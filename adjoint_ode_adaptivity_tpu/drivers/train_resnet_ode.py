"""Train ResNet-as-integrator networks through the differentiable solver
with adjoint-driven depth (time) and width (neuron) adaptivity.

One driver covers the reference's five NN experiment families:

  --method recurrent        Main_FD_with_net.py   (shared params, batches,
                            trajectory MSE against RK4 truth)
  --method variable_params  Main_variable_params.py (per-step params,
                            ensemble-averaged refinement signal, noise init)
  --method new_loss         Main_new_loss.py      (trajectory/trapezoid loss
                            + terminal ramp)
  --method detect           Main_no_matrix_detect_complex.py (plateau-gated
                            refinement, Gaussian-mixture ODE)
  --method width            Main_width_ref.py     (width-vs-depth policy)

Usage:
    python -m adjoint_ode_adaptivity_tpu.drivers.train_resnet_ode \
        --method variable_params --seed 1 --epochs 200 --maxit 5
"""
from __future__ import annotations

import argparse

import numpy as np


def _ensemble_refinement_signal(net, params_stacked, dt, rf, u0s, trues, n_active=None):
    """Mean per-coarse-step error indicator over the IC ensemble: vmapped
    forward/adjoint/residual with the terminal-error goal functional
    (Main_variable_params.py:330-341). ``n_active`` (L,) switches to the
    masked padded-capacity net (ResBlockSimpleMasked)."""
    import jax
    import jax.numpy as jnp

    from adjoint_ode_adaptivity_tpu.adjoint import (
        adjoint_march_per_step,
        coarse_indicator,
        interp_to_fine,
        refine_all,
        residual,
    )
    from adjoint_ode_adaptivity_tpu.functionals import terminal_abs_error
    from adjoint_ode_adaptivity_tpu.march.fd import forward_march_per_step

    if n_active is None:
        def net_step(u, t, d, p):
            return net.apply({"params": p}, u, t, d)

    else:
        params_stacked = (params_stacked, n_active)

        def net_step(u, t, d, pm):
            p, n_a = pm
            return net.apply({"params": p}, u, t, d, n_a)

    dt_f = refine_all(dt, rf)
    fine_params = jax.tree_util.tree_map(
        lambda l: jnp.repeat(l, rf, axis=0), params_stacked
    )

    def one(u0, true):
        u = forward_march_per_step(net_step, jnp.atleast_1d(u0), dt, params_stacked)
        u_f = interp_to_fine(jnp.squeeze(u), dt, dt_f)[:, None]
        k_vec = jax.grad(lambda uu: terminal_abs_error(uu, true))(u_f)
        v = adjoint_march_per_step(
            net_step, u_f, dt_f, jnp.squeeze(k_vec), fine_params
        )
        res = residual(net_step, u_f, dt_f, params_stacked=fine_params)
        return coarse_indicator(jnp.squeeze(res * v), rf, "block")

    return jnp.mean(jax.vmap(one)(u0s, trues), axis=0)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--method", default="variable_params",
                   choices=["recurrent", "variable_params", "new_loss", "detect", "width"])
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--node", type=int, default=1, help="accepted for parity; unused")
    p.add_argument("--ode", default=None, help="override the method's default ODE")
    p.add_argument("--hidden", default=None,
                   help="--method recurrent: comma-separated Dense-chain "
                        "hidden widths (reference config '100,500', "
                        "Main_FD_with_net.py:52); default: one layer of "
                        "--width")
    p.add_argument("--n-steps", type=int, default=2)
    p.add_argument("--t1", type=float, default=1.0)
    p.add_argument("--width", type=int, default=16)
    p.add_argument("--width-capacity", type=int, default=0,
                   help="padded neuron capacity for --method width "
                        "(0 = width + maxit + 4)")
    p.add_argument("--ref-factor", type=int, default=4)
    p.add_argument("--epochs", type=int, default=200, help="epochs per outer iteration")
    p.add_argument("--maxit", type=int, default=5, help="outer refinement iterations")
    p.add_argument("--n-train", type=int, default=512)
    p.add_argument("--n-test", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument("--ref-tol", type=float, default=5e-5, help="plateau tolerance")
    p.add_argument("--width-tol", type=float, default=5e-5, help="bin-loss tolerance")
    p.add_argument("--depth-rel-tol", type=float, default=0.1,
                   help="width-vs-depth plateau tolerance (Main_width_ref.py"
                        ":487-500): refine depth when the relative loss "
                        "improvement over the epoch window falls below this; "
                        "0 forces width growth")
    p.add_argument("--train-engine", default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="pallas = the fused training-epoch kernel "
                        "(ops.pallas.train_fused; per-step ResBlockSimple "
                        "methods with n-train a multiple of 128). auto = "
                        "pallas on TPU when eligible, else xla")
    p.add_argument("--dp", action="store_true",
                   help="shard the training ensemble over all devices "
                        "(fused engine only: per-device fused epoch "
                        "kernels, psum-reduced gradients; n-train must "
                        "give each device a multiple of 128)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --checkpoint-dir")
    p.add_argument("--jsonl", default=None, help="metrics JSONL path")
    p.add_argument("--wandb-project", default=None)
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import jax.random as jrand
    import optax

    from adjoint_ode_adaptivity_tpu import models, odes
    from adjoint_ode_adaptivity_tpu.adapt.policy import plateau_detect, should_refine_depth
    from adjoint_ode_adaptivity_tpu.train import (
        MetricsLogger,
        create_train_state,
        evaluate,
        make_mixed_loss_train_step,
        make_per_step_train_step,
        rk4_truth,
    )

    default_ode = {
        "recurrent": "du/dt=t*sin(u)",
        "variable_params": "du/dt=10cos(u)",
        "new_loss": "du/dt=cos(2*pi*u)",
        "detect": "gaussian_mixture",
        "width": "du/dt=10cos(u)",
    }[args.method]
    ode_name = args.ode or default_ode
    ode = (
        odes.gaussian_mixture_ode()
        if ode_name == "gaussian_mixture"
        else odes.get_ode(ode_name)
    )

    case = f"ResNetODE_{args.method}_{args.seed}"
    logger = MetricsLogger(
        case,
        wandb_project=args.wandb_project,
        wandb_config={"problem": "ResNet", "method": args.method},
        jsonl_path=args.jsonl,
        verbose=not args.quiet,
    )

    rng = jrand.PRNGKey(args.seed)
    n_steps = args.n_steps
    t = jnp.linspace(0.0, args.t1, n_steps + 1)
    dt = jnp.diff(t)

    use_masked = args.method == "width"
    if use_masked:
        # padded-capacity masked net: width growth is an in-place scatter,
        # shapes (and the compiled train step) never change
        capacity = args.width_capacity or (args.width + args.maxit + 4)
        net = models.ResBlockSimpleMasked(capacity)
        # active prefix = the width-`width` ResBlockSimple init bit-for-bit
        # (direct masked init would sort knots across the full capacity and
        # hand the active prefix only the lowest tail)
        p_simple = models.ResBlockSimple(args.width).init(
            rng, jnp.ones(1), 0.0, 0.1
        )["params"]
        p1 = models.masked_params_from_simple(p_simple, capacity)
        n_active = jnp.full((n_steps,), args.width, jnp.int32)
    elif args.method == "recurrent":
        # Main_FD_with_net trains the Dense-chain ResNetBlock (szs =
        # [100, 500], Main_FD_with_net.py:52-54) with ONE shared param
        # set; --hidden picks the chain (default: one layer of --width)
        capacity = args.width
        hidden = (
            tuple(int(s) for s in args.hidden.split(","))
            if args.hidden else (args.width,)
        )
        net = models.ResNetBlock(hidden)
        p1 = net.init(rng, jnp.ones(1), 0.0, 0.1)["params"]
        n_active = None
    else:
        capacity = args.width
        net = models.ResBlockSimple(args.width)
        p1 = net.init(rng, jnp.ones(1), 0.0, 0.1)["params"]
        n_active = None
    stacked = jax.tree_util.tree_map(lambda l: jnp.stack([l] * n_steps), p1)
    tx = optax.adam(args.lr)
    state = create_train_state(stacked, tx)

    u0_train = jrand.uniform(rng, (args.n_train,), minval=-3.0, maxval=3.0)
    u0_test = jnp.concatenate(
        [u0_train[:1], jnp.array([-5.0]), 4.0 * jrand.normal(rng, (args.n_test - 2,))]
    )
    true_train = rk4_truth(ode.f, u0_train, (0.0, args.t1), n_sub=256)
    true_test = rk4_truth(ode.f, u0_test, (0.0, args.t1), n_sub=256)

    use_mixed = args.method == "new_loss"
    use_shared = args.method == "recurrent"
    use_fused = False
    if args.dp and use_shared:
        raise SystemExit(
            "--dp is only supported with the fused engines "
            "(methods variable_params/new_loss/detect/width)"
        )

    def _dp_mesh_or_none():
        if not args.dp:
            return None
        from jax.sharding import Mesh

        devs = jax.devices()
        if args.n_train % (128 * len(devs)):
            raise SystemExit(
                f"--dp: n-train={args.n_train} must give each of "
                f"the {len(devs)} devices a multiple of 128 members"
            )
        return Mesh(np.array(devs), ("data",))

    if use_mixed:
        t_nodes = jnp.pad(jnp.cumsum(dt), (1, 0))
        traj_train = rk4_truth(
            ode.f, u0_train, (0.0, args.t1), n_sub=256, save_times=t_nodes
        )
        use_fused = args.train_engine == "pallas" or (
            args.train_engine == "auto"
            and jax.default_backend() == "tpu"
            and args.n_train % 128 == 0
        )
        if use_fused:
            from adjoint_ode_adaptivity_tpu.train import (
                make_mixed_loss_train_step_fused,
            )

            def _mk_step(s):
                return make_mixed_loss_train_step_fused(
                    tx, s, args.width,
                    interpret=jax.default_backend() != "tpu",
                    mesh=_dp_mesh_or_none(),
                )

            train_step = _mk_step(n_steps)
        elif args.dp:
            raise SystemExit(
                "--dp requires the fused engine "
                "(--train-engine pallas/auto-eligible)"
            )
        else:
            train_step = make_mixed_loss_train_step(net, tx)
    elif use_shared:
        # Main_FD_with_net: ONE parameter set shared across all steps,
        # shuffled mini-batches of the IC ensemble
        from adjoint_ode_adaptivity_tpu.train import make_batches, make_shared_train_step

        state = create_train_state(p1, tx)
        batch_size = max(8, args.n_train // 16)
        sizes = hidden
        use_fused = args.train_engine == "pallas" or (
            args.train_engine == "auto"
            and jax.default_backend() == "tpu"
            and batch_size % 8 == 0
        )
        if use_fused and batch_size % 8:
            raise SystemExit(
                f"--train-engine pallas (shared): the minibatch size "
                f"{batch_size} must be a multiple of 8"
            )

        def _mk_shared_step(dt_now):
            if use_fused:
                from adjoint_ode_adaptivity_tpu.train import (
                    make_shared_train_step_fused,
                )

                return make_shared_train_step_fused(
                    tx, dt_now, sizes,
                    interpret=jax.default_backend() != "tpu",
                    block_members=max(8, batch_size),
                )
            return make_shared_train_step(net, tx, dt_now)

        train_step = _mk_shared_step(dt)
    else:
        # per-step ResBlockSimple (plain or padded-capacity masked):
        # eligible for the fused kernel
        use_fused = args.train_engine == "pallas" or (
            args.train_engine == "auto"
            and jax.default_backend() == "tpu"
            and args.n_train % 128 == 0
        )
        if use_fused:
            from adjoint_ode_adaptivity_tpu.train import (
                make_per_step_masked_train_step_fused,
                make_per_step_train_step_fused,
            )

            dp_mesh = _dp_mesh_or_none()

            def _mk_step(s):
                interp = jax.default_backend() != "tpu"
                if use_masked:
                    return make_per_step_masked_train_step_fused(
                        tx, s, capacity, interpret=interp, mesh=dp_mesh
                    )
                return make_per_step_train_step_fused(
                    tx, s, args.width, interpret=interp, mesh=dp_mesh
                )

            train_step = _mk_step(n_steps)
        elif args.dp:
            raise SystemExit(
                "--dp requires the fused engine (per-step ResBlockSimple "
                "method, --train-engine pallas/auto-eligible)"
            )
        elif use_masked:
            from adjoint_ode_adaptivity_tpu.train import (
                make_per_step_masked_train_step,
            )

            train_step = make_per_step_masked_train_step(net, tx)
        else:
            train_step = make_per_step_train_step(net, tx)

    ep_total = 0
    min_loss = jnp.asarray(1e10)
    err_total = np.inf
    it = 0

    if args.resume and args.checkpoint_dir:
        from adjoint_ode_adaptivity_tpu.train.checkpoint import (
            latest_step,
            restore_checkpoint,
        )

        last = latest_step(args.checkpoint_dir)
        if last is not None:
            import json as _json
            from pathlib import Path as _Path

            # the meta sidecar records the grid size AND the padded neuron
            # capacity so the restore template has the right shapes after
            # both depth refinements and width growth (width growth never
            # changes shapes — capacity is the allocation)
            meta_path = _Path(args.checkpoint_dir) / "meta.json"
            ck_steps, ck_capacity = n_steps, capacity
            if meta_path.exists():
                meta = _json.loads(meta_path.read_text())
                ck_steps = int(meta["n_steps"])
                ck_capacity = int(meta.get("capacity", capacity))
            if use_masked and ck_capacity != capacity:
                capacity = ck_capacity
                net = models.ResBlockSimpleMasked(capacity)
                p1 = net.init(
                    rng, jnp.ones(1), 0.0, 0.1, jnp.asarray(args.width)
                )["params"]
                from adjoint_ode_adaptivity_tpu.train import (
                    make_per_step_masked_train_step as _mk_masked,
                )

                train_step = _mk_masked(net, tx)
            t_tpl = jnp.linspace(0.0, args.t1, ck_steps + 1)
            if use_shared:
                stacked_tpl = p1  # shared method: one unstacked parameter set
            else:
                stacked_tpl = jax.tree_util.tree_map(
                    lambda l: jnp.stack([l] * ck_steps), p1
                )
            state_tpl = create_train_state(stacked_tpl, tx)
            template = {
                "params": state_tpl.params,
                "opt_state": state_tpl.opt_state,
                "times": t_tpl,
                "it": jnp.asarray(0),
            }
            if use_masked:
                template["n_active"] = jnp.full((ck_steps,), args.width, jnp.int32)
            try:
                restored = restore_checkpoint(args.checkpoint_dir, template, last)
                state = state_tpl._replace(
                    params=restored["params"], opt_state=restored["opt_state"]
                )
                t = restored["times"]
                dt = jnp.diff(t)
                it = int(restored["it"]) + 1
                n_steps = len(dt)
                if use_masked:
                    n_active = restored["n_active"]
                if use_shared:
                    train_step = _mk_shared_step(dt)
                elif use_fused:
                    train_step = _mk_step(n_steps)
                if use_mixed:
                    # the restored partition may have refined past the
                    # fresh-start one — the trajectory targets must be
                    # sampled at the RESTORED time nodes or the first
                    # epoch fails the (S+1, B) shape contract
                    t_nodes = jnp.pad(jnp.cumsum(dt), (1, 0))
                    traj_train = rk4_truth(
                        ode.f, u0_train, (0.0, args.t1), n_sub=256,
                        save_times=t_nodes,
                    )
                print(f"resumed from checkpoint step {last} (outer it {it})")
            except Exception as e:
                print(f"resume failed ({type(e).__name__}: {e}); starting fresh")

    while err_total > args.tol and it <= args.maxit:
        loss_hist = jnp.zeros((args.epochs,))
        ep = 0
        refine = False
        # --- train until epoch budget (or plateau for --method detect)
        while True:
            if use_mixed:
                state, loss = train_step(state, dt, u0_train, traj_train, jnp.asarray(it))
            elif use_shared:
                u0_b, true_b = make_batches(
                    jrand.PRNGKey(ep + ep_total), u0_train, true_train, batch_size
                )
                for b in range(u0_b.shape[0]):
                    state, loss = train_step(state, u0_b[b], true_b[b])
            elif use_masked:
                state, loss = train_step(state, dt, n_active, u0_train, true_train)
            else:
                state, loss = train_step(state, dt, u0_train, true_train)
            if use_masked:
                from adjoint_ode_adaptivity_tpu.train import evaluate_masked

                err = evaluate_masked(
                    net, state.params, n_active, dt, u0_test, true_test
                )
            else:
                err = evaluate(
                    net, state.params, dt, u0_test, true_test, per_step=not use_shared
                )
            logger.log({"Epoch": ep + ep_total, "Loss": loss, "Error": err,
                        "Refinements": it})
            loss_hist = jnp.concatenate([loss_hist[1:], loss[None]])
            ep += 1
            if args.method == "detect":
                if ep >= args.epochs:
                    refine, min_loss = plateau_detect(loss_hist, min_loss, args.ref_tol)
                    refine = bool(refine)
                if refine or ep >= 20 * args.epochs:
                    break
            elif ep >= args.epochs:
                break
        ep_total += ep

        # --- refinement signal (ensemble-averaged adjoint indicator)
        sig_n = min(args.n_train, 128)  # signal ensemble (full set in reference)
        if use_shared:
            sig_params = jax.tree_util.tree_map(
                lambda l: jnp.broadcast_to(l, (len(dt),) + l.shape), state.params
            )
        else:
            sig_params = state.params
        err_steps = _ensemble_refinement_signal(
            net, sig_params, dt, args.ref_factor, u0_train[:sig_n],
            true_train[:sig_n], n_active=n_active,
        )
        err_total = float(jnp.sum(err_steps))
        idx = int(jnp.argmax(err_steps)) + 1

        # --- adapt
        grow_depth = True
        if args.method == "width":
            grow_depth = bool(should_refine_depth(loss_hist, args.depth_rel_tol))
        if grow_depth:
            t_new = jnp.zeros((len(t) + 1,))
            t_new = t_new.at[:idx].set(t[:idx])
            t_new = t_new.at[idx + 1 :].set(t[idx:])
            t_new = t_new.at[idx].set(jnp.mean(t[idx - 1 : idx + 1]))
            t = t_new
            dt = jnp.diff(t)
            if use_shared:
                # shared params need no surgery; rebuild the step for new dt
                train_step = _mk_shared_step(dt)
            else:
                if use_fused:
                    # the fused kernel bakes n_steps; rebuild per insertion
                    train_step = _mk_step(n_steps + 1)
                mode = "noise" if args.method == "variable_params" else "copy_left"
                new_params = models.insert_step_params(
                    state.params, idx, mode=mode, key=jrand.PRNGKey(len(t))
                )
                state = create_train_state(new_params, tx)
                if use_masked:
                    n_active = models.insert_step_params(n_active, idx)
            n_steps += 1
            what = f"depth insert at {idx}"
        else:
            # reference-faithful width growth: adaptWidth over EVERY step's
            # parameters in place (Main_width_ref.py:225-312) — hidden layers
            # bin per-layer knot losses, the last layer bins the terminal
            # prediction error; trained weights of every step are preserved,
            # grown steps get fresh optimizer moments; no retrace.
            from adjoint_ode_adaptivity_tpu.march.fd import forward_march_per_step
            from adjoint_ode_adaptivity_tpu.train.loop import _masked_net_step_fn

            step_fn = _masked_net_step_fn(net)
            u_arr = jax.vmap(
                lambda u0: forward_march_per_step(
                    step_fn, jnp.atleast_1d(u0), dt, (state.params, n_active)
                )
            )(u0_train[:sig_n])[..., 0]
            grown, n_active_new, inserted = models.grow_width_all_steps(
                state.params, n_active, u_arr, true_train[:sig_n],
                tol=args.width_tol,
            )
            if bool(jnp.any(inserted)):
                opt_state = models.zero_step_moments(state.opt_state, inserted)
                state = state._replace(params=grown, opt_state=opt_state)
                n_active = n_active_new
                what = (
                    f"width grow at steps {np.flatnonzero(np.asarray(inserted)).tolist()}"
                    f" -> n_active={np.asarray(n_active).tolist()}"
                )
            else:
                what = "no growth (below tol)"

        if use_mixed:
            t_nodes = jnp.pad(jnp.cumsum(dt), (1, 0))
            traj_train = rk4_truth(
                ode.f, u0_train, (0.0, args.t1), n_sub=256, save_times=t_nodes
            )

        print(f"outer it {it}: err_total={err_total:.4e}  {what}  "
              f"(n_steps={len(dt)})")

        if args.checkpoint_dir:
            import json as _json
            from pathlib import Path as _Path

            from adjoint_ode_adaptivity_tpu.train.checkpoint import save_checkpoint

            ck = {"params": state.params, "opt_state": state.opt_state,
                  "times": t, "it": it}
            if use_masked:
                ck["n_active"] = n_active
            save_checkpoint(args.checkpoint_dir, it, ck)
            # sidecar: grid size + padded capacity for shape-correct resume
            # templates (the capacity, not the original --width: width growth
            # is in-place so shapes are always (capacity,...))
            (_Path(args.checkpoint_dir) / "meta.json").write_text(
                _json.dumps({"n_steps": int(len(dt)), "capacity": int(capacity)})
            )
        it += 1

    logger.finish()
    return state, t


if __name__ == "__main__":
    main()
