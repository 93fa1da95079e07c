"""Adaptive FD-in-time driver — the Main_finite_difference.py experiment.

Usage:
    python -m adjoint_ode_adaptivity_tpu.drivers.fd_adaptive \
        --ode "du/dt=sin(u)" --functional "J=int(u^2)" --tol 1e-5 --maxit 40
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--case", default="FD_nonlinear_u_sq")
    p.add_argument("--ode", default="du/dt=sin(u)")
    p.add_argument("--functional", default="J=int(u^2)")
    p.add_argument("--u0", type=float, default=1.0)
    p.add_argument("--t0", type=float, default=0.0)
    p.add_argument("--t1", type=float, default=2.0)
    p.add_argument("--n-steps0", type=int, default=2)
    p.add_argument("--ref-factor", type=int, default=4)
    p.add_argument("--tol", type=float, default=1e-5)
    p.add_argument("--maxit", type=int, default=40)
    p.add_argument("--plot", action="store_true")
    p.add_argument("--checkpoint-dir", default=None,
                   help="orbax-checkpoint each iteration; resume if present "
                        "(greedy schedule only)")
    p.add_argument("--animate", action="store_true")
    p.add_argument(
        "--device-loop", action="store_true",
        help="run the WHOLE adaptive study as one lax.while_loop "
             "dispatch (on-device stopping test, single fetch); "
             "greedy schedule only",
    )
    p.add_argument("--x64", action="store_true")
    p.add_argument("--schedule", default="greedy", choices=["greedy", "backtrack"],
                   help="greedy: always bisect the argmax; backtrack: undo+block "
                        "inserts that increased the total estimate "
                        "(main_backtrack_serial.sh's named-but-missing experiment)")
    p.add_argument("--coarsen-tol", type=float, default=None,
                   help="backtrack schedule only: merge adjacent step pairs whose "
                        "combined contribution is below this")
    p.add_argument(
        "--ensemble", type=int, default=0,
        help="B>0: PER-MEMBER ensemble — B initial conditions drawn "
             "U(u0/2, 2*u0) with --seed, each adapting its OWN time grid "
             "and freezing at --tol independently (the reference's "
             "one-adaptive-job-per-config farm in one vmapped jit)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--engine", choices=["xla", "pallas"], default=None,
        help="--ensemble only: estimate engine (default: pallas on TPU "
             "— the whole per-member fwd+adjoint+indicator in one fused "
             "kernel launch)",
    )
    args = p.parse_args(argv)

    if args.x64:
        import jax

        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from adjoint_ode_adaptivity_tpu import odes
    from adjoint_ode_adaptivity_tpu.adapt import run_adaptive_fd
    from adjoint_ode_adaptivity_tpu.functionals import get_functional
    from adjoint_ode_adaptivity_tpu.march import euler_step

    ode = odes.get_ode(args.ode)
    functional = get_functional(args.functional)
    step = euler_step(ode.f)

    if args.ensemble > 0:
        import numpy as _np

        from adjoint_ode_adaptivity_tpu.adapt.fd_loop import (
            run_adaptive_fd_per_member,
        )

        import jax

        rng = _np.random.default_rng(args.seed)
        u0s = rng.uniform(args.u0 / 2.0, 2.0 * args.u0, args.ensemble)
        engine = args.engine or (
            "pallas" if jax.default_backend() == "tpu" else "xla"
        )
        if engine == "pallas" and args.functional != "J=int(u^2)":
            print(f"engine=pallas supports J=int(u^2) only; using xla "
                  f"for {args.functional}")
            engine = "xla"
        history = run_adaptive_fd_per_member(
            step, u0s, (args.t0, args.t1), n_steps0=args.n_steps0,
            functional_name=args.functional, ref_factor=args.ref_factor,
            tol=args.tol, maxit=args.maxit, engine=engine, ode_f=ode.f,
            checkpoint_dir=args.checkpoint_dir,
            device_loop=args.device_loop,
        )
        for it, r in enumerate(history):
            print(
                f"it {it:3d}  steps [{r.n_active.min()}..{r.n_active.max()}]"
                f"  J_mean={r.j_coarse.mean():+.10e}  "
                f"mean sum(err)={r.err_total.mean():.6e}  "
                f"refining={r.n_refining}/{args.ensemble}"
            )
        print(f"finished after {len(history)} iterations "
              f"(B={args.ensemble}, per-member, engine={engine})")
        return history

    if args.schedule == "backtrack" and (args.plot or args.animate):
        print("--plot/--animate are not supported with --schedule backtrack; "
              "ignoring")
        args.plot = args.animate = False
    plot_state = {"bar_ylim": None}
    case_dir = None
    if args.plot:
        from adjoint_ode_adaptivity_tpu.utils.plotting import fresh_case_dir, plot_iteration

        case_dir = fresh_case_dir(args.case)
        x_plot = np.linspace(args.t0, args.t1, 500)
        exact_fwd = (
            np.asarray(ode.exact_fwd(jnp.asarray(x_plot), args.u0))
            if ode.exact_fwd
            else None
        )
        exact_adj = None
        if ode.exact_fwd is not None and functional.g_u is not None:
            exact_adj = np.asarray(
                odes.exact_adjoint_rk4(
                    ode, functional.g_u, jnp.asarray(x_plot), args.u0, args.t1,
                    functional.terminal,
                )
            )

    def callback(result):
        n_act = int(result.n_steps_used)
        it = int(result.state.it) - 1
        print(
            f"it {it:3d}  steps {n_act:4d}  J={float(result.j_coarse):+.10e}  "
            f"sum(err)={float(result.err_total):.6e}"
        )
        if args.plot:
            rf = args.ref_factor
            t_pre = np.asarray(result.times_used)[: n_act + 1]
            dt = np.diff(t_pre)
            t_fine = np.concatenate([[t_pre[0]], t_pre[0] + np.cumsum(np.repeat(dt / rf, rf))])
            n_fine = len(dt) * rf
            plot_state["bar_ylim"] = plot_iteration(
                args.case,
                it,
                t_pre,
                np.asarray(result.u)[: n_act + 1],
                t_fine,
                np.asarray(result.v)[: n_fine + 1],
                np.asarray(result.err_steps)[: n_act],
                exact_t=x_plot,
                exact_fwd=exact_fwd,
                exact_adj=exact_adj,
                bar_ylim=plot_state["bar_ylim"],
            )

    if args.schedule == "backtrack":
        from adjoint_ode_adaptivity_tpu.adapt import run_adaptive_fd_backtrack_padded

        history = run_adaptive_fd_backtrack_padded(
            step,
            args.u0,
            (args.t0, args.t1),
            n_steps0=args.n_steps0,
            functional_name=args.functional,
            ref_factor=args.ref_factor,
            tol=args.tol,
            maxit=args.maxit,
            coarsen_tol=args.coarsen_tol,
        )
        for r in history:
            print(f"it {r['it']:3d}  steps {r['n_steps']:4d}  "
                  f"sum(err)={r['total']:.6e}  {r['action']}")
        print(f"finished after {len(history)} iterations; final Σerr = "
              f"{history[-1]['total']:.6e}")
        return history

    history = run_adaptive_fd(
        step,
        args.u0,
        (args.t0, args.t1),
        n_steps0=args.n_steps0,
        functional_name=args.functional,
        ref_factor=args.ref_factor,
        tol=args.tol,
        maxit=args.maxit,
        callback=callback,
        checkpoint_dir=args.checkpoint_dir,
        device_loop=args.device_loop,
    )
    print(f"finished after {len(history)} iterations; final Σerr = "
          f"{float(history[-1].err_total):.6e}")
    if args.plot and args.animate:
        from adjoint_ode_adaptivity_tpu.utils.plotting import animate_case

        out = animate_case(args.case)
        print("wrote", out)
    return history


if __name__ == "__main__":
    main()
