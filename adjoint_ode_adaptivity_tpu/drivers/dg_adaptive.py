"""Adaptive DG-in-time driver — the matlab/MAIN.m experiment.

Per iteration, prints the effectivity telemetry exactly as the reference:
JuH−Juh (coarse minus fine functional), JuH−Ju (vs exact when available),
and the adjoint-weighted residual sum — all to %.10e (MAIN.m:55-76).

Usage:
    python -m adjoint_ode_adaptivity_tpu.drivers.dg_adaptive --maxit 30
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--case", default="dg_nonlinear")
    p.add_argument("--ode", default="du/dt=sin(u)")
    p.add_argument("--y0", type=float, default=1.0)
    p.add_argument("--t0", type=float, default=0.0)
    p.add_argument("--t1", type=float, default=2.0)
    p.add_argument("--order", type=int, default=1)
    p.add_argument("--k0", type=int, default=2)
    p.add_argument("--tol", type=float, default=1e-5)
    p.add_argument("--maxit", type=int, default=30)
    p.add_argument("--plot", action="store_true")
    p.add_argument("--checkpoint-dir", default=None,
                   help="orbax-checkpoint each iteration; resume if present")
    p.add_argument("--x64", action="store_true", default=True)
    p.add_argument("--adjoint", choices=["solve", "reconstruct"], default="solve",
                   help="adjoint at order n+1: direct march (adj_march) or "
                        "Radau reconstruction from an order-n solve (adj_rec)")
    p.add_argument(
        "--padded",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="compile-once padded loop (default: on for TPU backends)",
    )
    p.add_argument(
        "--ensemble", type=int, default=0,
        help="B>0: ensemble-mean refinement signal over B initial "
             "conditions drawn U(y0/2, 2*y0) with seed --seed (the "
             "reference's Main_variable_params.py:330-341 signal applied "
             "to the MATLAB strand; batched pipeline, padded partition)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--engine", choices=["xla", "pallas"], default=None,
        help="ensemble paths: pipeline engine (default: pallas on TPU "
             "for --ensemble; xla for --hp --per-member, where pallas "
             "fuses the whole mixed-order member pipeline per launch "
             "and needs B to be a multiple of 8)",
    )
    p.add_argument(
        "--dp", action="store_true",
        help="--ensemble only: data-parallelize the members over ALL "
             "local devices (jax.sharding.Mesh on a 'data' axis; B must "
             "divide by the device count)",
    )
    p.add_argument(
        "--per-member", action="store_true",
        help="--ensemble only: every member adapts its OWN partition "
             "(bisects its own argmax, freezes at --tol independently) — "
             "the reference's one-adaptive-job-per-IC farm "
             "(Submit_schedule_frontera) in one compile-once loop",
    )
    p.add_argument(
        "--hp", choices=["h", "p", "hp", "smooth"], default=None,
        help="hp-adaptive loop on the mixed per-element-order solvers "
             "(dg_march.m's latent Ns-vector capability): refine the ORDER "
             "at the argmax element ('p'), bisect it ('h' — children "
             "inherit the order), p-until-saturated-then-h ('hp'), or "
             "decide p-vs-h from the element's modal decay ('smooth' — "
             "see --smooth-theta); --order sets the starting order, "
             "--n-max the p cap",
    )
    p.add_argument(
        "--smooth-theta", type=float, default=0.3,
        help="--hp smooth only: p-refine when the argmax element's top "
             "Legendre mode holds at most this fraction of the modal "
             "energy, else bisect",
    )
    p.add_argument(
        "--newton-iters", type=int, default=None,
        help="fixed Newton iteration count for the hp solves (the vmapped-"
             "ensemble TPU fast path; default: tolerance while_loop)",
    )
    p.add_argument("--n-max", type=int, default=4,
                   help="--hp only: maximum per-element order")
    p.add_argument(
        "--device-loop", action="store_true",
        help="run the WHOLE adaptive loop on device (lax.while_loop over "
             "iterations, on-device stopping test, one dispatch + one "
             "fetch for the run); applies to the single-run padded loop "
             "and to --per-member",
    )
    args = p.parse_args(argv)

    if args.x64:
        import jax

        jax.config.update("jax_enable_x64", True)

    import jax
    import jax.numpy as jnp

    from adjoint_ode_adaptivity_tpu import odes
    from adjoint_ode_adaptivity_tpu.adapt.dg_loop import run_adaptive_dg

    ode = odes.get_ode(args.ode)
    j_exact = None
    if ode.exact_fwd is not None:
        # J = ∫u dt via dense quadrature on the exact solution
        tq = np.linspace(args.t0, args.t1, 20001)
        uq = np.asarray(ode.exact_fwd(jnp.asarray(tq), args.y0))
        j_exact = np.trapezoid(uq, tq)

    def callback(r):
        k = len(r.times) - 1
        print(f"-- it with K={k}")
        print("JuH-Juh")
        print(f"{r.effectivity_gap:.10e}")
        if j_exact is not None:
            print("JuH-Ju")
            print(f"{r.j_coarse - j_exact:.10e}")
        print("Adj-W Res")
        print(f"{r.est_total:.10e}")

    if args.hp is not None:
        from adjoint_ode_adaptivity_tpu.adapt.hp_loop import run_adaptive_dg_hp

        hp_y0 = args.y0
        hp_mesh = None
        if args.ensemble > 0:
            rng = np.random.default_rng(args.seed)
            hp_y0 = rng.uniform(args.y0 / 2.0, 2.0 * args.y0, args.ensemble)
            if args.dp:
                from jax.sharding import Mesh

                hp_mesh = Mesh(np.array(jax.devices()), ("data",))
                print(f"dp over {hp_mesh.shape['data']} devices")
        elif args.dp:
            p.error("--dp requires --ensemble with --hp")
        if args.ensemble > 0 and args.per_member:
            # every member its own partition AND order vector
            from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
                run_adaptive_dg_hp_per_member,
            )

            history = run_adaptive_dg_hp_per_member(
                ode.f, hp_y0, (args.t0, args.t1),
                k0=args.k0, n0=args.order, n_max=args.n_max, mode=args.hp,
                tol=args.tol, maxit=args.maxit, adjoint_mode=args.adjoint,
                newton_iters=args.newton_iters,
                engine=args.engine or "xla",
                smooth_theta=args.smooth_theta,
                mesh=hp_mesh, device_loop=args.device_loop,
                checkpoint_dir=args.checkpoint_dir,
            )
            for it, r in enumerate(history):
                print(
                    f"-- it {it} K=[{r.n_active.min()}..{r.n_active.max()}]"
                    f" max order={r.ns.max()}"
                    f" mean |est|={np.abs(r.est_total).mean():.10e}"
                    f" refining={r.n_refining}/{args.ensemble}"
                )
            print(f"finished after {len(history)} iterations "
                  f"(per-member hp, B={args.ensemble}, mode={args.hp})")
            return history

        # the exact-J comparison only makes sense for a single IC (the
        # ensemble's mean J is not the scalar y0's functional)
        hp_j_exact = j_exact if args.ensemble == 0 else None

        def hp_callback(r):
            k = len(r.ns)
            print(f"-- it with K={k} ns={r.ns.tolist()}")
            print("JuH-Juh")
            print(f"{r.effectivity_gap:.10e}")
            if hp_j_exact is not None:
                print("JuH-Ju")
                print(f"{r.j_coarse - hp_j_exact:.10e}")
            print("Adj-W Res")
            print(f"{r.est_total:.10e}")

        history = run_adaptive_dg_hp(
            ode.f, hp_y0, (args.t0, args.t1),
            k0=args.k0, n0=args.order, n_max=args.n_max, mode=args.hp,
            tol=args.tol, maxit=args.maxit, callback=hp_callback,
            newton_iters=args.newton_iters,
            adjoint_mode=args.adjoint,
            engine=args.engine or "xla",
            smooth_theta=args.smooth_theta, mesh=hp_mesh,
            checkpoint_dir=args.checkpoint_dir,
            device_loop=args.device_loop,
        )
        last = history[-1]
        print(f"finished after {len(history)} iterations "
              f"(mode={args.hp}, K={len(last.ns)}, "
              f"orders {last.ns.min()}..{last.ns.max()})")
        if args.plot:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from adjoint_ode_adaptivity_tpu.utils.plotting import (
                fresh_case_dir,
            )

            fresh_case_dir(args.case)
            for i, r in enumerate(history):
                fig, ax1 = plt.subplots(figsize=(10, 7))
                mids = (r.times[:-1] + r.times[1:]) / 2
                widths = np.diff(r.times)
                ax1.bar(mids, np.abs(r.err), widths,
                        color=[0.466, 0.674, 0.188])
                ax1.set_ylabel("Error Contribution")
                ax2 = ax1.twinx()
                u_p = r.u[0] if r.u.ndim == 3 else r.u  # member 0 when
                v_p = r.v[0] if r.v.ndim == 3 else r.v  # --ensemble is set
                for kk in range(len(r.ns)):
                    npk = int(r.ns[kk]) + 1  # live nodes only (padded
                    # entries beyond the element's order are zeros)
                    tk = np.linspace(r.times[kk], r.times[kk + 1], npk)
                    ax2.plot(tk, u_p[kk, :npk], "g--*", linewidth=2)
                    ta = np.linspace(r.times[kk], r.times[kk + 1], npk + 1)
                    ax2.plot(ta, v_p[kk, : npk + 1], "r--*", linewidth=2)
                ax2.set_ylabel("Solution")
                fig.savefig(f"{args.case}/{args.case}_{i}.png")
                plt.close(fig)
            print(f"wrote {len(history)} frames to {args.case}/")
        return history

    if args.ensemble > 0:
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_ensemble,
        )

        engine = args.engine or (
            "pallas" if jax.default_backend() == "tpu" else "xla"
        )
        rng = np.random.default_rng(args.seed)
        y0s = rng.uniform(
            args.y0 / 2.0, 2.0 * args.y0, args.ensemble
        ).astype(np.float32 if engine == "pallas" else np.float64)
        mesh = None
        if args.dp:
            from jax.sharding import Mesh

            mesh = Mesh(np.array(jax.devices()), ("data",))
            print(f"dp over {mesh.shape['data']} devices")
        if args.per_member:
            from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
                run_adaptive_dg_per_member,
            )

            history = run_adaptive_dg_per_member(
                ode.f, y0s, (args.t0, args.t1),
                n_order=args.order, k0=args.k0, tol=args.tol,
                maxit=args.maxit, newton_iters=8, engine=engine,
                mesh=mesh, checkpoint_dir=args.checkpoint_dir,
                device_loop=args.device_loop,
            )
            for it, r in enumerate(history):
                print(
                    f"-- it {it} K=[{r.n_active.min()}..{r.n_active.max()}]"
                    f"  J_mean={r.j.mean():.10e}  "
                    f"mean |Adj-W Res|={np.abs(r.est_total).mean():.10e}  "
                    f"refining={r.n_refining}/{args.ensemble}"
                )
            mode = "per-member, device-loop" if args.device_loop \
                else "per-member"
            print(f"finished after {len(history)} iterations "
                  f"(B={args.ensemble}, {mode}, engine={engine})")
            return history
        history = run_adaptive_dg_ensemble(
            ode.f, y0s, (args.t0, args.t1),
            n_order=args.order, k0=args.k0, tol=args.tol, maxit=args.maxit,
            newton_iters=8, engine=engine, mesh=mesh,
            checkpoint_dir=args.checkpoint_dir,
            device_loop=args.device_loop,
        )
        for it, r in enumerate(history):
            print(
                f"-- it {it} K={len(r.times) - 1}  "
                f"J_mean={r.j_mean:.10e}  "
                f"mean Adj-W Res={r.est_total_mean:.10e}"
            )
        print(f"finished after {len(history)} iterations "
              f"(B={args.ensemble}, engine={engine})")
        return history

    padded = args.padded
    if padded is None:
        padded = jax.default_backend() == "tpu" or args.device_loop
    history = run_adaptive_dg(
        ode.f,
        args.y0,
        (args.t0, args.t1),
        n_order=args.order,
        k0=args.k0,
        tol=args.tol,
        maxit=args.maxit,
        callback=callback,
        padded=padded,
        adjoint_mode=args.adjoint,
        checkpoint_dir=args.checkpoint_dir,
        device_loop=args.device_loop,
    )
    print(f"finished after {len(history)} iterations, "
          f"K={len(history[-1].times) - 1} elements")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from adjoint_ode_adaptivity_tpu.utils.plotting import fresh_case_dir

        fresh_case_dir(args.case)
        for i, r in enumerate(history):
            fig, ax1 = plt.subplots(figsize=(10, 7))
            mids = (r.times[:-1] + r.times[1:]) / 2
            widths = np.diff(r.times)
            ax1.bar(mids, np.abs(r.err), widths, color=[0.466, 0.674, 0.188])
            ax1.set_ylabel("Error Contribution")
            ax2 = ax1.twinx()
            for kk in range(r.u.shape[0]):
                tk = np.linspace(r.times[kk], r.times[kk + 1], r.u.shape[1])
                ax2.plot(tk, r.u[kk], "g--*", linewidth=2)
                ta = np.linspace(r.times[kk], r.times[kk + 1], r.v.shape[1])
                ax2.plot(ta, r.v[kk], "r--*", linewidth=2)
            ax2.set_ylabel("Solution")
            fig.savefig(f"{args.case}/{args.case}_{i}.png")
            plt.close(fig)
        print(f"wrote {len(history)} frames to {args.case}/")
    return history


if __name__ == "__main__":
    main()
