"""Spatial DG advection demo — the utils/One_code.mlx Advec1D driver.

Marches u_t + a·u_x = 0 on [0, 2π] (u0 = sin x, inflow BC −sin(a·t)) with
the LSRK4(5) DG march; optionally slope-limited; reports error vs the exact
solution and (optionally) the fwd+adjoint error estimate.

Usage:
    python -m adjoint_ode_adaptivity_tpu.drivers.advec_dg --k 10 --order 2
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--order", type=int, default=2)
    p.add_argument("--a", type=float, default=2 * np.pi)
    p.add_argument("--final-time", type=float, default=2.0)
    p.add_argument("--cfl", type=float, default=0.75)
    p.add_argument("--limiter", choices=["none", "n", "1"], default="none")
    p.add_argument("--estimate", action="store_true", help="run fwd+adjoint AWR")
    p.add_argument(
        "--adapt", action="store_true",
        help="run the goal-oriented element h-adaptivity loop (bisect the "
        "worst element by adjoint-weighted step-doubling error) instead of "
        "a single march",
    )
    p.add_argument("--maxit", type=int, default=8)
    p.add_argument("--tol", type=float, default=1e-10)
    p.add_argument("--x64", action="store_true")
    p.add_argument("--checkpoint-dir", default=None,
                   help="--adapt only: orbax-checkpoint each iteration; "
                        "resume if present")
    p.add_argument(
        "--kernel", choices=["xla", "pallas"], default="xla",
        help="pallas = fused f32 kernels (march; blocked-sublane estimate "
        "when K is a multiple of 8); needs --limiter none, interpret mode "
        "off-TPU",
    )
    args = p.parse_args(argv)
    if args.kernel == "pallas" and (args.limiter != "none" or args.x64):
        p.error("--kernel pallas requires --limiter none and f32 (no --x64)")

    import jax

    if args.kernel == "pallas":
        # must happen BEFORE the first device use below — LIBTPU_INIT_ARGS
        # is consumed when the TPU client is created
        from adjoint_ode_adaptivity_tpu.ops.pallas import ensure_scoped_vmem

        ensure_scoped_vmem()

    if args.x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from adjoint_ode_adaptivity_tpu.march.advec import (
        advec_march,
        advec_operators,
        cfl_dt,
    )
    from adjoint_ode_adaptivity_tpu.ops import (
        slope_limit_1,
        slope_limit_n,
        startup_1d,
    )

    dtype = jnp.float64 if args.x64 else jnp.float32

    if args.adapt:
        from adjoint_ode_adaptivity_tpu.adapt.advec_loop import run_adaptive_advec

        hist = run_adaptive_advec(
            lambda x: np.sin(x), n_order=args.order, k0=args.k, a=args.a,
            final_time=args.final_time, cfl=args.cfl / 2, maxit=args.maxit,
            tol=args.tol, dtype=dtype, engine=args.kernel,
            checkpoint_dir=args.checkpoint_dir,
        )
        for it, r in enumerate(hist):
            print(
                f"it {it:3d}  K={len(r.vx) - 1:5d}  J={r.j_value:+.10e}  "
                f"sum_eta={r.est_total:+.6e}"
            )
        print(
            f"finished after {len(hist)} iterations; "
            f"final |sum_eta| = {abs(hist[-1].est_total):.6e}"
        )
        return abs(hist[-1].est_total)

    disc = startup_1d(args.order, 0.0, 2 * np.pi, args.k)
    ops = advec_operators(disc, a=args.a, dtype=dtype)
    u0 = jnp.asarray(np.sin(disc.x), dtype)
    dt, n_steps = cfl_dt(disc, args.a, args.cfl, args.final_time)
    print(f"K={args.k} N={args.order} dt={dt:.3e} steps={n_steps}")

    post = None
    if args.limiter != "none":
        xj = jnp.asarray(disc.x, dtype)
        vj = jnp.asarray(disc.v, dtype)
        ivj = jnp.asarray(disc.inv_v, dtype)
        drj = jnp.asarray(disc.dr, dtype)
        lim = slope_limit_n if args.limiter == "n" else slope_limit_1
        post = lambda u: lim(u, xj, vj, ivj, drj)

    interpret = jax.default_backend() != "tpu"
    if args.kernel == "pallas":
        from adjoint_ode_adaptivity_tpu.ops.pallas import pick_chunk
        from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
            make_pallas_advec_march,
        )

        spc = pick_chunk(n_steps)
        march = make_pallas_advec_march(
            disc, args.a, dt, steps_per_call=spc, interpret=interpret
        )
        u = march(u0, jnp.asarray(0.0, dtype), n_steps // spc)
    else:
        u = advec_march(ops, u0, dt, n_steps, post_stage=post)
    jax.block_until_ready(u)
    exact = np.sin(np.asarray(disc.x) - args.a * args.final_time)
    err = float(jnp.max(jnp.abs(u - exact)))
    print(f"max |u - exact| at T={args.final_time}: {err:.6e}")

    if args.estimate:
        from adjoint_ode_adaptivity_tpu.adjoint.advec import (
            advec_fwd_adj_estimate,
            terminal_integral_cotangent,
        )

        n8 = max(8, (n_steps // 8) * 8)
        if args.kernel == "pallas" and disc.k % 8 == 0:
            from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
                make_pallas_fwd_adj_estimate_grid_single_blocked,
            )

            from adjoint_ode_adaptivity_tpu.ops.pallas import pick_chunk

            seg = pick_chunk(n8, (32, 16, 8, 4, 2, 1))
            pipe = make_pallas_fwd_adj_estimate_grid_single_blocked(
                disc, args.a, args.final_time / n8, segment=seg,
                n_segments=n8 // seg, interpret=interpret,
            )
            lam = terminal_integral_cotangent(disc, dtype)
            uf, lam0, eta = pipe(u0, jnp.asarray(0.0, dtype), lam)
            j_value = jnp.sum(lam * uf)
            sum_eta = jnp.sum(eta)
        else:
            res = advec_fwd_adj_estimate(
                ops, disc, u0, args.final_time / n8, n8,
                segment=max(n8 // 8, 1),
            )
            j_value, sum_eta = res.j_value, jnp.sum(res.eta)
        print(f"J = {float(j_value):+.10e}  Σeta = {float(sum_eta):+.6e}")
    return err


if __name__ == "__main__":
    main()
