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
    p.add_argument("--x64", action="store_true")
    args = p.parse_args(argv)

    import jax

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

    u = advec_march(ops, u0, dt, n_steps, post_stage=post)
    jax.block_until_ready(u)
    exact = np.sin(np.asarray(disc.x) - args.a * args.final_time)
    err = float(jnp.max(jnp.abs(u - exact)))
    print(f"max |u - exact| at T={args.final_time}: {err:.6e}")

    if args.estimate:
        from adjoint_ode_adaptivity_tpu.adjoint.advec import advec_fwd_adj_estimate

        n8 = max(8, (n_steps // 8) * 8)
        res = advec_fwd_adj_estimate(
            ops, disc, u0, args.final_time / n8, n8, segment=max(n8 // 8, 1)
        )
        print(
            f"J = {float(res.j_value):+.10e}  Σeta = {float(jnp.sum(res.eta)):+.6e}"
        )
    return err


if __name__ == "__main__":
    main()
