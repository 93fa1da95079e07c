"""Nonlinear conservation-law demo: Burgers with minmod slope limiting.

Completes the 'nonlinear conservation law with minmod slope limiting'
configuration — the reference carries the limiter toolkit
(utils/SlopeLimit*.m) but never drives it.

Usage:
    python -m adjoint_ode_adaptivity_tpu.drivers.burgers_dg --k 48 --order 4
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=48)
    p.add_argument("--order", type=int, default=4)
    p.add_argument("--final-time", type=float, default=1.5)
    p.add_argument("--dt", type=float, default=2e-4)
    p.add_argument("--limiter", choices=["n", "1", "none"], default="n")
    p.add_argument(
        "--x64", action="store_true", default=None,
        help="force f64 (default for --kernel xla; an error with pallas)",
    )
    p.add_argument("--plot", action="store_true")
    p.add_argument(
        "--kernel", choices=["xla", "pallas"], default="xla",
        help="pallas = fused blocked-sublane f32 kernel (K must be a "
        "multiple of 8; interpret mode off-TPU)",
    )
    args = p.parse_args(argv)
    if args.kernel == "pallas" and args.x64:
        p.error("--kernel pallas is f32-only (drop --x64)")

    import jax

    if args.kernel == "pallas":
        # must happen BEFORE the first device use below — LIBTPU_INIT_ARGS
        # is consumed when the TPU client is created
        from adjoint_ode_adaptivity_tpu.ops.pallas import ensure_scoped_vmem

        ensure_scoped_vmem()

    use_x64 = args.kernel == "xla"  # f64 default; pallas kernels are f32
    if use_x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from adjoint_ode_adaptivity_tpu.march.burgers import (
        burgers_march,
        burgers_operators,
    )
    from adjoint_ode_adaptivity_tpu.ops import startup_1d

    disc = startup_1d(args.order, 0.0, 2 * np.pi, args.k)
    ops = burgers_operators(disc, jnp.float64 if use_x64 else jnp.float32)
    u0 = jnp.asarray(0.5 + np.sin(disc.x), ops.x.dtype)
    n_steps = int(round(args.final_time / args.dt))
    if args.kernel == "pallas":
        from adjoint_ode_adaptivity_tpu.ops.pallas import (
            make_pallas_burgers_march_single_blocked,
            pick_chunk,
        )

        interpret = jax.default_backend() != "tpu"
        run = make_pallas_burgers_march_single_blocked(
            disc, args.dt, n_steps, steps_per_chunk=pick_chunk(n_steps),
            limiter=args.limiter, interpret=interpret,
        )
        u = run(u0)
    else:
        u = burgers_march(ops, u0, args.dt, n_steps, limiter=args.limiter)
    jax.block_until_ready(u)
    finite = bool(np.isfinite(np.asarray(u)).all())
    print(
        f"Burgers K={args.k} N={args.order} T={args.final_time} "
        f"limiter={args.limiter}: finite={finite} "
        f"range=[{float(jnp.min(u)):+.4f}, {float(jnp.max(u)):+.4f}]"
    )
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot(np.asarray(disc.x).T.ravel(), np.asarray(u).T.ravel(), lw=1)
        ax.set_xlabel("x"); ax.set_ylabel("u")
        fig.savefig("burgers.png")
        print("wrote burgers.png")
    return u


if __name__ == "__main__":
    main()
