#!/usr/bin/env python
"""North-star benchmark: fwd+adjoint DoF-steps/sec, 1D DG advection,
10k elements (BASELINE.md). Prints ONE JSON line.

Run on the default backend (the real TPU under axon). The baseline is a
NumPy/MATLAB-style element march measured on the host CPU (the reference is
MATLAB; it publishes no numbers — SURVEY.md §6), extrapolated from a short
run.
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from adjoint_ode_adaptivity_tpu.adjoint.advec import advec_fwd_adj_estimate
    from adjoint_ode_adaptivity_tpu.march.advec import advec_operators
    from adjoint_ode_adaptivity_tpu.ops import startup_1d
    from adjoint_ode_adaptivity_tpu.utils.benchmarks import (
        numpy_advec_fwd_adj_baseline,
    )

    n_order = 2
    k_elems = 10_000
    a = 2 * np.pi
    disc = startup_1d(n_order, 0.0, 2 * np.pi, k_elems)
    dtype = jnp.float32
    ops = advec_operators(disc, a=a, dtype=dtype)

    # CFL-stable step (same rule as the reference driver)
    xmin = float(np.min(np.abs(disc.x[0, :] - disc.x[1, :])))
    dt = 0.5 * (0.75 / a) * xmin

    n_steps = 2048
    segment = 256

    u0 = jnp.asarray(np.sin(disc.x), dtype)

    run = jax.jit(
        lambda u: advec_fwd_adj_estimate(ops, disc, u, dt, n_steps, segment=segment)
    )
    # compile + warmup
    res = run(u0)
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    res = run(u0)
    jax.block_until_ready(res)
    elapsed = time.perf_counter() - t0

    dof = (n_order + 1) * k_elems
    dof_steps = dof * (2 * n_steps)  # forward sweep + adjoint sweep
    throughput = dof_steps / elapsed

    # baseline: short NumPy run on host CPU
    base = numpy_advec_fwd_adj_baseline(disc, a, dt, n_steps=8)

    print(
        json.dumps(
            {
                "metric": "fwd+adjoint DoF-steps/sec (1D DG advection, K=10k, N=2)",
                "value": throughput,
                "unit": "DoF-steps/s",
                "vs_baseline": throughput / base.dof_steps_per_sec,
                "elapsed_s": round(elapsed, 4),
                "baseline_dof_steps_per_sec": base.dof_steps_per_sec,
                "backend": jax.default_backend(),
                "j_value": float(res.j_value),
                "sum_eta": float(jnp.sum(res.eta)),
            }
        )
    )


if __name__ == "__main__":
    main()
