#!/usr/bin/env python
"""North-star benchmark: fwd+adjoint DoF-steps/sec, 1D DG advection,
10k elements (BASELINE.md). Prints ONE JSON line.

Pipeline measured: forward LSRK4(5) march with segment checkpointing +
reverse adjoint sweep with the per-element adjoint-weighted step-doubling
error estimate — the Pallas fused kernels on TPU (ops/pallas/dg_rhs.py),
falling back to the XLA path off-TPU. The baseline is a NumPy/MATLAB-style
element march on the host CPU (the reference is MATLAB and publishes no
numbers — SURVEY.md §6), extrapolated from a short run.

DoF-step accounting: one unit = one DoF advanced through one forward-or-
adjoint step. The estimate work (forward recompute + two half-step solves
per step) rides inside the adjoint sweep and is NOT credited — the metric
stays conservative.
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the TPU tunnel's remote compile of the fused
# kernels takes minutes; cache so subsequent bench runs start in seconds
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from adjoint_ode_adaptivity_tpu.adjoint.advec import (
        advec_fwd_adj_estimate,
        terminal_integral_cotangent,
    )
    from adjoint_ode_adaptivity_tpu.march.advec import advec_operators
    from adjoint_ode_adaptivity_tpu.ops import startup_1d
    from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
        make_pallas_fwd_adj_estimate_grid,
    )
    from adjoint_ode_adaptivity_tpu.utils.benchmarks import (
        numpy_advec_fwd_adj_baseline,
    )

    n_order = 2
    k_elems = 10_000
    a = 2 * np.pi
    disc = startup_1d(n_order, 0.0, 2 * np.pi, k_elems)
    dtype = jnp.float32

    # CFL-stable step (same rule as the reference driver)
    xmin = float(np.min(np.abs(disc.x[0, :] - disc.x[1, :])))
    dt = 0.5 * (0.75 / a) * xmin

    segment = 8  # best measured config: single-launch grid, unrolled stages
    n_segments = 256
    n_steps = segment * n_segments  # 2048

    u0 = jnp.asarray(np.sin(disc.x), dtype)
    lam_end = terminal_integral_cotangent(disc, dtype)
    on_tpu = jax.default_backend() == "tpu"

    if on_tpu:
        pipeline = make_pallas_fwd_adj_estimate_grid(
            disc, a, dt, segment=segment, n_segments=n_segments, unroll=True
        )
        run = jax.jit(lambda u: pipeline(u, jnp.float32(0.0), lam_end))

        def extract(res):
            u_final, lam0, eta = res
            return float(jnp.sum(lam_end * u_final)), float(jnp.sum(eta))

    else:
        ops = advec_operators(disc, a=a, dtype=dtype)
        run = jax.jit(
            lambda u: advec_fwd_adj_estimate(ops, disc, u, dt, n_steps, segment=segment)
        )

        def extract(res):
            return float(res.j_value), float(jnp.sum(res.eta))

    res = run(u0)
    jax.block_until_ready(res)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        res = run(u0)
        jax.block_until_ready(res)
        best = min(best, time.perf_counter() - t0)

    dof = (n_order + 1) * k_elems
    dof_steps = dof * (2 * n_steps)  # forward sweep + adjoint sweep
    throughput = dof_steps / best
    j_value, sum_eta = extract(res)

    # baseline: short NumPy run on host CPU
    base = numpy_advec_fwd_adj_baseline(disc, a, dt, n_steps=8)

    # effectivity parity (the north star's second metric): |Σres·v − (J(u_H)−J(u_h))|
    # for the linear case, computed at float64 in a CPU subprocess (x64 must
    # be set before jax init; this process is pinned to the TPU at f32)
    import subprocess
    import sys as _sys

    eff_code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True)\n"
        "import sys; sys.path.insert(0, %r)\n"
        "import jax.numpy as jnp\n"
        "from adjoint_ode_adaptivity_tpu import odes, functionals as fnl\n"
        "from adjoint_ode_adaptivity_tpu.march import euler_step, forward_march\n"
        "from adjoint_ode_adaptivity_tpu.adjoint import ("
        "adjoint_march, refine_all, interp_to_fine, residual)\n"
        "ode = odes.get_ode('du/dt=u'); step = euler_step(ode.f)\n"
        "functional = fnl.get_functional('J=int(u)')\n"
        "dt = jnp.full((32,), 2.0/32); u = forward_march(step, 1.0, dt)\n"
        "dtf = refine_all(dt, 4); uf = interp_to_fine(u, dt, dtf)\n"
        "k = jax.grad(functional.value)(uf, dtf)\n"
        "v = adjoint_march(step, uf, dtf, k)\n"
        "res = residual(step, uf, dtf)\n"
        "est = float(jnp.sum(res*v))\n"
        "um = forward_march(step, 1.0, dtf)\n"
        "gap = float(functional.value(uf, dtf) - functional.value(um, dtf))\n"
        "print(abs(est - gap))\n"
    ) % (__file__.rsplit("/", 1)[0],)
    try:
        out = subprocess.run(
            [_sys.executable, "-c", eff_code], capture_output=True, text=True,
            timeout=120,
        )
        effectivity_error = float(out.stdout.strip().split("\n")[-1])
    except Exception:
        effectivity_error = None

    print(
        json.dumps(
            {
                "metric": "fwd+adjoint DoF-steps/sec (1D DG advection, K=10k, N=2)",
                "value": throughput,
                "unit": "DoF-steps/s",
                "vs_baseline": throughput / base.dof_steps_per_sec,
                "elapsed_s": round(best, 4),
                "n_steps": n_steps,
                "baseline_dof_steps_per_sec": base.dof_steps_per_sec,
                "backend": jax.default_backend(),
                "kernel": "pallas-fused" if on_tpu else "xla",
                "j_value": j_value,
                "sum_eta": sum_eta,
                "effectivity_error_f64": effectivity_error,
            }
        )
    )


if __name__ == "__main__":
    main()
