#!/usr/bin/env python
"""Hardware micro-rooflines for the v5e this repo benches on.

Measures three practical ceilings the BASELINE.md roofline table divides
by (public spec sheets give bf16-MXU and HBM numbers, but the hot kernels
here are f32 VPU code, whose peak is not published):

- vpu_f32_tflops: independent 2-wide FMA streams on resident (8, 512)
  f32 tiles inside one Pallas kernel, unrolled ×16 — instruction-level
  parallelism without HBM traffic, the practical VPU f32 ceiling.
- mxu_f32_tflops: big f32 matmul (XLA dot, HIGHEST precision is NOT used
  — this measures the default-precision MXU path the shared-net trainer
  rides) and a bf16 matmul for the spec cross-check.
- hbm_gbps: jnp copy of a 1 GiB f32 array (read + write), chained.

Prints one JSON line. Run ON the TPU: python tools/microroof.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def chained(mk, arg, k_lo=4, k_hi=16):
    """(t[k_hi] − t[k_lo]) / (k_hi − k_lo) with a VALUE FETCH inside the
    timed region — this harness's block_until_ready returns prematurely
    for some kernels (CLAUDE.md), so only a data-dependent device_get
    bounds the work; the ~27 ms RPC floor cancels in the slope."""
    import jax.numpy as jnp

    t = {}
    for k in (k_lo, k_hi):
        g = mk(k)
        float(jnp.sum(g(arg)[:8]))  # warm/compile (+ fetch)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(g(arg)[:8]))
            best = min(best, time.perf_counter() - t0)
        t[k] = best
    return (t[k_hi] - t[k_lo]) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = {"backend": jax.default_backend()}

    # ---- VPU f32 FMA ceiling: S independent accumulator streams over an
    # (8, L) tile, R rounds; FLOPs = 2 * S * R * 8 * L per program.
    # Swept over S: too few streams is latency-bound, too many spills
    # (measured S=16 -> 1.6 TF/s vs S=8 -> 3.1); report the max.
    L, R = 512, 16384
    best_vpu = 0.0
    for S in (2, 4, 8):

        def fma_kernel(x_ref, o_ref, S=S):
            x = x_ref[:]
            accs = [x * (1.0 + 0.001 * i) for i in range(S)]
            c = x * 1e-9

            def body(_, accs):
                return tuple(a * 1.0000001 + c for a in accs)

            accs = jax.lax.fori_loop(0, R, body, tuple(accs))
            o_ref[:] = sum(accs)

        x = jnp.asarray(np.random.default_rng(0).uniform(0.5, 1.0, (8, L)),
                        jnp.float32)

        def mk_fma(k, fma_kernel=fma_kernel):
            f = pl.pallas_call(
                fma_kernel,
                out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )

            @jax.jit
            def g(x):
                for _ in range(k):
                    x = f(x) * 1e-9 + 1.0  # keep the chain data-dependent
                return x

            return g

        dt_fma = chained(mk_fma, x, k_lo=8, k_hi=64)
        best_vpu = max(best_vpu, 2 * S * R * 8 * L / dt_fma / 1e12)
    out["vpu_f32_tflops"] = best_vpu

    # ---- MXU matmul ceilings (default precision = what training uses)
    for name, dtype in (("mxu_f32_tflops", jnp.float32),
                        ("mxu_bf16_tflops", jnp.bfloat16)):
        n = 4096
        a = jnp.asarray(np.random.default_rng(1).standard_normal((n, n)),
                        dtype)

        def mk_mm(k, a=a):
            @jax.jit
            def g(a):
                x = a
                for _ in range(k):
                    x = jnp.dot(x, a) * jnp.asarray(1e-3, a.dtype)
                return x

            return g

        dt_mm = chained(mk_mm, a, k_lo=8, k_hi=64)
        out[name] = 2 * n**3 / dt_mm / 1e12

    # ---- HBM stream: y = x + 1 over 1 GiB (read 1 GiB + write 1 GiB)
    nbytes = 1 << 30
    xs = jnp.zeros((nbytes // 4,), jnp.float32)

    import jax

    def mk_cp(k):
        @jax.jit
        def g(x):
            for _ in range(k):
                # the barrier prevents XLA fusing the k passes into one
                x = jax.lax.optimization_barrier(x + 1.0)
            return x

        return g

    dt_cp = chained(mk_cp, xs, k_lo=8, k_hi=32)
    out["hbm_gbps"] = 2 * nbytes / dt_cp / 1e9

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
