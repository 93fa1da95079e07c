#!/usr/bin/env python
"""Find the REAL v5e VPU f32 peak: sweep tile width × stream count.

tools/microroof.py's original FMA kernel ((8,512) tiles, ≤8 streams)
measured 4.2-4.4 TFLOP/s and was taken as the ceiling — but real kernels
with huge elementwise ILP (the affine-RHS ensemble twin, the d=2 vec
kernel on clean runs) measure 5.8-7.9e12 FLOP/s, so that kernel was
issue/ILP-limited, not the hardware. Public v5e architecture (8×128
VPU lanes × 4 ALUs × 2 FLOP × ~0.94 GHz) implies ~7.7 TF/s.

Sweeps (L, S) and also an UNROLLED independent-op body (closer to what
big unrolled kernel bodies look like post-Mosaic). Prints one JSON line.
Run ON the TPU.
"""
from __future__ import annotations

import json
import time

import numpy as np


def chained(mk, arg, k_lo, k_hi):
    import jax
    import jax.numpy as jnp

    t = {}
    for k in (k_lo, k_hi):
        g = mk(k)
        float(jnp.sum(g(arg)[:8]))
        best = np.inf
        for _ in range(3):
            jax.block_until_ready(arg)
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
    best_overall = 0.0
    for L in (512, 2048):
        for S in (4, 8, 16):
            # R must stay LARGE regardless of S·L: a first version scaled
            # R down for constant work and every call dropped under the
            # dispatch jitter (rows of 0.9-120 TF/s nonsense)
            R = 16384

            def fma_kernel(x_ref, o_ref, S=S, R=R):
                x = x_ref[:]
                accs = [x * (1.0 + 0.001 * i) for i in range(S)]
                c = x * 1e-9

                def body(_, accs):
                    return tuple(a * 1.0000001 + c for a in accs)

                accs = jax.lax.fori_loop(0, R, body, tuple(accs))
                o_ref[:] = sum(accs)

            x = jnp.asarray(
                np.random.default_rng(0).uniform(0.5, 1.0, (8, L)),
                jnp.float32)

            def mk(k, fma_kernel=fma_kernel, L=L):
                f = pl.pallas_call(
                    fma_kernel,
                    out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )

                @jax.jit
                def g(x):
                    for _ in range(k):
                        x = f(x) * 1e-9 + 1.0
                    return x
                return g

            dt = chained(mk, x, 8, 64)
            tf = 2 * S * R * 8 * L / dt / 1e12
            out[f"fma_L{L}_S{S}_tflops"] = round(tf, 3)
            best_overall = max(best_overall, tf)

    # unrolled independent-pair body: mimics big unrolled kernel bodies
    # (each iteration issues S independent FMAs with rotating operands,
    # no loop-carried serialization beyond one op per stream)
    L, S, R = 2048, 8, 16384

    def unroll_kernel(x_ref, o_ref):
        x = x_ref[:]
        accs = [x * (1.0 + 0.001 * i) for i in range(S)]
        cs = [x * (1e-9 * (i + 1)) for i in range(S)]

        def body(_, accs):
            # two independent FMAs per stream per iteration
            a2 = tuple(a * 1.0000001 + c for a, c in zip(accs, cs))
            return tuple(a * 0.9999999 + c for a, c in zip(a2, cs))

        accs = jax.lax.fori_loop(0, R, body, tuple(accs))
        o_ref[:] = sum(accs)

    x = jnp.asarray(np.random.default_rng(0).uniform(0.5, 1.0, (8, L)),
                    jnp.float32)

    def mk2(k):
        f = pl.pallas_call(
            unroll_kernel,
            out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

        @jax.jit
        def g(x):
            for _ in range(k):
                x = f(x) * 1e-9 + 1.0
            return x
        return g

    dt = chained(mk2, x, 8, 64)
    tf = 2 * 2 * S * R * 8 * L / dt / 1e12
    out["fma_unrolled2_tflops"] = round(tf, 3)
    best_overall = max(best_overall, tf)
    out["vpu_peak_tflops"] = round(best_overall, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
