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

    # ---- transcendental throughput (sin/cos/exp) at saturation, with the
    # SAME multi-stream structure as the FMA-ceiling kernel (a dependent
    # chain would measure latency, and an affine identity chain gets
    # strength-reduced by Mosaic — a first attempt measured an impossible
    # 0.25 ns/iter on it). S independent streams of `op(a) + c` over an
    # (8, L) tile, R rounds: element-ops/s = S·R·8·L / t. The constant the
    # FD-ensemble roofline adjustment uses is
    #   op_fma_equiv = fma_rate / op_rate
    # (how many peak-rate FMA issues one transcendental displaces),
    # exported to adjoint_ode_adaptivity_tpu/utils/flops.py::SIN_FMA_EQUIV.
    R_t = 2048
    fma_elem_rate = best_vpu * 1e12 / 2  # element-FMAs/s at the ceiling

    def _stream_kernel(op, S):
        def kern(x_ref, o_ref):
            x = x_ref[:]
            accs = [x * (1.0 + 0.01 * i) for i in range(S)]
            c = x * 1e-9

            def body(_, accs):
                # contraction: args stay in [0.06, 0.4] for every op
                # tested (exp would diverge under a weaker damping), i.e.
                # the fast small-range path the kernels also live in;
                # + c keeps each chain data-dependent
                return tuple(op(a) * 0.1 + 0.2 + c for a in accs)

            accs = jax.lax.fori_loop(0, R_t, body, tuple(accs))
            o_ref[:] = sum(accs)
        return kern

    def mk_stream(op, S):
        def mk(k):
            f = pl.pallas_call(
                _stream_kernel(op, S),
                out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )

            @jax.jit
            def g(x):
                for _ in range(k):
                    x = f(x) * 1e-3 + 0.5
                return x

            return g
        return mk

    x_t = jnp.asarray(np.random.default_rng(2).uniform(0.2, 0.8, (8, L)),
                      jnp.float32)
    for name, op in (("sin", jnp.sin), ("cos", jnp.cos), ("exp", jnp.exp),
                     ("sincos", lambda v: jnp.sin(v) + jnp.cos(v))):
        best_rate = 0.0
        for S in (2, 4, 8):
            t_op = chained(mk_stream(op, S), x_t, k_lo=4, k_hi=32)
            best_rate = max(best_rate, S * R_t * 8 * L / t_op)
        out[f"{name}_giga_per_sec"] = best_rate / 1e9
        out[f"{name}_fma_equiv"] = fma_elem_rate / best_rate

    # ---- shape-matched MXU ceiling for the Dense-fused training kernel
    # (VERDICT r4 #5): the kernel's hidden chain is, per 128-row member
    # tile, (B,128)@(128,512) → relu → (B,512)@(512,128), S sequential
    # steps. Time EXACTLY that chain (dependent steps, weights resident)
    # in one Pallas kernel at the kernel's tile sizes; the measured
    # TFLOP/s is the ceiling the 45%-of-MXU row should be judged against.
    # B=128/256 probe the narrow-tile penalty; B=2048 is the actual
    # member-block height of ops/pallas/train_dense_fused.py — its row is
    # THE shape-matched ceiling for that kernel's 45%-of-MXU figure
    # B=2048 keeps S_c=128 (the (2048,512) activation tiles bound VMEM)
    # but needs a LONG call chain: at ~180 TF/s one call is ~0.4 ms, and
    # an early (2, 10) range measured 543 TF/s — 2.8× the MXU ceiling —
    # out of pure dispatch jitter (the same failure mode check_claims.py
    # gates bench rows against)
    for B_tile, S_c, k_rng in ((128, 1024, (8, 64)), (256, 1024, (8, 64)),
                               (2048, 128, (16, 80))):
        w1 = jnp.asarray(
            np.random.default_rng(3).standard_normal((128, 512)) * 0.03,
            jnp.float32)
        w2 = jnp.asarray(
            np.random.default_rng(4).standard_normal((512, 128)) * 0.03,
            jnp.float32)

        def dense_chain_kernel(x_ref, w1_ref, w2_ref, o_ref, S_c=S_c):
            x = x_ref[:]
            w1_ = w1_ref[:]
            w2_ = w2_ref[:]

            def body(_, v):
                h = jax.lax.dot_general(
                    v, w1_, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                h = jnp.maximum(h, 0.0)
                r = jax.lax.dot_general(
                    h, w2_, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return v * 0.999 + r * 1e-3

            o_ref[:] = jax.lax.fori_loop(0, S_c, body, x)

        xb = jnp.asarray(
            np.random.default_rng(5).standard_normal((B_tile, 128)),
            jnp.float32)

        def mk_dense(k, B_tile=B_tile):
            f = pl.pallas_call(
                dense_chain_kernel,
                out_shape=jax.ShapeDtypeStruct((B_tile, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )

            @jax.jit
            def g(x):
                for _ in range(k):
                    x = f(x, w1, w2) * 1e-3 + 0.5
                return x

            return g

        # per-tile (k_lo, k_hi) keep the slope signal at tens of ms — a
        # k_hi=16 first attempt measured an impossible 397 TF/s (2× the
        # MXU ceiling) out of pure dispatch jitter
        dt_d = chained(mk_dense, xb, k_lo=k_rng[0], k_hi=k_rng[1])
        flops = 2 * S_c * B_tile * (128 * 512 + 512 * 128)
        out[f"dense_chain_b{B_tile}_tflops"] = flops / dt_d / 1e12

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
