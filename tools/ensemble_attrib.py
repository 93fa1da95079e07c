#!/usr/bin/env python
"""Attribution microbench for the FD-ensemble kernel family (VERDICT r4 #1).

Decomposes the d=1 fused kernel's time on the REAL bench problem
(u' = sin u, J = ∫u², 102,400 ICs, n_steps=16 / rf=4) by differencing
against a structurally-identical kernel with a 1-FMA affine RHS:

- sin_ics_per_sec      — the production kernel (sin/cos RHS, with the
                         round-5 pair-adjacent emission)
- affine_ics_per_sec   — same pipeline, RHS = 1 FMA (no transcendentals):
                         the non-transcendental floor of the kernel family
- the difference of per-IC times is the transcendental share, compared
  against the pure sin/cos throughput ceilings from tools/microroof.py
- vec2_ics_per_sec     — the d=2 harmonic-oscillator kernel, re-measured
                         with a 128-call chain (BENCH_r04's 16-call chain
                         produced a physically impossible 2.0e10 ICs/s)

Run ON the TPU: python tools/ensemble_attrib.py
Prints one JSON line; numbers feed BASELINE.md's roofline table notes.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from adjoint_ode_adaptivity_tpu.ops.pallas.fd_ensemble import (
        make_pallas_fd_ensemble,
        make_pallas_fd_ensemble_vec,
    )
    from adjoint_ode_adaptivity_tpu.utils.flops import (
        BENCH_CFG,
        fd_ensemble_flops_per_ic,
        fd_ensemble_vec_flops_per_ic,
    )

    cfg = BENCH_CFG["fd_ensemble"]
    n_ics, n_steps, rf = cfg["n_ics"], cfg["n_steps"], cfg["ref_factor"]
    dt = 2.0 / n_steps
    u0s = jnp.asarray(
        np.random.default_rng(0).uniform(-3, 3, n_ics), jnp.float32
    )

    def chained_slope(mk, arg, k_hi=64, reps=5):
        gs = {k: mk(k) for k in (1, k_hi)}
        for g in gs.values():
            float(jnp.sum(g(arg)))
        t = {}
        for k, g in gs.items():
            best = np.inf
            for i in range(reps):
                a_in = arg + jnp.asarray(1e-6 * (i + 1), arg.dtype)
                jax.block_until_ready(a_in)
                t0 = time.perf_counter()
                float(jnp.sum(g(a_in)))
                best = min(best, time.perf_counter() - t0)
            t[k] = best
        return (t[k_hi] - t[1]) / (k_hi - 1)

    def mk_runner(run):
        def mk(k):
            @jax.jit
            def g(u):
                def body(u, _):
                    err = run(u)
                    return u + 1e-7 * jnp.sum(err), None
                u, _ = jax.lax.scan(body, u, None, length=k)
                return u
            return g
        return mk

    out = {"backend": jax.default_backend(), "n_ics": n_ics,
           "n_steps": n_steps, "rf": rf}

    # production kernel (sin/cos), pair-adjacent emission
    run_sin = make_pallas_fd_ensemble(
        lambda u, t: jnp.sin(u), lambda u, t: jnp.cos(u), n_steps, rf, dt)
    t_sin = chained_slope(mk_runner(run_sin), u0s, k_hi=64)
    out["sin_ics_per_sec"] = n_ics / t_sin

    # fast-trig variant: ops/pallas/fast_trig's shared-x² polynomial pair
    # replaces the ~57-FMA libm sin/cos (legit on this bench problem: the
    # u' = sin u flow keeps |u| ≤ π + ε < DOMAIN)
    from adjoint_ode_adaptivity_tpu.ops.pallas.fast_trig import (
        fast_cos,
        fast_sin,
    )

    run_ft = make_pallas_fd_ensemble(
        lambda u, t: fast_sin(u), lambda u, t: fast_cos(u), n_steps, rf, dt)
    # ~30 µs/call — needs a long scan chain (a k_hi=64 draw once read
    # 3.6e9, above the ceiling-bound ~2.2e9; that was jitter)
    t_ft = chained_slope(mk_runner(run_ft), u0s, k_hi=512)
    out["fastsin_ics_per_sec"] = n_ics / t_ft

    # affine 1-FMA RHS: the non-transcendental floor of the same pipeline
    run_aff = make_pallas_fd_ensemble(
        lambda u, t: u * -0.09 + 0.01, lambda u, t: u * -0.09,
        n_steps, rf, dt)
    t_aff = chained_slope(mk_runner(run_aff), u0s, k_hi=512)
    out["affine_ics_per_sec"] = n_ics / t_aff

    # decomposition: per-IC transcendental time and the implied pair rate
    n_fine = n_steps * rf
    trans_pairs = n_fine - 1  # adjacent sin+cos per interior fine node
    per_ic_trans_s = t_sin / n_ics - t_aff / n_ics
    out["per_ic_total_ns"] = t_sin / n_ics * 1e9
    out["per_ic_nontrans_ns"] = t_aff / n_ics * 1e9
    out["per_ic_trans_ns"] = per_ic_trans_s * 1e9
    if per_ic_trans_s > 0:
        out["implied_sincos_pairs_per_sec"] = trans_pairs / per_ic_trans_s
    fl, tr = fd_ensemble_flops_per_ic(n_steps, rf)
    out["model_flops_per_ic"] = fl
    out["model_trans_per_ic"] = tr

    # d=2 kernel, honest re-measurement with a long chain
    vcfg = BENCH_CFG["fd_ensemble_vec2"]
    v_u0s = jnp.asarray(
        np.random.default_rng(21).uniform(-1, 1, (vcfg["n_ics"], 2)),
        jnp.float32)
    run_vec = make_pallas_fd_ensemble_vec(
        lambda us, t: (us[1], -4.0 * us[0]),
        lambda us, t: ((0.0, 1.0), (-4.0, 0.0)),
        2, vcfg["n_steps"], vcfg["ref_factor"], dt=2.0 / vcfg["n_steps"])

    def mk_vec(k):
        @jax.jit
        def g(u):
            for _ in range(k):
                err = run_vec(u)
                u = u + 1e-7 * jnp.sum(err)
            return u
        return g

    t_vec = chained_slope(mk_vec, v_u0s, k_hi=128)
    out["vec2_ics_per_sec"] = vcfg["n_ics"] / t_vec
    vfl, _ = fd_ensemble_vec_flops_per_ic()
    out["vec2_tflops"] = vcfg["n_ics"] / t_vec * vfl / 1e12

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
