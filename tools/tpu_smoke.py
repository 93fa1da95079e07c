#!/usr/bin/env python
"""Real-TPU kernel smoke gate: run EVERY Pallas kernel configuration once
on hardware and pin it to the XLA oracle at f32 tolerance.

The pytest suite runs all Pallas kernels in interpret mode (CPU) — it can
never catch Mosaic lowering, VMEM-capacity, or layout regressions; those
only show up when the kernel actually compiles for the chip. This gate is
the one command that does: each configuration below is exercised at
bench-like sizes (where the VMEM pressure is real), compared against the
XLA reference path running on the same chip at HIGHEST matmul precision,
and reported as one pass/fail JSON line. Exit code 0 iff every config
passes. Compiles are cached (~/.cache/jax_comp_cache): the first cold run
takes minutes through this container's TPU tunnel, warm runs ~1 min.

Usage:  python tools/tpu_smoke.py        (TPU; falls back to interpret off-TPU)
"""
import json
import os
import sys
import time

_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=49152"
_cur = os.environ.get("LIBTPU_INIT_ARGS", "")
_m = __import__("re").search(r"--xla_tpu_scoped_vmem_limit_kib=(\d+)", _cur)
if _m is None:
    os.environ["LIBTPU_INIT_ARGS"] = (_cur + " " + _VMEM_FLAG).strip()
elif int(_m.group(1)) < 49152:
    # a stale smaller limit (e.g. round-2's 32768) would fail the batched
    # kernels' Mosaic VMEM check — upgrade it
    os.environ["LIBTPU_INIT_ARGS"] = _cur.replace(_m.group(0), _VMEM_FLAG)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

A = 2 * np.pi
RESULTS = []


def _tpu_reachable(timeout_s: float = 300.0) -> bool:
    """Probe the TPU tunnel in a SUBPROCESS with a hard timeout (same
    guard as bench.py): a dead tunnel blocks backend init for tens of
    minutes (observed), which would stall the gate with no JSON. jax not
    being on a TPU at all (plain CPU box) is fine — the gate then runs
    interpret-mode; only a present-but-dead tunnel must fail fast."""
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(jax.default_backend(),"
             " float(jnp.sum(jnp.ones((8, 8)))))"],
            capture_output=True,
            timeout=timeout_s,
        )
        return probe.returncode == 0
    except Exception:
        return False


def check(name, got, want, rtol, atol):
    got = np.asarray(got)
    want = np.asarray(want)
    err = float(np.max(np.abs(got - want)))
    bound = atol + rtol * float(np.max(np.abs(want)))
    RESULTS.append(
        {"config": name, "max_abs_err": err, "bound": bound, "ok": err <= bound}
    )


def fail(name, exc):
    RESULTS.append({"config": name, "error": repr(exc)[:300], "ok": False})


def main():
    from adjoint_ode_adaptivity_tpu.adjoint.advec import (
        advec_fwd_adj_estimate,
        lsrk_step,
        lsrk_step_homogeneous,
        terminal_integral_cotangent,
    )
    from adjoint_ode_adaptivity_tpu.march.advec import advec_march, advec_operators
    from adjoint_ode_adaptivity_tpu.march.burgers import burgers_march, burgers_operators
    from adjoint_ode_adaptivity_tpu.ops import startup_1d
    from adjoint_ode_adaptivity_tpu.ops.pallas import dg_rhs as P

    interp = jax.default_backend() != "tpu"
    t_start = time.perf_counter()

    # ---------------- uniform N=2 flagship mesh (K=10k, bench size)
    disc = startup_1d(2, 0.0, 2 * np.pi, 10_000)
    ops = advec_operators(disc, a=A, dtype=jnp.float32)
    xmin = float(np.min(np.abs(disc.x[0, :] - disc.x[1, :])))
    dt = 0.5 * (0.75 / A) * xmin
    u0 = jnp.asarray(np.sin(disc.x), jnp.float32)
    lam = terminal_integral_cotangent(disc, jnp.float32)
    n_steps = 16
    ref = advec_fwd_adj_estimate(ops, disc, u0, dt, n_steps, segment=4, lam_end=lam)
    jax.block_until_ready(ref.eta)

    # 1. unbatched forward march kernel
    try:
        march = P.make_pallas_advec_march(disc, A, dt, steps_per_call=n_steps,
                                          interpret=interp)
        u_march = march(u0, jnp.float32(0.0), 1)
        check("march_unbatched_N2_K10k", u_march, ref.u_final, 2e-4, 1e-6)
    except Exception as e:  # noqa: BLE001
        fail("march_unbatched_N2_K10k", e)

    # 2. unbatched adjoint (transpose) kernel vs jax.linear_transpose
    try:
        adj = P.make_pallas_advec_adjoint(disc, A, dt, steps_per_call=4,
                                          interpret=interp)
        lam_k = adj(lam, 1)
        lt = jax.linear_transpose(
            lambda v: lsrk_step_homogeneous(ops, v, dt), lam
        )
        lam_x = lam
        for _ in range(4):
            (lam_x,) = lt(lam_x)
        check("adjoint_unbatched_N2_K10k", lam_k, lam_x, 2e-3, 2e-5)
    except Exception as e:  # noqa: BLE001
        fail("adjoint_unbatched_N2_K10k", e)

    # 3. unbatched grid pipeline
    try:
        run = P.make_pallas_fwd_adj_estimate_grid(
            disc, A, dt, segment=4, n_segments=n_steps // 4, interpret=interp
        )
        uf, lam0, eta = run(u0, jnp.float32(0.0), lam)
        check("grid_pipeline_N2_K10k", eta, ref.eta, 5e-3, 1e-7)
    except Exception as e:  # noqa: BLE001
        fail("grid_pipeline_N2_K10k", e)

    # 4/5. batched pipeline, recompute + stored-trajectory (bench config)
    b = 8
    phases = np.linspace(0.0, 2 * np.pi, b, endpoint=False)
    u0b = jnp.asarray(
        np.stack([np.sin(np.asarray(disc.x) + p) for p in phases], axis=1),
        jnp.float32,
    )
    lam_b = jnp.broadcast_to(lam[:, None, :], (disc.np_, b, disc.k))
    ref_b = advec_fwd_adj_estimate(
        ops, disc, u0b[:, 3], dt, n_steps, segment=4
    )
    for store in (False, True):
        name = f"batched_N2_K10k_{'stored' if store else 'recompute'}"
        try:
            runb = P.make_pallas_fwd_adj_estimate_grid_batched(
                disc, A, dt, segment=4, n_segments=n_steps // 4, batch=b,
                store_trajectory=store, interpret=interp,
            )
            ufb, lam0b, etab = runb(u0b, jnp.float32(0.0), lam_b)
            check(name, etab[3], ref_b.eta, 5e-3, 1e-7)
        except Exception as e:  # noqa: BLE001
            fail(name, e)

    # 6. blocked-single stored layout (gate size: segment=8 over 16
    # steps; bench.py runs the same factory at segment=64/2048 steps)
    try:
        run1 = P.make_pallas_fwd_adj_estimate_grid_single_blocked(
            disc, A, dt, segment=8, n_segments=n_steps // 8, interpret=interp
        )
        uf1, lam01, eta1 = run1(u0, jnp.float32(0.0), lam)
        check("blocked_single_N2_K10k", eta1, ref.eta, 5e-3, 1e-7)
    except Exception as e:  # noqa: BLE001
        fail("blocked_single_N2_K10k", e)

    # 6b. revolve-composed beyond-HBM pipeline (round 5): forward-only
    # blocked march advances + per-unit stored reverses through the
    # binomial schedule; λ/η must match the monolithic oracle on HARDWARE
    # (the composition chains traced-t0 kernels the interpret tests can't
    # exercise against Mosaic)
    try:
        from adjoint_ode_adaptivity_tpu.adjoint.revolve_vjp import (
            revolve_advec_estimate,
        )

        rev = revolve_advec_estimate(
            disc, A, dt, n_steps, unit_steps=8, snaps=2, segment=4,
            interpret=interp,
        )
        uf_r, lam0_r, eta_r = rev(u0, jnp.float32(0.0), lam)
        check("revolve_estimate_N2_K10k", eta_r, ref.eta, 5e-3, 1e-7)
    except Exception as e:  # noqa: BLE001
        fail("revolve_estimate_N2_K10k", e)

    # 7/8. graded (3x) mesh: batched + blocked-single geom-operand paths
    vx = np.asarray(
        np.concatenate(
            [
                np.linspace(0, np.pi, 6_000, endpoint=False),
                np.linspace(np.pi, 2 * np.pi, 4_001),
            ]
        )
    )
    disc_g = startup_1d(2, 0.0, 2 * np.pi, 10_000, vx=vx)
    ops_g = advec_operators(disc_g, a=A, dtype=jnp.float32)
    xmin_g = float(np.min(np.abs(disc_g.x[0, :] - disc_g.x[1, :])))
    dt_g = 0.5 * (0.75 / A) * xmin_g
    u0_g = jnp.asarray(np.sin(disc_g.x), jnp.float32)
    lam_g = terminal_integral_cotangent(disc_g, jnp.float32)
    ref_g = advec_fwd_adj_estimate(
        ops_g, disc_g, u0_g, dt_g, n_steps, segment=4, lam_end=lam_g
    )
    try:
        run_g = P.make_pallas_fwd_adj_estimate_grid_batched(
            disc_g, A, dt_g, segment=4, n_segments=n_steps // 4, batch=b,
            store_trajectory=True, interpret=interp,
        )
        u0_gb = jnp.broadcast_to(u0_g[:, None, :], (disc_g.np_, b, disc_g.k))
        lam_gb = jnp.broadcast_to(lam_g[:, None, :], (disc_g.np_, b, disc_g.k))
        _, _, eta_g = run_g(u0_gb, jnp.float32(0.0), lam_gb)
        check("batched_graded_N2_K10k", eta_g[0], ref_g.eta, 5e-3, 1e-7)
    except Exception as e:  # noqa: BLE001
        fail("batched_graded_N2_K10k", e)
    try:
        run_g1 = P.make_pallas_fwd_adj_estimate_grid_single_blocked(
            disc_g, A, dt_g, segment=8, n_segments=n_steps // 8,
            interpret=interp,
        )
        _, _, eta_g1 = run_g1(u0_g, jnp.float32(0.0), lam_g)
        check("blocked_single_graded_N2_K10k", eta_g1, ref_g.eta, 5e-3, 1e-7)
    except Exception as e:  # noqa: BLE001
        fail("blocked_single_graded_N2_K10k", e)

    # 9/10. higher orders at bench sizes: N=3 (Np=4) and N=7 (Np=8, the
    # scoped-VMEM-critical config — segment=2)
    for n_ord, k_el, seg in ((3, 7_500, 4), (7, 10_000, 2)):
        name = f"batched_N{n_ord}_K{k_el}_stored"
        try:
            disc_h = startup_1d(n_ord, 0.0, 2 * np.pi, k_el)
            ops_h = advec_operators(disc_h, a=A, dtype=jnp.float32)
            xmin_h = float(np.min(np.abs(disc_h.x[0, :] - disc_h.x[1, :])))
            dt_h = 0.5 * (0.75 / A) * xmin_h
            u0_h = jnp.asarray(np.sin(disc_h.x), jnp.float32)
            lam_h = terminal_integral_cotangent(disc_h, jnp.float32)
            steps_h = 2 * seg
            ref_h = advec_fwd_adj_estimate(
                ops_h, disc_h, u0_h, dt_h, steps_h, segment=seg, lam_end=lam_h
            )
            run_h = P.make_pallas_fwd_adj_estimate_grid_batched(
                disc_h, A, dt_h, segment=seg, n_segments=2, batch=b,
                store_trajectory=True, interpret=interp,
            )
            u0_hb = jnp.broadcast_to(u0_h[:, None, :], (disc_h.np_, b, disc_h.k))
            lam_hb = jnp.broadcast_to(lam_h[:, None, :], (disc_h.np_, b, disc_h.k))
            _, _, eta_h = run_h(u0_hb, jnp.float32(0.0), lam_hb)
            check(name, eta_h[0], ref_h.eta, 5e-3, 1e-7)
        except Exception as e:  # noqa: BLE001
            fail(name, e)

    # 11-13. fused Burgers march with each limiter mode (batched) + the
    # blocked-single layout
    from adjoint_ode_adaptivity_tpu.ops.pallas.burgers import (
        make_pallas_burgers_march,
        make_pallas_burgers_march_single_blocked,
    )

    # f32 note: the minmod limiter's sign comparisons make any two f32
    # implementations diverge chaotically once shocks form (tests pin the
    # kernels at f64 in interpret mode); the on-hardware gate therefore
    # runs a SHORT march on a smooth low-amplitude state — the limiter
    # code path executes, but the trajectory stays deterministic at f32
    b_ops = burgers_operators(disc, dtype=jnp.float32)
    b_dt = 0.3 * xmin
    b_steps = 8
    u0_burg = jnp.asarray(
        np.stack(
            [(0.1 + 0.01 * j) * np.sin(np.asarray(disc.x)) for j in range(b)],
            axis=1,
        ),
        jnp.float32,
    )
    # limiter tolerance: on a fine smooth state every cell's minmod
    # comparison is a near-tie, so f32 kernel-vs-XLA decision flips
    # perturb ~4e-4 (measured); a real layout/indexing regression shows as
    # O(state amplitude) or NaN. 'none' stays tight.
    def _lim_tol(lim):
        return (0.0, 5e-3) if lim != "none" else (2e-4, 2e-6)

    for lim in ("n", "1", "none"):
        name = f"burgers_batched_limiter_{lim}"
        try:
            runb = make_pallas_burgers_march(
                disc, b_dt, b_steps, batch=b, steps_per_chunk=b_steps,
                limiter=lim, interpret=interp,
            )
            got = runb(u0_burg)
            want = burgers_march(b_ops, u0_burg[:, 0], b_dt, b_steps, limiter=lim)
            check(name, got[:, 0], want, *_lim_tol(lim))
        except Exception as e:  # noqa: BLE001
            fail(name, e)
    try:
        run1b = make_pallas_burgers_march_single_blocked(
            disc, b_dt, b_steps, steps_per_chunk=b_steps, limiter="n",
            interpret=interp,
        )
        got = run1b(u0_burg[:, 0])
        want = burgers_march(b_ops, u0_burg[:, 0], b_dt, b_steps, limiter="n")
        check("burgers_blocked_single_limiter_n", got, want, *_lim_tol("n"))
    except Exception as e:  # noqa: BLE001
        fail("burgers_blocked_single_limiter_n", e)

    # 14/15. FD ensemble kernel (uniform + nonuniform dt), 102400 ICs.
    # Shared fixtures sit in their OWN try so a setup failure marks both
    # configs with the true error instead of cascading NameErrors.
    fd_fix = None
    try:
        from adjoint_ode_adaptivity_tpu.ops.pallas.fd_ensemble import (
            make_pallas_fd_ensemble,
        )
        from adjoint_ode_adaptivity_tpu.utils.benchmarks import (
            ensemble_fd_pipeline,
        )

        n_ics, e_steps, rf = 102_400, 16, 4
        fn, u0s = ensemble_fd_pipeline(n_ics, n_steps=e_steps, ref_factor=rf)
        fd_fix = True
    except Exception as e:  # noqa: BLE001
        fail("fd_ensemble_102400", e)
        fail("fd_ensemble_nonuniform_dt", e)
    if fd_fix:
        try:
            want_mean = fn(u0s)
            run_e = make_pallas_fd_ensemble(
                lambda u, t: jnp.sin(u), lambda u, t: jnp.cos(u), e_steps, rf,
                dt=2.0 / e_steps, interpret=interp,
            )
            err = run_e(u0s)
            check("fd_ensemble_102400", jnp.mean(err, axis=1), want_mean,
                  2e-4, 1e-6)
        except Exception as e:  # noqa: BLE001
            fail("fd_ensemble_102400", e)
        # 15b. fast-trig variant (round 5): the polynomial sin/cos pair
        # must track the libm oracle at f32-roundoff scale ON HARDWARE
        try:
            from adjoint_ode_adaptivity_tpu.ops.pallas.fast_trig import (
                fast_cos,
                fast_sin,
            )

            run_ft = make_pallas_fd_ensemble(
                lambda u, t: fast_sin(u), lambda u, t: fast_cos(u), e_steps,
                rf, dt=2.0 / e_steps, interpret=interp,
            )
            err_ft = run_ft(u0s)
            check("fd_ensemble_fastsin_102400", jnp.mean(err_ft, axis=1),
                  want_mean, 5e-4, 2e-6)
        except Exception as e:  # noqa: BLE001
            fail("fd_ensemble_fastsin_102400", e)
        try:
            dts = np.full(e_steps, 2.0 / e_steps)
            dts[::2] *= 1.5
            dts[1::2] *= 0.5
            run_n = make_pallas_fd_ensemble(
                lambda u, t: jnp.sin(u), lambda u, t: jnp.cos(u), e_steps, rf,
                dt=dts, interpret=interp,
            )
            err_n = run_n(u0s)
            RESULTS.append(
                {
                    "config": "fd_ensemble_nonuniform_dt",
                    "max_abs_err": 0.0
                    if bool(jnp.all(jnp.isfinite(err_n))) else np.inf,
                    "bound": 0.0,
                    "ok": bool(jnp.all(jnp.isfinite(err_n))),
                }
            )
        except Exception as e:  # noqa: BLE001
            fail("fd_ensemble_nonuniform_dt", e)

    # 15c. vector-state (d=2) fused ensemble: harmonic oscillator through
    # the same fwd+adj+indicator pipeline with the transposed 2x2 Jacobian
    # applied in-kernel, vs the generic XLA vmap composition
    try:
        from adjoint_ode_adaptivity_tpu import odes as _odes
        from adjoint_ode_adaptivity_tpu.adjoint import (
            adjoint_march,
            coarse_indicator,
            interp_to_fine,
            refine_all,
            residual,
        )
        from adjoint_ode_adaptivity_tpu.march import (
            euler_step,
            forward_march,
        )
        from adjoint_ode_adaptivity_tpu.ops.pallas.fd_ensemble import (
            make_pallas_fd_ensemble_vec,
        )

        v_steps, v_rf = 16, 4
        v_dt = jnp.full((v_steps,), 2.0 / v_steps, jnp.float32)
        v_dtf = refine_all(v_dt, v_rf)
        v_step = euler_step(_odes.get_ode("harmonic_oscillator").f)

        def _vec_val(u_f):
            return jnp.sum((u_f[:-1] ** 2).sum(-1) * v_dtf)

        def _vec_one(u0):
            u = forward_march(v_step, u0, v_dt)
            u_f = interp_to_fine(u, v_dt, v_dtf)
            k = jax.grad(_vec_val)(u_f)
            v = adjoint_march(v_step, u_f, v_dtf, k)
            res = residual(v_step, u_f, v_dtf)
            return coarse_indicator((res * v).sum(-1), v_rf, "block")

        v_u0s = jnp.asarray(
            np.random.default_rng(21).uniform(-1, 1, (102_400, 2)),
            jnp.float32,
        )
        want_vec = jax.vmap(_vec_one)(v_u0s).T
        run_vec = make_pallas_fd_ensemble_vec(
            lambda us, t: (us[1], -4.0 * us[0]),
            lambda us, t: ((0.0, 1.0), (-4.0, 0.0)),
            2, v_steps, v_rf, dt=2.0 / v_steps, interpret=interp,
        )
        check("fd_ensemble_vec2_102400", run_vec(v_u0s), want_vec,
              2e-4, 1e-6)
    except Exception as e:  # noqa: BLE001
        fail("fd_ensemble_vec2_102400", e)

    # 16. element-tiled (HBM-streamed) pipeline — the K-beyond-VMEM path
    try:
        from adjoint_ode_adaptivity_tpu.ops.pallas.dg_tiled import (
            make_pallas_fwd_adj_estimate_tiled,
        )

        run_t = make_pallas_fwd_adj_estimate_tiled(
            disc, A, dt, segment=8, n_segments=n_steps // 8, chunks=8,
            interpret=interp,
        )
        _, _, eta_t = run_t(u0, jnp.float32(0.0), lam)
        check("tiled_chunks8_N2_K10k", eta_t, ref.eta, 5e-3, 1e-7)
    except Exception as e:  # noqa: BLE001
        fail("tiled_chunks8_N2_K10k", e)

    # 16b. grid-streamed tiled pipeline (chunks as a Pallas grid dimension,
    # chunk-major lane blocking + rolled ghosts — the fast K-envelope path)
    try:
        from adjoint_ode_adaptivity_tpu.ops.pallas.dg_tiled import (
            make_pallas_fwd_adj_estimate_tiled_grid,
        )

        run_tg = make_pallas_fwd_adj_estimate_tiled_grid(
            disc, A, dt, segment=8, n_segments=n_steps // 8, chunks=5,
            interpret=interp,
        )
        _, _, eta_tg = run_tg(u0, jnp.float32(0.0), lam)
        check("tiled_grid_chunks5_N2_K10k", eta_tg, ref.eta, 5e-3, 1e-7)
    except Exception as e:  # noqa: BLE001
        fail("tiled_grid_chunks5_N2_K10k", e)

    # 18. element-sharded pallas pipeline on a 1-device mesh — the REAL
    # hardware compile of the shard_map-composed kernels (multi-device
    # equality is pinned on the CPU mesh in tests/test_pallas_sharded.py)
    try:
        from jax.sharding import Mesh

        from adjoint_ode_adaptivity_tpu.ops.pallas.dg_sharded import (
            make_pallas_fwd_adj_estimate_sharded_blocked,
        )

        mesh1 = Mesh(np.array(jax.devices()[:1]), ("space",))
        run_s = make_pallas_fwd_adj_estimate_sharded_blocked(
            disc, A, dt, mesh1, segment=8, n_segments=n_steps // 8,
            interpret=interp,
        )
        t_sh = time.perf_counter()
        ufs, lams, etas, js = run_s(u0, jnp.float32(0.0), lam)
        jax.block_until_ready(etas)
        sh_elapsed = time.perf_counter() - t_sh
        check("sharded_pallas_1dev_mesh_N2_K10k", etas, ref.eta, 5e-3, 1e-7)
        RESULTS[-1]["elapsed_s_incl_dispatch"] = round(sh_elapsed, 4)
    except Exception as e:  # noqa: BLE001
        fail("sharded_pallas_1dev_mesh_N2_K10k", e)

    # 18b. element-sharded + HBM-STREAMED (tiled-grid) pipeline on a
    # 1-device mesh — hardware compile of the shard_map + grid-streamed
    # composition (ppermute wrap rows + Mosaic-pipelined chunk DMAs;
    # multi-device equality pinned on the CPU mesh in
    # tests/test_pallas_sharded.py::TestShardedTiledGrid)
    try:
        from jax.sharding import Mesh

        from adjoint_ode_adaptivity_tpu.ops.pallas.dg_tiled_sharded import (
            make_pallas_fwd_adj_estimate_tiled_grid_sharded,
        )

        mesh1t = Mesh(np.array(jax.devices()[:1]), ("space",))
        run_ts = make_pallas_fwd_adj_estimate_tiled_grid_sharded(
            disc, A, dt, mesh1t, segment=8, n_segments=n_steps // 8,
            chunks=5, interpret=interp,
        )
        t_ts = time.perf_counter()
        _, _, eta_ts = run_ts(u0, jnp.float32(0.0), lam)
        jax.block_until_ready(eta_ts)
        ts_elapsed = time.perf_counter() - t_ts
        check("sharded_tiled_grid_1dev_mesh_N2_K10k", eta_ts, ref.eta,
              5e-3, 1e-7)
        RESULTS[-1]["elapsed_s_incl_dispatch"] = round(ts_elapsed, 4)
    except Exception as e:  # noqa: BLE001
        fail("sharded_tiled_grid_1dev_mesh_N2_K10k", e)

    # 19. fused training-epoch kernel (forward march + terminal MSE +
    # hand-derived reverse sweep in one launch) vs XLA value_and_grad at
    # the bench shape family (S=10, F=500, B=1024 here)
    try:
        import optax  # noqa: F401 - presence check only

        from adjoint_ode_adaptivity_tpu.models.blocks import ResBlockSimple
        from adjoint_ode_adaptivity_tpu.march.fd import forward_march_per_step
        from adjoint_ode_adaptivity_tpu.ops.pallas.train_fused import (
            make_pallas_resblock_epoch_grad,
        )

        s_tr, f_tr, b_tr = 10, 500, 1024
        net_tr = ResBlockSimple(features=f_tr)
        p1_tr = net_tr.init(
            jax.random.PRNGKey(7), jnp.ones(1), 0.0, 0.1
        )["params"]
        p_tr = jax.tree_util.tree_map(
            lambda l: jnp.stack([l] * s_tr), p1_tr
        )
        dt_tr = jnp.full((s_tr,), 0.1, jnp.float32)
        u0_tr = jnp.asarray(
            np.random.default_rng(13).uniform(0.5, 2.0, b_tr), jnp.float32
        )
        true_tr = jnp.sin(u0_tr) + 0.3

        def _step_tr(u, t, d, p):
            return net_tr.apply({"params": p}, u, t, d)

        def _loss_tr(p):
            def one(u0, tv):
                u = forward_march_per_step(
                    _step_tr, jnp.atleast_1d(u0), dt_tr, p
                )
                return jnp.squeeze(
                    jnp.square(jnp.squeeze(u[-1]) - tv)
                )

            return jnp.mean(jax.vmap(one)(u0_tr, true_tr))

        want_l, want_g = jax.jit(jax.value_and_grad(_loss_tr))(p_tr)
        run_tr = make_pallas_resblock_epoch_grad(s_tr, f_tr, interpret=interp)
        got_l, got_g = jax.jit(
            lambda p: run_tr(p, dt_tr, u0_tr, true_tr)
        )(p_tr)
        jax.block_until_ready(got_l)
        flat_w = jnp.concatenate(
            [jnp.ravel(x) for x in jax.tree_util.tree_leaves(want_g)]
            + [jnp.reshape(want_l, (1,))]
        )
        flat_g = jnp.concatenate(
            [jnp.ravel(x) for x in jax.tree_util.tree_leaves(got_g)]
            + [jnp.reshape(got_l, (1,))]
        )
        check("train_fused_epoch_grad_S10_F500_B1024", flat_g, flat_w,
              5e-4, 1e-6)
        tr_fix = True
    except Exception as e:  # noqa: BLE001
        fail("train_fused_epoch_grad_S10_F500_B1024", e)
        fail("train_fused_masked_S10_cap500_B1024", e)
        tr_fix = False

    # 19b. the MASKED (padded-width-capacity) variant: ragged per-step
    # n_active gates neurons in-kernel; inactive grads exactly zero
    if tr_fix:
        try:
            na_tr = jnp.asarray(
                [100, 500, 250, 1, 499, 8, 64, 300, 500, 7], jnp.int32
            )
            run_trm = make_pallas_resblock_epoch_grad(
                s_tr, f_tr, interpret=interp, masked=True
            )
            got_lm, got_gm = jax.jit(
                lambda p: run_trm(p, dt_tr, u0_tr, true_tr, n_active=na_tr)
            )(p_tr)
            jax.block_until_ready(got_lm)

            def _step_trm(u, t, d, pm):
                p, n_a = pm
                w1 = p["weights1"][:, 0]
                b_ = p["bias"][:, 0]
                w2 = p["weights2"][0]
                m = (jnp.arange(f_tr) < n_a).astype(u.dtype)
                act = m * jnp.maximum(w1 * (u - b_), 0.0)
                return u + jnp.dot(w2, act) * d

            def _loss_trm(p):
                def one(u0, tv):
                    u = forward_march_per_step(
                        _step_trm, jnp.atleast_1d(u0)[0], dt_tr, (p, na_tr)
                    )
                    return jnp.square(u[-1] - tv)

                return jnp.mean(jax.vmap(one)(u0_tr, true_tr))

            want_lm, want_gm = jax.jit(jax.value_and_grad(_loss_trm))(p_tr)
            flat_wm = jnp.concatenate(
                [jnp.ravel(x) for x in jax.tree_util.tree_leaves(want_gm)]
                + [jnp.reshape(want_lm, (1,))]
            )
            flat_gm = jnp.concatenate(
                [jnp.ravel(x) for x in jax.tree_util.tree_leaves(got_gm)]
                + [jnp.reshape(got_lm, (1,))]
            )
            check("train_fused_masked_S10_cap500_B1024", flat_gm, flat_wm,
                  5e-4, 1e-6)
        except Exception as e:  # noqa: BLE001
            fail("train_fused_masked_S10_cap500_B1024", e)

    # 19c. the MIXED (trajectory trapezoid + ramped terminal) variant:
    # the trapezoid nodes read the VMEM trajectory scratch and inject
    # their cotangents during the reverse sweep (Main_new_loss.py:145-168)
    if tr_fix:
        try:
            nodes_tr = jnp.pad(jnp.cumsum(dt_tr), (1, 0))
            traj_tr = jnp.sin(u0_tr[:, None] + nodes_tr[None, :]) + 0.3
            ramp_tr = 0.01
            run_trx = make_pallas_resblock_epoch_grad(
                s_tr, f_tr, interpret=interp, mixed=True
            )
            got_lx, got_gx = jax.jit(
                lambda p: run_trx(p, dt_tr, u0_tr, traj_tr.T,
                                  ramp_weight=ramp_tr)
            )(p_tr)
            jax.block_until_ready(got_lx)

            def _loss_trx(p):
                def one(u0, tv_traj):
                    u = forward_march_per_step(
                        _step_tr, jnp.atleast_1d(u0), dt_tr, p
                    )
                    e2 = jnp.square(jnp.squeeze(u) - tv_traj)
                    trap = jnp.dot((e2[:-1] + e2[1:]) / 2.0, dt_tr)
                    return trap + ramp_tr * e2[-1]

                return jnp.mean(jax.vmap(one)(u0_tr, traj_tr))

            want_lx, want_gx = jax.jit(jax.value_and_grad(_loss_trx))(p_tr)
            flat_wx = jnp.concatenate(
                [jnp.ravel(x) for x in jax.tree_util.tree_leaves(want_gx)]
                + [jnp.reshape(want_lx, (1,))]
            )
            flat_gx = jnp.concatenate(
                [jnp.ravel(x) for x in jax.tree_util.tree_leaves(got_gx)]
                + [jnp.reshape(got_lx, (1,))]
            )
            check("train_fused_mixed_S10_F500_B1024", flat_gx, flat_wx,
                  5e-4, 1e-6)
        except Exception as e:  # noqa: BLE001
            fail("train_fused_mixed_S10_F500_B1024", e)

    # 19d. the SHARED-params Dense-chain fused epoch kernel at the
    # reference's largest config (ResNetBlock([100, 500]),
    # Main_FD_with_net.py:52): MXU dot_general chains (fwd, a_{l-1}ᵀdz,
    # dz Wᵀ) + backward activation recompute vs jax.grad of the XLA loss
    try:
        from adjoint_ode_adaptivity_tpu.march.fd import forward_march
        from adjoint_ode_adaptivity_tpu.models.blocks import ResNetBlock
        from adjoint_ode_adaptivity_tpu.ops.pallas.train_dense_fused import (
            make_pallas_dense_epoch_grad,
        )

        ds_sizes, ds_s, ds_b = (100, 500), 10, 2048
        ds_net = ResNetBlock(ds_sizes)
        ds_p = ds_net.init(jax.random.PRNGKey(11), jnp.ones(1), 0.0, 0.1)[
            "params"
        ]
        ds_dt = jnp.full((ds_s,), 0.1, jnp.float32)
        ds_u0 = jnp.asarray(
            np.random.default_rng(17).uniform(0.5, 2.0, ds_b), jnp.float32
        )
        ds_true = jnp.sin(ds_u0) + 0.3

        def _ds_loss(p):
            def one(u0, tv):
                u = forward_march(
                    lambda u_, t, d: ds_net.apply({"params": p}, u_, t, d),
                    jnp.atleast_1d(u0), ds_dt,
                )
                return jnp.squeeze(jnp.square(jnp.squeeze(u[-1]) - tv))

            return jnp.mean(jax.vmap(one)(ds_u0, ds_true))

        want_dl, want_dg = jax.jit(jax.value_and_grad(_ds_loss))(ds_p)
        ds_run = make_pallas_dense_epoch_grad(ds_s, ds_sizes,
                                              interpret=interp)
        got_dl, got_dg = jax.jit(
            lambda p: ds_run(p, ds_dt, ds_u0, ds_true)
        )(ds_p)
        jax.block_until_ready(got_dl)
        flat_dw = jnp.concatenate(
            [jnp.ravel(x) for x in jax.tree_util.tree_leaves(want_dg)]
            + [jnp.reshape(want_dl, (1,))]
        )
        flat_dg = jnp.concatenate(
            [jnp.ravel(x) for x in jax.tree_util.tree_leaves(got_dg)]
            + [jnp.reshape(got_dl, (1,))]
        )
        # MXU (bf16-accumulate) matmuls vs the XLA path's: looser rtol
        check("train_dense_fused_100x500_B2048", flat_dg, flat_dw,
              5e-3, 1e-5)
    except Exception as e:  # noqa: BLE001
        fail("train_dense_fused_100x500_B2048", e)

    # 17. fused DG-in-time slab ensemble kernel vs the XLA batched pipeline.
    # This group runs LAST: the imports + shared fixtures used by every
    # 17* section sit in their OWN try, and a setup failure marks all
    # dependent configs with the true error and finishes the gate
    # (instead of cascading NameErrors across a third of the configs).
    dg_fix = None
    try:
        from adjoint_ode_adaptivity_tpu.march.dg_batched import (
            dg_estimate_batched,
        )
        from adjoint_ode_adaptivity_tpu.march.dg_time import dg_time_operators
        from adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab import (
            make_pallas_dg_estimate_ensemble,
        )

        f_sin = lambda u, t: jnp.sin(u)  # noqa: E731
        ops_p1, ops_a1 = dg_time_operators(1), dg_time_operators(2)
        dg_k, dg_b = 16, 16_384
        dg_times = jnp.asarray(np.linspace(0.0, 2.0, dg_k + 1), jnp.float32)
        dg_y0 = jnp.asarray(
            np.random.default_rng(1).uniform(0.5, 2.0, dg_b), jnp.float32
        )
        dg_fix = True
    except Exception as e:  # noqa: BLE001
        for nm in (
            "dg_slab_ensemble_B16384_K16",
            "dg_slab_blocked_grid_B32768_K16",
            "dg_slab_high_order_Np5_B1024_K16",
            "dg_slab_per_member_times_B1024_K16",
            "dg_per_member_fused_loop_B256",
            "fd_per_member_estimate_B20480",
            "dg_slab_hp_per_member_B1024_K16",
        ):
            fail(nm, e)
    if not dg_fix:
        return _finish(t_start, interp)
    try:
        dg_run = make_pallas_dg_estimate_ensemble(
            ops_p1, ops_a1, f_sin, lambda u, t: jnp.cos(u), dg_k,
            newton_iters=5, interpret=interp,
        )
        _, _, err_p = dg_run(dg_times, dg_y0)
        _, _, err_x = dg_estimate_batched(
            ops_p1, ops_a1, f_sin, dg_times, dg_y0, newton_iters=5
        )
        check("dg_slab_ensemble_B16384_K16", err_p, err_x, 1e-4, 3e-6)
    except Exception as e:  # noqa: BLE001
        fail("dg_slab_ensemble_B16384_K16", e)

    # 17a-fast. fast-trig slab variant (round 5): polynomial sin/cos pair
    # through the Newton/adjoint quadrature vs the libm XLA oracle
    try:
        from adjoint_ode_adaptivity_tpu.ops.pallas.fast_trig import (
            fast_cos as _fc,
            fast_sin as _fs,
        )

        dg_run_ft = make_pallas_dg_estimate_ensemble(
            ops_p1, ops_a1, lambda u, t: _fs(u), lambda u, t: _fc(u), dg_k,
            newton_iters=5, interpret=interp,
        )
        _, _, err_ft = dg_run_ft(dg_times, dg_y0)
        check("dg_slab_fastsin_B16384_K16", err_ft, err_x, 5e-4, 1e-5)
    except Exception as e:  # noqa: BLE001
        fail("dg_slab_fastsin_B16384_K16", e)

    # 17b. the member-blocked grid of the same kernel (the 100k-IC scale
    # path): B=32,768 at block_members=8,192 -> 4 grid programs
    try:
        dg_b2 = 32_768
        dg_y0b = jnp.asarray(
            np.random.default_rng(2).uniform(0.5, 2.0, dg_b2), jnp.float32
        )
        dg_run_blk = make_pallas_dg_estimate_ensemble(
            ops_p1, ops_a1, f_sin, lambda u, t: jnp.cos(u), dg_k,
            newton_iters=5, interpret=interp, block_members=8_192,
        )
        _, _, err_pb = dg_run_blk(dg_times, dg_y0b)
        _, _, err_xb = dg_estimate_batched(
            ops_p1, ops_a1, f_sin, dg_times, dg_y0b, newton_iters=5
        )
        check("dg_slab_blocked_grid_B32768_K16", err_pb, err_xb, 1e-4, 3e-6)
    except Exception as e:  # noqa: BLE001
        fail("dg_slab_blocked_grid_B32768_K16", e)

    # 17c. high-order slab kernel (Np=5/6): the in-kernel branch-free
    # pivoted-GE solves (Cramer covers Np <= 4) on hardware
    try:
        ops_p4, ops_a4 = dg_time_operators(4), dg_time_operators(5)
        dg_y0h = jnp.asarray(
            np.random.default_rng(3).uniform(0.5, 2.0, 1024), jnp.float32
        )
        dg_run_ho = make_pallas_dg_estimate_ensemble(
            ops_p4, ops_a4, f_sin, lambda u, t: jnp.cos(u), dg_k,
            newton_iters=5, interpret=interp,
        )
        _, _, err_ph = dg_run_ho(dg_times, dg_y0h)
        _, _, err_xh = dg_estimate_batched(
            ops_p4, ops_a4, f_sin, dg_times, dg_y0h, newton_iters=5
        )
        check("dg_slab_high_order_Np5_B1024_K16", err_ph, err_xh, 1e-4, 3e-6)
    except Exception as e:  # noqa: BLE001
        fail("dg_slab_high_order_Np5_B1024_K16", e)

    # 17d. per-member slab geometry: (B, K+1) partitions as (8, B/8)
    # width/left-edge tiles with dynamic element indexing of the VMEM
    # times operand — the per-member adaptive loop's fused path
    try:
        rngpm = np.random.default_rng(5)
        b_pm = 1024
        t_core = np.sort(rngpm.uniform(0.1, 1.9, (b_pm, dg_k - 2)), axis=1)
        t_pm = jnp.asarray(
            np.concatenate(
                [
                    np.zeros((b_pm, 1)), t_core,
                    np.full((b_pm, 1), 2.0), np.full((b_pm, 1), 2.0),
                ],
                axis=1,
            ),
            jnp.float32,
        )
        y_pm = jnp.asarray(rngpm.uniform(0.5, 2.0, b_pm), jnp.float32)
        dg_run_pm = make_pallas_dg_estimate_ensemble(
            ops_p1, ops_a1, f_sin, lambda u, t: jnp.cos(u), dg_k,
            newton_iters=5, interpret=interp,
        )
        _, _, err_pp = dg_run_pm(t_pm, y_pm)
        _, _, err_xp = dg_estimate_batched(
            ops_p1, ops_a1, f_sin, t_pm, y_pm, newton_iters=5
        )
        check("dg_slab_per_member_times_B1024_K16", err_pp, err_xp, 1e-4, 3e-6)
    except Exception as e:  # noqa: BLE001
        fail("dg_slab_per_member_times_B1024_K16", e)

    # 17e. the fused per-member ADAPTIVE loop (device_loop=True): a
    # lax.while_loop driving the slab kernel with on-device refinement —
    # while_loop-of-pallas_call is its own Mosaic/XLA compile path, so it
    # gets its own hardware gate; oracle = the per-iteration host loop
    # over the identical XLA-batched pipeline
    try:
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_per_member,
        )

        y_al = np.random.default_rng(6).uniform(0.5, 2.0, 256).astype(
            np.float32
        )
        kw_al = dict(k0=3, maxit=3, tol=0.0, newton_iters=5)
        h_dev = run_adaptive_dg_per_member(
            f_sin, y_al, (0.0, 2.0), engine="pallas", device_loop=True,
            **kw_al,
        )
        h_ref = run_adaptive_dg_per_member(
            f_sin, y_al, (0.0, 2.0), engine="xla", **kw_al
        )
        assert len(h_dev) == len(h_ref), (len(h_dev), len(h_ref))
        assert (h_dev[-1].n_active == h_ref[-1].n_active).all(), (
            "refinement decisions diverged"
        )
        check(
            "dg_per_member_fused_loop_B256",
            jnp.asarray(h_dev[-1].times), jnp.asarray(h_ref[-1].times),
            1e-4, 3e-6,
        )
    except Exception as e:  # noqa: BLE001
        fail("dg_per_member_fused_loop_B256", e)

    # 17f. the per-member FD estimate kernel (per-member step widths as
    # traced VMEM operands — the FD per-member adaptive loop's engine)
    # at B=20480/44 padded steps vs the vmapped XLA iteration
    try:
        from adjoint_ode_adaptivity_tpu.adapt.fd_loop import (
            AdaptState as _FDState,
            adapt_iteration as _fd_iter,
        )
        from adjoint_ode_adaptivity_tpu.march import euler_step
        from adjoint_ode_adaptivity_tpu.ops.pallas.fd_ensemble import (
            make_pallas_fd_estimate_per_member,
        )

        b_fd, ns_fd, rf_fd = 20_480, 44, 4
        rngfd = np.random.default_rng(7)
        tc_fd = np.sort(rngfd.uniform(0.1, 1.9, (b_fd, 39)), axis=1)
        t_fd = np.concatenate(
            [np.zeros((b_fd, 1)), tc_fd, np.full((b_fd, 1), 2.0),
             np.full((b_fd, 4), 2.0)], axis=1,
        ).astype(np.float32)
        u_fd = rngfd.uniform(0.5, 2.0, b_fd).astype(np.float32)
        fd_run = make_pallas_fd_estimate_per_member(
            f_sin, lambda u, t: jnp.cos(u), ns_fd, rf_fd,
            convention="strided", interpret=interp,
        )
        err_fd, j_fd = fd_run(
            jnp.asarray(np.diff(t_fd, axis=1)), jnp.asarray(u_fd)
        )
        st_fd = _FDState(
            times=jnp.asarray(t_fd),
            n_active=jnp.full((b_fd,), 40, jnp.int32),
            it=jnp.zeros((b_fd,), jnp.int32),
        )
        step_fd = euler_step(f_sin)
        r_fd = jax.jit(jax.vmap(
            lambda s, u0: _fd_iter(s, u0, step_fd, "J=int(u^2)", rf_fd,
                                   "strided")
        ))(st_fd, jnp.asarray(u_fd))
        check("fd_per_member_estimate_B20480", err_fd, r_fd.err_steps,
              1e-4, 3e-6)
    except Exception as e:  # noqa: BLE001
        fail("fd_per_member_estimate_B20480", e)

    # 17g. the fused per-member MIXED-ORDER (hp) slab kernel: per-member
    # partitions AND order vectors as register-tile operands, blended
    # per-order operator tables, three sequential marches in one launch
    # (the hp loop's engine='pallas') vs the vmapped XLA mixed pipeline
    try:
        from adjoint_ode_adaptivity_tpu.adjoint.dg_mixed import (
            dg_adjoint_interp_mixed,
            dg_adjoint_march_mixed,
        )
        from adjoint_ode_adaptivity_tpu.march.dg_mixed import (
            dg_march_mixed,
            dg_time_operators_mixed,
        )
        from adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab_mixed import (
            make_pallas_dg_estimate_hp_per_member,
        )

        n_user, fo, b_hp, k_hp = 3, 2, 1024, 16
        mops_s = dg_time_operators_mixed(n_user + fo)
        interp_s = dg_adjoint_interp_mixed(mops_s)
        rnghp = np.random.default_rng(9)
        tc_hp = np.sort(rnghp.uniform(0.1, 1.9, (b_hp, k_hp - 1)), axis=1)
        t_hp = jnp.asarray(
            np.concatenate(
                [np.zeros((b_hp, 1)), tc_hp, np.full((b_hp, 1), 2.0)],
                axis=1,
            ),
            jnp.float32,
        )
        ns_hp = jnp.asarray(
            rnghp.integers(1, n_user + 1, (b_hp, k_hp)), jnp.int32
        )
        y_hp = jnp.asarray(rnghp.uniform(0.5, 2.0, b_hp), jnp.float32)
        hp_run = make_pallas_dg_estimate_hp_per_member(
            mops_s, interp_s, f_sin, n_elements=k_hp, n_max_user=n_user,
            fine_offset=fo, newton_iters=6, interpret=interp,
        )
        _, _, _, err_hp = hp_run(t_hp, ns_hp, y_hp)

        def _hp_member(t_m, n_m, y_m):
            res_c = dg_march_mixed(
                mops_s, f_sin, t_m, n_m, y_m, newton_iters=6
            )
            adj = dg_adjoint_march_mixed(
                mops_s, interp_s, f_sin, res_c.u, t_m, n_m, y_m
            )
            return adj.err

        err_hx = jax.jit(jax.vmap(_hp_member))(t_hp, ns_hp, y_hp)
        check("dg_slab_hp_per_member_B1024_K16", err_hp, err_hx, 1e-4, 3e-6)
        hp_fix = True
    except Exception as e:  # noqa: BLE001
        fail("dg_slab_hp_per_member_B1024_K16", e)
        hp_fix = False

    try:
        if not hp_fix:
            raise RuntimeError("hp fixture setup failed (see 17g)")
        # 17h. the RECONSTRUCT-adjoint variant of the same kernel: the
        # low-order backward solve + Radau lift + AWR (adj_rec.m path)
        # vs the XLA reconstruct pipeline
        from adjoint_ode_adaptivity_tpu.adjoint.dg_mixed import (
            dg_adjoint_reconstruct_mixed,
            dg_adjoint_solve_low_mixed,
            dg_awr_from_adjoint_mixed,
            dg_radau_interp_mixed,
        )

        rad_s = dg_radau_interp_mixed(mops_s)
        hp_run_rec = make_pallas_dg_estimate_hp_per_member(
            mops_s, interp_s, f_sin, n_elements=k_hp, n_max_user=n_user,
            fine_offset=fo, newton_iters=6, interpret=interp,
            adjoint_mode="reconstruct", rad=rad_s,
        )
        _, _, _, err_hr = hp_run_rec(t_hp, ns_hp, y_hp)

        def _hp_member_rec(t_m, n_m, y_m):
            res_c = dg_march_mixed(
                mops_s, f_sin, t_m, n_m, y_m, newton_iters=6
            )
            v_low = dg_adjoint_solve_low_mixed(
                mops_s, f_sin, res_c.u, t_m, n_m, y_m
            )
            v_hi = dg_adjoint_reconstruct_mixed(mops_s, rad_s, v_low, n_m)
            return dg_awr_from_adjoint_mixed(
                mops_s, interp_s, f_sin, res_c.u, t_m, n_m, y_m, v_hi
            )

        err_hxr = jax.jit(jax.vmap(_hp_member_rec))(t_hp, ns_hp, y_hp)
        check("dg_slab_hp_reconstruct_B1024_K16", err_hr, err_hxr,
              1e-4, 3e-6)
    except Exception as e:  # noqa: BLE001
        fail("dg_slab_hp_reconstruct_B1024_K16", e)

    return _finish(t_start, interp)


def _finish(t_start, interp):
    ok = all(r["ok"] for r in RESULTS)
    print(
        json.dumps(
            {
                "metric": "tpu kernel smoke gate",
                "value": sum(r["ok"] for r in RESULTS),
                "unit": f"configs passed / {len(RESULTS)}",
                "vs_baseline": 1.0 if ok else 0.0,
                "ok": ok,
                "backend": jax.default_backend(),
                "interpret": interp,
                "elapsed_s": round(time.perf_counter() - t_start, 1),
                "configs": RESULTS,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    import time as _time

    # the tunnel drops intermittently and recovers within minutes —
    # retry twice before declaring hardware validation impossible
    _alive = False
    for _attempt in range(3):
        if _tpu_reachable():
            _alive = True
            break
        if _attempt < 2:
            print('{"warning": "TPU probe failed - retrying in 120 s"}',
                  file=sys.stderr)
            _time.sleep(120.0)
    if not _alive:
        print(json.dumps({
            "metric": "tpu kernel smoke gate",
            "value": 0,
            "ok": False,
            "error": "backend unreachable (dead TPU tunnel?) — probe "
                     "subprocess failed; hardware validation impossible",
        }))
        sys.exit(1)
    sys.exit(main())
