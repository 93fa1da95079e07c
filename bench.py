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
adjoint step. The estimate work (forward recompute + two half-step solves +
the half-step transpose pair per step) rides inside the adjoint sweep and is
NOT credited in the headline number; a second, clearly-labelled
``dof_steps_per_sec_credited`` figure counts it.

Also reported: effectivity parity measured ON this benchmark problem
(K=10k/N=2, same dt, f64 CPU subprocess) against a half-step truth march,
and the reference's largest compute — the 100k-IC vmapped fwd+adj+indicator
ensemble (Main_variable_params.py:234,330-341).
"""
import json
import os
import sys
import time

# the batched reverse kernel's VMEM stack (~16.4 MB of (Np,8,K) temporaries)
# needs more than Mosaic's default 16 MB scoped limit; the TPU backend
# initializes lazily, so setting this before first device use is sufficient
# (verified) even though sitecustomize imports jax at interpreter startup.
# APPEND to any pre-existing LIBTPU_INIT_ARGS — setdefault would silently
# drop the flag and the batched kernels would fail Mosaic's VMEM check.
_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=49152"
_cur = os.environ.get("LIBTPU_INIT_ARGS", "")
_m = __import__("re").search(r"--xla_tpu_scoped_vmem_limit_kib=(\d+)", _cur)
if _m is None:
    os.environ["LIBTPU_INIT_ARGS"] = (_cur + " " + _VMEM_FLAG).strip()
elif int(_m.group(1)) < 49152:
    # a stale smaller limit (e.g. round-2's 32768) would fail the batched
    # kernels' Mosaic VMEM check — upgrade it
    os.environ["LIBTPU_INIT_ARGS"] = _cur.replace(_m.group(0), _VMEM_FLAG)

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the TPU tunnel's remote compile of the fused
# kernels takes minutes; cache so subsequent bench runs start in seconds
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _tpu_reachable(timeout_s: float = 300.0) -> bool:
    """Probe the TPU tunnel in a SUBPROCESS with a hard timeout: a dead
    tunnel makes backend init block for tens of minutes before raising
    (observed), which would leave the bench with no JSON at all.  On
    failure the caller pins this process to CPU and the bench runs its
    XLA fallback paths instead."""
    import subprocess

    try:
        probe = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax, jax.numpy as jnp;"
                "assert jax.default_backend() == 'tpu';"
                "print(float(jnp.sum(jnp.ones((8, 8)))))",
            ],
            capture_output=True,
            timeout=timeout_s,
        )
        return probe.returncode == 0
    except Exception:
        return False


def main():
    # the tunnel drops intermittently and usually recovers within
    # minutes (observed 3x in one round-5 session); a CPU-fallback bench
    # record is worthless, so retry the probe twice with a pause before
    # giving up (~15 min worst case, still far under any driver budget)
    tpu_outage = True
    for attempt in range(3):
        if _tpu_reachable():
            tpu_outage = False
            break
        if attempt < 2:
            print(
                '{"warning": "TPU probe failed - retrying in 120 s"}',
                file=sys.stderr,
            )
            time.sleep(120.0)
    if tpu_outage:
        print(
            '{"warning": "TPU unreachable - falling back to CPU paths"}',
            file=sys.stderr,
        )
        jax.config.update("jax_platforms", "cpu")
    from adjoint_ode_adaptivity_tpu.adjoint.advec import (
        advec_fwd_adj_estimate,
        terminal_integral_cotangent,
    )
    from adjoint_ode_adaptivity_tpu.march.advec import advec_operators
    from adjoint_ode_adaptivity_tpu.ops import startup_1d
    from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
        make_pallas_fwd_adj_estimate_grid_single_blocked,
    )
    from adjoint_ode_adaptivity_tpu.utils.benchmarks import (
        numpy_advec_fwd_adj_baseline,
    )
    from adjoint_ode_adaptivity_tpu.utils.flops import BENCH_CFG

    # canonical row shapes shared with tools/roofline.py (ADVICE r4: one
    # source so the FLOP accounting cannot drift from the benched config)
    n_order = BENCH_CFG["advec_pipeline"]["n_order"]
    k_elems = BENCH_CFG["advec_pipeline"]["k_elems"]
    a = 2 * np.pi
    disc = startup_1d(n_order, 0.0, 2 * np.pi, k_elems)
    dtype = jnp.float32

    # CFL-stable step (same rule as the reference driver)
    xmin = float(np.min(np.abs(disc.x[0, :] - disc.x[1, :])))
    dt = 0.5 * (0.75 / a) * xmin

    segment = 8  # off-TPU XLA fallback segmentation (and n_steps derivation);
    # the TPU paths pick their own segments below
    n_segments = 256
    n_steps = segment * n_segments  # 2048

    u0 = jnp.asarray(np.sin(disc.x), dtype)
    lam_end = terminal_integral_cotangent(disc, dtype)
    on_tpu = jax.default_backend() == "tpu"

    if on_tpu:
        # blocked-single layout: the K elements tile the 8 sublanes as
        # contiguous blocks, so ONE state runs at full register height
        # (38.7 -> ~6 ms vs the row-layout grid pipeline); segment=64 is
        # the best measured under the 48 MB scoped-VMEM limit (5.65 ms vs
        # 5.79 at the old 32-MB-limited seg=32)
        pipeline = make_pallas_fwd_adj_estimate_grid_single_blocked(
            disc, a, dt, segment=64, n_segments=n_steps // 64
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

    # ---- timing methodology: this environment dispatches through a tunnel
    # with ~25 ms fixed per-call overhead and a ~27 ms RPC floor on value
    # fetches, and block_until_ready can return prematurely for some
    # kernels. The honest device time chains K data-dependent pipeline
    # calls (ALL outputs kept live) inside one jit and takes the
    # (K_hi − K_lo) slope with a single fetch at the end.
    def chained_slope(make_g, arg, k_hi=3, reps=5):
        gs = {k: make_g(k) for k in (1, k_hi)}
        for g in gs.values():
            float(jnp.sum(g(arg)))  # compile + warm
        t = {}
        for k, g in gs.items():
            t_best = np.inf
            for i in range(reps):
                a_in = arg + jnp.asarray(1e-6 * (i + 1), arg.dtype)
                jax.block_until_ready(a_in)
                t0 = time.perf_counter()
                float(jnp.sum(g(a_in)))
                t_best = min(t_best, time.perf_counter() - t0)
            t[k] = t_best
        slope = (t[k_hi] - t[1]) / (k_hi - 1)
        if slope <= 0:
            # timing noise swallowed the slope: fall back to the dispatch-
            # inclusive single-call time (conservative, never absurd)
            slope = t[1]
        return slope, t[1]

    def mk_epoch_timer(state0, call):
        """Factory for every train-strand timing closure: scans
        ``call(state, u0b, epoch_idx) -> (state, loss)`` for k epochs
        inside ONE jit and keeps the final params live — XLA would DCE
        the whole epoch chain if only the last loss were consumed; the
        1e-20 guard keeps every update on the critical path at no
        measurable cost. Returned ``make(k)`` plugs into
        ``chained_slope``."""
        def make(k_epochs):
            @jax.jit
            def g(u0b):
                st, losses = jax.lax.scan(
                    lambda st, i: call(st, u0b, i),
                    state0, jnp.arange(k_epochs)
                )
                live = sum(
                    jnp.sum(leaf)
                    for leaf in jax.tree_util.tree_leaves(st.params)
                )
                return losses[-1] + 1e-20 * live
            return g
        return make

    def study_device_slope(run_fused, t0, extra=(), pick=None, k_hi=8,
                           reps=5):
        """Device-time slope for a fused adaptive STUDY (one while_loop
        dispatch). A single-study wall-clock here is dominated by the
        harness's ~25 ms RPC dispatch/fetch floor (a 31 ms wall is
        mostly tunnel), which made the r3/r4 study ratios wobble ±15%
        run-to-run. This scans k data-dependent study replays inside
        ONE jit — replay i+1's initial partition carries a
        1e-20·(replay-i scalar) term, numerically a no-op (≪ one ulp of
        any node coordinate, and a uniform shift leaves every slab
        width bit-identical anyway) but a real dataflow edge, so XLA
        must run the replays serially — and takes the (k_hi−1) slope,
        same methodology as every other bench row. ``pick(out)``
        reduces a study's outputs to one float scalar (keeps the
        history buffers live; only the scalar is ever fetched).
        Returns ``(device_s_per_study, dispatch_inclusive_wall_s)``."""
        def make(k):
            @jax.jit
            def g(t_in):
                def body(carry, _):
                    t, acc = carry
                    s = pick(run_fused(t, *extra)).astype(jnp.float32)
                    t = t_in + (1e-20 * s).astype(t_in.dtype)
                    return (t, acc + s), None
                (_, acc), _ = jax.lax.scan(
                    body, (t_in, jnp.zeros((), jnp.float32)), None,
                    length=k,
                )
                return acc
            return g
        return chained_slope(make, t0, k_hi=k_hi, reps=reps)

    def _timeit(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    if on_tpu:
        def mk_single(k_calls):
            @jax.jit
            def g(u):
                for _ in range(k_calls):
                    uf, lam0, eta = pipeline(u, jnp.float32(0.0), lam_end)
                    u = uf + 1e-20 * lam0 + 1e-20 * eta[None, :]
                return u
            return g

        best, t1_single = chained_slope(mk_single, u0)
        res = run(u0)
        jax.block_until_ready(res)
    else:
        res = run(u0)
        jax.block_until_ready(res)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            res = run(u0)
            jax.block_until_ready(res)
            best = min(best, time.perf_counter() - t0)
        t1_single = best

    dof = (n_order + 1) * k_elems
    dof_steps = dof * (2 * n_steps)  # forward sweep + adjoint sweep
    throughput_single = dof_steps / best

    # ---- batched pipeline: B=8 independent states stacked on the sublane
    # axis so every VPU op runs at full register height (the unbatched
    # kernel uses 1 of 8 sublanes — ~87% idle). Same per-state outputs
    # (tested); throughput counts all B marches.
    batch = 8
    throughput_batched = batch_elapsed = None
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
            make_pallas_fwd_adj_estimate_grid_batched,
        )

        # segment=8 (fits the 48 MB scoped limit; 35.9 vs 36.3 ms at the
        # old 32-MB-limited seg=4); store_trajectory streams every coarse
        # state through HBM (~2 GB, pipelined) so the reverse kernel skips
        # the forward recompute: 5 instead of 6 LSRK step-equivalents per
        # step (measured 44.6 -> 36.9 ms)
        pipeline_b = make_pallas_fwd_adj_estimate_grid_batched(
            disc, a, dt, segment=8, n_segments=n_steps // 8, batch=batch,
            store_trajectory=True,
        )
        phases = np.linspace(0.0, 2 * np.pi, batch, endpoint=False)
        u0b = jnp.asarray(
            np.stack([np.sin(np.asarray(disc.x) + p) for p in phases], axis=1),
            dtype,
        )
        lam_b = jnp.broadcast_to(
            lam_end[:, None, :], (n_order + 1, batch, k_elems)
        )
        def mk_batched(k_calls):
            @jax.jit
            def g(u):
                for _ in range(k_calls):
                    uf, lam0, eta = pipeline_b(u, jnp.float32(0.0), lam_b)
                    u = uf + 1e-20 * lam0 + 1e-20 * eta[None, :, :]
                return u
            return g

        batch_elapsed, t1_batched = chained_slope(mk_batched, u0b)
        throughput_batched = batch * dof_steps / batch_elapsed

    throughput = throughput_batched or throughput_single
    j_value, sum_eta = extract(res)
    # step-doubling accounting: per time step the batched stored-trajectory
    # pipeline executes 5 full-cost LSRK step-equivalents — 1 forward +
    # (reverse) 2 half steps + 2 half-transpose steps (the half-transposes
    # ARE the adjoint propagation; the forward recompute is eliminated by
    # streaming the stored trajectory). The single-state pipeline still
    # recomputes (6). Credited in a clearly-labelled second figure; the
    # headline counts only 2 (fwd + adjoint) and stays conservative.
    cred_elapsed = batch_elapsed if throughput_batched else best
    cred_batch = batch if throughput_batched else 1
    cred_equiv = 5 if throughput_batched else 6
    throughput_credited = cred_batch * dof * (cred_equiv * n_steps) / cred_elapsed

    # baseline: NumPy element pipeline on the host CPU. The PINNED constant
    # (utils/pinned_baselines.py — fastest median-of-9 session, favouring
    # the baseline) is what every ratio divides by; the live draw is
    # reported alongside so drift stays visible (VERDICT r3 weak #1: the
    # 1-core live draws wobble 2-4x under load).
    from adjoint_ode_adaptivity_tpu.utils.pinned_baselines import pinned

    base = numpy_advec_fwd_adj_baseline(disc, a, dt, n_steps=16)
    base2 = numpy_advec_fwd_adj_baseline(disc, a, dt, n_steps=16)
    baseline_dsps_live = max(base.dof_steps_per_sec, base2.dof_steps_per_sec)
    baseline_dsps = pinned("advec_fd_dof_steps_per_sec", baseline_dsps_live)

    # ---- effectivity parity ON the benchmark problem (north star metric 2):
    # the same K=10k/N=2 discretisation and dt, f64 in a CPU subprocess
    # (x64 must be set before jax touches an array; this process is pinned
    # to the TPU at f32). u0 = sin(800x) gives a measurable time-error gap;
    # J = ∫ u(T) over x∈[π, π+1]. Reports |Ση − (J(u_dt) − J(u_dt/2))|,
    # absolute and relative to the gap.
    import subprocess
    import sys as _sys

    def effectivity_f64(n_ord, k_el, dt_val, n_stp, freq=800):
        """f64 effectivity identity |Ση − (J(u_dt) − J(u_dt/2))| for the
        advection pipeline at order ``n_ord`` — run in a CPU subprocess
        (this process is pinned to the TPU at f32). ``dt_val=None`` derives
        the CFL-stable step from that order's own mesh (GL nodes cluster
        ~1/N², so the N=2 step is unstable at N=7). ``freq`` sets the
        u0 = sin(freq·x) wavenumber — scaled with the mesh so the
        time-integration gap stays well above roundoff (a well-resolved IC
        at high order leaves a ~1e-10 gap whose relative error floor is
        then meaningless). Returns (abs_err, rel_err, gap) or (None,)*3."""
        dt_expr = (
            repr(dt_val)
            if dt_val is not None
            else "0.5*(0.75/(2*np.pi))*float(np.min(np.abs("
            "np.asarray(disc.x)[0,:]-np.asarray(disc.x)[1,:])))"
        )
        code = (
            "import jax; jax.config.update('jax_platforms','cpu'); "
            "jax.config.update('jax_enable_x64', True)\n"
            "import sys; sys.path.insert(0, %r)\n"
            "import jax.numpy as jnp, numpy as np\n"
            "from jax import lax\n"
            "from adjoint_ode_adaptivity_tpu.ops import startup_1d\n"
            "from adjoint_ode_adaptivity_tpu.march.advec import advec_operators\n"
            "from adjoint_ode_adaptivity_tpu.adjoint.advec import ("
            "advec_fwd_adj_estimate, lsrk_step, terminal_integral_cotangent)\n"
            "disc = startup_1d(%d, 0.0, 2*np.pi, %d)\n"
            "a = 2*np.pi; dt = " + dt_expr + "; n_steps = %d\n"
            "ops = advec_operators(disc, a=a, dtype=jnp.float64)\n"
            "u0 = jnp.asarray(np.sin(%d*np.asarray(disc.x)), jnp.float64)\n"
            "lam = terminal_integral_cotangent(disc, jnp.float64)\n"
            "xc = np.mean(np.asarray(disc.x), axis=0)\n"
            "lam = lam * jnp.asarray(((xc>=np.pi)&(xc<=np.pi+1.0)).astype(np.float64))[None,:]\n"
            "res = advec_fwd_adj_estimate(ops, disc, u0, dt, n_steps, segment=8, lam_end=lam)\n"
            "def half(u):\n"
            "    def body(c, i):\n"
            "        (u,) = c\n"
            "        return (lsrk_step(ops, u, i*(dt/2), dt/2),), None\n"
            "    (u,), _ = lax.scan(body, (u,), jnp.arange(2*n_steps))\n"
            "    return u\n"
            "gap = float(jnp.sum(lam*(res.u_final - half(u0))))\n"
            "est = float(jnp.sum(res.eta))\n"
            "print(abs(est-gap), abs(est-gap)/abs(gap), gap)\n"
        ) % (__file__.rsplit("/", 1)[0], n_ord, k_el, n_stp, freq)
        try:
            out = subprocess.run(
                [_sys.executable, "-c", code], capture_output=True, text=True,
                timeout=600,
            )
            vals = out.stdout.strip().split("\n")[-1].split()
            # a failed subprocess leaves [] here; tuple() of that would be
            # an EMPTY tuple and crash the caller's 3-way unpack
            if out.returncode != 0 or len(vals) != 3:
                return (None, None, None)
            return tuple(float(v) for v in vals)
        except Exception:
            return (None, None, None)

    eff_abs, eff_rel, eff_gap = effectivity_f64(n_order, k_elems, dt, 64)
    # exact fine-adjoint identity pinned across orders (same methodology;
    # equal-DoF N=3 mesh, smaller N=7 run to bound the 1-core CPU cost;
    # per-order CFL-stable dt; IC wavenumber ~3 DoF/wavelength — the
    # marginally-resolved regime where LSRK time error is large, so the
    # gap sits ~1e-5..1e-6, far above f64 roundoff; well-resolved ICs
    # leave roundoff-sized gaps whose relative error is meaningless even
    # though the absolute identity still holds to ~1e-17)
    eff_abs_n3, eff_rel_n3, _ = effectivity_f64(3, 7_500, None, 64, freq=9000)
    eff_abs_n7, eff_rel_n7, _ = effectivity_f64(7, 2_500, None, 32, freq=7000)

    # ---- nonlinear strand: fused batched Burgers march with the ΠN minmod
    # limiter applied after every LSRK stage (the reference's limiter
    # toolkit driven at scale; kernel pinned to the XLA march at f64)
    burgers_throughput = burgers_throughput_1 = None
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.ops.pallas.burgers import (
            make_pallas_burgers_march,
        )

        b_dt = 0.3 * xmin
        burgers_run = make_pallas_burgers_march(
            disc, b_dt, n_steps, batch=batch, steps_per_chunk=64, limiter="n"
        )
        u0_burg = jnp.asarray(
            np.stack(
                [(0.5 + 0.05 * j) * np.sin(np.asarray(disc.x)) for j in range(batch)],
                axis=1,
            ),
            dtype,
        )

        def mk_burgers(k_calls):
            @jax.jit
            def g(u):
                for _ in range(k_calls):
                    u = burgers_run(u)
                return u
            return g

        burgers_elapsed, _ = chained_slope(mk_burgers, u0_burg)
        burgers_throughput = batch * dof * n_steps / burgers_elapsed

        # single-state latency via the blocked-sublane layout (one state's
        # K elements tile the 8 sublanes; the sublane-wrapping shifts ARE
        # the periodic flux)
        from adjoint_ode_adaptivity_tpu.ops.pallas.burgers import (
            make_pallas_burgers_march_single_blocked,
        )

        burgers_run_1 = make_pallas_burgers_march_single_blocked(
            disc, b_dt, n_steps, steps_per_chunk=64, limiter="n"
        )

        def mk_burgers_1(k_calls):
            @jax.jit
            def g(u):
                for _ in range(k_calls):
                    u = burgers_run_1(u)
                return u
            return g

        burgers_1_elapsed, _ = chained_slope(mk_burgers_1, u0_burg[:, 0])
        burgers_throughput_1 = dof * n_steps / burgers_1_elapsed

    # ---- ensemble benchmark: fwd+adj+indicator over ~100k ICs — the
    # reference's largest compute (Main_variable_params.py:234,330-341).
    # On TPU: the fused Pallas kernel (ops/pallas/fd_ensemble.py), ICs on
    # the vector lanes, one launch for the whole pipeline. Timing note: a
    # single call sits below this environment's ~27 ms host↔device RPC
    # floor, so the honest measurement chains K data-dependent calls inside
    # one jit and takes the slope (K=1 vs K=64).
    n_ics, ens_steps, ref_factor = (
        BENCH_CFG["fd_ensemble"]["n_ics"],
        BENCH_CFG["fd_ensemble"]["n_steps"],
        BENCH_CFG["fd_ensemble"]["ref_factor"],
    )
    ens_fast_rate = None
    ens_dt = 2.0 / ens_steps
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.ops.pallas.fd_ensemble import (
            make_pallas_fd_ensemble,
        )

        ens_run = make_pallas_fd_ensemble(
            lambda u, t: jnp.sin(u), lambda u, t: jnp.cos(u), ens_steps,
            ref_factor, dt=ens_dt,
        )

        def _chain(k_calls):
            @jax.jit
            def g(u):
                for _ in range(k_calls):
                    err = ens_run(u)
                    u = u + 1e-7 * err[0]  # data dependency between calls
                return u
            return g

        u0s = jnp.asarray(
            np.random.default_rng(0).uniform(-3, 3, n_ics), jnp.float32
        )
        # the kernel is ~0.1-0.3 ms/call: chain long enough (K=64) that the
        # slope clears the ~ms dispatch jitter
        ens_best, _ = chained_slope(_chain, u0s, k_hi=64)
        ens_kernel = "pallas-fused"

        # fast-trig variant (round 5): the attribution run
        # (tools/ensemble_attrib.py) measured 90% of this kernel's time in
        # sin/cos issue (the affine-RHS twin runs at 99% of the VPU FMA
        # roofline), so the remaining lever is the transcendental itself —
        # ops/pallas/fast_trig's shared-x² polynomial pair (~13 FMAs vs
        # Mosaic's ~57-per-eval libm path; |u| ≤ 4 domain proof in the
        # module docstring, f32-roundoff-level accuracy, refinement argmax
        # identical — tests/test_fast_trig.py)
        from adjoint_ode_adaptivity_tpu.ops.pallas.fast_trig import (
            fast_cos,
            fast_sin,
        )

        ens_run_fast = make_pallas_fd_ensemble(
            lambda u, t: fast_sin(u), lambda u, t: fast_cos(u), ens_steps,
            ref_factor, dt=ens_dt,
        )

        def _chain_fast(k_calls):
            # the fast kernel is ~30 µs/call — a 64-call unrolled chain
            # sits inside dispatch jitter (the first full-bench run
            # captured 4e6 ICs/s = the fallback single-call wall); scan
            # 512 data-dependent calls so the slope signal is ~15 ms
            @jax.jit
            def g(u):
                def body(u, _):
                    err = ens_run_fast(u)
                    return u + 1e-7 * jnp.sum(err), None
                u, _ = jax.lax.scan(body, u, None, length=k_calls)
                return u
            return g

        ens_fast_best, _ = chained_slope(_chain_fast, u0s, k_hi=512)
        ens_fast_rate = n_ics / ens_fast_best
    else:
        from adjoint_ode_adaptivity_tpu.utils.benchmarks import ensemble_fd_pipeline

        ens_fn, u0s = ensemble_fd_pipeline(
            n_ics, n_steps=ens_steps, ref_factor=ref_factor
        )
        ens = ens_fn(u0s)
        jax.block_until_ready(ens)
        ens_best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            ens = ens_fn(u0s)
            jax.block_until_ready(ens)
            ens_best = min(ens_best, time.perf_counter() - t0)
        ens_kernel = "xla"
    # fwd coarse + fine grid adjoint + residual ≈ (1 + 2·ref_factor)
    # Euler-step-equivalents per coarse step per IC
    ens_dof_steps = n_ics * ens_steps * (1 + 2 * ref_factor)
    ens_throughput = ens_dof_steps / ens_best

    # ---- DG-in-time strand (matlab/dg_march.m:26-78 + MAIN.m:29-166):
    # batched ensemble Newton slab march + n+1 adjoint + per-element AWR in
    # the lane-major (Np, B) layout with closed-form Cramer solves — the
    # whole ensemble Newton iteration is vectorized arithmetic. One
    # slab-solve = one element's Newton (fwd) or linear (adjoint) solve for
    # one member; the NumPy baseline runs the same pipeline as the
    # reference does — element-by-element, member-by-member.
    from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
        run_adaptive_dg_ensemble,
        run_adaptive_dg_per_member,
    )
    from adjoint_ode_adaptivity_tpu.march.dg_batched import (
        dg_estimate_batched,
    )
    from adjoint_ode_adaptivity_tpu.march.dg_time import dg_time_operators
    from adjoint_ode_adaptivity_tpu.utils.benchmarks import (
        numpy_dg_pipeline_baseline,
    )

    f_sin = lambda u, t: jnp.sin(u)  # noqa: E731
    dg_b, dg_k = 16_384, 16
    dg_ops_p = dg_time_operators(1)
    dg_ops_a = dg_time_operators(2)
    dg_times = jnp.asarray(np.linspace(0.0, 2.0, dg_k + 1), dtype)
    dg_y0 = jnp.asarray(
        np.random.default_rng(1).uniform(0.5, 2.0, dg_b), dtype
    )
    if on_tpu:
        # fused Pallas slab kernel: the whole ensemble fwd-Newton +
        # adjoint + AWR in ONE launch, tuple-of-rows on (8, B/8) tiles —
        # measured 7.5x the XLA batched path (0.38 vs 2.9 ms)
        from adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab import (
            make_pallas_dg_estimate_ensemble,
        )

        dg_run = make_pallas_dg_estimate_ensemble(
            dg_ops_p, dg_ops_a, f_sin, lambda u, t: jnp.cos(u), dg_k,
            newton_iters=5,
        )
        dg_kernel = "pallas-fused"

        def _dg_call(y):
            return dg_run(dg_times, y)

    else:
        dg_kernel = "xla"

        def _dg_call(y):
            return dg_estimate_batched(
                dg_ops_p, dg_ops_a, f_sin, dg_times, y, newton_iters=5
            )

    def mk_dg(k_calls):
        @jax.jit
        def g(y):
            for _ in range(k_calls):
                u, v, err = _dg_call(y)
                # keep every output live in the chain (XLA DCEs the rest)
                y = (
                    y
                    + 1e-20 * u[:, -1, -1]
                    + 1e-20 * v[:, 0, 0]
                    + 1e-20 * jnp.sum(err, axis=1)
                )
            return y
        return g

    # the fused kernel is ~0.4 ms/call: chain K=32 so the measured section
    # is >10 ms (the chained-slope stability rule; K=8 wobbled 3.5x)
    dg_elapsed, dg_t1 = chained_slope(mk_dg, dg_y0, k_hi=32)
    dg_rate = dg_b * dg_k * 2 / dg_elapsed  # fwd + adjoint solves per element

    # fast-trig variant (round 5): ~74% of the slab kernel's issue budget
    # is the Newton/adjoint quadrature sin/cos (utils/flops.py model +
    # the measured pair ceiling) — swap in fast_trig's polynomial pair
    # (|u| ≤ 4 holds: the slab states live in the same u' = sin u basin)
    dg_fast_rate = None
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.ops.pallas.fast_trig import (
            fast_cos as _fcos,
            fast_sin as _fsin,
        )

        dg_run_fast = make_pallas_dg_estimate_ensemble(
            dg_ops_p, dg_ops_a, lambda u, t: _fsin(u),
            lambda u, t: _fcos(u), dg_k, newton_iters=5,
        )

        def mk_dg_fast(k_calls):
            # ~0.1-0.2 ms/call: scan 256 calls for a >25 ms slope signal
            @jax.jit
            def g(y):
                def body(y, _):
                    u, v, err = dg_run_fast(dg_times, y)
                    y = (
                        y
                        + 1e-20 * u[:, -1, -1]
                        + 1e-20 * v[:, 0, 0]
                        + 1e-20 * jnp.sum(err, axis=1)
                    )
                    return y, None
                y, _ = jax.lax.scan(body, y, None, length=k_calls)
                return y
            return g

        dg_fast_elapsed, _ = chained_slope(mk_dg_fast, dg_y0, k_hi=256)
        dg_fast_rate = dg_b * dg_k * 2 / dg_fast_elapsed
    dg_base = numpy_dg_pipeline_baseline(
        1, np.asarray(dg_times, np.float64), np.linspace(0.5, 2.0, 16)
    )
    dg_base2 = numpy_dg_pipeline_baseline(
        1, np.asarray(dg_times, np.float64), np.linspace(0.5, 2.0, 16)
    )
    dg_base_rate_live = max(dg_base.slabs_per_sec, dg_base2.slabs_per_sec)
    dg_base_rate = pinned("dg_slab_order1_slabs_per_sec", dg_base_rate_live)

    # adaptive-loop wall-clock (MAIN.m:29-166 at ensemble scale): B members
    # share the partition, bisect at the ensemble-mean |AWR| argmax; padded
    # partition -> the whole iteration compiles once. Baseline wall-clock is
    # extrapolated from the measured NumPy per-slab rate over the identical
    # slab count (the reference loop's cost is exactly its pipeline cost).
    # each call of run_adaptive_dg_ensemble builds a fresh jit closure, so
    # a plain warm-up call cannot seed the timed call's jit cache; the
    # first run returns its jitted iteration (history.iteration) and the
    # timed run reuses it — genuinely warm, no trace or cache-load in the
    # measured wall-clock.
    dg_ab, dg_maxit, dg_k0 = 1024, 10, 4
    dg_ay0 = np.random.default_rng(2).uniform(0.5, 2.0, dg_ab).astype(
        np.asarray(dg_y0).dtype
    )
    kwargs = dict(k0=dg_k0, maxit=dg_maxit, tol=0.0, newton_iters=8)
    warm = run_adaptive_dg_ensemble(f_sin, dg_ay0, (0.0, 2.0), **kwargs)
    t0 = time.perf_counter()
    dg_hist = run_adaptive_dg_ensemble(
        f_sin, dg_ay0, (0.0, 2.0), iteration=warm.iteration, **kwargs
    )
    dg_adaptive_wallclock = time.perf_counter() - t0
    dg_adaptive_slabs = sum(
        2 * (len(h.times) - 1) * dg_ab for h in dg_hist
    )
    dg_adaptive_baseline_est = dg_adaptive_slabs / dg_base_rate

    # FUSED-DISPATCH ensemble loop (device_loop=True): the whole maxit-
    # iteration ensemble-mean study is ONE lax.while_loop dispatch with a
    # single diagnostics fetch (run_adaptive_dg_ensemble grew device_loop
    # in round 3 but the r3 bench still timed the host loop's ~27 ms/iter
    # dispatch — VERDICT r3 weak #3). Histories pinned identical in tests.
    h_ens_f = run_adaptive_dg_ensemble(
        f_sin, dg_ay0, (0.0, 2.0), device_loop=True, **kwargs
    )
    ens_npad = dg_k0 + dg_maxit + 2
    ens_row = np.linspace(0.0, 2.0, dg_k0 + 1)
    ens_t0 = jnp.asarray(
        np.concatenate(
            [ens_row, np.full(ens_npad - dg_k0 - 1, ens_row[-1])]
        ),
        jnp.float32,
    )

    dg_adaptive_fused_dev, dg_adaptive_fused_wall = study_device_slope(
        h_ens_f.run_fused, ens_t0,
        pick=lambda o: jnp.sum(o[1]) + o[2].astype(jnp.float32),
    )

    # PER-MEMBER adaptive loop, fused on device (device_loop=True): every
    # member refines its own partition (the reference's one-job-per-IC
    # farm), and the WHOLE maxit-iteration study runs as one
    # lax.while_loop dispatch with a single diagnostics fetch. Timed
    # steady-state via the prebuilt run_fused / iteration callables (same
    # no-retrace methodology as above); histories are pinned identical in
    # tests, so host-vs-fused is a pure dispatch/fetch comparison.
    pm_engine = "pallas" if on_tpu else "xla"
    pm_kwargs = dict(kwargs, engine=pm_engine)
    h_pm_host = run_adaptive_dg_per_member(
        f_sin, dg_ay0, (0.0, 2.0), **pm_kwargs
    )
    h_pm_fused = run_adaptive_dg_per_member(
        f_sin, dg_ay0, (0.0, 2.0), device_loop=True, **pm_kwargs
    )
    n_pad_pm = h_pm_host[0].times.shape[1]
    row_pm = np.linspace(0.0, 2.0, dg_k0 + 1)
    row_pm = np.concatenate(
        [row_pm, np.full(n_pad_pm - dg_k0 - 1, row_pm[-1])]
    )
    pm_times0 = jnp.asarray(
        np.broadcast_to(row_pm, (dg_ab, n_pad_pm)).copy(), jnp.float32
    )
    pm_ref0 = jnp.ones((dg_ab,), bool)

    def _pm_host_run():
        t, r = pm_times0, pm_ref0
        for _ in range(dg_maxit + 1):
            t_new, r_new, diag = h_pm_host.iteration(t, r)
            d = np.asarray(diag)  # the per-iteration host fetch
            if not (d[:, -1] != 0).any():
                break
            t, r = t_new, r_new
        return d

    _pm_host_run()  # warm
    pm_host_s = min(_timeit(_pm_host_run) for _ in range(3))
    pm_fused_dev, pm_fused_s = study_device_slope(
        h_pm_fused.run_fused, pm_times0, extra=(pm_ref0,),
        pick=lambda o: jnp.sum(o[2]) + o[3].astype(jnp.float32),
        k_hi=64,
    )
    # baseline: the farm runs each member's adaptive study on the host
    # pipeline — slab count = live coarse+fine slabs actually marched
    pm_slabs = sum(2 * int(h.n_active.sum()) for h in h_pm_host)
    pm_baseline_est = pm_slabs / dg_base_rate

    # ---- 100k-IC DG slab ensemble (the reference's Main_variable_params
    # scale, python/Main_variable_params.py:234): the member-blocked grid
    # keeps each program's working set VMEM-resident at any B, so the
    # whole 102,400-member fwd+adjoint+AWR pipeline is one kernel launch
    dg100k_rate = None
    dg100k_b = 102_400
    if on_tpu:
        dg100k_y0 = jnp.asarray(
            np.random.default_rng(3).uniform(0.5, 2.0, dg100k_b), dtype
        )

        def mk_dg100k(k_calls):
            @jax.jit
            def g(y):
                for _ in range(k_calls):
                    u, v, err = dg_run(dg_times, y)
                    y = (
                        y
                        + 1e-20 * u[:, -1, -1]
                        + 1e-20 * v[:, 0, 0]
                        + 1e-20 * jnp.sum(err, axis=1)
                    )
                return y
            return g

        dg100k_elapsed, _ = chained_slope(mk_dg100k, dg100k_y0, k_hi=8)
        dg100k_rate = dg100k_b * dg_k * 2 / dg100k_elapsed

    # ---- PER-MEMBER FD adaptive ensemble, fully fused: B=1024
    # independent Main_finite_difference.py studies (each IC its own
    # padded grid + bisections + freeze), engine="pallas" (each
    # iteration's whole per-member fwd+adjoint+indicator is one kernel
    # launch with per-member step widths as traced VMEM operands) and
    # device_loop=True (the 41-iteration study is one lax.while_loop
    # dispatch). Steady-state via the returned run_fused.
    fd_pm_wall = fd_pm_dev = None
    if on_tpu:
        from adjoint_ode_adaptivity_tpu import odes as _odes
        from adjoint_ode_adaptivity_tpu.adapt.fd_loop import (
            run_adaptive_fd_per_member,
        )
        from adjoint_ode_adaptivity_tpu.march import euler_step

        fd_ode = _odes.get_ode("du/dt=sin(u)")
        fd_b, fd_maxit = 1024, 40
        fd_u0 = np.random.default_rng(0).uniform(0.5, 2.0, fd_b).astype(
            np.float32
        )
        h_fdpm = run_adaptive_fd_per_member(
            euler_step(fd_ode.f), fd_u0, (0.0, 2.0), n_steps0=2, tol=0.0,
            maxit=fd_maxit, engine="pallas", ode_f=fd_ode.f,
            device_loop=True,
        )
        fd_nodes = 2 + fd_maxit + 2
        fd_row = np.linspace(0.0, 2.0, 3)
        fd_row = np.concatenate([fd_row, np.full(fd_nodes - 3, fd_row[-1])])
        fd_t0 = jnp.asarray(
            np.broadcast_to(fd_row, (fd_b, fd_nodes)).copy(), jnp.float32
        )
        fd_na0 = jnp.full((fd_b,), 2, jnp.int32)
        fd_r0 = jnp.ones((fd_b,), bool)

        # slope-timed; the study's device time is SUB-MILLISECOND (the
        # r3 "0.38-0.68 s" wall was the ~50 MB diag-buffer fetch over
        # the tunnel), so k_hi must be large enough that ±1-2 ms of
        # dispatch noise divides down below 10% of the per-replay time
        fd_pm_dev, fd_pm_wall = study_device_slope(
            h_fdpm.run_fused, fd_t0, extra=(fd_na0, fd_r0),
            pick=lambda o: jnp.sum(o[3]) + o[5].astype(jnp.float32),
            k_hi=64, reps=5,
        )

    # ---- PER-MEMBER hp-ADAPTIVE DG-in-time (the mixed per-element-order
    # strand: dg_march.m:1's latent Ns-vector capability driven as a real
    # adaptivity axis): B independent MAIN.m studies, each member owning
    # its OWN partition AND order vector, p-until-saturated-then-h at its
    # |AWR| argmax, all vmapped into one jit and the whole maxit-iteration
    # study fused into ONE lax.while_loop dispatch (device_loop).
    # Steady-state via the returned run_fused/iteration handles (each call
    # otherwise rebuilds its jit closures — hp_loop docstring). Baseline:
    # the measured NumPy dg-pipeline slab rate over the same live-slab
    # count (2 solves/iteration counted — coarse + adjoint — ignoring the
    # fine ns+2 solve, and the NumPy rate is measured at ORDER 1 while the
    # hp study runs orders 1..n_max with ~Np^3 Newton cost and a
    # 30*Ns-point fem_setup rebuild per element in the reference: both
    # choices make the quoted speedup conservative).
    hp_pm_fused_wall = hp_pm_host_wall = hp_pm_base_est = None
    hp_pm_fused_dev = None
    hp_pm_pallas_wall = hp_pm_pallas_dev = hp_pm_base_faithful_est = None
    hp_pm_pallas_rec_wall = hp_pm_pallas_rec_dev = None
    hp_pm_pallas4k_wall = hp_pm_pallas4k_dev = hp_pm_base4k_faithful_est = None
    hp_pm_pallas4k_rec_wall = hp_pm_pallas4k_rec_dev = None
    hp4k_b = 4096
    hp_pm_iters = 0
    hp_pm_b = 512
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
            run_adaptive_dg_hp_per_member,
        )

        hp_kwargs = dict(
            k0=4, n0=1, n_max=3, mode="hp", tol=0.0, maxit=10,
            newton_iters=8,
        )
        hp_y0 = np.random.default_rng(5).uniform(0.5, 2.0, hp_pm_b).astype(
            np.float32
        )
        h_hp = run_adaptive_dg_hp_per_member(
            f_sin, hp_y0, (0.0, 2.0), device_loop=True, **hp_kwargs
        )
        hp_pm_iters = len(h_hp)

        hp_t0, hp_ns0 = h_hp.fused_args

        def hp_pick(o):
            # o = (bufs, n_done); bufs[3] = per-iteration est buffer
            return jnp.sum(o[0][3]) + o[1].astype(jnp.float32)

        hp_pm_fused_dev, hp_pm_fused_wall = study_device_slope(
            h_hp.run_fused, hp_t0, extra=(hp_ns0,), pick=hp_pick,
            k_hi=2, reps=3,
        )

        def _hp_host_run():
            return run_adaptive_dg_hp_per_member(
                f_sin, hp_y0, (0.0, 2.0), iteration=h_hp.iteration,
                **hp_kwargs
            )

        _hp_host_run()
        hp_pm_host_wall = min(_timeit(_hp_host_run) for _ in range(3))
        hp_pm_slabs = sum(2 * int(h.n_active.sum()) for h in h_hp)
        hp_pm_base_est = hp_pm_slabs / dg_base_rate

        # ORDER-MATCHED faithful baseline (VERDICT r3 next-step #3,
        # measured not asserted): every live element weighted by its OWN
        # order's pinned host rate from the fem_setup-FAITHFUL pipeline —
        # the reference rebuilds fem_setup per element with a 30·Ns-point
        # Golub-Welsch quadrature (dg_march.m:29) and per-Newton-iteration
        # operators (dg_march.m:55-60); utils/benchmarks.
        # numpy_dg_hp_faithful_baseline transliterates exactly that and
        # matches the generous pipeline's solution to machine precision.
        def _hp_faithful_cost(hist):
            cost = 0.0
            for h in hist:
                na = np.asarray(h.n_active)
                ns_arr = np.asarray(h.ns)
                live = np.arange(ns_arr.shape[1])[None, :] < na[:, None]
                for n in (1, 2, 3):
                    cnt = int(((ns_arr == n) & live).sum())
                    cost += 2.0 * cnt / pinned(
                        f"dg_faithful_order{n}_slabs_per_sec"
                    )
            return cost

        hp_pm_base_faithful_est = _hp_faithful_cost(h_hp)

        def _hp_pallas_study_slope(y0, k_hi=8, **mode_kwargs):
            """Fused-kernel hp study → (history, device_s, wall_s).

            k_hi=8 matches study_device_slope's default (the B=512 study
            is ~4 ms device under a ~27 ms dispatch floor — a k_hi=2
            slope gets swallowed by tunnel jitter and trips the
            conservative wall-clock fallback)."""
            h = run_adaptive_dg_hp_per_member(
                f_sin, y0, (0.0, 2.0), device_loop=True, engine="pallas",
                **mode_kwargs, **hp_kwargs
            )
            dev, wall = study_device_slope(
                h.run_fused, h.fused_args[0], extra=(h.fused_args[1],),
                pick=hp_pick, k_hi=k_hi,
            )
            return h, dev, wall

        # the FUSED-KERNEL engine: the whole mixed-order member pipeline
        # (coarse/fine/adjoint/AWR) is ONE pallas launch per iteration
        # (ops/pallas/dg_slab_mixed.py) inside the same device while_loop
        try:
            _, hp_pm_pallas_dev, hp_pm_pallas_wall = _hp_pallas_study_slope(
                hp_y0
            )
        except Exception:  # noqa: BLE001 - keep bench alive on kernel regress
            hp_pm_pallas_dev = hp_pm_pallas_wall = None

        # RECONSTRUCT-adjoint engine (adj_rec.m path): solves the backward
        # system at the PRIMAL order and lifts through Radau collocation —
        # an (ns+1)-row solve instead of (ns+2), so it should beat solve
        # mode (the reason the reference built adj_rec)
        hp_pm_pallas_rec_wall = hp_pm_pallas_rec_dev = None
        try:
            _, hp_pm_pallas_rec_dev, hp_pm_pallas_rec_wall = (
                _hp_pallas_study_slope(hp_y0, adjoint_mode="reconstruct")
            )
        except Exception:  # noqa: BLE001 - keep bench alive on regress
            hp_pm_pallas_rec_dev = hp_pm_pallas_rec_wall = None

        # scale past B=512 (VERDICT r3 next-step #3): the same fused-kernel
        # study at B=4096 — per-study cost drops when the kernel was
        # under-occupied at B=512
        hp_pm_pallas4k_wall = hp_pm_pallas4k_dev = None
        hp_pm_base4k_faithful_est = None
        try:
            hp4k_b = 4096
            hp4k_y0 = np.random.default_rng(6).uniform(
                0.5, 2.0, hp4k_b
            ).astype(np.float32)
            h_hp4k, hp_pm_pallas4k_dev, hp_pm_pallas4k_wall = (
                _hp_pallas_study_slope(hp4k_y0, k_hi=4)
            )
            hp_pm_base4k_faithful_est = _hp_faithful_cost(h_hp4k)
        except Exception:  # noqa: BLE001 - keep bench alive on regress
            hp_pm_pallas4k_dev = hp_pm_pallas4k_wall = None

        # reconstruct mode at the same B=4096 scale: with the per-iteration
        # indicator/partition/format overhead amortized over 8x the members
        # the (ns+1)- vs (ns+2)-row Newton saving should become visible
        # (at B=512 the two modes tie — BASELINE.md round-4 table)
        hp_pm_pallas4k_rec_wall = hp_pm_pallas4k_rec_dev = None
        try:
            _, hp_pm_pallas4k_rec_dev, hp_pm_pallas4k_rec_wall = (
                _hp_pallas_study_slope(
                    hp4k_y0, k_hi=4, adjoint_mode="reconstruct"
                )
            )
        except Exception:  # noqa: BLE001 - keep bench alive on regress
            hp_pm_pallas4k_rec_dev = hp_pm_pallas4k_rec_wall = None

    # ---- NN-training throughput (the L4 axis): per-step ResBlockSimple
    # at width 500 — the reference's LARGEST trained width
    # (Main_new_loss.py:209) — over 10 time steps, batch 8192,
    # terminal-MSE Adam epoch through the differentiable solver. The
    # reference farm budget is 10,000 epochs inside a 5-12 h RTX job
    # (Main_FD_with_net.py:57, Submit_schedule_frontera/main_shell.sh:2-4),
    # i.e. ≤0.23-0.56 epochs/s even if a job did nothing but train.
    # Chained: K adam epochs as one lax.scan inside one jit, slope-timed.
    train_rate = None
    if on_tpu:
        import optax
        from jax import random as jrand

        from adjoint_ode_adaptivity_tpu import odes as odes_mod
        from adjoint_ode_adaptivity_tpu.models.blocks import ResBlockSimple
        from adjoint_ode_adaptivity_tpu.train.loop import (
            create_train_state,
            make_per_step_train_step,
        )

        t_net = ResBlockSimple(features=500)
        t_steps, t_batch = 10, 8192
        t_dt = jnp.full((t_steps,), 0.1, jnp.float32)
        p_one = t_net.init(jrand.PRNGKey(7), jnp.ones(1), 0.0, 0.1)["params"]
        p_st = jax.tree_util.tree_map(
            lambda leaf: jnp.stack([leaf] * t_steps), p_one
        )
        t_tx = optax.adam(1e-3)
        t_state0 = create_train_state(p_st, t_tx)
        t_step = make_per_step_train_step(t_net, t_tx)
        t_ode = odes_mod.get_ode("du/dt=sin(u)")
        t_u0 = jnp.asarray(
            np.random.default_rng(11).uniform(0.5, 2.0, t_batch), jnp.float32
        )
        t_true = jnp.asarray(t_ode.exact_fwd(1.0, t_u0), jnp.float32)

        mk_train = mk_epoch_timer(
            t_state0, lambda st, u0b, i: t_step(st, t_dt, u0b, t_true)
        )
        t_elapsed, _ = chained_slope(mk_train, t_u0, k_hi=128)
        train_rate = 1.0 / t_elapsed

    # ---- same epoch with the FUSED Pallas training kernel
    # (ops/pallas/train_fused.py: forward march + terminal MSE + the
    # hand-derived reverse sweep in ONE launch — the (F × B) activation
    # sheets never leave VMEM; adam stays in optax). Same adam trajectory
    # as the XLA step (tests/test_pallas_train.py).
    train_rate_pallas = None
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.train.loop import (
            make_per_step_train_step_fused,
        )

        t_step_f = make_per_step_train_step_fused(t_tx, t_steps, 500)

        mk_train_fused = mk_epoch_timer(
            t_state0, lambda st, u0b, i: t_step_f(st, t_dt, u0b, t_true)
        )
        try:
            tf_elapsed, _ = chained_slope(mk_train_fused, t_u0, k_hi=128)
            train_rate_pallas = 1.0 / tf_elapsed
        except Exception:  # noqa: BLE001 - keep bench alive on regress
            train_rate_pallas = None

    # ---- MASKED (width-surgery capacity) fused train step: the kernel the
    # width driver auto-selects on TPU (--method width --train-engine
    # pallas). Same epoch as above at capacity 500 with every neuron
    # active, so the delta vs the plain kernel IS the per-chunk
    # neuron_mask cost (VERDICT r3 weak #4).
    train_rate_pallas_masked = None
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.models.blocks import (
            masked_params_from_simple,
        )
        from adjoint_ode_adaptivity_tpu.train.loop import (
            make_per_step_masked_train_step_fused,
        )

        try:
            pm_one = masked_params_from_simple(p_one, 500)
            pm_st = jax.tree_util.tree_map(
                lambda leaf: jnp.stack([leaf] * t_steps), pm_one
            )
            tm_state0 = create_train_state(pm_st, t_tx)
            t_nact = jnp.full((t_steps,), 500, jnp.int32)
            t_step_m = make_per_step_masked_train_step_fused(
                t_tx, t_steps, 500
            )

            mk_train_masked = mk_epoch_timer(
                tm_state0,
                lambda st, u0b, i: t_step_m(st, t_dt, t_nact, u0b, t_true),
            )
            tm_elapsed, _ = chained_slope(mk_train_masked, t_u0, k_hi=128)
            train_rate_pallas_masked = 1.0 / tm_elapsed
        except Exception:  # noqa: BLE001
            train_rate_pallas_masked = None

    # ---- dp-SHARDED fused train step on the 1-device TPU mesh: measures
    # the shard_map + psum wrapper cost (no-regression gate; the 8-way CPU
    # mesh wall-clock sanity lives in tests/test_pallas_train.py).
    train_rate_pallas_dp = None
    if on_tpu:
        try:
            from jax.sharding import Mesh

            dp_mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
            t_step_dp = make_per_step_train_step_fused(
                t_tx, t_steps, 500, mesh=dp_mesh
            )

            mk_train_dp = mk_epoch_timer(
                t_state0,
                lambda st, u0b, i: t_step_dp(st, t_dt, u0b, t_true),
            )
            td_elapsed, _ = chained_slope(mk_train_dp, t_u0, k_hi=128)
            train_rate_pallas_dp = 1.0 / td_elapsed
        except Exception:  # noqa: BLE001
            train_rate_pallas_dp = None

    # ---- MIXED (trajectory trapezoid + ramped terminal) loss — the
    # Main_new_loss.py:145-168 strand — XLA step vs the fused kernel
    # (mixed=True reads the trajectory already sitting in VMEM scratch,
    # so the per-node loss costs no extra HBM traffic; the XLA path
    # re-materializes every (F, B) step intermediate).
    train_rate_mixed = train_rate_mixed_pallas = None
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.train.loop import (
            make_mixed_loss_train_step,
            make_mixed_loss_train_step_fused,
        )

        t_nodes = jnp.pad(jnp.cumsum(t_dt), (1, 0))
        t_traj = jnp.asarray(
            jax.vmap(lambda tt: t_ode.exact_fwd(tt, t_u0))(t_nodes).T,
            jnp.float32,
        )  # (B, S+1)
        mx_steps = {
            "xla": make_mixed_loss_train_step(t_net, t_tx),
            "pallas": make_mixed_loss_train_step_fused(t_tx, t_steps, 500),
        }
        mx_rates = {}
        for eng, mx_step in mx_steps.items():
            mk_train_mixed = mk_epoch_timer(
                t_state0,
                lambda st, u0b, i, mx_step=mx_step:
                    mx_step(st, t_dt, u0b, t_traj, i),
            )
            try:
                mx_el, _ = chained_slope(
                    mk_train_mixed, t_u0, k_hi=32 if eng == "xla" else 128
                )
                mx_rates[eng] = 1.0 / mx_el
            except Exception:  # noqa: BLE001
                mx_rates[eng] = None
        train_rate_mixed = mx_rates["xla"]
        train_rate_mixed_pallas = mx_rates["pallas"]

    # ---- SHARED-net Dense training (the reference's LARGEST training
    # config: Main_FD_with_net.py:52-57 trains ResNetBlock([100,500]) for
    # 10,000 epochs x 99 batches inside a 5-12 h RTX SLURM job —
    # main_shell.sh:2-4 — i.e. <=0.23-0.56 epochs/s even if the job did
    # nothing but train). Dense chains (B,1)->(B,100)->(B,500)->(B,1) are
    # MXU work; one epoch here pushes 8192 ICs (the reference's pushes
    # 990), so the epochs/s ratio is conservative per-IC. Benched at the
    # reference's initial depth band (10 steps) and its end-of-study depth
    # (100 steps after ~100 refinements, Main_FD_with_net.py:56).
    train_shared_rate = train_shared_rate_s100 = None
    train_shared_flops = None
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.models.blocks import ResNetBlock
        from adjoint_ode_adaptivity_tpu.train.loop import (
            make_shared_train_step,
        )

        s_net = ResNetBlock((100, 500))
        s_batch = 8192
        s_params = s_net.init(
            jrand.PRNGKey(3), jnp.ones(1), 0.0, 0.1
        )["params"]
        s_tx = optax.adam(1e-4)
        s_state0 = create_train_state(s_params, s_tx)
        s_u0 = jnp.asarray(
            np.random.default_rng(13).uniform(0.5, 2.0, s_batch), jnp.float32
        )
        s_true = jnp.asarray(t_ode.exact_fwd(1.0, s_u0), jnp.float32)
        s_rates = {}
        for s_steps in (10, 100):
            s_dt = jnp.full((s_steps,), 1.0 / s_steps, jnp.float32)
            s_step = make_shared_train_step(s_net, s_tx, s_dt)

            mk_shared = mk_epoch_timer(
                s_state0,
                lambda st, u0b, i, s_step=s_step: s_step(st, u0b, s_true),
            )
            s_el, _ = chained_slope(
                mk_shared, s_u0, k_hi=64 if s_steps == 10 else 16
            )
            s_rates[s_steps] = 1.0 / s_el
        train_shared_rate = s_rates[10]
        train_shared_rate_s100 = s_rates[100]
        # matmul roofline: fwd = 2·B·steps·(1·100 + 100·500 + 500·1) MACs,
        # value_and_grad ≈ 3x fwd (each Dense backward does dX and dW)
        train_shared_flops = (
            3 * 2 * s_batch * 100 * (100 + 50_000 + 500)
            * s_rates[100]
        )

    # ---- same epochs through the FUSED Dense-chain kernel
    # (ops/pallas/train_dense_fused.py): activations VMEM-resident,
    # hidden matmuls on the MXU, backward recomputes the chain from the
    # stored scalar trajectory (4/3 of the XLA FLOPs for ~zero HBM
    # activation traffic — the XLA step measures ~700 GB/s of sheet
    # traffic at S=100 and sits at the bandwidth roofline).
    train_shared_rate_pallas = train_shared_rate_pallas_s100 = None
    train_shared_flops_pallas = None
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.train.loop import (
            make_shared_train_step_fused,
        )

        sp_rates = {}
        for s_steps in (10, 100):
            s_dt = jnp.full((s_steps,), 1.0 / s_steps, jnp.float32)
            s_step_p = make_shared_train_step_fused(
                s_tx, s_dt, (100, 500), block_members=8192
            )

            mk_shared_p = mk_epoch_timer(
                s_state0,
                lambda st, u0b, i, s_step_p=s_step_p:
                    s_step_p(st, u0b, s_true),
            )
            try:
                sp_el, _ = chained_slope(
                    mk_shared_p, s_u0, k_hi=64 if s_steps == 10 else 16
                )
                sp_rates[s_steps] = 1.0 / sp_el
            except Exception:  # noqa: BLE001
                sp_rates[s_steps] = None
        train_shared_rate_pallas = sp_rates[10]
        train_shared_rate_pallas_s100 = sp_rates[100]
        if sp_rates[100]:
            # the fused kernel recomputes the chain in backward: 4x fwd
            train_shared_flops_pallas = (
                4 * 2 * s_batch * 100 * (100 + 50_000 + 500)
                * sp_rates[100]
            )

    # ---- vector-state (d=2) ensemble through the generic XLA paths: the
    # fused kernels are scalar-state by design (all reference nets are
    # scalar, models.py:38-65); this row quantifies the d>1 fallback so
    # the capability cliff is measured, not guessed (VERDICT r3 weak #5).
    # Harmonic oscillator fwd+adj+indicator over 102,400 ICs, J=∫|u|²dt.
    vec2_rate = None
    if on_tpu:
        from adjoint_ode_adaptivity_tpu import odes as _odes2
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

        v_ode = _odes2.get_ode("harmonic_oscillator")
        v_step = euler_step(v_ode.f)
        v_steps = BENCH_CFG["fd_ensemble_vec2"]["n_steps"]
        v_rf = BENCH_CFG["fd_ensemble_vec2"]["ref_factor"]
        v_dt = jnp.full((v_steps,), 2.0 / v_steps, jnp.float32)
        v_dtf = refine_all(v_dt, v_rf)

        def _vec_val(u_f):
            return jnp.sum(
                (u_f[:-1] ** 2).sum(-1) * v_dtf
            )

        def _vec_one(u0):
            u = forward_march(v_step, u0, v_dt)
            u_fine = interp_to_fine(u, v_dt, v_dtf)
            k_vec = jax.grad(_vec_val)(u_fine)
            v = adjoint_march(v_step, u_fine, v_dtf, k_vec)
            res = residual(v_step, u_fine, v_dtf)
            return coarse_indicator((res * v).sum(-1), v_rf, "block")

        v_n_ics = BENCH_CFG["fd_ensemble_vec2"]["n_ics"]
        v_u0s = jnp.asarray(
            np.random.default_rng(21).uniform(-1, 1, (v_n_ics, 2)),
            jnp.float32,
        )

        def mk_vec(k_calls):
            @jax.jit
            def g(u0s):
                for _ in range(k_calls):
                    err = jnp.mean(jax.vmap(_vec_one)(u0s), axis=0)
                    u0s = u0s + 1e-7 * err[0]
                return u0s
            return g

        try:
            vec_best, _ = chained_slope(mk_vec, v_u0s, k_hi=16)
            vec2_rate = v_n_ics / vec_best
        except Exception:  # noqa: BLE001
            vec2_rate = None

    # fused d=2 kernel on the same problem (round 4: the vector-state
    # pipeline joins the fast path — components as separate lane carpets,
    # transposed 2x2 Jacobian applied in-kernel)
    vec2_rate_pallas = None
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.ops.pallas.fd_ensemble import (
            make_pallas_fd_ensemble_vec,
        )

        run_vec_pl = make_pallas_fd_ensemble_vec(
            lambda us, t: (us[1], -4.0 * us[0]),
            lambda us, t: ((0.0, 1.0), (-4.0, 0.0)),
            2, v_steps, v_rf, dt=2.0 / v_steps,
        )

        def mk_vec_pl(k_calls):
            @jax.jit
            def g(u0s):
                def body(u0s, _):
                    err = jnp.mean(run_vec_pl(u0s), axis=1)
                    # every step row stays live (not just [0]) and feeds
                    # the next call — XLA cannot shortcut the chain
                    return u0s + 1e-7 * jnp.sum(err), None

                u0s, _ = jax.lax.scan(body, u0s, None, length=k_calls)
                return u0s
            return g

        try:
            # the kernel is ~40 µs/call: k_hi=16 left the slope inside
            # the tunnel's ms-level dispatch jitter and BENCH_r04
            # captured a physically impossible 2.0e10 ICs/s (≈10× the
            # VPU roofline); a 128-call chain still wobbled to 6.4e9 in
            # one round-5 session (caught by check_claims' plausibility
            # gate) — scan 1024 calls so the measured section is ~40 ms
            vec_pl_best, _ = chained_slope(mk_vec_pl, v_u0s, k_hi=1024)
            vec2_rate_pallas = v_n_ics / vec_pl_best
        except Exception:  # noqa: BLE001
            vec2_rate_pallas = None

    # ---- K-envelope rows (BASELINE.md): the resident blocked-single
    # pipeline at K=10^5 (fits the 48 MB scoped-VMEM limit) and the
    # element-tiled HBM-streamed pipeline at K=10^6 — 100x beyond any
    # VMEM-resident kernel's reach
    k100k_rate = k1m_rate = k100k_tiled_rate = None
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.ops.pallas.dg_tiled import (
            make_pallas_fwd_adj_estimate_tiled_grid,
        )

        # (K, (segment, chunks) for the grid-streamed tiled variant, steps);
        # chunks=None = the resident blocked-single kernel.  Tiled configs
        # are the measured-best grid-streamed settings (BASELINE.md): the
        # chunk loop is a Pallas grid dimension, so all HBM streaming
        # overlaps compute (the old scan-of-launches variant measured
        # 12.0 / 32.3 ms on these rows).
        for kk, cfg_t, stps in (
            (100_000, None, 256),
            (100_000, (8, 4), 256),
            (1_000_000, (16, 25), 64),
        ):
            disc_k = startup_1d(2, 0.0, 2 * np.pi, kk)
            xmin_k = float(
                np.min(np.abs(np.asarray(disc_k.x)[0, :] - np.asarray(disc_k.x)[1, :]))
            )
            dt_k = 0.5 * (0.75 / a) * xmin_k
            u0_k = jnp.asarray(np.sin(disc_k.x), jnp.float32)
            lam_k = terminal_integral_cotangent(disc_k, jnp.float32)
            if cfg_t is None:
                run_k = make_pallas_fwd_adj_estimate_grid_single_blocked(
                    disc_k, a, dt_k, segment=8, n_segments=stps // 8
                )
            else:
                seg_t, chunks_t = cfg_t
                run_k = make_pallas_fwd_adj_estimate_tiled_grid(
                    disc_k, a, dt_k, segment=seg_t,
                    n_segments=stps // seg_t, chunks=chunks_t,
                )

            def mk_k(k_calls, run_k=run_k, lam_k=lam_k):
                @jax.jit
                def g(u):
                    for _ in range(k_calls):
                        uf, lam0, eta = run_k(u, jnp.float32(0.0), lam_k)
                        u = uf + 1e-20 * lam0 + 1e-20 * eta[None, :]
                    return u
                return g

            el_k, _ = chained_slope(mk_k, u0_k)
            rate_k = (n_order + 1) * kk * 2 * stps / el_k
            if cfg_t is None:
                k100k_rate = rate_k
            elif kk == 100_000:
                k100k_tiled_rate = rate_k
            else:
                k1m_rate = rate_k

    # ---- advection goal-oriented h-adaptive loop (VERDICT r4 #2: the one
    # adaptive strand without a bench row). The MAIN.m argmax-bisection
    # policy (matlab/MAIN.m:29-166) applied to the flagship PDE
    # (utils/AdvecRHS1D.m): per iteration fwd+adjoint+estimate on the
    # current (graded) mesh, bisect the worst element, CFL-recouple dt.
    # Two scales: the reference's own K≈16 (MAIN.m uses 10-20 elements)
    # and a production K=512. The study is host-looped by design (mesh/
    # operator rebuild is host float64), so the honest device time is the
    # SUM of per-iteration pipeline device-slopes over the exact meshes
    # the study visited (AdvecAdaptResult records n_steps/dt); the
    # dispatch-inclusive study wall is reported alongside. Baseline: the
    # pinned NumPy fwd+adj+estimate rate (measured at K=10⁴, where the
    # host pipeline is MOST efficient per DoF — conservative for these
    # smaller K) over the identical DoF-step count.
    advec_ad = {}
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.adapt.advec_loop import (
            _build_pallas_pipeline,
            run_adaptive_advec,
        )

        # maxit=4 → 5 meshes per scale: each fresh mesh costs a ~2 min
        # cold pipeline compile over the tunnel (validated end-to-end at
        # maxit=2 before the full run); the persistent compile cache makes
        # repeat runs cheap
        for tag, k0_a, maxit_a in (("ref", 16, 4), ("prod", 512, 4)):
            t0_wall = time.perf_counter()
            hist_a = run_adaptive_advec(
                lambda x: np.sin(x), n_order=n_order, k0=k0_a, a=a,
                final_time=0.25, cfl=0.375, maxit=maxit_a, tol=1e-30,
                engine="pallas",
            )
            wall_a = time.perf_counter() - t0_wall
            dev_total = 0.0
            dof_steps_a = 0
            for res_a in hist_a:
                disc_a = startup_1d(
                    n_order, 0.0, 2 * np.pi, len(res_a.vx) - 1, vx=res_a.vx
                )
                pipe_a = _build_pallas_pipeline(
                    disc_a, a, res_a.dt, res_a.n_steps
                )
                u0_a = jnp.broadcast_to(
                    jnp.asarray(np.sin(disc_a.x), jnp.float32)[:, None, :],
                    (disc_a.np_, 8, disc_a.k),
                )
                lam_a = jnp.broadcast_to(
                    terminal_integral_cotangent(disc_a, jnp.float32)[:, None, :],
                    (disc_a.np_, 8, disc_a.k),
                )

                def mk_a(k_calls, pipe_a=pipe_a, lam_a=lam_a):
                    @jax.jit
                    def g(u):
                        def body(u, _):
                            uf, lam0, eta = pipe_a(u, jnp.float32(0.0), lam_a)
                            return uf + 1e-20 * lam0 + 1e-20 * eta[None], None
                        u, _ = jax.lax.scan(body, u, None, length=k_calls)
                        return u
                    return g

                # tiny meshes: the per-call device time is µs-scale, so
                # chain enough calls that the slope clears dispatch jitter
                k_hi_a = 512 if k0_a <= 64 else 64
                dev_a, _ = chained_slope(mk_a, u0_a, k_hi=k_hi_a)
                dev_total += dev_a
                dof_steps_a += (
                    disc_a.np_ * disc_a.k * 2 * res_a.n_steps
                )
            base_a = dof_steps_a / pinned("advec_fd_dof_steps_per_sec")
            advec_ad[f"advec_adaptive_{tag}_iterations"] = len(hist_a)
            advec_ad[f"advec_adaptive_{tag}_final_k"] = len(hist_a[-1].vx) - 1
            advec_ad[f"advec_adaptive_{tag}_est_first"] = float(
                hist_a[0].est_total
            )
            advec_ad[f"advec_adaptive_{tag}_est_last"] = float(
                hist_a[-1].est_total
            )
            advec_ad[f"advec_adaptive_{tag}_wall_s"] = round(wall_a, 4)
            advec_ad[f"advec_adaptive_{tag}_device_s"] = round(dev_total, 6)
            advec_ad[f"advec_adaptive_{tag}_baseline_est_s"] = round(base_a, 4)
            advec_ad[f"advec_adaptive_{tag}_vs_baseline"] = base_a / dev_total
        advec_ad["advec_adaptive_vs_baseline"] = advec_ad[
            "advec_adaptive_prod_vs_baseline"
        ]

    # ---- revolve beyond-HBM demonstration (VERDICT r4 #3): the binomial
    # checkpointing the north star names, at a size the stored pipeline
    # CANNOT reach. K=10⁵ / n_steps=16384 needs a 19.7 GB stored
    # trajectory (> the chip's 16 GB HBM); the revolve composition
    # (adjoint/revolve_vjp.revolve_advec_estimate) runs it in
    # snaps·state + one unit trajectory ≈ 0.2 GB. Also measured: the
    # stored pipeline at its largest feasible n_steps=8192 (9.8 GB), for
    # the throughput-cost-of-checkpointing comparison at equal K.
    revolve_row = {}
    if on_tpu:
        from adjoint_ode_adaptivity_tpu.adjoint.revolve_vjp import (
            revolve_advec_estimate,
        )

        k_r = 100_000
        disc_r = startup_1d(2, 0.0, 2 * np.pi, k_r)
        xmin_r = float(
            np.min(np.abs(np.asarray(disc_r.x)[0, :] - np.asarray(disc_r.x)[1, :]))
        )
        dt_r = 0.5 * (0.75 / a) * xmin_r
        u0_r = jnp.asarray(np.sin(disc_r.x), jnp.float32)
        lam_r = terminal_integral_cotangent(disc_r, jnp.float32)

        # stored ceiling: n_steps=8192 → 9.8 GB trajectory (largest
        # power-of-two that fits beside workspace on 16 GB)
        st_steps = 8192
        pipe_st = make_pallas_fwd_adj_estimate_grid_single_blocked(
            disc_r, a, dt_r, segment=8, n_segments=st_steps // 8
        )
        run_st = jax.jit(
            lambda u: pipe_st(u, jnp.float32(0.0), lam_r)
        )
        outs = run_st(u0_r)
        float(sum(jnp.sum(o) for o in outs))  # compile+fetch
        best_st = np.inf
        for _ in range(3):
            t0_st = time.perf_counter()
            float(sum(jnp.sum(o) for o in run_st(u0_r)))
            best_st = min(best_st, time.perf_counter() - t0_st)
        revolve_row["revolve_stored8k_dof_steps_per_sec"] = (
            3 * k_r * 2 * st_steps / best_st
        )
        revolve_row["revolve_stored8k_traj_gb"] = round(
            st_steps * 3 * k_r * 4 / 2**30, 2
        )

        # revolve at n_steps=16384 (stored trajectory would be 19.7 GB)
        rv_steps, unit_r, snaps_r = 16384, 128, 16
        rev_run = revolve_advec_estimate(
            disc_r, a, dt_r, rv_steps, unit_steps=unit_r, snaps=snaps_r,
            segment=8,
        )
        run_rv = jax.jit(
            lambda u: rev_run(u, jnp.float32(0.0), lam_r)
        )
        outs = run_rv(u0_r)
        float(sum(jnp.sum(o) for o in outs))
        best_rv = np.inf
        for _ in range(3):
            t0_rv = time.perf_counter()
            float(sum(jnp.sum(o) for o in run_rv(u0_r)))
            best_rv = min(best_rv, time.perf_counter() - t0_rv)
        st = rev_run.revolve_stats
        revolve_row["revolve_dof_steps_per_sec"] = (
            3 * k_r * 2 * rv_steps / best_rv
        )
        revolve_row["revolve_n_steps"] = rv_steps
        revolve_row["revolve_traj_would_be_gb"] = round(
            rv_steps * 3 * k_r * 4 / 2**30, 2
        )
        revolve_row["revolve_live_state_gb"] = round(
            (st["snaps"] + unit_r) * 3 * k_r * 4 / 2**30, 3
        )
        revolve_row["revolve_snaps"] = st["snaps"]
        revolve_row["revolve_forward_units"] = st["forward_units"]
        revolve_row["revolve_recompute_factor"] = round(
            st["forward_units"] / st["n_units"], 4
        )
        # measured cost factor vs the stored pipeline at equal K (per
        # DoF-step), to compare against the planner's structural bound:
        # work ≈ (5 + fwd_recompute_per_step) vs stored's 5 equivalents
        revolve_row["revolve_vs_stored_per_step_cost"] = round(
            (best_rv / rv_steps) / (best_st / st_steps), 4
        )

    full = (
            {
                "metric": "fwd+adjoint DoF-steps/sec (1D DG advection, K=10k, N=2)",
                "value": throughput,
                "unit": "DoF-steps/s",
                "vs_baseline": throughput / baseline_dsps,
                "elapsed_s": round(batch_elapsed or best, 4),
                "elapsed_s_incl_dispatch": round(
                    (t1_batched if throughput_batched else t1_single), 4
                ),
                "batch": batch if throughput_batched else 1,
                "dof_steps_per_sec_single_state": throughput_single,
                "elapsed_s_single_state": round(best, 4),
                "n_steps": n_steps,
                "baseline_dof_steps_per_sec": baseline_dsps,
                "backend": jax.default_backend(),
                "tpu_outage_fallback": tpu_outage,
                "kernel": "pallas-fused" if on_tpu else "xla",
                "j_value": j_value,
                "sum_eta": sum_eta,
                "dof_steps_per_sec_credited": throughput_credited,
                "effectivity_abs_error_f64": eff_abs,
                "effectivity_rel_error_f64": eff_rel,
                "effectivity_gap_f64": eff_gap,
                "ensemble_ics_per_sec": n_ics / ens_best,
                "ensemble_dof_steps_per_sec": ens_throughput,
                "ensemble_n_ics": n_ics,
                "ensemble_kernel": ens_kernel,
                "ensemble_ics_per_sec_fastsin": ens_fast_rate,
                "burgers_limited_dof_steps_per_sec": burgers_throughput,
                "burgers_limited_single_state_dof_steps_per_sec": burgers_throughput_1,
                "effectivity_rel_error_f64_n3": eff_rel_n3,
                "effectivity_abs_error_f64_n3": eff_abs_n3,
                "effectivity_rel_error_f64_n7": eff_rel_n7,
                "effectivity_abs_error_f64_n7": eff_abs_n7,
                "dg_slab_solves_per_sec": dg_rate,
                "dg_slab_solves_per_sec_fastsin": dg_fast_rate,
                "dg_kernel": dg_kernel,
                "dg_elapsed_s": round(dg_elapsed, 4),
                "dg_batch": dg_b,
                "dg_k_elements": dg_k,
                "dg_baseline_slab_solves_per_sec": dg_base_rate,
                "dg_vs_baseline": dg_rate / dg_base_rate,
                "dg_adaptive_wallclock_s": round(dg_adaptive_wallclock, 4),
                "dg_adaptive_baseline_wallclock_est_s": round(
                    dg_adaptive_baseline_est, 4
                ),
                # DEPRECATED name dg_adaptive_vs_baseline: this is the
                # HOST-LOOPED study wall (per-iteration dispatch+fetch),
                # kept for cross-round comparability — the production
                # number is dg_adaptive_fused_vs_baseline (device_loop)
                "dg_adaptive_hostloop_vs_baseline": dg_adaptive_baseline_est
                / dg_adaptive_wallclock,
                "dg_adaptive_ensemble": dg_ab,
                "dg_adaptive_iterations": len(dg_hist),
                "dg_adaptive_pm_host_wall_s": round(pm_host_s, 4),
                "dg_adaptive_pm_fused_wall_s": round(pm_fused_s, 4),
                "dg_adaptive_pm_fused_device_s": round(pm_fused_dev, 4),
                "dg_adaptive_pm_fused_speedup": round(
                    pm_host_s / pm_fused_s, 2
                ),
                "dg_adaptive_pm_vs_baseline": pm_baseline_est / pm_fused_dev,
                "dg_adaptive_pm_engine": pm_engine,
                "dg_slab_100k_solves_per_sec": dg100k_rate,
                "dg_slab_100k_batch": dg100k_b,
                "train_epochs_per_sec_w500_b8192": train_rate,
                "train_epochs_per_sec_w500_b8192_pallas": train_rate_pallas,
                "fd_adaptive_pm_fused_wall_s": None
                if fd_pm_wall is None else round(fd_pm_wall, 4),
                "fd_adaptive_pm_fused_device_s": None
                if fd_pm_dev is None else round(fd_pm_dev, 4),
                "fd_adaptive_pm_per_study_ms": None
                if fd_pm_dev is None else round(fd_pm_dev / fd_b * 1e3, 4),
                "hp_adaptive_pm_fused_wall_s": None
                if hp_pm_fused_wall is None else round(hp_pm_fused_wall, 4),
                "hp_adaptive_pm_fused_device_s": None
                if hp_pm_fused_dev is None else round(hp_pm_fused_dev, 4),
                "hp_adaptive_pm_host_wall_s": None
                if hp_pm_host_wall is None else round(hp_pm_host_wall, 4),
                "hp_adaptive_pm_fused_speedup": None
                if hp_pm_fused_wall is None
                else round(hp_pm_host_wall / hp_pm_fused_wall, 2),
                "hp_adaptive_pm_vs_baseline": None
                if hp_pm_fused_dev is None
                else hp_pm_base_est / hp_pm_fused_dev,
                "hp_adaptive_pm_pallas_wall_s": None
                if hp_pm_pallas_wall is None else round(hp_pm_pallas_wall, 4),
                "hp_adaptive_pm_pallas_device_s": None
                if hp_pm_pallas_dev is None else round(hp_pm_pallas_dev, 4),
                "hp_adaptive_pm_pallas_vs_xla": None
                if hp_pm_pallas_dev is None or hp_pm_fused_dev is None
                else round(hp_pm_fused_dev / hp_pm_pallas_dev, 2),
                "hp_adaptive_pm_pallas_vs_baseline": None
                if hp_pm_pallas_dev is None
                else hp_pm_base_est / hp_pm_pallas_dev,
                "hp_adaptive_pm_ensemble": hp_pm_b,
                "hp_adaptive_pm_iterations": hp_pm_iters,
                "k100k_resident_dof_steps_per_sec": k100k_rate,
                "k100k_tiled_grid_dof_steps_per_sec": k100k_tiled_rate,
                "k1m_tiled_dof_steps_per_sec": k1m_rate,
                # --- round-4 additions ---
                # live host-baseline draws (ratios divide by the PINNED
                # constants above; these show drift)
                "baseline_dof_steps_per_sec_live": baseline_dsps_live,
                "dg_baseline_slab_solves_per_sec_live": dg_base_rate_live,
                # fused-dispatch ensemble-mean adaptive loop
                "dg_adaptive_fused_wall_s": round(dg_adaptive_fused_wall, 4),
                "dg_adaptive_fused_device_s": round(
                    dg_adaptive_fused_dev, 4
                ),
                "dg_adaptive_fused_vs_baseline": dg_adaptive_baseline_est
                / dg_adaptive_fused_dev,
                # hp strand vs the fem_setup-faithful order-matched baseline
                "hp_adaptive_pm_base_faithful_est_s": None
                if hp_pm_base_faithful_est is None
                else round(hp_pm_base_faithful_est, 4),
                "hp_adaptive_pm_pallas_vs_faithful_baseline": None
                if hp_pm_pallas_dev is None or hp_pm_base_faithful_est is None
                else hp_pm_base_faithful_est / hp_pm_pallas_dev,
                "hp_adaptive_pm_pallas_reconstruct_wall_s": None
                if hp_pm_pallas_rec_wall is None
                else round(hp_pm_pallas_rec_wall, 4),
                "hp_adaptive_pm_pallas_reconstruct_device_s": None
                if hp_pm_pallas_rec_dev is None
                else round(hp_pm_pallas_rec_dev, 4),
                "hp_adaptive_pm_pallas4k_wall_s": None
                if hp_pm_pallas4k_wall is None
                else round(hp_pm_pallas4k_wall, 4),
                "hp_adaptive_pm_pallas4k_device_s": None
                if hp_pm_pallas4k_dev is None
                else round(hp_pm_pallas4k_dev, 4),
                "hp_adaptive_pm_pallas4k_vs_faithful_baseline": None
                if hp_pm_pallas4k_dev is None
                or hp_pm_base4k_faithful_est is None
                else hp_pm_base4k_faithful_est / hp_pm_pallas4k_dev,
                "hp_adaptive_pm_4k_ensemble": hp4k_b,
                "hp_adaptive_pm_pallas4k_reconstruct_wall_s": None
                if hp_pm_pallas4k_rec_wall is None
                else round(hp_pm_pallas4k_rec_wall, 4),
                "hp_adaptive_pm_pallas4k_reconstruct_device_s": None
                if hp_pm_pallas4k_rec_dev is None
                else round(hp_pm_pallas4k_rec_dev, 4),
                # masked-capacity and dp-sharded fused train steps
                "train_epochs_per_sec_w500_b8192_pallas_masked":
                    train_rate_pallas_masked,
                "train_epochs_per_sec_w500_b8192_pallas_dp":
                    train_rate_pallas_dp,
                # mixed (trajectory+ramped-terminal) loss strand
                # (Main_new_loss.py:145-168)
                "train_mixed_epochs_per_sec_w500_b8192": train_rate_mixed,
                "train_mixed_epochs_per_sec_w500_b8192_pallas":
                    train_rate_mixed_pallas,
                # shared-net Dense strand (reference's largest training
                # config; ceiling ≤0.56 epochs/s from the SLURM budget)
                "train_shared_epochs_per_sec_w100x500_b8192_s10":
                    train_shared_rate,
                "train_shared_epochs_per_sec_w100x500_b8192_s100":
                    train_shared_rate_s100,
                "train_shared_matmul_flops_per_sec": train_shared_flops,
                "train_shared_epochs_per_sec_w100x500_b8192_s10_pallas":
                    train_shared_rate_pallas,
                "train_shared_epochs_per_sec_w100x500_b8192_s100_pallas":
                    train_shared_rate_pallas_s100,
                "train_shared_matmul_flops_per_sec_pallas":
                    train_shared_flops_pallas,
                "train_shared_vs_reference_ceiling": None
                if train_shared_rate_s100 is None
                else train_shared_rate_s100 / 0.56,
                "train_shared_pallas_vs_reference_ceiling": None
                if train_shared_rate_pallas_s100 is None
                else train_shared_rate_pallas_s100 / 0.56,
                # vector-state (d=2) XLA fallback at ensemble scale
                "vec2_ensemble_ics_per_sec": vec2_rate,
                "vec2_ensemble_ics_per_sec_pallas": vec2_rate_pallas,
                # advection h-adaptive study + revolve beyond-HBM rows
                **advec_ad,
                **revolve_row,
            }
    )

    # full record: file + stderr (humans/judge); stdout gets ONE compact
    # line that always fits the driver's tail-capture window — r3's
    # BENCH_r03.json had parsed:null because the full line was truncated
    # mid-line by that window (VERDICT r3 next-step #9)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_local.json"), "w"
    ) as f:
        json.dump(full, f, indent=1)
    print(json.dumps(full), file=sys.stderr)

    def _sig(x, n=4):
        if x is None or not isinstance(x, (int, float)):
            return x
        return float(f"%.{n}g" % x)

    compact_keys = [
        "vs_baseline", "backend", "kernel",
        "dg_vs_baseline", "dg_adaptive_fused_vs_baseline",
        "dg_adaptive_pm_vs_baseline",
        "hp_adaptive_pm_pallas_vs_faithful_baseline",
        "train_epochs_per_sec_w500_b8192_pallas",
        "train_shared_epochs_per_sec_w100x500_b8192_s100",
        "train_shared_epochs_per_sec_w100x500_b8192_s100_pallas",
        "train_shared_matmul_flops_per_sec_pallas",
        "effectivity_rel_error_f64",
        "ensemble_dof_steps_per_sec", "dg_slab_solves_per_sec",
        "k1m_tiled_dof_steps_per_sec",
        "advec_adaptive_vs_baseline", "revolve_dof_steps_per_sec",
    ]
    compact = {
        "metric": full["metric"],
        "value": _sig(full["value"], 6),
        "unit": "DoF-steps/s",
    }
    compact.update({k: _sig(full.get(k)) for k in compact_keys})
    compact["detail"] = "BENCH_local.json"
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
