"""Adaptive DG-in-time refinement loop — the matlab/MAIN.m driver.

Per iteration: coarse DG solve (order n), fine solve (n+2) for the
effectivity report, adjoint march at n+1, per-element adjoint-weighted
residual, bisect the element with the largest |contribution|
(MAIN.m:137-141), repeat.

Two modes:
- dynamic (default off-TPU): the mesh grows by one element per iteration and
  each iteration jits at its own (small) static shape;
- padded (``padded=True``): the partition is padded with zero-width slabs to
  ``max_elements`` and the whole per-iteration pipeline jits ONCE — a
  zero-width DG slab solve is an exact identity (``(Sᵀ+B)U = −e_L u_prev``
  has the constant solution), the adjoint on it is inert, and its error
  contribution is exactly zero (verified in tests), so refinement changes
  data, never shapes. This is what makes the loop usable through the slow
  TPU compile path.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from adjoint_ode_adaptivity_tpu.adjoint.dg_time import (
    dg_adjoint_march,
    dg_adjoint_reconstruct,
    dg_awr_from_adjoint,
    dg_element_functional,
)
from adjoint_ode_adaptivity_tpu.march.dg_time import dg_march, dg_time_operators

__all__ = [
    "DGAdaptResult",
    "run_adaptive_dg",
    "run_adaptive_dg_ensemble",
    "DGPerMemberAdaptResult",
    "run_adaptive_dg_per_member",
]


def _resumed_history(history):
    """Early-return wrapper for a resumed-already-complete run: keeps the
    wrapped-return attribute contract (``.iteration``/``.run_fused``/
    ``.fused_args`` present); None = nothing prebuilt, a warm-reuse caller
    passing ``iteration=None`` simply rebuilds."""

    class _H(list):
        pass

    out = _H(history)
    out.iteration = None
    out.run_fused = None
    out.fused_args = None
    return out


class DGAdaptResult(NamedTuple):
    times: np.ndarray  # partition at this iteration
    u: np.ndarray  # (K, Np) coarse primal
    v: np.ndarray  # (K, Np+1) adjoint
    err: np.ndarray  # (K,) element contributions
    j_coarse: float
    j_fine: float
    effectivity_gap: float  # JuH − Juh (MAIN.m:55-64)
    est_total: float  # Σ err (MAIN.m:75-76)


def _make_dg_iteration(f, g, g_u, ops_p, ops_a, ops_f, adjoint_mode="solve"):
    """Build the jitted per-iteration pipeline (operators closed over as
    constants; compiles once per run at a fixed padded shape).

    ``adjoint_mode``: 'solve' marches the adjoint directly at order n+1
    (adj_march.m); 'reconstruct' solves it at the primal's order and lifts
    it to n+1 through Radau collocation (adj_rec.m) before weighting the
    residual."""

    @jax.jit
    def iteration(times, y0):
        res_p = dg_march(ops_p, f, times, y0)
        res_f = dg_march(ops_f, f, times, y0)
        if adjoint_mode == "reconstruct":
            adj_low = dg_adjoint_march(ops_p, f, res_p.u, times, y0, g_u=g_u)
            v_rec = dg_adjoint_reconstruct(ops_p, adj_low.v, times)
            err = dg_awr_from_adjoint(ops_a, f, res_p.u, times, y0, v_rec)
            adj = adj_low._replace(v=v_rec, err=err)
        else:
            adj = dg_adjoint_march(ops_a, f, res_p.u, times, y0, g_u=g_u)
        j_coarse = dg_element_functional(ops_p, res_p.u, times, g)
        j_fine = dg_element_functional(ops_f, res_f.u, times, g)
        # padded bisection: zero-width slabs contribute exactly zero error
        # and can never win the argmax
        ref_i = jnp.argmax(jnp.abs(adj.err))
        mid = 0.5 * (times[ref_i] + times[ref_i + 1])
        idx = jnp.arange(times.shape[0])
        shifted = times[jnp.maximum(idx - 1, 0)]
        times_new = jnp.where(
            idx <= ref_i, times, jnp.where(idx == ref_i + 1, mid, shifted)
        )
        return res_p.u, adj.v, adj.err, j_coarse, j_fine, times_new

    return iteration


class DGEnsembleAdaptResult(NamedTuple):
    times: np.ndarray  # shared partition at this iteration
    err_mean: np.ndarray  # (K,) ensemble-mean |contribution| per element
    j_mean: float  # ensemble-mean functional
    est_total_mean: float  # mean over members of Σ_k err_k


def run_adaptive_dg_ensemble(
    f: Callable,
    y0s,  # (B,) initial-condition ensemble
    t_span: tuple[float, float],
    *,
    n_order: int = 1,
    k0: int = 4,
    g: Callable = lambda u, t: u,
    g_u: Callable = lambda u, t: jnp.ones_like(u),
    tol: float = 0.0,
    maxit: int = 10,
    n_gq: int | None = None,
    newton_iters: int | None = None,
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
    engine: str = "xla",
    mesh=None,
    mesh_axis: str = "data",
    checkpoint_dir: str | None = None,
    iteration=None,
    device_loop: bool = False,
) -> list[DGEnsembleAdaptResult]:
    """Ensemble-signal adaptive DG-in-time loop — the reference's
    refinement-by-ensemble-mean indicator (Main_variable_params.py:330-341)
    applied to the MATLAB strand (MAIN.m:29-166), TPU-batched.

    All B members share one partition; each iteration runs the batched
    fwd(n) + adjoint(n+1) + per-element AWR pipeline
    (:mod:`~adjoint_ode_adaptivity_tpu.march.dg_batched`) and bisects the
    element with the largest ensemble-mean |contribution|. The partition is
    padded with zero-width slabs to ``k0 + maxit`` elements so the whole
    iteration compiles ONCE (zero-width slabs are exact identities for both
    marches and contribute exactly zero error — the repo-wide padding
    contract). ``newton_iters`` switches the forward Newton to a fixed
    static iteration count (the f32/TPU fast path). ``engine="pallas"``
    fuses the whole pipeline into one kernel launch
    (:mod:`~adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab`, ~7.5× the XLA
    path on TPU; requires ``newton_iters`` and an elementwise ``f``).
    ``iteration``: a prebuilt jitted per-iteration function taken from a
    prior identically-configured call's return value (``history.iteration``
    attribute) — lets a caller (bench.py) time a genuinely warm run, since
    each call otherwise builds a fresh jit closure that cannot hit the
    previous call's cache.

    ``mesh``: a :class:`jax.sharding.Mesh` to data-parallelize the ensemble
    over ``mesh_axis`` — members shard across devices (the dp scale-out of
    Main_variable_params.py's ensemble study), the partition and the
    bisection decision stay replicated, and the ensemble means reduce
    across the mesh inside the jit. The XLA engine shards by layout
    propagation from the member axis; the Pallas engine composes the fused
    slab kernel per-device via
    :func:`~adjoint_ode_adaptivity_tpu.parallel.ensemble.ensemble_batched`
    (B / n_devices must be a multiple of 8). Decisions are pinned equal to
    the single-device loop in tests (f32 roundoff on the signal).

    ``device_loop=True``: the whole study runs as one ``lax.while_loop``
    dispatch — on-device |mean Σerr|-vs-tol stopping test, per-iteration
    diagnostics in a preallocated buffer, one fetch at the end; history
    bit-identical to the per-iteration mode (tested). Checkpointing
    degrades to a single end-of-run save (resume still works).
    """
    from adjoint_ode_adaptivity_tpu.march.dg_batched import (
        dg_adjoint_march_batched,
        dg_element_functional_batched,
        dg_march_batched,
    )

    if engine not in ("xla", "pallas"):
        raise ValueError(engine)
    ops_p = dg_time_operators(n_order, n_gq)
    ops_a = dg_time_operators(n_order + 1, None if n_gq is None else n_gq + 2)
    y0s = jnp.asarray(y0s)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = mesh.shape[mesh_axis]
        if y0s.shape[0] % n_dev:
            raise ValueError(
                f"B={y0s.shape[0]} must divide over {n_dev} mesh devices"
            )
        # member axis sharded, everything downstream (partition, argmax,
        # means) replicated — XLA inserts the cross-device reductions
        y0s = jax.device_put(y0s, NamedSharding(mesh, PartitionSpec(mesh_axis)))

    # restore BEFORE sizing the padded partition: a resumed run may ask for
    # fewer OR more iterations than the killed one, and the engines below
    # bake the padded element count in — max_k must cover both
    history: list[DGEnsembleAdaptResult] = []
    it0 = 0
    restored_times = None
    restored_n_active = None
    if checkpoint_dir is not None:
        from adjoint_ode_adaptivity_tpu.train.checkpoint import (
            latest_step,
            restore_checkpoint_raw,
        )

        if latest_step(checkpoint_dir) is not None:
            raw = restore_checkpoint_raw(checkpoint_dir)
            history = [
                DGEnsembleAdaptResult(
                    times=np.asarray(h["times"]),
                    err_mean=np.asarray(h["err_mean"]),
                    j_mean=float(h["j_mean"]),
                    est_total_mean=float(h["est_total_mean"]),
                )
                for h in raw["history"]
            ]
            restored_times = np.asarray(raw["times"])
            restored_n_active = int(raw["n_active"])
            it0 = len(history)
            if abs(history[-1].est_total_mean) < tol:
                return _resumed_history(history)
    max_k = k0 + maxit + 1
    if restored_times is not None:
        max_k = max(max_k, len(restored_times) - 1)

    if iteration is not None:
        pass  # caller-supplied prebuilt jitted iteration (bench reuse)
    elif engine == "pallas":
        from adjoint_ode_adaptivity_tpu.ops.pallas import ensure_scoped_vmem
        from adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab import (
            make_pallas_dg_estimate_ensemble,
        )

        ensure_scoped_vmem()
        pallas_run = make_pallas_dg_estimate_ensemble(
            ops_p, ops_a, f, None, max_k, g_u=g_u,
            newton_iters=newton_iters or 8,
            interpret=jax.default_backend() != "tpu",
        )
        if mesh is not None:
            # pallas_call cannot be auto-partitioned: compose the fused
            # kernel per-device over the member axis
            from adjoint_ode_adaptivity_tpu.parallel.ensemble import (
                ensemble_batched,
            )

            _slab_dp = ensemble_batched(
                lambda y, t, _run=pallas_run: _run(t, y), mesh, axis=mesh_axis
            )
            pallas_run = lambda times, y: _slab_dp(y, times)  # noqa: E731

    @jax.jit
    def _built_iteration(times):
        if engine == "pallas":
            u, _v, err = pallas_run(times, y0s)
            j_mean = jnp.mean(
                dg_element_functional_batched(ops_p, u, times, g)
            )
        else:
            fwd = dg_march_batched(
                ops_p, f, times, y0s,
                newton_tol=newton_tol, newton_maxit=newton_maxit,
                newton_iters=newton_iters,
            )
            adj = dg_adjoint_march_batched(
                ops_a, f, fwd.u, times, y0s, g_u=g_u
            )
            err = adj.err
            j_mean = jnp.mean(
                dg_element_functional_batched(ops_p, fwd.u, times, g)
            )
        err_mean = jnp.mean(jnp.abs(err), axis=0)  # (K,)
        est_total = jnp.mean(jnp.sum(err, axis=1))
        # padded bisection (zero-width slabs can never win the argmax)
        ref_i = jnp.argmax(err_mean)
        mid = 0.5 * (times[ref_i] + times[ref_i + 1])
        idx = jnp.arange(times.shape[0])
        shifted = times[jnp.maximum(idx - 1, 0)]
        times_new = jnp.where(
            idx <= ref_i, times, jnp.where(idx == ref_i + 1, mid, shifted)
        )
        # one packed diagnostics vector -> a single host fetch per
        # iteration (this environment's tunnel has a ~27 ms RPC floor per
        # fetch; times_new never leaves the device)
        diag = jnp.concatenate(
            [times, err_mean, jnp.stack([j_mean, est_total])]
        )
        return times_new, diag

    if iteration is None:
        iteration = _built_iteration
    n_pad = max_k + 1  # node slots; max_k element slots
    if restored_times is not None:
        t_res = restored_times
        if len(t_res) < n_pad:  # re-pad (zero-width slabs: exact identity)
            t_res = np.concatenate(
                [t_res, np.full(n_pad - len(t_res), t_res[-1])]
            )
        times = jnp.asarray(t_res)
        n_active = restored_n_active
    else:
        times_host = np.linspace(t_span[0], t_span[1], k0 + 1)
        times_host = np.concatenate(
            [times_host, np.full(max_k - k0, times_host[-1])]
        )
        times = jnp.asarray(times_host)
        n_active = k0

    if device_loop:
        n_diag = n_pad + max_k + 2

        @jax.jit
        def _run_fused(times):
            diag_buf = jnp.zeros((maxit + 1, n_diag), jnp.asarray(times).dtype)

            def body(carry):
                t, buf, it, _ = carry
                t_new, diag = iteration(t)
                done = jnp.abs(diag[n_pad + max_k + 1]) < tol
                zero = jnp.zeros_like(it)
                buf = jax.lax.dynamic_update_slice(
                    buf, diag[None].astype(buf.dtype), (it, zero)
                )
                t = jnp.where(done, t, t_new)
                return (t, buf, it + 1, ~done)

            def cond(carry):
                _, _, it, cont = carry
                return (it <= maxit) & cont

            t_f, diag_buf, n_done, _ = jax.lax.while_loop(
                cond, body,
                (jnp.asarray(times), diag_buf, jnp.int32(it0),
                 jnp.array(True)),
            )
            return t_f, diag_buf, n_done

        t_f, diag_buf, n_done = _run_fused(times)
        n_done = int(n_done)
        diag_buf = np.asarray(diag_buf)
        for i in range(it0, n_done):
            d = diag_buf[i]
            na = n_active + (i - it0)
            history.append(
                DGEnsembleAdaptResult(
                    times=d[: na + 1].copy(),
                    err_mean=d[n_pad : n_pad + na].copy(),
                    j_mean=float(d[n_pad + max_k]),
                    est_total_mean=float(d[n_pad + max_k + 1]),
                )
            )
        if checkpoint_dir is not None and n_done > it0:
            from adjoint_ode_adaptivity_tpu.train.checkpoint import (
                save_checkpoint,
            )

            done_final = abs(history[-1].est_total_mean) < tol
            save_checkpoint(
                checkpoint_dir,
                len(history),
                {
                    "times": np.asarray(t_f),
                    "n_active": n_active + (n_done - 1 - it0)
                    + (0 if done_final else 1),
                    "history": [dict(r._asdict()) for r in history],
                },
            )

        class _FusedHistory(list):
            pass

        out = _FusedHistory(history)
        out.iteration = iteration
        out.run_fused = _run_fused
        return out

    for _ in range(it0, maxit + 1):
        times_new, diag = iteration(times)
        diag = np.asarray(diag)
        t_h, err_mean = diag[:n_pad], diag[n_pad : n_pad + max_k]
        j_mean, est_total = diag[n_pad + max_k], diag[n_pad + max_k + 1]
        history.append(
            DGEnsembleAdaptResult(
                times=t_h[: n_active + 1].copy(),
                err_mean=err_mean[:n_active],
                j_mean=float(j_mean),
                est_total_mean=float(est_total),
            )
        )
        done = abs(history[-1].est_total_mean) < tol
        if not done:
            times = times_new
            n_active += 1
        if checkpoint_dir is not None:
            from adjoint_ode_adaptivity_tpu.train.checkpoint import (
                save_checkpoint,
            )

            save_checkpoint(
                checkpoint_dir,
                len(history),
                {
                    "times": np.asarray(times),
                    "n_active": n_active,
                    "history": [dict(r._asdict()) for r in history],
                },
            )
        if done:
            break

    class _History(list):
        pass

    out = _History(history)
    out.iteration = iteration  # reusable prebuilt jit (see docstring)
    return out


class DGPerMemberAdaptResult(NamedTuple):
    times: np.ndarray  # (B, n_pad+1) padded partitions (zero-width tail)
    n_active: np.ndarray  # (B,) live slab count per member
    err: np.ndarray  # (B, n_pad) contributions (exactly 0 on padding)
    j: np.ndarray  # (B,) functional per member
    est_total: np.ndarray  # (B,) Σ_k err_k per member
    n_refining: int  # members still above tol AFTER this iteration


def run_adaptive_dg_per_member(
    f: Callable,
    y0s,  # (B,) initial-condition ensemble
    t_span: tuple[float, float],
    *,
    n_order: int = 1,
    k0: int = 4,
    g: Callable = lambda u, t: u,
    g_u: Callable = lambda u, t: jnp.ones_like(u),
    tol: float = 0.0,
    maxit: int = 10,
    n_gq: int | None = None,
    newton_iters: int | None = None,
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
    engine: str = "xla",
    mesh=None,
    mesh_axis: str = "data",
    checkpoint_dir: str | None = None,
    iteration=None,
    device_loop: bool = False,
) -> list[DGPerMemberAdaptResult]:
    """PER-MEMBER adaptive DG-in-time: every ensemble member owns its own
    partition, bisects its own largest-|AWR| element, and freezes
    independently once its |Σ err| drops below ``tol``.

    This is the reference's job-farm semantics — one MAIN.m:29-166
    adaptive run per initial condition, submitted as thousands of serial
    SLURM jobs (Submit_schedule_frontera/main_serial.sh) — collapsed into
    ONE compile-once jit: ``times`` is a (B, n_pad+1) array of per-member
    partitions (the batched marches take per-member times natively,
    ``march.dg_batched._norm_times``), refinement is a per-row
    shift-insert, and converged members are frozen by a ``where`` on the
    member axis so shapes never change. Padding slabs are zero-width —
    exact identities with exactly-zero contributions (the repo-wide
    padding contract), so they can never win a member's argmax.

    ``engine="pallas"`` fuses the whole per-member pipeline into the one
    DG-slab kernel launch (per-member slab geometry rides as (8, b8)
    width/left-edge tiles). ``mesh`` data-parallelizes members across
    devices exactly as in :func:`run_adaptive_dg_ensemble` — decisions
    are per-member, so dp needs no cross-device reduction at all.
    Checkpoint/resume mirrors the ensemble loop (orbax round-trip of the
    padded partitions + per-member masks each iteration).

    ``device_loop=True`` runs the ENTIRE adaptive loop on device: a
    ``lax.while_loop`` over adaptive iterations carries (times, refining)
    and writes each iteration's packed diagnostics row into a
    preallocated (maxit+1, B, ·) buffer with ``dynamic_update_slice``,
    stopping early on device when no member is still refining. One
    dispatch and ONE host fetch replace the per-iteration
    dispatch+fetch round trips — on this harness those cost ~52 ms each,
    more than the per-iteration compute itself at B≲10³. History is
    reconstructed on the host from the buffer, bit-identical to the
    per-iteration mode (pinned in tests). Checkpointing degrades to a
    single save at the end of the run (resume still works; there are no
    intermediate host syncs to checkpoint from).
    """
    from adjoint_ode_adaptivity_tpu.march.dg_batched import (
        dg_adjoint_march_batched,
        dg_element_functional_batched,
        dg_march_batched,
    )

    if engine not in ("xla", "pallas"):
        raise ValueError(engine)
    ops_p = dg_time_operators(n_order, n_gq)
    ops_a = dg_time_operators(n_order + 1, None if n_gq is None else n_gq + 2)
    y0s = jnp.asarray(y0s)
    b = y0s.shape[0]
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = mesh.shape[mesh_axis]
        if b % n_dev:
            raise ValueError(f"B={b} must divide over {n_dev} mesh devices")
        # everything is per-member: y0s, times, and the refining mask all
        # shard on the member axis; no collective is ever needed
        sharding = NamedSharding(mesh, PartitionSpec(mesh_axis))
        y0s = jax.device_put(y0s, sharding)

    history: list[DGPerMemberAdaptResult] = []
    it0 = 0
    restored = None
    if checkpoint_dir is not None:
        from adjoint_ode_adaptivity_tpu.train.checkpoint import (
            latest_step,
            restore_checkpoint_raw,
        )

        if latest_step(checkpoint_dir) is not None:
            raw = restore_checkpoint_raw(checkpoint_dir)
            history = [
                DGPerMemberAdaptResult(
                    times=np.asarray(h["times"]),
                    n_active=np.asarray(h["n_active"]),
                    err=np.asarray(h["err"]),
                    j=np.asarray(h["j"]),
                    est_total=np.asarray(h["est_total"]),
                    n_refining=int(h["n_refining"]),
                )
                for h in raw["history"]
            ]
            restored = raw
            it0 = len(history)
            if history[-1].n_refining == 0:
                return _resumed_history(history)
    max_k = k0 + maxit + 1
    if restored is not None:
        max_k = max(max_k, np.asarray(restored["times"]).shape[1] - 1)
    n_pad = max_k + 1  # node slots per member
    if restored is not None and history and history[0].times.shape[1] < n_pad:
        # re-pad restored rows to this run's width so the whole history is
        # shape-uniform (zero-width slabs at t_end; padding err is exactly
        # 0 — same hardening as the per-member FD loop)
        def _repad(r):
            wt = n_pad - r.times.shape[1]
            return r._replace(
                times=np.concatenate(
                    [r.times, np.repeat(r.times[:, -1:], wt, axis=1)], axis=1
                ),
                err=np.concatenate(
                    [r.err, np.zeros((r.err.shape[0], wt))], axis=1
                ),
            )

        history = [_repad(r) for r in history]

    if iteration is not None:
        pass  # caller-supplied prebuilt jitted iteration (bench reuse)
    else:
        if engine == "pallas":
            from adjoint_ode_adaptivity_tpu.ops.pallas import (
                ensure_scoped_vmem,
            )
            from adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab import (
                make_pallas_dg_estimate_ensemble,
            )

            ensure_scoped_vmem()
            pallas_run = make_pallas_dg_estimate_ensemble(
                ops_p, ops_a, f, None, max_k, g_u=g_u,
                newton_iters=newton_iters or 8,
                interpret=jax.default_backend() != "tpu",
            )
            if mesh is not None:
                from adjoint_ode_adaptivity_tpu.parallel.ensemble import (
                    ensemble_batched,
                )

                # per-member times shard WITH the members (extra 0)
                _slab_dp = ensemble_batched(
                    lambda y, t, _run=pallas_run: _run(t, y),
                    mesh, axis=mesh_axis, shard_extras={0},
                )
                pallas_run = lambda times, y: _slab_dp(y, times)  # noqa: E731

        @jax.jit
        def _built_iteration(times, refining):
            if engine == "pallas":
                u, _v, err = pallas_run(times, y0s)
            else:
                fwd = dg_march_batched(
                    ops_p, f, times, y0s,
                    newton_tol=newton_tol, newton_maxit=newton_maxit,
                    newton_iters=newton_iters,
                )
                err = dg_adjoint_march_batched(
                    ops_a, f, fwd.u, times, y0s, g_u=g_u
                ).err
                u = fwd.u
            j = dg_element_functional_batched(ops_p, u, times, g)  # (B,)
            est_total = jnp.sum(err, axis=1)  # (B,)
            # per-member padded bisection (each row shift-inserts at its
            # own argmax; zero-width slabs can never win it)
            ref_i = jnp.argmax(jnp.abs(err), axis=1)  # (B,)
            t_l = jnp.take_along_axis(times, ref_i[:, None], axis=1)
            t_r = jnp.take_along_axis(times, ref_i[:, None] + 1, axis=1)
            mid = 0.5 * (t_l + t_r)  # (B, 1)
            idx = jnp.arange(times.shape[1])[None, :]
            shifted = times[:, np.maximum(np.arange(times.shape[1]) - 1, 0)]
            times_new = jnp.where(
                idx <= ref_i[:, None], times,
                jnp.where(idx == ref_i[:, None] + 1, mid, shifted),
            )
            # members at tolerance freeze: their partition stops changing
            refine_now = refining & (jnp.abs(est_total) >= tol)  # (B,)
            times_new = jnp.where(refine_now[:, None], times_new, times)
            # one packed (B, ·) diagnostics fetch per iteration;
            # times_new/refine_now stay on device between iterations
            diag = jnp.concatenate(
                [
                    times,
                    err.astype(times.dtype),
                    j[:, None].astype(times.dtype),
                    est_total[:, None].astype(times.dtype),
                    refine_now[:, None].astype(times.dtype),
                ],
                axis=1,
            )
            return times_new, refine_now, diag

        iteration = _built_iteration

    if restored is not None:
        t_res = np.asarray(restored["times"])
        if t_res.shape[1] < n_pad:  # re-pad (zero-width: exact identity)
            t_res = np.concatenate(
                [
                    t_res,
                    np.repeat(t_res[:, -1:], n_pad - t_res.shape[1], axis=1),
                ],
                axis=1,
            )
        times = jnp.asarray(t_res)
        refining = jnp.asarray(np.asarray(restored["refining"]) != 0)
        n_active = np.asarray(restored["n_active"]).copy()
    else:
        row = np.linspace(t_span[0], t_span[1], k0 + 1)
        row = np.concatenate([row, np.full(max_k - k0, row[-1])])
        times = jnp.asarray(np.broadcast_to(row, (b, n_pad)).copy())
        refining = jnp.ones((b,), bool)
        n_active = np.full((b,), k0, np.int64)
    if sharding is not None:
        times = jax.device_put(times, sharding)
        refining = jax.device_put(refining, sharding)

    if device_loop:
        ncols = n_pad + max_k + 3

        @jax.jit
        def _run_fused(times, refining):
            diag_buf = jnp.zeros((maxit + 1, b, ncols), times.dtype)
            if sharding is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                diag_buf = jax.lax.with_sharding_constraint(
                    diag_buf,
                    NamedSharding(mesh, PartitionSpec(None, mesh_axis)),
                )

            def body(carry):
                t, r, buf, it, _ = carry
                t_new, r_new, diag = iteration(t, r)
                zero = jnp.zeros_like(it)
                buf = jax.lax.dynamic_update_slice(
                    buf, diag[None].astype(buf.dtype), (it, zero, zero)
                )
                return (t_new, r_new, buf, it + 1, jnp.sum(r_new) > 0)

            def cond(carry):
                _, _, _, it, cont = carry
                return (it < maxit + 1) & cont

            t_f, r_f, diag_buf, n_done, _ = jax.lax.while_loop(
                cond, body,
                (times, refining, diag_buf, jnp.int32(it0), jnp.array(True)),
            )
            return t_f, r_f, diag_buf, n_done

        times_f, refining_f, diag_buf, n_done = _run_fused(times, refining)
        n_done = int(n_done)
        diag_buf = np.asarray(diag_buf)
        for i in range(it0, n_done):
            d = diag_buf[i]
            refine_h = d[:, n_pad + max_k + 2] != 0
            history.append(
                DGPerMemberAdaptResult(
                    times=d[:, :n_pad].copy(),
                    n_active=n_active.copy(),
                    err=d[:, n_pad : n_pad + max_k].copy(),
                    j=d[:, n_pad + max_k].copy(),
                    est_total=d[:, n_pad + max_k + 1].copy(),
                    n_refining=int(refine_h.sum()),
                )
            )
            # a zero-refining row adds zeros -> identical to the host
            # loop's conditional update
            n_active = n_active + refine_h.astype(np.int64)
        if checkpoint_dir is not None:
            from adjoint_ode_adaptivity_tpu.train.checkpoint import (
                save_checkpoint,
            )

            save_checkpoint(
                checkpoint_dir,
                len(history),
                {
                    "times": np.asarray(times_f),
                    "refining": np.asarray(refining_f).astype(np.int32),
                    "n_active": n_active,
                    "history": [dict(r._asdict()) for r in history],
                },
            )

        class _FusedHistory(list):
            pass

        out = _FusedHistory(history)
        out.iteration = iteration
        out.run_fused = _run_fused
        return out

    for _ in range(it0, maxit + 1):
        times_new, refine_new, diag = iteration(times, refining)
        diag = np.asarray(diag)
        t_h = diag[:, :n_pad]
        err_h = diag[:, n_pad : n_pad + max_k]
        j_h = diag[:, n_pad + max_k]
        est_h = diag[:, n_pad + max_k + 1]
        refine_h = diag[:, n_pad + max_k + 2] != 0
        n_refining = int(refine_h.sum())
        history.append(
            DGPerMemberAdaptResult(
                times=t_h.copy(),
                n_active=n_active.copy(),
                err=err_h.copy(),
                j=j_h.copy(),
                est_total=est_h.copy(),
                n_refining=n_refining,
            )
        )
        if n_refining > 0:
            times = times_new
            refining = refine_new
            n_active = n_active + refine_h.astype(np.int64)
        if checkpoint_dir is not None:
            from adjoint_ode_adaptivity_tpu.train.checkpoint import (
                save_checkpoint,
            )

            save_checkpoint(
                checkpoint_dir,
                len(history),
                {
                    "times": np.asarray(times),
                    "refining": np.asarray(refining).astype(np.int32),
                    "n_active": n_active,
                    "history": [dict(r._asdict()) for r in history],
                },
            )
        if n_refining == 0:
            break

    class _History(list):
        pass

    out = _History(history)
    out.iteration = iteration
    return out


def run_adaptive_dg(
    f: Callable,
    y0: float,
    t_span: tuple[float, float],
    *,
    n_order: int = 1,
    k0: int = 2,
    g: Callable = lambda u, t: u,
    g_u: Callable = lambda u, t: jnp.ones_like(u),
    tol: float = 1e-5,
    maxit: int = 30,
    fine_offset: int = 2,
    n_gq: int | None = None,
    callback: Callable | None = None,
    padded: bool = False,
    adjoint_mode: str = "solve",
    checkpoint_dir: str | None = None,
    device_loop: bool = False,
) -> list[DGAdaptResult]:
    """Adaptive h-refinement of the DG-in-time partition driven by the
    adjoint-weighted residual, with MAIN.m's effectivity telemetry.

    ``padded=True`` compiles the whole iteration once at ``k0 + maxit``
    elements (zero-width padding slabs) — use on TPU.

    ``checkpoint_dir``: orbax-checkpoint partition + history each
    iteration and resume from the latest checkpoint when present (the
    callback is not re-invoked for restored iterations).

    ``device_loop=True`` (requires ``padded=True``): the whole MAIN.m
    study — solve, estimate, refine, stopping test — runs as ONE
    ``lax.while_loop`` dispatch; per-iteration results land in
    preallocated buffers and the host fetches once at the end. History
    is bit-identical to the per-iteration mode (tested). Checkpointing
    degrades to a single end-of-run save; the callback fires after the
    run, in order.
    """
    if device_loop and not padded:
        raise ValueError("device_loop=True requires padded=True "
                         "(static shapes are what make the fused loop "
                         "compile once)")
    ops_p = dg_time_operators(n_order, n_gq)
    ops_a = dg_time_operators(n_order + 1, None if n_gq is None else n_gq + 2)
    ops_f = dg_time_operators(n_order + fine_offset)

    times = np.linspace(t_span[0], t_span[1], k0 + 1)
    if padded:
        max_k = k0 + maxit + 1
        times = np.concatenate([times, np.full(max_k - k0, times[-1])])
    n_active = k0
    iteration = _make_dg_iteration(f, g, g_u, ops_p, ops_a, ops_f, adjoint_mode)
    history: list[DGAdaptResult] = []
    it0 = 0
    if checkpoint_dir is not None:
        from adjoint_ode_adaptivity_tpu.train.checkpoint import (
            latest_step,
            restore_checkpoint_raw,
        )

        if latest_step(checkpoint_dir) is not None:
            raw = restore_checkpoint_raw(checkpoint_dir)
            history = [
                DGAdaptResult(
                    times=np.asarray(h["times"]),
                    u=np.asarray(h["u"]),
                    v=np.asarray(h["v"]),
                    err=np.asarray(h["err"]),
                    j_coarse=float(h["j_coarse"]),
                    j_fine=float(h["j_fine"]),
                    effectivity_gap=float(h["effectivity_gap"]),
                    est_total=float(h["est_total"]),
                )
                for h in raw["history"]
            ]
            times = np.asarray(raw["times"])
            n_active = int(raw["n_active"])
            # a resumed run may ask for MORE iterations: re-pad the
            # restored partition to this run's max_k (zero-width slabs
            # are exact identities)
            if padded and len(times) < max_k + 1:
                times = np.concatenate(
                    [times, np.full(max_k + 1 - len(times), times[-1])]
                )
            it0 = len(history)
            if abs(history[-1].est_total) < tol:
                return history
    if device_loop:
        shapes = jax.eval_shape(iteration, jnp.asarray(times), y0)
        n_nodes = times.shape[0]

        @jax.jit
        def _run_fused(times):
            t_dtype = jnp.asarray(times).dtype
            bufs = tuple(
                jnp.zeros((maxit + 1,) + s.shape, s.dtype) for s in shapes[:5]
            ) + (
                jnp.zeros((maxit + 1, n_nodes), t_dtype),
                jnp.zeros((maxit + 1,), shapes[2].dtype),  # device-side Σerr
            )

            def body(carry):
                t, bufs, it, _ = carry
                u, v, err, j_c, j_f, t_new = iteration(t, y0)
                # same device reduction as the host loop's
                # float(jnp.sum(err)) — keeps est_total bit-identical
                est = jnp.sum(err)
                done = jnp.abs(est) < tol
                slot = it
                zero = jnp.zeros_like(slot)
                rows = (u, v, err, j_c, j_f, t, est)
                bufs = tuple(
                    jax.lax.dynamic_update_slice(
                        b,
                        jnp.asarray(r, b.dtype)[None],
                        (slot,) + (zero,) * (b.ndim - 1),
                    )
                    for b, r in zip(bufs, rows)
                )
                t = jnp.where(done, t, t_new)
                return (t, bufs, it + 1, ~done)

            def cond(carry):
                _, _, it, cont = carry
                return (it <= maxit) & cont

            t_f, bufs, n_done, _ = jax.lax.while_loop(
                cond, body, (jnp.asarray(times), bufs, jnp.int32(it0),
                             jnp.array(True)),
            )
            return t_f, bufs, n_done

        t_f, bufs, n_done = _run_fused(times)
        n_done = int(n_done)
        bufs = [np.asarray(b) for b in bufs]
        for i in range(it0, n_done):
            na = n_active + (i - it0)
            est_total = float(bufs[6][i])
            result = DGAdaptResult(
                times=bufs[5][i][: na + 1].copy(),
                u=bufs[0][i][:na],
                v=bufs[1][i][:na],
                err=bufs[2][i][:na],
                j_coarse=float(bufs[3][i]),
                j_fine=float(bufs[4][i]),
                effectivity_gap=float(bufs[3][i]) - float(bufs[4][i]),
                est_total=est_total,
            )
            history.append(result)
            if callback is not None:
                callback(result)
        if checkpoint_dir is not None and n_done > it0:
            from adjoint_ode_adaptivity_tpu.train.checkpoint import (
                save_checkpoint,
            )

            done_final = abs(history[-1].est_total) < tol
            n_active_final = n_active + (n_done - 1 - it0) + (
                0 if done_final else 1
            )
            save_checkpoint(
                checkpoint_dir,
                len(history),
                {
                    "times": np.asarray(t_f),
                    "n_active": n_active_final,
                    "history": [dict(r._asdict()) for r in history],
                },
            )
        return history

    for it in range(it0, maxit + 1):
        t_j = jnp.asarray(times)
        u, v, err, j_coarse, j_fine, times_new = iteration(t_j, y0)
        result = DGAdaptResult(
            times=times[: n_active + 1].copy(),
            u=np.asarray(u)[:n_active],
            v=np.asarray(v)[:n_active],
            err=np.asarray(err)[:n_active],
            j_coarse=float(j_coarse),
            j_fine=float(j_fine),
            effectivity_gap=float(j_coarse) - float(j_fine),
            est_total=float(jnp.sum(err)),
        )
        history.append(result)
        if callback is not None:
            callback(result)
        done = abs(result.est_total) < tol
        if not done:
            if padded:
                times = np.asarray(times_new)
            else:
                ref_i = int(np.argmax(np.abs(result.err)))
                mid = 0.5 * (times[ref_i] + times[ref_i + 1])
                times = np.insert(times, ref_i + 1, mid)
            n_active += 1
        if checkpoint_dir is not None:
            from adjoint_ode_adaptivity_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(
                checkpoint_dir,
                len(history),
                {
                    "times": np.asarray(times),
                    "n_active": n_active,
                    "history": [dict(r._asdict()) for r in history],
                },
            )
        if done:
            break
    return history
