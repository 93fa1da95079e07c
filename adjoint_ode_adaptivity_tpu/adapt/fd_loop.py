"""The adaptive forward/adjoint/estimate/refine loop for one-step marches.

This is the end-to-end algorithm of ``python/Main_finite_difference.py``
(and the analytic branch of ``factory.py getAdaptFunctions``): march the
primal on the coarse grid, solve the discrete adjoint on the uniformly
refined grid, localise the adjoint-weighted residual per coarse step, bisect
the worst step, repeat until the total estimate drops below tolerance.

TPU-first: one jitted ``adapt_iteration`` at a *fixed padded shape* runs the
entire per-iteration pipeline on device; the host loop only checks the
scalar stopping test and logs. No recompiles as the grid grows.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from adjoint_ode_adaptivity_tpu import functionals as fnl
from adjoint_ode_adaptivity_tpu.adapt.policy import bisect_refine_padded, pad_times
from adjoint_ode_adaptivity_tpu.adjoint.discrete import adjoint_march
from adjoint_ode_adaptivity_tpu.adjoint.estimate import (
    coarse_indicator,
    interp_to_fine,
    refine_all,
    residual,
)
from adjoint_ode_adaptivity_tpu.march.fd import forward_march

__all__ = [
    "AdaptState",
    "AdaptResult",
    "adapt_iteration",
    "backtrack_iteration",
    "run_adaptive_fd",
    "run_adaptive_fd_backtrack",
    "run_adaptive_fd_backtrack_padded",
    "FDPerMemberAdaptResult",
    "run_adaptive_fd_per_member",
]


class AdaptState(NamedTuple):
    """Immutable per-iteration adaptivity state (padded, static shapes)."""

    times: jnp.ndarray  # (max_nodes,) padded node times
    n_active: jnp.ndarray  # scalar int32: number of real steps
    it: jnp.ndarray  # scalar int32 iteration counter


class AdaptResult(NamedTuple):
    state: AdaptState  # post-refinement state (next iteration's grid)
    times_used: jnp.ndarray  # (max_nodes,) the grid THIS iteration solved on
    n_steps_used: jnp.ndarray  # scalar int32: active steps this iteration
    u: jnp.ndarray  # (max_nodes,) coarse primal
    v: jnp.ndarray  # (max_fine+1,) fine-grid adjoint
    err_steps: jnp.ndarray  # (max_nodes-1,) per-coarse-step indicator
    err_total: jnp.ndarray  # scalar Σ err_steps
    j_coarse: jnp.ndarray  # J evaluated on the coarse march


def _k_vector(functional: fnl.Functional, u_fine, dt_fine, n_active, ref_factor):
    """∂J/∂U on the padded fine grid, padding-aware.

    ``J=u_N`` places the unit at fine node ``n_active·rf − 1`` (the
    second-to-last *active* node — the reference convention, see
    functionals.py); integral functionals are automatically padding-safe
    because padded dt is zero.
    """
    if functional.name == "J=u_N":
        idx = n_active * ref_factor - 1
        return (jnp.arange(u_fine.shape[0]) == idx).astype(u_fine.dtype)
    return jax.grad(functional.value)(u_fine, dt_fine)


@partial(jax.jit, static_argnames=("step_fn", "functional_name", "ref_factor", "convention"))
def adapt_iteration(
    state: AdaptState,
    u0,
    step_fn: Callable,
    functional_name: str,
    ref_factor: int,
    convention: str = "strided",
) -> AdaptResult:
    """One adaptive iteration, entirely on device at static shapes."""
    functional = fnl.get_functional(functional_name)
    t0 = state.times[0]
    dt = jnp.diff(state.times)
    u = forward_march(step_fn, u0, dt, t0)

    dt_fine = refine_all(dt, ref_factor)
    u_fine = interp_to_fine(u, dt, dt_fine, t0)
    k_vec = _k_vector(functional, u_fine, dt_fine, state.n_active, ref_factor)
    v = adjoint_march(step_fn, u_fine, dt_fine, k_vec, t0)

    res = residual(step_fn, u_fine, dt_fine, t0)
    err_fine = res * v
    err_steps = coarse_indicator(err_fine, ref_factor, convention)
    err_total = jnp.sum(err_steps)

    times_new, n_active_new = bisect_refine_padded(state.times, state.n_active, err_steps)
    if functional.name == "J=u_N":
        # the reference convention is J ≡ u_{N-1} (functionals.py: value is
        # u[-2] on an unpadded grid) — the SECOND-to-last active node, the
        # same node _k_vector targets on the fine grid
        j_coarse = u[state.n_active - 1]
    else:
        j_coarse = functional.value(u, dt)
    new_state = AdaptState(times=times_new, n_active=n_active_new, it=state.it + 1)
    return AdaptResult(
        new_state, state.times, state.n_active, u, v, err_steps, err_total, j_coarse
    )


def run_adaptive_fd(
    step_fn: Callable,
    u0: float,
    t_span: tuple[float, float],
    n_steps0: int = 2,
    *,
    functional_name: str = "J=int(u^2)",
    ref_factor: int = 4,
    tol: float = 1e-5,
    maxit: int = 100,
    convention: str = "strided",
    max_nodes: int | None = None,
    callback: Callable | None = None,
    dtype=None,
    checkpoint_dir: str | None = None,
    device_loop: bool = False,
) -> list[AdaptResult]:
    """Run the adaptive loop until Σerr < tol or maxit — the complete
    Main_finite_difference.py driver, minus plotting (see utils.plotting).

    Returns the per-iteration :class:`AdaptResult` history. ``callback``
    (if given) is invoked with each result (host-side, for logging/plots).

    ``checkpoint_dir``: orbax-checkpoint the loop state + full history
    after every iteration and RESUME from the latest checkpoint if the
    directory already holds one — a killed run continues exactly where it
    stopped (the reference restarts from scratch, SURVEY.md §5). Resumed
    iterations are bitwise-identical to an uninterrupted run (tested);
    the callback is not re-invoked for restored iterations.

    ``device_loop=True`` runs the WHOLE study as one ``lax.while_loop``
    dispatch: the scalar stopping test (Σerr vs tol) happens on device,
    every iteration's full :class:`AdaptResult` fields are written into
    preallocated (maxit+1, ·) buffers with ``dynamic_update_slice``, and
    the host fetches once at the end — history bit-identical to the
    per-iteration mode (pinned in tests). Checkpointing degrades to a
    single end-of-run save (resume still works); the callback fires
    after the run, in order.
    """
    if max_nodes is None:
        max_nodes = n_steps0 + maxit + 2
    dtype = dtype or jnp.asarray(0.0).dtype
    times0 = jnp.linspace(t_span[0], t_span[1], n_steps0 + 1, dtype=dtype)
    times, n_active = pad_times(times0, max_nodes)
    state = AdaptState(times=times, n_active=n_active, it=jnp.asarray(0, jnp.int32))

    history: list[AdaptResult] = []
    err = jnp.inf
    it = 0
    if checkpoint_dir is not None:
        from adjoint_ode_adaptivity_tpu.train.checkpoint import (
            latest_step,
            restore_checkpoint_raw,
        )

        if latest_step(checkpoint_dir) is not None:
            raw = restore_checkpoint_raw(checkpoint_dir)

            def _st(d):
                return AdaptState(
                    times=jnp.asarray(d["times"], dtype),
                    n_active=jnp.asarray(d["n_active"], jnp.int32),
                    it=jnp.asarray(d["it"], jnp.int32),
                )

            history = [
                AdaptResult(
                    state=_st(h["state"]),
                    times_used=jnp.asarray(h["times_used"], dtype),
                    n_steps_used=jnp.asarray(h["n_steps_used"], jnp.int32),
                    u=jnp.asarray(h["u"], dtype),
                    v=jnp.asarray(h["v"], dtype),
                    err_steps=jnp.asarray(h["err_steps"], dtype),
                    err_total=jnp.asarray(h["err_total"], dtype),
                    j_coarse=jnp.asarray(h["j_coarse"], dtype),
                )
                for h in raw["history"]
            ]
            state = _st(raw["state"])
            # a resumed run may ask for MORE iterations than the killed
            # one: re-pad the restored grid to this run's max_nodes (the
            # padding convention repeats the final time = zero-width
            # steps, exact identities)
            cur = state.times.shape[0]
            # ... or FEWER: keep the restored width so the device-loop
            # buffers match the state (same guard as the per-member loop)
            max_nodes = max(max_nodes, cur)
            if max_nodes > cur:
                state = state._replace(
                    times=jnp.concatenate(
                        [
                            state.times,
                            jnp.full(max_nodes - cur, state.times[-1], dtype),
                        ]
                    )
                )
            err = float(history[-1].err_total)
            it = len(history)

    if device_loop:
        n_fine = (max_nodes - 1) * ref_factor + 1
        err0 = jnp.asarray(err, dtype)

        @jax.jit
        def _run_fused(state, err0):
            bufs = (
                jnp.zeros((maxit + 1, max_nodes), dtype),  # times_used
                jnp.zeros((maxit + 1,), jnp.int32),  # n_steps_used
                jnp.zeros((maxit + 1, max_nodes), dtype),  # u
                jnp.zeros((maxit + 1, n_fine), dtype),  # v
                jnp.zeros((maxit + 1, max_nodes - 1), dtype),  # err_steps
                jnp.zeros((maxit + 1,), dtype),  # err_total
                jnp.zeros((maxit + 1,), dtype),  # j_coarse
                jnp.zeros((maxit + 1, max_nodes), dtype),  # post times
                jnp.zeros((maxit + 1,), jnp.int32),  # post n_active
            )

            def body(carry):
                st, e, bufs = carry
                r = adapt_iteration(
                    st, u0, step_fn, functional_name, ref_factor, convention
                )
                slot = st.it
                zero = jnp.zeros_like(slot)
                rows = (
                    r.times_used, r.n_steps_used, r.u, r.v, r.err_steps,
                    r.err_total, r.j_coarse, r.state.times, r.state.n_active,
                )
                bufs = tuple(
                    jax.lax.dynamic_update_slice(
                        b,
                        jnp.asarray(row, b.dtype)[None]
                        if b.ndim == 1
                        else jnp.asarray(row, b.dtype)[None, :],
                        (slot,) if b.ndim == 1 else (slot, zero),
                    )
                    for b, row in zip(bufs, rows)
                )
                return (r.state, jnp.asarray(r.err_total, dtype), bufs)

            def cond(carry):
                st, e, _ = carry
                return (st.it <= maxit) & (e > tol)

            state_f, _, bufs = jax.lax.while_loop(
                cond, body, (state, err0, bufs)
            )
            return state_f, bufs

        state_f, bufs = _run_fused(state, err0)
        n_done = int(state_f.it)
        bufs = [np.asarray(b) for b in bufs]
        for i in range(it, n_done):
            result = AdaptResult(
                state=AdaptState(
                    times=jnp.asarray(bufs[7][i]),
                    n_active=jnp.asarray(bufs[8][i], jnp.int32),
                    it=jnp.asarray(i + 1, jnp.int32),
                ),
                times_used=jnp.asarray(bufs[0][i]),
                n_steps_used=jnp.asarray(bufs[1][i], jnp.int32),
                u=jnp.asarray(bufs[2][i]),
                v=jnp.asarray(bufs[3][i]),
                err_steps=jnp.asarray(bufs[4][i]),
                err_total=jnp.asarray(bufs[5][i]),
                j_coarse=jnp.asarray(bufs[6][i]),
            )
            history.append(result)
            if callback is not None:
                callback(result)
        if checkpoint_dir is not None and n_done > it:
            from adjoint_ode_adaptivity_tpu.train.checkpoint import (
                save_checkpoint,
            )

            def _sd(s):
                return dict(s._asdict())

            save_checkpoint(
                checkpoint_dir,
                n_done,
                {
                    "state": _sd(history[-1].state),
                    "history": [
                        {**_sd(r), "state": _sd(r.state)} for r in history
                    ],
                },
            )

        class _FusedHistory(list):
            pass

        out = _FusedHistory(history)
        out.run_fused = _run_fused  # reusable prebuilt jit (bench/timing)
        return out

    while it <= maxit and err > tol:
        result = adapt_iteration(
            state, u0, step_fn, functional_name, ref_factor, convention
        )
        history.append(result)
        if callback is not None:
            callback(result)
        state = result.state
        err = float(result.err_total)
        it += 1
        if checkpoint_dir is not None:
            from adjoint_ode_adaptivity_tpu.train.checkpoint import save_checkpoint

            def _sd(s):
                return dict(s._asdict())

            payload = {
                "state": _sd(state),
                "history": [
                    {**_sd(r), "state": _sd(r.state)} for r in history
                ],
            }
            save_checkpoint(checkpoint_dir, it, payload)
    return history


@partial(
    jax.jit,
    static_argnames=("step_fn", "functional_name", "ref_factor", "convention"),
)
def backtrack_iteration(
    state: AdaptState,
    blocked: jnp.ndarray,
    u0,
    step_fn: Callable,
    functional_name: str,
    ref_factor: int,
    convention: str = "strided",
):
    """One backtrack-schedule iteration at static padded shapes: the full
    solve + indicator, then a *masked* bisection (blocked intervals excluded
    from the argmax). Returns (err_steps, err_total, times_new, n_active_new,
    blocked_new, interval). Compiles once per padded size — the TPU-viable
    form of the host-driven :func:`run_adaptive_fd_backtrack` solve."""
    from adjoint_ode_adaptivity_tpu.adapt.policy import bisect_refine_padded_masked

    functional = fnl.get_functional(functional_name)
    t0 = state.times[0]
    dt = jnp.diff(state.times)
    u = forward_march(step_fn, u0, dt, t0)
    dt_fine = refine_all(dt, ref_factor)
    u_fine = interp_to_fine(u, dt, dt_fine, t0)
    k_vec = _k_vector(functional, u_fine, dt_fine, state.n_active, ref_factor)
    v = adjoint_march(step_fn, u_fine, dt_fine, k_vec, t0)
    res = residual(step_fn, u_fine, dt_fine, t0)
    err_steps = coarse_indicator(res * v, ref_factor, convention)
    err_total = jnp.sum(err_steps)
    times_new, n_active_new, blocked_new, interval = bisect_refine_padded_masked(
        state.times, state.n_active, err_steps, blocked
    )
    return err_steps, err_total, times_new, n_active_new, blocked_new, interval


def run_adaptive_fd_backtrack_padded(
    step_fn: Callable,
    u0: float,
    t_span: tuple[float, float],
    n_steps0: int = 2,
    *,
    functional_name: str = "J=int(u^2)",
    ref_factor: int = 4,
    tol: float = 1e-5,
    maxit: int = 100,
    convention: str = "strided",
    coarsen_tol: float | None = None,
    max_nodes: int | None = None,
    dtype=None,
) -> list[dict]:
    """The backtrack schedule (insert / undo / block, optional coarsening) on
    the padded static-shape machinery: every device computation compiles once
    at ``max_nodes``; the host only runs the accept/backtrack control flow.
    Semantics match :func:`run_adaptive_fd_backtrack` EXACTLY — refine at
    the masked argmax; if the total estimate increased, undo the insert and
    permanently block that interval; a coarsen merge re-solves on the
    merged grid within the same iteration (no extra history entry) before
    refining. Blocked intervals are keyed by their ``(t_l, t_r)`` endpoints
    (rounded to 1e-12) exactly like the dynamic loop — the host rebuilds
    the positional mask from the keys before each jitted iteration, so
    inserts and merges can never desynchronise the two bookkeepings (the
    round-2 positional-mask deviation is gone; pinned equal in tests).
    """
    from adjoint_ode_adaptivity_tpu.adapt.policy import coarsen_merge_padded

    if max_nodes is None:
        max_nodes = n_steps0 + maxit + 2
    dtype = dtype or jnp.asarray(0.0).dtype
    times0 = jnp.linspace(t_span[0], t_span[1], n_steps0 + 1, dtype=dtype)
    times, n_active = pad_times(times0, max_nodes)
    state = AdaptState(times=times, n_active=n_active, it=jnp.asarray(0, jnp.int32))

    blocked_keys: set = set()

    def interval_key(tl, tr):
        return (round(float(tl), 12), round(float(tr), 12))

    def build_mask(st: AdaptState) -> jnp.ndarray:
        t_host = np.asarray(st.times)
        n_act = int(st.n_active)
        m = np.zeros((max_nodes - 1,), bool)
        for i in range(n_act):
            m[i] = interval_key(t_host[i], t_host[i + 1]) in blocked_keys
        return jnp.asarray(m)

    history: list[dict] = []
    prev_total = None
    last_insert = None  # (pre-insert state, key of the inserted interval)
    it = 0
    while it <= maxit:
        blocked = build_mask(state)
        err_steps, err_total, t_new, n_new, _b, interval = backtrack_iteration(
            state, blocked, u0, step_fn, functional_name, ref_factor, convention
        )
        total = float(err_total)
        if prev_total is not None and last_insert is not None and total > prev_total:
            # backtrack: revert to the pre-insert grid, block the interval
            state, key = last_insert
            blocked_keys.add(key)
            last_insert = None
            history.append({"it": it, "n_steps": int(state.n_active),
                            "total": total, "action": "backtrack"})
            it += 1
            continue
        prev_total = total
        history.append({
            "it": it,
            "n_steps": int(state.n_active),
            "times": np.asarray(state.times[: int(state.n_active) + 1]),
            "err_steps": np.asarray(err_steps),
            "total": total,
            "action": "accept",
        })
        if total < tol:
            break
        if coarsen_tol is not None:
            t_c, n_c, _bc, merged = coarsen_merge_padded(
                state.times, state.n_active, err_steps, blocked, coarsen_tol
            )
            if bool(merged):
                # re-solve on the merged grid within the SAME iteration (no
                # history entry) before refining — exactly the dynamic
                # loop's post-merge re-solve (run_adaptive_fd_backtrack).
                # prev_total keeps the pre-merge value, as there. The keyed
                # mask rebuild decides the merged interval's blocked status
                # from its endpoints, identically to the dynamic loop.
                state = AdaptState(times=t_c, n_active=n_c, it=state.it)
                blocked = build_mask(state)
                err_steps, _, t_new, n_new, _b, interval = backtrack_iteration(
                    state, blocked, u0, step_fn, functional_name, ref_factor,
                    convention,
                )
        n_act = int(state.n_active)
        if bool(jnp.all(blocked[:n_act])):
            break  # every active interval blocked: no legal refinement left
        if int(n_new) == n_act:
            # guarded no-op insert: the padded grid is full (max_nodes)
            history.append({"it": it, "n_steps": n_act, "total": total,
                            "action": "capacity"})
            break
        # remember the pre-insert state and the bisected interval's key, so
        # a backtrack reverts the grid and blocks the key in one step
        t_host = np.asarray(state.times)
        iv = int(interval)
        last_insert = (state, interval_key(t_host[iv], t_host[iv + 1]))
        state = AdaptState(times=t_new, n_active=n_new, it=state.it + 1)
        it += 1
    return history


def run_adaptive_fd_backtrack(
    step_fn: Callable,
    u0: float,
    t_span: tuple[float, float],
    n_steps0: int = 2,
    *,
    functional_name: str = "J=int(u^2)",
    ref_factor: int = 4,
    tol: float = 1e-5,
    maxit: int = 100,
    convention: str = "strided",
    coarsen_tol: float | None = None,
) -> list[dict]:
    """Adaptive loop with a BACKTRACK schedule (and optional coarsening).

    The reference's job scripts name a backtracking variant
    (python/main_backtrack_serial.sh runs Main_no_matrix_backtrack_complex.py,
    a file absent from the repo); the policy here: refine at the masked
    argmax; if the total estimate *increased* after a refinement, undo that
    insert, permanently block the offending interval, and pick the next
    candidate. With ``coarsen_tol`` set, the cheapest adjacent step pair is
    merged whenever its combined contribution falls below the tolerance.

    Host-driven with dynamic shapes (each grid size compiles once — intended
    for CPU analysis runs; the padded :func:`run_adaptive_fd` is the TPU
    path). Returns per-iteration dicts with times/err/action records.
    """
    from adjoint_ode_adaptivity_tpu.adapt.policy import (
        bisect_refine_masked,
        coarsen_merge,
    )

    functional = fnl.get_functional(functional_name)
    times = jnp.linspace(t_span[0], t_span[1], n_steps0 + 1)

    def interval_key(tl, tr):
        return (round(float(tl), 12), round(float(tr), 12))

    def solve(times):
        dt = jnp.diff(times)
        u = forward_march(step_fn, u0, dt, times[0])
        dt_fine = refine_all(dt, ref_factor)
        u_fine = interp_to_fine(u, dt, dt_fine, times[0])
        k_vec = jax.grad(functional.value)(u_fine, dt_fine)
        v = adjoint_march(step_fn, u_fine, dt_fine, k_vec, times[0])
        res = residual(step_fn, u_fine, dt_fine, times[0])
        err_steps = coarse_indicator(res * v, ref_factor, convention)
        return u, v, err_steps, float(jnp.sum(err_steps))

    blocked: set = set()
    history: list[dict] = []
    prev_total = None
    last_insert = None  # (times_before, interval_key)
    it = 0
    while it <= maxit:
        u, v, err_steps, total = solve(times)
        action = "accept"
        if prev_total is not None and last_insert is not None and total > prev_total:
            # backtrack: revert the insert, block the interval
            times, key = last_insert
            blocked.add(key)
            last_insert = None
            action = f"backtrack {key}"
            history.append({"it": it, "times": np.asarray(times), "total": total,
                            "action": action})
            it += 1
            continue
        prev_total = total
        history.append({"it": it, "times": np.asarray(times),
                        "err_steps": np.asarray(err_steps), "total": total,
                        "action": action})
        if total < tol:
            break
        if coarsen_tol is not None:
            times = coarsen_merge(times, err_steps, coarsen_tol)
            if times.shape[0] - 1 != err_steps.shape[0]:
                # grid changed: recompute the indicator before refining
                u, v, err_steps, total = solve(times)
        mask = jnp.asarray(
            [
                interval_key(times[i], times[i + 1]) in blocked
                for i in range(times.shape[0] - 1)
            ]
        )
        if bool(jnp.all(mask)):
            break  # every interval blocked: no legal refinement left
        times_before = times
        times, interval = bisect_refine_masked(times, err_steps, mask)
        last_insert = (
            times_before,
            interval_key(times_before[interval], times_before[interval + 1]),
        )
        it += 1
    return history


class FDPerMemberAdaptResult(NamedTuple):
    """Per-iteration snapshot of a B-member per-member FD adaptive study."""

    times: np.ndarray  # (B, max_nodes) padded per-member grids
    n_active: np.ndarray  # (B,) live step count per member
    err_steps: np.ndarray  # (B, max_nodes-1) per-coarse-step indicators
    err_total: np.ndarray  # (B,) signed Σ err_steps per member
    j_coarse: np.ndarray  # (B,) functional per member
    n_refining: int  # members still above tol AFTER this iteration


def run_adaptive_fd_per_member(
    step_fn: Callable,
    u0s,  # (B,) initial-condition ensemble
    t_span: tuple[float, float],
    n_steps0: int = 2,
    *,
    functional_name: str = "J=int(u^2)",
    ref_factor: int = 4,
    tol: float = 1e-5,
    maxit: int = 100,
    convention: str = "strided",
    max_nodes: int | None = None,
    dtype=None,
    engine: str = "xla",
    ode_f: Callable | None = None,
    mesh=None,
    mesh_axis: str = "data",
    checkpoint_dir: str | None = None,
    device_loop: bool = False,
) -> list[FDPerMemberAdaptResult]:
    """PER-MEMBER adaptive FD study: B independent
    Main_finite_difference.py loops — each initial condition owns its own
    padded time grid, bisects its own worst step, and freezes
    independently once its Σerr drops to ``tol`` (the same signed
    ``err > tol`` stopping test as :func:`run_adaptive_fd`) — collapsed
    into ONE compile-once jit via ``vmap`` of :func:`adapt_iteration`
    over the member axis. The reference runs exactly one such study per
    SLURM job (Submit_schedule_frontera); here thousands ride the TPU
    vector lanes together. Frozen members are masked by a ``where`` on
    the member axis, so shapes never change across iterations.

    History stores the per-member grids/indicators/functionals (the
    single-run loop additionally keeps u and v — per-member trajectories
    at ensemble scale would dominate the fetch).

    ``mesh`` data-parallelizes members over ``mesh_axis`` (pure dp, no
    collectives — decisions are per-member). ``device_loop=True`` fuses
    the whole study into one ``lax.while_loop`` dispatch with on-device
    early exit when every member freezes (checkpointing degrades to one
    end-of-run save). Checkpoint/resume mirrors the DG per-member loop.

    ``engine="pallas"`` runs every member's whole fwd+adjoint+indicator
    estimate in ONE fused kernel launch
    (:func:`~adjoint_ode_adaptivity_tpu.ops.pallas.fd_ensemble.make_pallas_fd_estimate_per_member`
    — per-member step widths ride as traced VMEM operands, so the loop
    never recompiles); refinement stays a vmapped
    :func:`~adjoint_ode_adaptivity_tpu.adapt.policy.bisect_refine_padded`.
    Requires the Euler march (pass the raw ODE right-hand side as
    ``ode_f``), ``functional_name="J=int(u^2)"``, and B a multiple of 8;
    pinned equal to the XLA engine in tests.
    """
    u0s = jnp.asarray(u0s)
    b = u0s.shape[0]
    if max_nodes is None:
        max_nodes = n_steps0 + maxit + 2
    dtype = dtype or jnp.asarray(0.0).dtype
    u0s = u0s.astype(dtype)
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = mesh.shape[mesh_axis]
        if b % n_dev:
            raise ValueError(f"B={b} must divide over {n_dev} mesh devices")
        sharding = NamedSharding(mesh, PartitionSpec(mesh_axis))
        u0s = jax.device_put(u0s, sharding)

    history: list[FDPerMemberAdaptResult] = []
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
                FDPerMemberAdaptResult(
                    times=np.asarray(h["times"]),
                    n_active=np.asarray(h["n_active"]),
                    err_steps=np.asarray(h["err_steps"]),
                    err_total=np.asarray(h["err_total"]),
                    j_coarse=np.asarray(h["j_coarse"]),
                    n_refining=int(h["n_refining"]),
                )
                for h in raw["history"]
            ]
            restored = raw
            it0 = len(history)
            if history[-1].n_refining == 0:
                from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
                    _resumed_history,
                )

                return _resumed_history(history)
            max_nodes = max(max_nodes, np.asarray(raw["times"]).shape[1])
            if history[0].times.shape[1] < max_nodes:
                # re-pad restored rows to this run's width so the whole
                # history is shape-uniform (padding = zero-width steps at
                # t_end, exact identities; indicator padding is exactly 0)
                def _repad(r):
                    wt = max_nodes - r.times.shape[1]
                    return r._replace(
                        times=np.concatenate(
                            [r.times, np.repeat(r.times[:, -1:], wt, 1)], 1
                        ),
                        err_steps=np.concatenate(
                            [
                                r.err_steps,
                                np.zeros((r.err_steps.shape[0], wt)),
                            ],
                            1,
                        ),
                    )

                history = [_repad(r) for r in history]

    if engine not in ("xla", "pallas"):
        raise ValueError(engine)
    if engine == "pallas":
        if ode_f is None:
            raise ValueError(
                "engine='pallas' needs the raw ODE right-hand side as "
                "ode_f (the fused kernel traces f/f_u itself)"
            )
        if functional_name != "J=int(u^2)":
            raise ValueError(
                "engine='pallas' supports functional_name='J=int(u^2)'"
            )
        from adjoint_ode_adaptivity_tpu.ops.pallas.fd_ensemble import (
            make_pallas_fd_estimate_per_member,
        )

        def _f_u(u, t, _f=ode_f):
            return jax.jvp(lambda uu: _f(uu, t), (u,), (jnp.ones_like(u),))[1]

        pallas_run = make_pallas_fd_estimate_per_member(
            ode_f, _f_u, max_nodes - 1, ref_factor, convention=convention,
            interpret=jax.default_backend() != "tpu",
        )
        if mesh is not None:
            from adjoint_ode_adaptivity_tpu.parallel.ensemble import (
                ensemble_batched,
            )

            # per-member dt shards WITH the members (extra 0)
            pallas_run_dp = ensemble_batched(
                lambda u0b, dtb, _run=pallas_run: _run(dtb, u0b),
                mesh, axis=mesh_axis, shard_extras={0},
            )
            pallas_run = lambda dtb, u0b: pallas_run_dp(u0b, dtb)  # noqa: E731

    def _one(state, u0):
        return adapt_iteration(
            state, u0, step_fn, functional_name, ref_factor, convention
        )

    @jax.jit
    def _iteration(times, n_active, refining):
        if engine == "pallas":
            err_steps, j_coarse = pallas_run(
                jnp.diff(times, axis=1), u0s
            )
            err_total = jnp.sum(err_steps, axis=1)
            t_new, na_new = jax.vmap(bisect_refine_padded)(
                times, n_active, err_steps
            )
        else:
            st = AdaptState(
                times=times, n_active=n_active,
                it=jnp.zeros((b,), jnp.int32),
            )
            r = jax.vmap(_one)(st, u0s)
            err_steps, err_total = r.err_steps, r.err_total
            j_coarse = r.j_coarse
            t_new, na_new = r.state.times, r.state.n_active
        # signed stopping test, per member (run_adaptive_fd semantics)
        refine_now = refining & (err_total > tol)  # (B,)
        times_next = jnp.where(refine_now[:, None], t_new, times)
        n_active_next = jnp.where(refine_now, na_new, n_active)
        diag = jnp.concatenate(
            [
                times,
                err_steps.astype(times.dtype),
                err_total[:, None].astype(times.dtype),
                j_coarse[:, None].astype(times.dtype),
                refine_now[:, None].astype(times.dtype),
            ],
            axis=1,
        )  # (B, max_nodes + max_nodes-1 + 3)
        return times_next, n_active_next, refine_now, diag

    if restored is not None:
        t_res = np.asarray(restored["times"])
        if t_res.shape[1] < max_nodes:  # re-pad: zero-width steps
            t_res = np.concatenate(
                [
                    t_res,
                    np.repeat(
                        t_res[:, -1:], max_nodes - t_res.shape[1], axis=1
                    ),
                ],
                axis=1,
            )
        times = jnp.asarray(t_res, dtype)
        n_active = jnp.asarray(restored["n_active"], jnp.int32)
        refining = jnp.asarray(np.asarray(restored["refining"]) != 0)
    else:
        row = np.linspace(t_span[0], t_span[1], n_steps0 + 1)
        row = np.concatenate(
            [row, np.full(max_nodes - n_steps0 - 1, row[-1])]
        )
        times = jnp.asarray(np.broadcast_to(row, (b, max_nodes)).copy(), dtype)
        n_active = jnp.full((b,), n_steps0, jnp.int32)
        refining = jnp.ones((b,), bool)
    if sharding is not None:
        times = jax.device_put(times, sharding)
        n_active = jax.device_put(n_active, sharding)
        refining = jax.device_put(refining, sharding)

    n_cols = 2 * max_nodes + 2  # diag row width

    def _append(d_row, na_row):
        refine_h = d_row[:, -1] != 0
        history.append(
            FDPerMemberAdaptResult(
                times=d_row[:, :max_nodes].copy(),
                n_active=np.asarray(na_row).copy(),
                err_steps=d_row[:, max_nodes : 2 * max_nodes - 1].copy(),
                err_total=d_row[:, 2 * max_nodes - 1].copy(),
                j_coarse=d_row[:, 2 * max_nodes].copy(),
                n_refining=int(refine_h.sum()),
            )
        )
        return refine_h

    def _save(times_f, n_active_f, refining_f):
        from adjoint_ode_adaptivity_tpu.train.checkpoint import (
            save_checkpoint,
        )

        save_checkpoint(
            checkpoint_dir,
            len(history),
            {
                "times": np.asarray(times_f),
                "n_active": np.asarray(n_active_f),
                "refining": np.asarray(refining_f).astype(np.int32),
                "history": [dict(r._asdict()) for r in history],
            },
        )

    if device_loop:
        @jax.jit
        def _run_fused(times, n_active, refining):
            diag_buf = jnp.zeros((maxit + 1, b, n_cols), times.dtype)
            na_buf = jnp.zeros((maxit + 1, b), jnp.int32)
            if sharding is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                spec = NamedSharding(mesh, PartitionSpec(None, mesh_axis))
                diag_buf = jax.lax.with_sharding_constraint(diag_buf, spec)
                na_buf = jax.lax.with_sharding_constraint(na_buf, spec)

            def body(carry):
                t, na, r, dbuf, nbuf, it, _ = carry
                t_n, na_n, r_n, diag = _iteration(t, na, r)
                zero = jnp.zeros_like(it)
                dbuf = jax.lax.dynamic_update_slice(
                    dbuf, diag[None].astype(dbuf.dtype), (it, zero, zero)
                )
                nbuf = jax.lax.dynamic_update_slice(
                    nbuf, na[None], (it, zero)
                )
                return (t_n, na_n, r_n, dbuf, nbuf, it + 1,
                        jnp.sum(r_n) > 0)

            def cond(carry):
                it, cont = carry[5], carry[6]
                return (it <= maxit) & cont

            t_f, na_f, r_f, dbuf, nbuf, n_done, _ = jax.lax.while_loop(
                cond, body,
                (times, n_active, refining, diag_buf, na_buf,
                 jnp.int32(it0), jnp.array(True)),
            )
            return t_f, na_f, r_f, dbuf, nbuf, n_done

        t_f, na_f, r_f, dbuf, nbuf, n_done = _run_fused(
            times, n_active, refining
        )
        n_done = int(n_done)
        dbuf, nbuf = np.asarray(dbuf), np.asarray(nbuf)
        for i in range(it0, n_done):
            _append(dbuf[i], nbuf[i])
        if checkpoint_dir is not None and n_done > it0:
            _save(t_f, na_f, r_f)

        class _FusedHistory(list):
            pass

        out = _FusedHistory(history)
        out.iteration = _iteration
        out.run_fused = _run_fused
        return out

    for _ in range(it0, maxit + 1):
        times_new, n_active_new, refine_new, diag = _iteration(
            times, n_active, refining
        )
        _append(np.asarray(diag), n_active)
        if history[-1].n_refining > 0:
            times, n_active, refining = times_new, n_active_new, refine_new
        if checkpoint_dir is not None:
            _save(times, n_active, refining)
        if history[-1].n_refining == 0:
            break

    class _History(list):
        pass

    out = _History(history)
    out.iteration = _iteration
    return out
