"""Bounded-memory adjoints: the revolve schedule executed behind custom_vjp.

The planner (adjoint/checkpointing.py, native/revolve.cpp) emits the
Griewank–Walther binomial action list; this module *consumes* it. The
schedule is static (host-side, once per configuration), so the executor
unrolls it at trace time: slot stores/restores are plain Python list
assignments over traced arrays, "advance" segments are forward steps, and
each "reverse" applies one per-step VJP. The compiled program therefore
holds at most ``snaps`` checkpoint states plus one live state — O(s) memory
for an N-step march with O(N·t) recompute, t = min_repetitions(N, s).

``checkpointed_march`` wraps a forward-Euler-style march ``u_{i+1} =
step_fn(u_i, t_i, dt_i)`` in ``jax.custom_vjp``: ``jax.grad`` through it
takes the revolve path, matching the stored-trajectory gradient to roundoff
(tested) while saving only ``(u0, dt)`` as residuals. This is the north-star
"discrete adjoint reverse sweep generated via custom_vjp with binomial
checkpointing" applied to the reference's march (the reference itself stores
the whole trajectory and dense-solves — python/Main_finite_difference.py:54-76).

``checkpointed_advec_march`` is the same wrapper around the DG advection
LSRK march (march/advec.py), whose production estimate pipeline uses
two-level segmented checkpointing (adjoint/advec.py) — revolve is the
memory-optimal alternative when HBM is tighter than √N segments.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from adjoint_ode_adaptivity_tpu.adjoint.checkpointing import (
    min_repetitions,
    optimal_snaps,
    plan_schedule,
)

__all__ = [
    "execute_revolve",
    "checkpointed_march",
    "checkpointed_advec_march",
]


def execute_revolve(
    step_at: Callable[[int, Any], Any],
    reverse_at: Callable[[int, Any, Any], Any],
    u0: Any,
    lam_init: Any,
    n_steps: int,
    snaps: int,
    schedule: list[tuple[str, int]] | None = None,
):
    """Run a revolve schedule. ``step_at(i, state) -> state_{i+1}`` advances
    one step; ``reverse_at(i, state_i, lam) -> lam`` applies the adjoint of
    step i (and may fold in source terms / accumulators — ``lam`` is an
    arbitrary pytree carried through the reverse sweep).

    Returns ``(lam_final, stats)`` with ``stats = {"forward_steps",
    "max_slots"}`` counted during (trace-time) execution — the structural
    proof that the memory bound holds.
    """
    schedule = schedule if schedule is not None else plan_schedule(n_steps, snaps)
    slots: dict[int, tuple[int, Any]] = {}
    pos, state, lam = 0, u0, lam_init
    next_rev = n_steps
    fwd_count, max_slots = 0, 0
    for act, arg in schedule:
        if act == "advance":
            for _ in range(arg):
                state = step_at(pos, state)
                pos += 1
                fwd_count += 1
        elif act == "takeshot":
            slots[arg] = (pos, state)
            if len(slots) > snaps:
                raise AssertionError("revolve slot budget exceeded")
            max_slots = max(max_slots, len(slots))
        elif act == "restore":
            pos, state = slots[arg]
        elif act == "reverse":
            if pos != next_rev - 1:  # pragma: no cover — planner invariant
                raise AssertionError(f"reverse at {pos}, expected {next_rev - 1}")
            lam = reverse_at(pos, state, lam)
            next_rev -= 1
        else:  # pragma: no cover
            raise ValueError(act)
    if next_rev != 0:  # pragma: no cover — planner invariant
        raise AssertionError(f"{next_rev} steps never reversed")
    return lam, {"forward_steps": fwd_count, "max_slots": max_slots}


def checkpointed_march(
    step_fn: Callable,
    n_steps: int,
    snaps: int | None = None,
    t0: float = 0.0,
):
    """A march ``(u0, dt) -> u_final`` over ``n_steps`` (possibly nonuniform)
    steps whose reverse-mode gradient runs the revolve schedule with
    ``snaps`` checkpoint slots instead of storing the trajectory.

    Gradients w.r.t. both ``u0`` and ``dt`` are exact, including the
    dependence of the step times ``t_i = t0 + Σ_{j<i} dt_j`` on earlier
    steps (the reverse sweep carries the time cotangent alongside the state
    cotangent).
    """
    if snaps is None:
        snaps = optimal_snaps(n_steps)
    schedule = plan_schedule(n_steps, snaps)

    def _step_at(dt):
        def step_at(i, ut):
            u, t = ut
            return step_fn(u, t, dt[i]), t + dt[i]

        return step_at

    def _plain(u0, dt):
        ut = (u0, jnp.asarray(t0, u0.dtype))
        step_at = _step_at(dt)
        for i in range(n_steps):
            ut = step_at(i, ut)
        return ut[0]

    @jax.custom_vjp
    def march(u0, dt):
        return _plain(u0, dt)

    def fwd(u0, dt):
        return _plain(u0, dt), (u0, dt)

    def bwd(res, g):
        u0, dt = res
        step_at = _step_at(dt)

        def reverse_at(i, ut, lam):
            lam_ut, dt_bar = lam
            _, vjp = jax.vjp(lambda s, d: step_at_d(i, s, d), ut, dt[i])
            lam_ut, dt_i_bar = vjp(lam_ut)
            return lam_ut, dt_bar.at[i].add(dt_i_bar)

        def step_at_d(i, ut, dt_i):
            u, t = ut
            return step_fn(u, t, dt_i), t + dt_i

        lam0 = ((g, jnp.zeros((), g.dtype)), jnp.zeros_like(dt))
        ut0 = (u0, jnp.asarray(t0, u0.dtype))
        (lam_ut, dt_bar), _ = execute_revolve(
            step_at, reverse_at, ut0, lam0, n_steps, snaps, schedule
        )
        return lam_ut[0], dt_bar

    march.defvjp(fwd, bwd)
    march.revolve_stats = {
        "snaps": snaps,
        "repetitions": min_repetitions(n_steps, snaps),
        "schedule_len": len(schedule),
    }
    return march


def checkpointed_advec_march(
    ops,
    dt: float,
    n_steps: int,
    snaps: int | None = None,
    t0: float = 0.0,
):
    """Revolve-checkpointed DG advection march ``u0 -> u_final`` (uniform
    ``dt``): ``jax.grad(J ∘ march)`` runs the binomial reverse sweep of the
    exact LSRK transpose with ``snaps`` stored states."""
    from adjoint_ode_adaptivity_tpu.adjoint.advec import lsrk_step

    if snaps is None:
        snaps = optimal_snaps(n_steps)
    schedule = plan_schedule(n_steps, snaps)

    def step_at(i, u):
        return lsrk_step(ops, u, jnp.asarray(t0 + i * dt, u.dtype), dt)

    def _plain(u0):
        u = u0
        for i in range(n_steps):
            u = step_at(i, u)
        return u

    @jax.custom_vjp
    def march(u0):
        return _plain(u0)

    def fwd(u0):
        return _plain(u0), u0

    def bwd(u0, g):
        def reverse_at(i, u, lam):
            _, vjp = jax.vjp(lambda v: step_at(i, v), u)
            return vjp(lam)[0]

        lam, _ = execute_revolve(step_at, reverse_at, u0, g, n_steps, snaps, schedule)
        return (lam,)

    march.defvjp(fwd, bwd)
    march.revolve_stats = {
        "snaps": snaps,
        "repetitions": min_repetitions(n_steps, snaps),
        "schedule_len": len(schedule),
    }
    return march
