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
    "revolve_advec_estimate",
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


def revolve_advec_estimate(
    disc,
    a: float,
    dt: float,
    n_steps: int,
    unit_steps: int,
    snaps: int | None = None,
    segment: int = 8,
    interpret: bool = False,
):
    """Beyond-HBM fwd+adjoint+estimate for the DG advection march: the
    revolve schedule over UNITS of ``unit_steps`` steps, each unit driven
    by the fused Pallas blocked-single kernels.

    The stored-trajectory pipeline
    (ops/pallas/dg_rhs.make_pallas_fwd_adj_estimate_grid_single_blocked)
    streams every coarse state to HBM — Np·K·4·n_steps bytes, which at
    K=10⁵ caps n_steps near 1.3e4 on a 16 GB chip. This composition keeps
    only ``snaps`` checkpointed STATES (Np·K·4 each) plus ONE unit's
    trajectory: advances are the forward-only kernel
    (make_pallas_advec_march_single_blocked), each reverse runs the stored
    pipeline on one unit with a TRACED start time and chains λ through the
    unit boundary. λ composition is exact (sequential transposes); η is
    the same per-step sum accumulated unit-wise (f32 association at unit
    boundaries only). Memory: snaps·state + unit_steps·state versus
    n_steps·state stored — e.g. n_steps=16384, unit=128, snaps=16 → 0.9%
    of the stored footprint.

    Returns ``run(u0, t0, lam_end) -> (u_final, lam0, eta)`` (same
    contract as the monolithic pipeline, tested equal in interpret mode)
    with ``run.revolve_stats`` carrying the planner's structural counts:
    ``forward_units`` (units advanced, incl. recomputation — the measured
    recompute factor is forward_units/n_units) and ``max_slots``
    (≤ snaps, the memory bound).
    """
    from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
        make_pallas_advec_march_single_blocked,
        make_pallas_fwd_adj_estimate_grid_single_blocked,
    )

    if n_steps % unit_steps:
        raise ValueError(f"n_steps={n_steps} not a multiple of {unit_steps}")
    if unit_steps % segment:
        raise ValueError(f"unit_steps={unit_steps} not a multiple of {segment}")
    n_units = n_steps // unit_steps
    if snaps is None:
        snaps = optimal_snaps(n_units)
    schedule = plan_schedule(n_units, snaps)
    from adjoint_ode_adaptivity_tpu.adjoint.checkpointing import (
        simulate_schedule,
    )

    plan_stats = simulate_schedule(n_units, snaps, schedule)
    march = make_pallas_advec_march_single_blocked(
        disc, a, dt, segment=segment, n_segments=unit_steps // segment,
        interpret=interpret,
    )
    pipe = make_pallas_fwd_adj_estimate_grid_single_blocked(
        disc, a, dt, segment=segment, n_segments=unit_steps // segment,
        interpret=interpret,
    )
    unit_dt = unit_steps * dt

    def run(u0, t0, lam_end):
        u_final_box = []

        def step_at(i, u):
            return march(u, t0 + i * unit_dt)

        def reverse_at(i, u_i, lam):
            lam_u, eta_acc = lam
            uf, lam0, eta = pipe(u_i, t0 + i * unit_dt, lam_u)
            if i == n_units - 1:  # this unit's final state IS u(T)
                u_final_box.append(uf)
            return (lam0, eta_acc + eta)

        lam_init = (lam_end, jnp.zeros((disc.k,), lam_end.dtype))
        (lam0, eta), _stats = execute_revolve(
            step_at, reverse_at, u0, lam_init, n_units, snaps, schedule
        )
        return u_final_box[0], lam0, eta

    run.revolve_stats = {
        "snaps": snaps,
        "n_units": n_units,
        "unit_steps": unit_steps,
        "forward_units": plan_stats["forward_steps"],
        "max_slots": plan_stats["max_slots"],
        "repetitions": min_repetitions(n_units, snaps),
    }
    return run


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
