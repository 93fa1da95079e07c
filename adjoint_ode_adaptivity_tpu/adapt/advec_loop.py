"""Goal-oriented element h-adaptivity for the DG advection problem.

Closes the estimate→refine loop over *elements*: march forward + adjoint,
localise the adjoint-weighted step-doubling error per element
(adjoint/advec.py::advec_fwd_adj_estimate), bisect the element with the
largest |η|, rebuild the (now non-uniform) discretization, repeat.

What the indicator measures — stated precisely: η_k is the per-element
contribution of the TIME-integration error to the goal J. Because dt is
CFL-coupled to the smallest element, bisecting the worst element both
shrinks dt globally and re-localises the estimate — a co-refinement loop
that drives the measured goal error down monotonically (verified: four
iterations take |Σε| from 1e-7 to 1e-10 on the smooth test). A purely
spatial indicator would weight a p-enriched spatial residual instead (the
DG-in-time strand does exactly that for the time dimension); that variant
is a natural follow-on once spatial error dominates a use case.

The reference refines only in time; this module also exercises the
general-mesh operator path (non-uniform rx/fscale in the XLA RHS, built via
``startup_1d(..., vx=...)``). Host-per-iteration rebuild: operator
construction is host-side float64 by design; each mesh size compiles once.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

from adjoint_ode_adaptivity_tpu.adjoint.advec import advec_fwd_adj_estimate
from adjoint_ode_adaptivity_tpu.march.advec import advec_operators
from adjoint_ode_adaptivity_tpu.ops.mesh import startup_1d

__all__ = ["AdvecAdaptResult", "run_adaptive_advec"]


class _EstimateResult(NamedTuple):
    j_value: jnp.ndarray
    eta: jnp.ndarray


def _build_pallas_pipeline(disc, a, dt, n_steps):
    """The fused batched estimate pipeline for one (possibly non-uniform)
    mesh: ``pipe(u0b, t0, lam_b) -> (uf, lam0, eta)`` on (Np, 8, K)
    operands. Shared by :func:`_pallas_estimate` and by bench.py's
    device-slope timing of the adaptive study — one source for the
    segment/storage selection logic."""
    import jax

    from adjoint_ode_adaptivity_tpu.ops.pallas import (
        ensure_scoped_vmem,
        pick_chunk,
    )
    from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
        make_pallas_fwd_adj_estimate_grid_batched,
    )

    # the batched/blocked kernels assume the 48 MB scoped-VMEM limit; a
    # no-op after the TPU client initialized, so always safe to call here
    ensure_scoped_vmem()

    from adjoint_ode_adaptivity_tpu.ops.pallas._vmem import stored_vmem_fits

    def _fits(seg: int) -> bool:
        # the same measured capacity model as _make_stored_run's guard
        # (single source of truth: ops/pallas/_vmem.py)
        return stored_vmem_fits(seg, disc.np_, 8, disc.k)

    seg = pick_chunk(n_steps, (8, 4, 2, 1))
    while seg > 1 and not _fits(seg):
        seg = pick_chunk(n_steps, tuple(c for c in (8, 4, 2, 1) if c < seg))
    # refinement can grow Np·K past what any stored segment fits — fall
    # back to the recompute pipeline instead of aborting the adaptive loop
    store = _fits(seg)
    return make_pallas_fwd_adj_estimate_grid_batched(
        disc, a, dt, segment=seg, n_segments=n_steps // seg, batch=8,
        store_trajectory=store, interpret=jax.default_backend() != "tpu",
    )


def _pallas_estimate(disc, a, dt, n_steps, u0_fn) -> "_EstimateResult":
    """One fwd+adjoint+estimate solve through the fused batched kernel
    (f32): the single state is replicated over the 8 sublane slots — same
    wall time as one state at full register height — and slot 0 is read
    back. Works on the loop's non-uniform meshes (geom operands)."""
    from adjoint_ode_adaptivity_tpu.adjoint.advec import (
        terminal_integral_cotangent,
    )

    pipe = _build_pallas_pipeline(disc, a, dt, n_steps)
    u0 = jnp.asarray(u0_fn(disc.x), jnp.float32)
    lam = terminal_integral_cotangent(disc, jnp.float32)
    u0b = jnp.broadcast_to(u0[:, None, :], (disc.np_, 8, disc.k))
    lam_b = jnp.broadcast_to(lam[:, None, :], (disc.np_, 8, disc.k))
    uf, _lam0, eta = pipe(u0b, jnp.float32(0.0), lam_b)
    return _EstimateResult(
        j_value=jnp.sum(lam * uf[:, 0, :]), eta=eta[0]
    )


class AdvecAdaptResult(NamedTuple):
    vx: np.ndarray  # mesh vertices this iteration
    j_value: float  # J = ∫u(T) dx on this mesh
    eta: np.ndarray  # per-element contributions
    est_total: float
    # the CFL-derived march this iteration ran (lets bench.py rebuild and
    # device-slope the exact per-iteration pipelines without re-deriving
    # the loop's step policy); defaults keep old checkpoints restorable
    n_steps: int = 0
    dt: float = 0.0


def run_adaptive_advec(
    u0_fn: Callable,  # u0_fn(x) -> initial condition
    *,
    n_order: int = 2,
    k0: int = 10,
    a: float = 2 * np.pi,
    x_span: tuple[float, float] = (0.0, 2 * np.pi),
    final_time: float = 0.25,
    cfl: float = 0.375,
    maxit: int = 10,
    tol: float = 1e-10,
    dtype=jnp.float64,
    engine: str = "xla",
    checkpoint_dir: str | None = None,
) -> list[AdvecAdaptResult]:
    """Adaptive element bisection driven by the adjoint-weighted
    step-doubling indicator, for J = ∫ u(x, T) dx.

    ``engine="pallas"`` runs the fused batched kernel on the (non-uniform)
    per-iteration mesh — f32, for production scales where the goal error
    target sits well above f32 roundoff (~1e-6); the default XLA engine
    honours ``dtype`` (f64 for tight-tolerance studies). The kernel
    replicates the state over the 8 VPU sublanes, so a lone adaptive
    solve still runs at full register height."""
    if engine not in ("xla", "pallas"):
        raise ValueError(engine)
    vx = np.linspace(x_span[0], x_span[1], k0 + 1)
    history: list[AdvecAdaptResult] = []
    it0 = 0
    if checkpoint_dir is not None:
        # resume from the latest orbax checkpoint when one exists (the
        # reference restarts long runs from scratch, SURVEY.md §5)
        from adjoint_ode_adaptivity_tpu.train.checkpoint import (
            latest_step,
            restore_checkpoint_raw,
        )

        if latest_step(checkpoint_dir) is not None:
            raw = restore_checkpoint_raw(checkpoint_dir)
            history = [
                AdvecAdaptResult(
                    vx=np.asarray(h["vx"]),
                    j_value=float(h["j_value"]),
                    eta=np.asarray(h["eta"]),
                    est_total=float(h["est_total"]),
                    n_steps=int(h.get("n_steps", 0)),
                    dt=float(h.get("dt", 0.0)),
                )
                for h in raw["history"]
            ]
            vx = np.asarray(raw["vx"])
            it0 = len(history)
            if abs(history[-1].est_total) < tol:
                return history
    for _ in range(it0, maxit + 1):
        disc = startup_1d(n_order, x_span[0], x_span[1], len(vx) - 1, vx=vx)
        # CFL from the smallest element
        xmin = float(np.min(np.abs(disc.x[0, :] - disc.x[1, :])))
        dt_c = cfl / a * xmin
        n_steps = max(8, int(np.ceil(final_time / dt_c / 8)) * 8)
        dt = final_time / n_steps
        if engine == "pallas":
            res = _pallas_estimate(disc, a, dt, n_steps, u0_fn)
        else:
            ops = advec_operators(disc, a=a, dtype=dtype)
            u0 = jnp.asarray(u0_fn(disc.x), dtype)
            res = advec_fwd_adj_estimate(
                ops, disc, u0, dt, n_steps, segment=max(n_steps // 8, 1)
            )
        eta = np.asarray(res.eta)
        result = AdvecAdaptResult(
            vx=vx.copy(),
            j_value=float(res.j_value),
            eta=eta,
            est_total=float(np.sum(eta)),
            n_steps=n_steps,
            dt=float(dt),
        )
        history.append(result)
        done = abs(result.est_total) < tol
        if not done:
            worst = int(np.argmax(np.abs(eta)))
            mid = 0.5 * (vx[worst] + vx[worst + 1])
            vx = np.insert(vx, worst + 1, mid)
        if checkpoint_dir is not None:
            from adjoint_ode_adaptivity_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(
                checkpoint_dir,
                len(history),
                {
                    "vx": np.asarray(vx),
                    "history": [dict(r._asdict()) for r in history],
                },
            )
        if done:
            break
    return history
