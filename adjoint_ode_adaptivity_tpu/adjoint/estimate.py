"""Grid refinement, trajectory interpolation, and the adjoint-weighted
residual error estimate.

Reference parity:
- ``refineAll`` (python/Main_finite_difference.py:16-21, factory.py:272-278)
  and ``refineTime`` (Main_new_loss.py:105-111): split every coarse step into
  ``ref_factor`` equal fine steps → here a single ``jnp.repeat``.
- ``interpU`` / ``refineSolution``: linear interpolation of the coarse primal
  onto the fine grid (jnp.interp).
- ``errEst`` (Main_finite_difference.py:79-94): fine-grid one-step residual
  weighted by the adjoint. The residuals at different nodes are independent —
  computed with one ``vmap`` instead of the reference's sequential loop.
- Coarse-step windowing: two conventions exist in the reference and both are
  provided —
  * ``"strided"``: |err|[2:] window-summed with window ``rf−1``, stride
    ``rf`` (the stride-tricks block, Main_finite_difference.py:270-277).
  * ``"block"``: signed block sums err[i·rf+1 : (i+1)·rf+1] then abs
    (``errorIndicator``, Main_new_loss.py:123-135).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from adjoint_ode_adaptivity_tpu.march.fd import times_from_dt

__all__ = [
    "refine_all",
    "interp_to_fine",
    "residual",
    "error_estimate",
    "coarse_indicator",
]


def refine_all(dt: jnp.ndarray, ref_factor: int) -> jnp.ndarray:
    """Uniformly split each step into ``ref_factor`` fine steps."""
    return jnp.repeat(dt / ref_factor, ref_factor)


def interp_to_fine(
    u: jnp.ndarray, dt: jnp.ndarray, dt_fine: jnp.ndarray, t0: float = 0.0
) -> jnp.ndarray:
    """Linear interpolation of nodal values from the coarse to the fine grid.

    ``u`` is (N+1,) for scalar state or (N+1, d) for systems (interpolated
    per component)."""
    t_coarse = times_from_dt(dt, t0)
    t_fine = times_from_dt(dt_fine, t0)
    if u.ndim == 1:
        return jnp.interp(t_fine, t_coarse, u)
    return jax.vmap(lambda col: jnp.interp(t_fine, t_coarse, col), in_axes=1, out_axes=1)(u)


def residual(
    step_fn: Callable,
    u_fine: jnp.ndarray,
    dt_fine: jnp.ndarray,
    t0: float = 0.0,
    params_stacked: Any = None,
) -> jnp.ndarray:
    """One-step residual res[n] = u[n] − G(u[n−1]) on the fine grid (res[0]=0).

    All entries are independent → one vmap over nodes (the reference loops).
    """
    t_fine = times_from_dt(dt_fine, t0)
    if params_stacked is None:
        res = jax.vmap(lambda up, tn, dn, un: un - step_fn(up, tn, dn))(
            u_fine[:-1], t_fine[:-1], dt_fine, u_fine[1:]
        )
    else:
        res = jax.vmap(lambda up, tn, dn, pn, un: un - step_fn(up, tn, dn, pn))(
            u_fine[:-1], t_fine[:-1], dt_fine, params_stacked, u_fine[1:]
        )
    return jnp.concatenate([jnp.zeros_like(u_fine[:1]), res])


def error_estimate(res: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Adjoint-weighted residual per fine node: err = res ⊙ v."""
    return res * v


def coarse_indicator(
    err_fine: jnp.ndarray, ref_factor: int, convention: str = "strided"
) -> jnp.ndarray:
    """Collapse fine-node error contributions to one value per coarse step.

    ``err_fine`` has length ``n_coarse·rf + 1`` (node values, entry 0 unused).
    """
    rf = ref_factor
    n_coarse = (err_fine.shape[0] - 1) // rf
    if convention == "strided":
        # |err|[2:] → windows of rf−1 at stride rf:
        # step i sums |err_fine|[i·rf+2 .. i·rf+rf]
        x = jnp.abs(err_fine)
        x = jnp.concatenate([x[2:], jnp.zeros((1,), dtype=err_fine.dtype)])
        rows = x[: n_coarse * rf].reshape(n_coarse, rf)
        return jnp.sum(rows[:, : rf - 1], axis=1)
    elif convention == "block":
        # signed sums err_fine[i·rf+1 .. (i+1)·rf], then abs
        rows = err_fine[1:].reshape(n_coarse, rf)
        return jnp.abs(jnp.sum(rows, axis=1))
    raise ValueError(f"unknown convention {convention!r}")
