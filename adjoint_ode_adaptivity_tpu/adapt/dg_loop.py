"""Adaptive DG-in-time refinement loop — the matlab/MAIN.m driver.

Per iteration: coarse DG solve (order n), fine solve (n+2) for the
effectivity report, adjoint march at n+1, per-element adjoint-weighted
residual, bisect the element with the largest |contribution|
(MAIN.m:137-141), repeat.

The mesh grows by one element per iteration; each iteration jits at its own
(small) static shape. A padded static-shape variant is unnecessary here —
the DG element counts stay tiny (the MATLAB driver caps at 30 iterations) —
but the per-iteration pipeline is fully on device.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

from adjoint_ode_adaptivity_tpu.adjoint.dg_time import (
    dg_adjoint_march,
    dg_element_functional,
)
from adjoint_ode_adaptivity_tpu.march.dg_time import dg_march, dg_time_operators

__all__ = ["DGAdaptResult", "run_adaptive_dg"]


class DGAdaptResult(NamedTuple):
    times: np.ndarray  # partition at this iteration
    u: np.ndarray  # (K, Np) coarse primal
    v: np.ndarray  # (K, Np+1) adjoint
    err: np.ndarray  # (K,) element contributions
    j_coarse: float
    j_fine: float
    effectivity_gap: float  # JuH − Juh (MAIN.m:55-64)
    est_total: float  # Σ err (MAIN.m:75-76)


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
) -> list[DGAdaptResult]:
    """Adaptive h-refinement of the DG-in-time partition driven by the
    adjoint-weighted residual, with MAIN.m's effectivity telemetry."""
    ops_p = dg_time_operators(n_order, n_gq)
    ops_a = dg_time_operators(n_order + 1, None if n_gq is None else n_gq + 2)
    ops_f = dg_time_operators(n_order + fine_offset)

    times = np.linspace(t_span[0], t_span[1], k0 + 1)
    history: list[DGAdaptResult] = []
    for it in range(maxit + 1):
        t_j = jnp.asarray(times)
        res_p = dg_march(ops_p, f, t_j, y0)
        res_f = dg_march(ops_f, f, t_j, y0)
        adj = dg_adjoint_march(ops_a, f, res_p.u, t_j, y0, g_u=g_u)
        j_coarse = float(dg_element_functional(ops_p, res_p.u, t_j, g))
        j_fine = float(dg_element_functional(ops_f, res_f.u, t_j, g))
        result = DGAdaptResult(
            times=times.copy(),
            u=np.asarray(res_p.u),
            v=np.asarray(adj.v),
            err=np.asarray(adj.err),
            j_coarse=j_coarse,
            j_fine=j_fine,
            effectivity_gap=j_coarse - j_fine,
            est_total=float(jnp.sum(adj.err)),
        )
        history.append(result)
        if callback is not None:
            callback(result)
        if abs(result.est_total) < tol:
            break
        # bisect the element with the largest |contribution| (MAIN.m:137-140)
        ref_i = int(np.argmax(np.abs(result.err)))
        mid = 0.5 * (times[ref_i] + times[ref_i + 1])
        times = np.insert(times, ref_i + 1, mid)
    return history
