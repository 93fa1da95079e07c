"""DG-in-time discrete adjoint march, Radau reconstruction, and the
per-element adjoint-weighted residual error contributions.

Reference parity: ``matlab/adj_march.m`` (backward element sweep at order
n_primal+1, linearised weighted mass M_v, per-element
err(k) = vᵀ(primal residual at adjoint order)), ``matlab/adj_rec.m``
(solve the adjoint at the primal's order, reconstruct to order+1 through
Radau collocation points + the known inflow endpoint), and
``matlab/err_contribution.m`` (continuous-adjoint error contributions with
an exact adjoint).

Derivation note (clean form — documented deviation): for a'(t) =
−f'(u)a − g_u with a(T)=0, upwind DG marching backward gives per element

    (−Sᵀ − e_L e_Lᵀ + M_w) v = −M·g_u_vec − e_R·v_inflow

with M_w = h/2·Φᵀdiag(w⊙f'(u_q))Φ and all quadrature *inside* the element.
The reference reaches the same system through a negative-h parameterisation
(adj_march.m:72), but anchors its interpolation points at the wrong element
end (adj_march.m:78: ``tk(1) + (1+r)·hk/2`` with hk<0 spans [t_L−h, t_L],
i.e. the *neighbouring* interval) — an O(h) extrapolation artifact we do not
reproduce. Our form is verified by effectivity against the fine solve to
1e-10 on linear problems (the matlab/MAIN.m:55-76 check).

Error contributions: err_k = v_kᵀ R_k(u_H), the primal slab residual
(march/dg_time.py weak form) evaluated at the adjoint's order with the
interpolated primal — exactly the adjoint-weighted residual localisation.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from adjoint_ode_adaptivity_tpu.march.dg_time import DGTimeOperators, f32_matmuls
from adjoint_ode_adaptivity_tpu.ops.jacobi import radau_points
from adjoint_ode_adaptivity_tpu.ops.operators import interp_matrix_1d, vandermonde_1d

__all__ = [
    "DGAdjointResult",
    "dg_adjoint_march",
    "dg_element_functional",
    "dg_adjoint_reconstruct",
    "dg_awr_from_adjoint",
    "continuous_err_contribution",
]


class DGAdjointResult(NamedTuple):
    v: jnp.ndarray  # (K, Np_adj) adjoint nodal values
    t: jnp.ndarray  # (K, Np_adj) node times
    err: jnp.ndarray  # (K,) adjoint-weighted residual contributions


def _interp_ops(n_primal: int, ops_adj: DGTimeOperators):
    """Primal-nodal → (adjoint nodes, adjoint quadrature) interp matrices."""
    from adjoint_ode_adaptivity_tpu.ops.jacobi import jacobi_gl

    r_p = jacobi_gl(0.0, 0.0, n_primal)
    to_nodes = interp_matrix_1d(n_primal, r_p, ops_adj.r)
    to_quad = interp_matrix_1d(n_primal, r_p, ops_adj.rq)
    return to_nodes, to_quad


@f32_matmuls
def dg_adjoint_march(
    ops_adj: DGTimeOperators,
    f: Callable,
    u_primal: jnp.ndarray,  # (K, Np_primal) nodal primal from dg_march
    times: jnp.ndarray,  # (K+1,) partition
    y0,
    *,
    g_u: Callable = lambda u, t: jnp.ones_like(u),
    v_terminal: float = 0.0,
) -> DGAdjointResult:
    """Backward adjoint sweep at order ``ops_adj.n`` (primal order + 1) with
    per-element error contributions.

    ``g_u`` is ∂(functional integrand)/∂u (default: J = ∫u ⇒ 1).
    """
    times = jnp.asarray(times)
    dtype = times.dtype
    k = u_primal.shape[0]
    n_primal = u_primal.shape[1] - 1
    to_nodes, to_quad = _interp_ops(n_primal, ops_adj)
    to_nodes = jnp.asarray(to_nodes, dtype)
    to_quad = jnp.asarray(to_quad, dtype)
    s = jnp.asarray(ops_adj.stiff, dtype)
    m_ref = jnp.asarray(ops_adj.mass, dtype)
    phi = jnp.asarray(ops_adj.phi, dtype)
    wq = jnp.asarray(ops_adj.wq, dtype)
    rq = jnp.asarray(ops_adj.rq, dtype)
    r_adj = jnp.asarray(ops_adj.r, dtype)
    np_a = ops_adj.np_

    e_l = jnp.zeros((np_a, np_a), dtype).at[0, 0].set(1.0)
    f_u = jax.vmap(jax.grad(lambda uu, tt: f(uu, tt)))

    t_left = times[:-1]
    hs = times[1:] - times[:-1]
    u_prevs = jnp.concatenate([jnp.asarray(y0, dtype).reshape(1), u_primal[:-1, -1]])

    def solve_element(v_inflow, xs):
        u_el, tl, h, u_prev = xs
        u_q = to_quad @ u_el  # primal at adjoint quadrature (in-element!)
        t_q = tl + (1.0 + rq) * h / 2.0
        m_w = h / 2.0 * (phi.T @ (wq[:, None] * f_u(u_q, t_q)[:, None] * phi))
        m = h / 2.0 * m_ref
        a_mat = -s.T - e_l + m_w
        t_n = tl + (1.0 + r_adj) * h / 2.0
        rhs = -(m @ g_u(to_nodes @ u_el, t_n)) - jnp.zeros((np_a,), dtype).at[-1].set(
            v_inflow
        )
        v_el = jnp.linalg.solve(a_mat, rhs)

        # adjoint-weighted residual of the interpolated primal at this order
        u_h = to_nodes @ u_el
        m_tilde = h / 2.0 * (phi.T @ (wq * f(u_q, t_q)))
        res = (
            s.T @ u_h
            - jnp.zeros((np_a,), dtype).at[-1].set(u_h[-1])
            + m_tilde
            + jnp.zeros((np_a,), dtype).at[0].set(u_prev)
        )
        err_el = v_el @ res
        return v_el[0], (v_el, t_n, err_el)

    _, (v, t, err) = lax.scan(
        solve_element,
        jnp.asarray(v_terminal, dtype),
        (u_primal, t_left, hs, u_prevs),
        reverse=True,
    )
    return DGAdjointResult(v=v, t=t, err=err)


@f32_matmuls
def dg_element_functional(
    ops: DGTimeOperators, u: jnp.ndarray, times: jnp.ndarray, g: Callable = lambda u, t: u
) -> jnp.ndarray:
    """J = Σ_k ∫_k g(u_h) dt by element-wise Gauss quadrature (the
    matlab/MAIN.m:55-73 ``integral(polyfit)`` functional evaluations)."""
    times = jnp.asarray(times)
    hs = times[1:] - times[:-1]
    phi = jnp.asarray(ops.phi, u.dtype)
    wq = jnp.asarray(ops.wq, u.dtype)
    rq = jnp.asarray(ops.rq, u.dtype)

    def one(u_el, tl, h):
        u_q = phi @ u_el
        t_q = tl + (1.0 + rq) * h / 2.0
        return h / 2.0 * jnp.sum(wq * g(u_q, t_q))

    return jnp.sum(jax.vmap(one)(u, times[:-1], hs))


@f32_matmuls
def dg_awr_from_adjoint(
    ops_adj: DGTimeOperators,
    f: Callable,
    u_primal: jnp.ndarray,
    times: jnp.ndarray,
    y0,
    v_hi: jnp.ndarray,  # (K, Np_adj) adjoint at ops_adj order (solved or reconstructed)
) -> jnp.ndarray:
    """Per-element adjoint-weighted residual err_k = v_kᵀ R_k(u_H) for a
    *given* higher-order adjoint — used by the reconstruction path
    (adj_rec.m) where v comes from a low-order solve lifted through Radau
    collocation instead of a direct higher-order solve."""
    times = jnp.asarray(times)
    dtype = times.dtype
    n_primal = u_primal.shape[1] - 1
    to_nodes, to_quad = _interp_ops(n_primal, ops_adj)
    to_nodes = jnp.asarray(to_nodes, dtype)
    to_quad = jnp.asarray(to_quad, dtype)
    s = jnp.asarray(ops_adj.stiff, dtype)
    phi = jnp.asarray(ops_adj.phi, dtype)
    wq = jnp.asarray(ops_adj.wq, dtype)
    rq = jnp.asarray(ops_adj.rq, dtype)
    np_a = ops_adj.np_
    t_left = times[:-1]
    hs = times[1:] - times[:-1]
    u_prevs = jnp.concatenate([jnp.asarray(y0, dtype).reshape(1), u_primal[:-1, -1]])

    def one(u_el, v_el, tl, h, u_prev):
        u_q = to_quad @ u_el
        t_q = tl + (1.0 + rq) * h / 2.0
        u_h = to_nodes @ u_el
        m_tilde = h / 2.0 * (phi.T @ (wq * f(u_q, t_q)))
        res = (
            s.T @ u_h
            - jnp.zeros((np_a,), dtype).at[-1].set(u_h[-1])
            + m_tilde
            + jnp.zeros((np_a,), dtype).at[0].set(u_prev)
        )
        return v_el @ res

    return jax.vmap(one)(u_primal, v_hi, t_left, hs, u_prevs)


@f32_matmuls
def dg_adjoint_reconstruct(
    ops_primal: DGTimeOperators,
    v_low: jnp.ndarray,  # (K, Np_primal) adjoint solved at the primal's order
    times: jnp.ndarray,
    v_terminal: float = 0.0,
) -> jnp.ndarray:
    """Reconstruct a low-order adjoint to order n+1 through left-Radau
    collocation + the known right-endpoint inflow value (adj_rec.m:34-47).

    Returns the (K, Np_primal+1) NODAL values of the reconstructed
    polynomial at the (n+1)-order GL nodes of each element.
    """
    n = ops_primal.n
    m = n + 1  # reconstruction order
    rad = radau_points(m)  # m left-Radau points on [-1, 1]
    # evaluate the low-order adjoint polynomial at the Radau points
    eval_rad = jnp.asarray(interp_matrix_1d(n, np.asarray(ops_primal.r), rad), v_low.dtype)
    # fit degree-m polynomial through (radau points, right endpoint)
    fit_pts = np.concatenate([rad, [1.0]])
    v_fit = np.linalg.inv(vandermonde_1d(m, fit_pts))  # modal coeffs from values
    from adjoint_ode_adaptivity_tpu.ops.jacobi import jacobi_gl

    r_hi = jacobi_gl(0.0, 0.0, m)
    v_hi = vandermonde_1d(m, r_hi)
    to_hi = jnp.asarray(v_hi @ v_fit, v_low.dtype)  # values at fit pts -> GL(m) nodes

    k = v_low.shape[0]
    # inflow value at each element's right endpoint = next element's v[0];
    # the LAST element's is the terminal condition (must match the paired
    # low-order solve's v_terminal)
    v_right_in = jnp.concatenate(
        [v_low[1:, 0], jnp.full((1,), v_terminal, v_low.dtype)]
    )

    def one(v_el, v_in):
        at_rad = eval_rad @ v_el
        vals = jnp.concatenate([at_rad, v_in[None]])
        return to_hi @ vals

    return jax.vmap(one)(v_low, v_right_in)


@f32_matmuls
def continuous_err_contribution(
    ops: DGTimeOperators,
    u: jnp.ndarray,  # (K, Np) primal nodal values
    times: jnp.ndarray,
    adj_fn: Callable,  # exact continuous adjoint a(t)
    f: Callable,  # ODE rhs
    y0: float,
    include_jumps: str = "all",
) -> jnp.ndarray:
    """Per-element ∫ a(t)·(f(u_h) − u_h') dt plus jump terms
    a(t_k)·(u_h(t_k⁺) − u_h(t_k⁻)) at element inflows.

    The complete continuous-adjoint error representation for DG-in-time
    requires the jump term at *every* element interface (the DG solution is
    discontinuous there); ``err_contribution.m:21-46`` keeps only the
    initial-condition jump (``include_jumps="first"`` reproduces that,
    commented-out lines :42-44 show the full version was intended)."""
    times = jnp.asarray(times)
    dtype = times.dtype
    hs = times[1:] - times[:-1]
    phi = jnp.asarray(ops.phi, dtype)
    wq = jnp.asarray(ops.wq, dtype)
    rq = jnp.asarray(ops.rq, dtype)
    # derivative at quadrature points: interpolate the nodal derivative
    from adjoint_ode_adaptivity_tpu.ops.operators import dmatrix_1d

    dr = jnp.asarray(dmatrix_1d(ops.n, np.asarray(ops.r), np.asarray(ops.v)), dtype)

    def one(u_el, tl, h):
        u_q = phi @ u_el
        du_q = phi @ (dr @ u_el) * (2.0 / h)
        t_q = tl + (1.0 + rq) * h / 2.0
        integrand = adj_fn(t_q) * (f(u_q, t_q) - du_q)
        return h / 2.0 * jnp.sum(wq * integrand)

    err = jax.vmap(one)(u, times[:-1], hs)
    # error representation: J(u) − J(u_h) = Σ_k [ ∫_k a·R dt − a(t_k⁻)·jump_k ]
    # with jump_k = u_h(t_k⁺) − u_h(t_k⁻) the inflow jump (y0 at the IC)
    u_in = jnp.concatenate([jnp.asarray(y0, dtype).reshape(1), u[:-1, -1]])
    jumps = adj_fn(times[:-1]) * (u[:, 0] - u_in)
    if include_jumps == "all":
        return err - jumps
    if include_jumps != "first":
        raise ValueError(
            f"include_jumps must be 'all' or 'first', got {include_jumps!r}"
        )
    return err.at[0].add(-jumps[0])
