"""Mixed per-element-order DG-in-time adjoint march and error estimate.

The per-element-order counterpart of :mod:`adjoint_ode_adaptivity_tpu.adjoint.dg_time`
(reference: ``matlab/adj_march.m`` called as ``adj_march(Ns+1, Ks, times)``,
``MAIN.m:34`` — the adjoint order vector is the primal's plus one
element-wise).  Shares the padded-stack design of
:mod:`~adjoint_ode_adaptivity_tpu.march.dg_mixed`: every element gathers its
order-(ns[k]+1) tables at run time from one
:class:`~adjoint_ode_adaptivity_tpu.march.dg_mixed.MixedDGTimeOperators`
stack, so one compiled executable serves every order assignment — this is
what makes p-adaptivity (refining the ORDER at the argmax element instead
of bisecting it) compile-once on TPU.

Use ONE stack built with ``n_max_stack = n_max_primal + fine_offset`` for
the coarse march (orders ``ns``), the fine march (``ns + fine_offset``),
and this adjoint (``ns + 1``) — all paddings then agree.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from adjoint_ode_adaptivity_tpu.adjoint.dg_time import DGAdjointResult
from adjoint_ode_adaptivity_tpu.march.dg_mixed import (
    gauss_solve,
    MixedDGTimeOperators,
    _check_orders,
    _one_hot,
)
from adjoint_ode_adaptivity_tpu.march.dg_time import f32_matmuls
from adjoint_ode_adaptivity_tpu.ops.jacobi import jacobi_gl
from adjoint_ode_adaptivity_tpu.ops.operators import interp_matrix_1d

__all__ = [
    "MixedAdjointInterp",
    "MixedRadauInterp",
    "dg_adjoint_interp_mixed",
    "dg_adjoint_march_mixed",
    "dg_adjoint_reconstruct_mixed",
    "dg_adjoint_solve_low_mixed",
    "dg_awr_from_adjoint_mixed",
    "dg_element_functional_mixed",
    "dg_radau_interp_mixed",
]


class MixedAdjointInterp(NamedTuple):
    """Primal(order n) → adjoint(order n+1) interpolation stacks, indexed by
    the PRIMAL order − 1 (n in 1..n_max_stack−1); zero-padded to the stack's
    ``np_max`` on both sides."""

    to_nodes: np.ndarray  # (L, np_max, np_max) primal nodes -> adjoint nodes
    to_quad: np.ndarray  # (L, Q, np_max) primal nodes -> shared quadrature


def dg_adjoint_interp_mixed(mops: MixedDGTimeOperators) -> MixedAdjointInterp:
    np_m = mops.np_max
    q = mops.rq.shape[0]
    l = mops.n_max - 1
    to_nodes = np.zeros((l, np_m, np_m))
    to_quad = np.zeros((l, q, np_m))
    for n in range(1, mops.n_max):
        r_p = jacobi_gl(0.0, 0.0, n)
        r_a = jacobi_gl(0.0, 0.0, n + 1)
        to_nodes[n - 1, : n + 2, : n + 1] = interp_matrix_1d(n, r_p, r_a)
        to_quad[n - 1, :, : n + 1] = interp_matrix_1d(n, r_p, mops.rq)
    return MixedAdjointInterp(to_nodes=to_nodes, to_quad=to_quad)


@f32_matmuls
def dg_adjoint_march_mixed(
    mops: MixedDGTimeOperators,
    interp: MixedAdjointInterp,
    f: Callable,
    u_primal: jnp.ndarray,  # (K, np_max) padded nodal primal (dg_march_mixed)
    times: jnp.ndarray,
    ns: jnp.ndarray,  # (K,) PRIMAL orders; adjoint solves at ns+1
    y0,
    *,
    g_u: Callable = lambda u, t: jnp.ones_like(u),
    v_terminal: float = 0.0,
) -> DGAdjointResult:
    """Backward adjoint sweep at per-element order ``ns[k] + 1`` with the
    per-element adjoint-weighted residual contributions — identical results
    to the uniform :func:`~adjoint_ode_adaptivity_tpu.adjoint.dg_time.dg_adjoint_march`
    where ``ns`` is uniform (tested).  Requires ``ns[k] + 1 <= mops.n_max``.
    """
    times = jnp.asarray(times)
    dtype = times.dtype
    _check_orders(ns, mops.n_max - 1, what="ns (adjoint solves at ns+1)")
    ns = jnp.asarray(ns, jnp.int32)
    np_m = mops.np_max
    stiff = jnp.asarray(mops.stiff_pad, dtype)
    mass = jnp.asarray(mops.mass_pad, dtype)
    pad_eye = jnp.asarray(mops.pad_eye, dtype)
    phi = jnp.asarray(mops.phi_pad, dtype)
    r_p = jnp.asarray(mops.r_pad, dtype)
    rq = jnp.asarray(mops.rq, dtype)
    wq = jnp.asarray(mops.wq, dtype)
    to_nodes = jnp.asarray(interp.to_nodes, dtype)
    to_quad = jnp.asarray(interp.to_quad, dtype)

    e_l = jnp.zeros((np_m, np_m), dtype).at[0, 0].set(1.0)
    f_u = jax.vmap(jax.grad(lambda uu, tt: f(uu, tt)))

    t_left = times[:-1]
    hs = times[1:] - times[:-1]
    # inflow values: previous element's right-endpoint value (dynamic node)
    ends = jax.vmap(lambda u_el, n_k: jnp.dot(_one_hot(n_k, np_m, dtype), u_el))(
        u_primal, ns
    )
    u_prevs = jnp.concatenate([jnp.asarray(y0, dtype).reshape(1), ends[:-1]])

    def solve_element(v_inflow, xs):
        u_el, tl, h, u_prev, n_k = xs
        ip = n_k - 1  # primal-order index (interp stacks)
        ia = n_k  # adjoint order n_k+1 -> stack index n_k
        s_a = jnp.take(stiff, ia, axis=0)
        m_ref = jnp.take(mass, ia, axis=0)
        eye_a = jnp.take(pad_eye, ia, axis=0)
        phi_a = jnp.take(phi, ia, axis=0)
        r_a = jnp.take(r_p, ia, axis=0)
        to_n = jnp.take(to_nodes, ip, axis=0)
        to_q = jnp.take(to_quad, ip, axis=0)
        e_end = _one_hot(n_k + 1, np_m, dtype)

        u_q = to_q @ u_el  # primal at shared quadrature (in-element)
        t_q = tl + (1.0 + rq) * h / 2.0
        m_w = h / 2.0 * (phi_a.T @ (wq[:, None] * f_u(u_q, t_q)[:, None] * phi_a))
        a_mat = -s_a.T - e_l + m_w + eye_a
        t_n = tl + (1.0 + r_a) * h / 2.0
        u_h = to_n @ u_el
        # mask g_u to the live nodes: the padded entries of u_h are
        # fabricated zeros, and a g_u singular at 0 (e.g. 1/u) would turn
        # m_ref's 0-column annihilation into 0·inf = NaN
        live = (jnp.arange(np_m) <= n_k + 1).astype(dtype)
        rhs = -(h / 2.0 * (m_ref @ (live * g_u(u_h, t_n)))) - e_end * v_inflow
        v_el = gauss_solve(a_mat, rhs)

        # adjoint-weighted residual of the interpolated primal at order n+1
        m_tilde = h / 2.0 * (phi_a.T @ (wq * f(u_q, t_q)))
        res = (
            s_a.T @ u_h
            - e_end * jnp.dot(e_end, u_h)
            + m_tilde
            + jnp.zeros((np_m,), dtype).at[0].set(u_prev)
        )
        err_el = v_el @ res
        return v_el[0], (v_el, t_n, err_el)

    _, (v, t, err) = lax.scan(
        solve_element,
        jnp.asarray(v_terminal, dtype),
        (u_primal, t_left, hs, u_prevs, ns),
        reverse=True,
    )
    return DGAdjointResult(v=v, t=t, err=err)


@f32_matmuls
def dg_element_functional_mixed(
    mops: MixedDGTimeOperators,
    u: jnp.ndarray,  # (K, np_max) padded nodal values
    times: jnp.ndarray,
    ns: jnp.ndarray,  # (K,) the orders ``u`` was solved at
    g: Callable = lambda u, t: u,
) -> jnp.ndarray:
    """J = Σ_k ∫_k g(u_h) dt with per-element orders (the mixed-order
    counterpart of :func:`~adjoint_ode_adaptivity_tpu.adjoint.dg_time.dg_element_functional`)."""
    _check_orders(ns, mops.n_max)
    times = jnp.asarray(times)
    dtype = u.dtype
    ns = jnp.asarray(ns, jnp.int32)
    hs = times[1:] - times[:-1]
    phi = jnp.asarray(mops.phi_pad, dtype)
    wq = jnp.asarray(mops.wq, dtype)
    rq = jnp.asarray(mops.rq, dtype)

    def one(u_el, tl, h, n_k):
        phi_k = jnp.take(phi, n_k - 1, axis=0)
        u_q = phi_k @ u_el
        t_q = tl + (1.0 + rq) * h / 2.0
        return h / 2.0 * jnp.sum(wq * g(u_q, t_q))

    return jnp.sum(jax.vmap(one)(u, times[:-1], hs, ns))


# ------------------------------------------------ mixed-order reconstruction
#
# adj_rec.m's alternative to the higher-order adjoint solve: solve the
# adjoint AT the primal's order, then lift each element to order n+1 by
# evaluating the low-order polynomial at the (n+1) left-Radau collocation
# points and refitting through them plus the known right-endpoint inflow
# value (adj_rec.m:34-47; Radau abscissas utils/Globals1D.m:36-42).  Like
# dg_march, the reference's signature is per-element (``adj_rec(Ns, ...)``,
# MAIN.m:35) — stacked padded tables make that real here.


class MixedRadauInterp(NamedTuple):
    """Per-primal-order Radau reconstruction tables, indexed by the primal
    order − 1 (n in 1..n_max_stack−1), zero-padded to ``np_max``."""

    eval_rad: np.ndarray  # (L, np_max, np_max) low-order nodes -> Radau pts
    to_hi: np.ndarray  # (L, np_max, np_max) [Radau vals, right endpoint]
    #                    -> order-(n+1) GL nodal values


def dg_radau_interp_mixed(mops: MixedDGTimeOperators) -> MixedRadauInterp:
    from adjoint_ode_adaptivity_tpu.ops.jacobi import radau_points
    from adjoint_ode_adaptivity_tpu.ops.operators import vandermonde_1d

    np_m = mops.np_max
    l = mops.n_max - 1
    eval_rad = np.zeros((l, np_m, np_m))
    to_hi = np.zeros((l, np_m, np_m))
    for n in range(1, mops.n_max):
        m = n + 1
        rad = radau_points(m)
        r_p = jacobi_gl(0.0, 0.0, n)
        eval_rad[n - 1, :m, : n + 1] = interp_matrix_1d(n, r_p, rad)
        fit_pts = np.concatenate([rad, [1.0]])
        v_fit = np.linalg.inv(vandermonde_1d(m, fit_pts))
        r_hi = jacobi_gl(0.0, 0.0, m)
        to_hi[n - 1, : m + 1, : m + 1] = vandermonde_1d(m, r_hi) @ v_fit
    return MixedRadauInterp(eval_rad=eval_rad, to_hi=to_hi)


@f32_matmuls
def dg_adjoint_solve_low_mixed(
    mops: MixedDGTimeOperators,
    f: Callable,
    u_primal: jnp.ndarray,  # (K, np_max) padded nodal primal
    times: jnp.ndarray,
    ns: jnp.ndarray,
    y0,
    *,
    g_u: Callable = lambda u, t: jnp.ones_like(u),
    v_terminal: float = 0.0,
) -> jnp.ndarray:
    """Backward adjoint sweep AT the primal's per-element order ``ns[k]``
    (the low-order solve that feeds :func:`dg_adjoint_reconstruct_mixed`).
    Returns (K, np_max) padded nodal values."""
    times = jnp.asarray(times)
    dtype = times.dtype
    _check_orders(ns, mops.n_max)
    ns = jnp.asarray(ns, jnp.int32)
    np_m = mops.np_max
    stiff = jnp.asarray(mops.stiff_pad, dtype)
    mass = jnp.asarray(mops.mass_pad, dtype)
    pad_eye = jnp.asarray(mops.pad_eye, dtype)
    phi = jnp.asarray(mops.phi_pad, dtype)
    r_p = jnp.asarray(mops.r_pad, dtype)
    rq = jnp.asarray(mops.rq, dtype)
    wq = jnp.asarray(mops.wq, dtype)
    e_l = jnp.zeros((np_m, np_m), dtype).at[0, 0].set(1.0)
    f_u = jax.vmap(jax.grad(lambda uu, tt: f(uu, tt)))
    t_left = times[:-1]
    hs = times[1:] - times[:-1]

    def solve_element(v_inflow, xs):
        u_el, tl, h, n_k = xs
        i = n_k - 1
        s_a = jnp.take(stiff, i, axis=0)
        m_ref = jnp.take(mass, i, axis=0)
        eye_a = jnp.take(pad_eye, i, axis=0)
        phi_a = jnp.take(phi, i, axis=0)
        r_a = jnp.take(r_p, i, axis=0)
        e_end = _one_hot(n_k, np_m, dtype)
        u_q = phi_a @ u_el
        t_q = tl + (1.0 + rq) * h / 2.0
        m_w = h / 2.0 * (phi_a.T @ (wq[:, None] * f_u(u_q, t_q)[:, None] * phi_a))
        a_mat = -s_a.T - e_l + m_w + eye_a
        t_n = tl + (1.0 + r_a) * h / 2.0
        live = (jnp.arange(np_m) <= n_k).astype(dtype)
        rhs = -(h / 2.0 * (m_ref @ (live * g_u(u_el, t_n)))) - e_end * v_inflow
        v_el = gauss_solve(a_mat, rhs)
        return v_el[0], v_el

    _, v = lax.scan(
        solve_element,
        jnp.asarray(v_terminal, dtype),
        (u_primal, t_left, hs, ns),
        reverse=True,
    )
    return v


@f32_matmuls
def dg_adjoint_reconstruct_mixed(
    mops: MixedDGTimeOperators,
    rad: MixedRadauInterp,
    v_low: jnp.ndarray,  # (K, np_max) adjoint solved at the primal orders
    ns: jnp.ndarray,
    v_terminal: float = 0.0,
) -> jnp.ndarray:
    """Lift the per-element low-order adjoint to order ``ns[k] + 1``
    through Radau collocation + the known right-endpoint inflow value
    (adj_rec.m:34-47 with a per-element order vector).  ``v_terminal``
    must match the value passed to the paired low-order solve (it is the
    last element's right-endpoint inflow).  Returns the (K, np_max)
    padded nodal values at the order-(n+1) GL nodes."""
    dtype = v_low.dtype
    _check_orders(ns, mops.n_max - 1, what="ns (reconstructs to ns+1)")
    ns = jnp.asarray(ns, jnp.int32)
    np_m = mops.np_max
    eval_rad = jnp.asarray(rad.eval_rad, dtype)
    to_hi = jnp.asarray(rad.to_hi, dtype)
    # inflow at each element's right endpoint = next element's v[0];
    # the LAST element's is the terminal condition
    v_right_in = jnp.concatenate(
        [v_low[1:, 0], jnp.full((1,), v_terminal, dtype)]
    )

    def one(v_el, v_in, n_k):
        i = n_k - 1
        at_rad = jnp.take(eval_rad, i, axis=0) @ v_el
        vals = at_rad + _one_hot(n_k + 1, np_m, dtype) * v_in
        return jnp.take(to_hi, i, axis=0) @ vals
    return jax.vmap(one)(v_low, v_right_in, ns)


@f32_matmuls
def dg_awr_from_adjoint_mixed(
    mops: MixedDGTimeOperators,
    interp: MixedAdjointInterp,
    f: Callable,
    u_primal: jnp.ndarray,
    times: jnp.ndarray,
    ns: jnp.ndarray,
    y0,
    v_hi: jnp.ndarray,  # (K, np_max) adjoint at order ns+1 (solved or rec.)
) -> jnp.ndarray:
    """Per-element adjoint-weighted residual err_k = v_kᵀ R_k(u_H) for a
    GIVEN order-(ns+1) adjoint — the reconstruction path's weighting step
    (mixed counterpart of
    :func:`~adjoint_ode_adaptivity_tpu.adjoint.dg_time.dg_awr_from_adjoint`)."""
    times = jnp.asarray(times)
    dtype = times.dtype
    _check_orders(ns, mops.n_max - 1, what="ns (residual at ns+1)")
    ns = jnp.asarray(ns, jnp.int32)
    np_m = mops.np_max
    stiff = jnp.asarray(mops.stiff_pad, dtype)
    phi = jnp.asarray(mops.phi_pad, dtype)
    rq = jnp.asarray(mops.rq, dtype)
    wq = jnp.asarray(mops.wq, dtype)
    to_nodes = jnp.asarray(interp.to_nodes, dtype)
    to_quad = jnp.asarray(interp.to_quad, dtype)
    t_left = times[:-1]
    hs = times[1:] - times[:-1]
    ends = jax.vmap(lambda u_el, n_k: jnp.dot(_one_hot(n_k, np_m, dtype), u_el))(
        u_primal, ns
    )
    u_prevs = jnp.concatenate([jnp.asarray(y0, dtype).reshape(1), ends[:-1]])

    def one(u_el, v_el, tl, h, u_prev, n_k):
        ip = n_k - 1
        ia = n_k
        s_a = jnp.take(stiff, ia, axis=0)
        phi_a = jnp.take(phi, ia, axis=0)
        to_q = jnp.take(to_quad, ip, axis=0)
        to_n = jnp.take(to_nodes, ip, axis=0)
        e_end = _one_hot(n_k + 1, np_m, dtype)
        u_q = to_q @ u_el
        t_q = tl + (1.0 + rq) * h / 2.0
        u_h = to_n @ u_el
        m_tilde = h / 2.0 * (phi_a.T @ (wq * f(u_q, t_q)))
        res = (
            s_a.T @ u_h
            - e_end * jnp.dot(e_end, u_h)
            + m_tilde
            + jnp.zeros((np_m,), dtype).at[0].set(u_prev)
        )
        return v_el @ res

    return jax.vmap(one)(u_primal, v_hi, t_left, hs, u_prevs, ns)
