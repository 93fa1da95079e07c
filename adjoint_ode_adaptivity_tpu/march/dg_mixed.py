"""Mixed per-element-order DG-in-time march (p/hp-adaptivity support).

Reference parity: ``matlab/dg_march.m:1`` takes a per-element order VECTOR
``Ns`` and rebuilds ``fem_setup(Ns(k), 1, times(k:k+1), 30*Ns(k))`` inside
the element loop (dg_march.m:29) — per-element polynomial orders are a
latent capability of the reference's signature even though ``MAIN.m:21``
only ever passes a uniform ``Ns = n*ones(Ks,1)``.  This module makes the
capability real and TPU-native.

TPU-first design — compile once for ANY order assignment:
- One shared Gauss rule (large enough for the highest order) and per-order
  operator tables padded to ``Np_max = n_max + 1``:

  * ``stiff_pad[n]`` / ``mass_pad[n]``: the order-n matrices zero-padded —
    padded rows/columns of every residual are exactly zero,
  * ``pad_eye[n]``: identity on the padding diagonal only — added to each
    Newton/adjoint SYSTEM matrix so the padded solve is well-posed with the
    padded unknowns pinned to zero,
  * ``phi_pad[n]``: nodal→quadrature interpolation with zero columns beyond
    ``n+1`` (padded nodal values never touch the quadrature loop),
  * ``r_pad[n]``: GL nodes padded with ``+1`` (padded node times sit at the
    element's right endpoint).

- The element march is the same ``lax.scan`` as the uniform solver
  (march/dg_time.py); each element GATHERS its tables by ``ns[k]`` at run
  time (``jnp.take`` on the stacked arrays).  Shapes are static, so a
  p-refinement step (``ns`` changes, ``times`` fixed) re-enters the same
  compiled executable — the reference pays a full ``fem_setup`` rebuild per
  element per Newton sweep.
- The right-endpoint (upwind out-flux) value is ``u[ns[k]]`` — a dynamic
  one-hot contraction, since the live node count varies per element.

The zero-width-slab identity contract (CLAUDE.md) holds unchanged: for
h = 0 the slab system reduces to ``S u = 0, u[0] = u_prev`` whose solution
is the constant ``u_prev`` for every order — the Newton initial guess —
so padded partitions from the adaptive loops compose with mixed orders.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from adjoint_ode_adaptivity_tpu.march.dg_time import DGMarchResult, f32_matmuls
from adjoint_ode_adaptivity_tpu.ops.jacobi import jacobi_gl, jacobi_gq
from adjoint_ode_adaptivity_tpu.ops.operators import (
    dmatrix_1d,
    interp_matrix_1d,
    mass_matrix,
    stiffness_matrix,
    vandermonde_1d,
)

__all__ = [
    "MixedDGTimeOperators",
    "dg_time_operators_mixed",
    "dg_march_mixed",
    "make_dg_slab_solver_mixed",
    "dg_march_mixed_differentiable",
]


def gauss_solve(a, b):
    """Unrolled no-pivot Gaussian elimination for the tiny padded slab
    systems: ``a`` (..., n, n), ``b`` (..., n) → x with n STATIC (≤ 8).

    TPU fast path for the mixed-order strand's (Np_max × Np_max) Newton
    and adjoint solves — ``jnp.linalg.solve`` lowers to a pivoted blocked
    LU whose control flow dwarfs the O(n³)=O(100) flops here; the
    unrolled elimination is straight-line vector arithmetic that fuses
    into the surrounding scan and batches over any leading axes (vmapped
    ensembles ride the lanes).  Pivoting is safe to omit for these
    systems: measured over orders 1..6, slab widths h ∈ [0, 2] and random
    states, the smallest pivot of ``A = Sᵀ − e·eᵀ + pad_eye + dM̃`` is
    6.7e-3 (the padding identity keeps padded pivots exactly 1) and the
    result matches the pivoted solve to 8e-16 — pinned in
    tests/test_dg_mixed.py."""
    n = a.shape[-1]
    for k in range(n - 1):
        inv = 1.0 / a[..., k, k]
        factor = a[..., k + 1 :, k] * inv[..., None]
        a = a.at[..., k + 1 :, :].add(
            -factor[..., None] * a[..., k : k + 1, :]
        )
        b = b.at[..., k + 1 :].add(-factor * b[..., k : k + 1])
    x = jnp.zeros_like(b)
    for k in range(n - 1, -1, -1):
        rhs = b[..., k] - jnp.sum(
            a[..., k, k + 1 :] * x[..., k + 1 :], axis=-1
        )
        x = x.at[..., k].set(rhs / a[..., k, k])
    return x


class MixedDGTimeOperators(NamedTuple):
    """Per-order operator tables padded to ``np_max``, indexed by
    ``order - 1`` (orders 1..n_max).  All arrays are host numpy — they fold
    into the jitted march as constants."""

    n_max: int
    np_max: int  # n_max + 1
    rq: np.ndarray  # (Q,) shared Gauss points
    wq: np.ndarray  # (Q,) shared Gauss weights
    r_pad: np.ndarray  # (n_max, np_max) GL nodes, padded with +1.0
    stiff_pad: np.ndarray  # (n_max, np_max, np_max) S_n, zero-padded
    mass_pad: np.ndarray  # (n_max, np_max, np_max) (V Vᵀ)⁻¹, zero-padded
    phi_pad: np.ndarray  # (n_max, Q, np_max) nodal→quadrature, zero-padded
    pad_eye: np.ndarray  # (n_max, np_max, np_max) identity on padding diag


def dg_time_operators_mixed(
    n_max: int, n_gq: int | None = None
) -> MixedDGTimeOperators:
    """Stacked padded operator tables for orders ``1..n_max`` sharing one
    ``(n_gq+1)``-point Gauss rule (default ``3·n_max + 6`` — at least as
    accurate as every per-order rule the uniform solver would pick;
    the reference uses ``30·Ns(k)`` points, dg_march.m:29)."""
    if n_gq is None:
        n_gq = 3 * n_max + 6
    np_max = n_max + 1
    rq, wq = jacobi_gq(0.0, 0.0, n_gq)
    q = rq.shape[0]
    r_pad = np.ones((n_max, np_max))
    stiff_pad = np.zeros((n_max, np_max, np_max))
    mass_pad = np.zeros((n_max, np_max, np_max))
    phi_pad = np.zeros((n_max, q, np_max))
    pad_eye = np.zeros((n_max, np_max, np_max))
    for n in range(1, n_max + 1):
        np_n = n + 1
        r = jacobi_gl(0.0, 0.0, n)
        v = vandermonde_1d(n, r)
        dr = dmatrix_1d(n, r, v)
        r_pad[n - 1, :np_n] = r
        stiff_pad[n - 1, :np_n, :np_n] = stiffness_matrix(v, dr)
        mass_pad[n - 1, :np_n, :np_n] = mass_matrix(v)
        phi_pad[n - 1, :, :np_n] = interp_matrix_1d(n, r, rq)
        pad_eye[n - 1, np_n:, np_n:] = np.eye(np_max - np_n)
    return MixedDGTimeOperators(
        n_max=n_max,
        np_max=np_max,
        rq=rq,
        wq=wq,
        r_pad=r_pad,
        stiff_pad=stiff_pad,
        mass_pad=mass_pad,
        phi_pad=phi_pad,
        pad_eye=pad_eye,
    )


def _one_hot(idx, length, dtype):
    return (jnp.arange(length) == idx).astype(dtype)


def _check_orders(ns, n_max, what="ns"):
    """Host-side order validation when ``ns`` is concrete (skipped for
    traced values — the adaptive loops keep orders in range by
    construction).  Out-of-range orders would otherwise fail SILENTLY:
    ``jnp.take`` clamps the operator-stack index and the right-endpoint
    one-hot turns all-zero, dropping the upwind flux."""
    try:
        ns_host = np.asarray(ns)
    except Exception:  # traced inside jit/vmap — cannot check
        return
    if ns_host.size and (ns_host.min() < 1 or ns_host.max() > n_max):
        raise ValueError(
            f"{what} must lie in [1, {n_max}] (operator stack range); got "
            f"[{ns_host.min()}, {ns_host.max()}]"
        )


@f32_matmuls
def dg_march_mixed(
    mops: MixedDGTimeOperators,
    f: Callable,
    times: jnp.ndarray,
    ns: jnp.ndarray,
    y0,
    *,
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
    newton_iters: int | None = None,
) -> DGMarchResult:
    """March the DG-in-time solution with per-element orders ``ns``
    (int array, (K,), values in 1..n_max).

    Same weak form, Newton tolerances and telemetry as the uniform
    :func:`~adjoint_ode_adaptivity_tpu.march.dg_time.dg_march`
    (``matlab/dg_march.m:26-78``); identical results where ``ns`` is
    uniform (tested).  Returns padded (K, np_max) nodal arrays — entries
    beyond ``ns[k]+1`` are zero (values) / the right endpoint (times).

    ``newton_iters``: run a FIXED Newton iteration count instead of the
    tolerance ``while_loop`` — the TPU fast path for vmapped ensembles
    (same contract as the batched solvers,
    :mod:`~adjoint_ode_adaptivity_tpu.march.dg_batched`): under ``vmap``
    a tolerance loop runs to the slowest member's count with every other
    member masked, while the fixed count is branch-free.  Newton on these
    slabs converges quadratically, so a handful of iterations reproduces
    the tol-converged solve to roundoff (tested).
    """
    times = jnp.asarray(times)
    dtype = times.dtype
    _check_orders(ns, mops.n_max)
    ns = jnp.asarray(ns, jnp.int32)
    np_m = mops.np_max
    stiff = jnp.asarray(mops.stiff_pad, dtype)
    mass_eye = jnp.asarray(mops.pad_eye, dtype)
    phi = jnp.asarray(mops.phi_pad, dtype)
    r_p = jnp.asarray(mops.r_pad, dtype)
    rq = jnp.asarray(mops.rq, dtype)
    wq = jnp.asarray(mops.wq, dtype)

    t_left = times[:-1]
    hs = times[1:] - times[:-1]
    f_u = jax.vmap(jax.grad(lambda uu, tt: f(uu, tt)))

    def solve_element(u_prev, slab):
        tl, h, n_k = slab
        i = n_k - 1
        s_k = jnp.take(stiff, i, axis=0)
        phi_k = jnp.take(phi, i, axis=0)
        r_k = jnp.take(r_p, i, axis=0)
        eye_k = jnp.take(mass_eye, i, axis=0)
        e_end = _one_hot(n_k, np_m, dtype)
        # A = Sᵀ + B (B[end,end] = −1) + identity on the padding block
        a_mat = s_k.T - jnp.outer(e_end, e_end) + eye_k
        f_vec = jnp.zeros((np_m,), dtype).at[0].set(u_prev)
        t_q = tl + (1.0 + rq) * h / 2.0

        def residual(u):
            u_q = phi_k @ u
            m_tilde = h / 2.0 * (phi_k.T @ (wq * f(u_q, t_q)))
            return a_mat @ u + m_tilde + f_vec

        def jacobian(u):
            u_q = phi_k @ u
            df = f_u(u_q, t_q)
            dmt = h / 2.0 * (phi_k.T @ (wq[:, None] * df[:, None] * phi_k))
            return a_mat + dmt

        def newton_cond(state):
            u, du_norm, it = state
            return (it <= newton_maxit) & (du_norm > newton_tol)

        def newton_body(state):
            u, _, it = state
            delta = gauss_solve(jacobian(u), residual(u))
            return (u - delta, jnp.linalg.norm(delta), it + 1)

        mask = (jnp.arange(np_m) <= n_k).astype(dtype)
        u0_el = u_prev * mask
        if newton_iters is not None:
            u = lax.fori_loop(
                0, newton_iters,
                lambda _, uu: uu
                - gauss_solve(jacobian(uu), residual(uu)),
                u0_el,
            )
            iters = jnp.int32(newton_iters)
        else:
            u, _, iters = lax.while_loop(
                newton_cond, newton_body,
                (u0_el, jnp.asarray(jnp.inf, dtype), 0),
            )
        res_norm = jnp.linalg.norm(residual(u))
        t_nodes = tl + (1.0 + r_k) * h / 2.0
        return jnp.dot(e_end, u), (u, t_nodes, iters, res_norm)

    _, (u, t, iters, resn) = lax.scan(
        solve_element, jnp.asarray(y0, dtype), (t_left, hs, ns)
    )
    return DGMarchResult(u=u, t=t, newton_iters=iters, newton_resnorm=resn)


# -------------------------------------------- differentiable mixed-order march
#
# Same implicit-function-theorem construction as dg_time.make_dg_slab_solver
# (jax.grad of the Newton while_loop is wrong/impossible; the right adjoint
# of an implicit solve is one transposed linear solve at the converged
# state).  The per-element operator tables are GATHERED OUTSIDE the
# custom_vjp and passed as float arguments, so every primal input has a
# well-defined cotangent (the table cotangents are computed and discarded —
# Np_max is tiny); the order itself never needs differentiating.


def _mixed_slab_residual(f, u, u_prev, h, t_left, params, tables, dtype):
    s_k, phi_k, eye_k, e_end, rq, wq = tables
    a_mat = s_k.T - jnp.outer(e_end, e_end) + eye_k
    np_m = e_end.shape[0]
    f_vec = jnp.zeros((np_m,), dtype).at[0].set(u_prev)
    u_q = phi_k @ u
    t_q = t_left + (1.0 + rq) * h / 2.0
    m_tilde = h / 2.0 * (phi_k.T @ (wq * f(u_q, t_q, params)))
    return a_mat @ u + m_tilde + f_vec


def make_dg_slab_solver_mixed(
    mops: MixedDGTimeOperators,
    f: Callable,
    *,
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
):
    """Returns ``solve(u_prev, h, t_left, n_k, params) -> u`` — one mixed-
    order DG time slab solved by Newton at order ``n_k``, wrapped in
    ``jax.custom_vjp`` via the implicit function theorem.  ``jax.grad``
    through it is exact w.r.t. ``u_prev``, ``h``, ``t_left`` and ``params``
    (``f(u, t, params)`` takes the parameter pytree explicitly)."""
    np_m = mops.np_max
    stiff = jnp.asarray(mops.stiff_pad)
    pad_eye = jnp.asarray(mops.pad_eye)
    phi = jnp.asarray(mops.phi_pad)
    rq_h = jnp.asarray(mops.rq)
    wq_h = jnp.asarray(mops.wq)

    def _newton(u_prev, h, t_left, params, tables):
        dtype = jnp.result_type(u_prev, h)

        def cond(state):
            u, du_norm, it = state
            return (it <= newton_maxit) & (du_norm > newton_tol)

        def body(state):
            u, _, it = state
            res = _mixed_slab_residual(
                f, u, u_prev, h, t_left, params, tables, dtype
            )
            jac = jax.jacfwd(
                lambda uu: _mixed_slab_residual(
                    f, uu, u_prev, h, t_left, params, tables, dtype
                )
            )(u)
            delta = gauss_solve(jac, res)
            return (u - delta, jnp.linalg.norm(delta), it + 1)

        e_end = tables[3]
        mask = (jnp.cumsum(e_end) < 1.0).astype(dtype) + e_end
        u0_el = u_prev * mask
        u, _, _ = lax.while_loop(
            cond, body, (u0_el, jnp.asarray(jnp.inf, dtype), 0)
        )
        return u

    @jax.custom_vjp
    def _solve_t(u_prev, h, t_left, params, tables):
        return _newton(u_prev, h, t_left, params, tables)

    def fwd(u_prev, h, t_left, params, tables):
        u = _newton(u_prev, h, t_left, params, tables)
        return u, (u, u_prev, h, t_left, params, tables)

    def bwd(saved, g):
        u, u_prev, h, t_left, params, tables = saved
        dtype = u.dtype
        jac = jax.jacfwd(
            lambda uu: _mixed_slab_residual(
                f, uu, u_prev, h, t_left, params, tables, dtype
            )
        )(u)
        w = gauss_solve(jac.T, g)
        _, vjp_rest = jax.vjp(
            lambda up, hh, tl, p, tb: _mixed_slab_residual(
                f, u, up, hh, tl, p, tb, dtype
            ),
            u_prev, h, t_left, params, tables,
        )
        return vjp_rest(-w)

    _solve_t.defvjp(f32_matmuls(fwd), f32_matmuls(bwd))

    def solve(u_prev, h, t_left, n_k, params):
        i = jnp.asarray(n_k, jnp.int32) - 1
        dtype = jnp.result_type(u_prev, h)
        tables = (
            jnp.asarray(jnp.take(stiff, i, axis=0), dtype),
            jnp.asarray(jnp.take(phi, i, axis=0), dtype),
            jnp.asarray(jnp.take(pad_eye, i, axis=0), dtype),
            _one_hot(jnp.asarray(n_k, jnp.int32), np_m, dtype),
            jnp.asarray(rq_h, dtype),
            jnp.asarray(wq_h, dtype),
        )
        return _solve_t(u_prev, h, t_left, params, tables)

    return f32_matmuls(solve)


@f32_matmuls
def dg_march_mixed_differentiable(
    mops: MixedDGTimeOperators,
    f: Callable,
    times: jnp.ndarray,
    ns: jnp.ndarray,
    y0,
    params=None,
    *,
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
) -> jnp.ndarray:
    """Mixed-order DG march that ``jax.grad`` can differentiate (the
    per-element-order counterpart of
    :func:`~adjoint_ode_adaptivity_tpu.march.dg_time.dg_march_differentiable`):
    a ``lax.scan`` of IFT-wrapped slab solves at per-element orders ``ns``.
    Gradients flow to ``y0``, ``times`` and ``params`` — a neural
    right-hand side trains *through* an hp-adapted implicit solver.
    Returns the (K, np_max) padded nodal solution."""
    times = jnp.asarray(times)
    dtype = times.dtype
    _check_orders(ns, mops.n_max)
    ns = jnp.asarray(ns, jnp.int32)
    solve = make_dg_slab_solver_mixed(
        mops, f, newton_tol=newton_tol, newton_maxit=newton_maxit
    )
    t_left = times[:-1]
    hs = times[1:] - times[:-1]
    np_m = mops.np_max

    def step(u_prev, slab):
        tl, h, n_k = slab
        u = solve(u_prev, h, tl, n_k, params)
        e_end = _one_hot(n_k, np_m, u.dtype)
        return jnp.dot(e_end, u), u

    _, u = lax.scan(step, jnp.asarray(y0, dtype), (t_left, hs, ns))
    return u
