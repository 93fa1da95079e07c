"""Batched (ensemble) DG-in-time slab march — the TPU-fast path for the
MATLAB strand (``matlab/dg_march.m:26-78`` Newton element solve, driven at
``MAIN.m:29-166`` scale).

The reference solves one element at a time with a dense ``A\\R`` per Newton
iteration; its only scale axis is the SLURM farm. Here the scale axis is an
**ensemble of B initial conditions and/or time partitions** marched
simultaneously:

- Layout is lane-major ``(Np, B)``: the ensemble axis B (10³–10⁵) rides the
  TPU vector lanes while the tiny nodal axis Np (2–5) sits on sublanes.
  Every Newton operation — Φ interpolation, weak-form assembly, the linear
  solve — is then a short chain of (B,)-wide vector ops; a ``(B, Np)``
  layout would waste 126/128 lanes on the minor dimension.
- The Np×Np Newton systems are solved in **closed form** (Cramer adjugate
  expansion, :func:`solve_small`) for Np ≤ 4: pure vectorised arithmetic,
  no batched-LU scalar loops (XLA's small batched ``linalg.solve`` lowers
  to per-matrix pivoting that crawls on TPU). 4 < Np ≤ 8 stays vectorised
  through :func:`ge_solve_rows` (unrolled Gaussian elimination whose
  partial pivoting is branch-free elementwise compare/``where`` swaps);
  only Np > 8 falls back to the XLA solver.
- Newton runs either as a ``lax.while_loop`` on the batch max-norm
  (reference semantics: tol 1e-7 / maxit 500, dg_march.m:34-36 — extra
  iterations on already-converged members are exact no-ops to roundoff) or
  as a fixed-count ``fori_loop`` (``newton_iters=``) for a fully static
  TPU schedule; parity between the two is pinned in tests.

The ODE right-hand side ``f(u, t)`` must be **elementwise** (scalar ODE
applied pointwise — true of every reference problem); its derivative is
taken by a single ``jvp`` with a ones tangent instead of per-point
``vmap(grad)``.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from adjoint_ode_adaptivity_tpu.march.dg_time import DGTimeOperators, f32_matmuls

__all__ = [
    "solve_small",
    "ge_solve_rows",
    "DGBatchedResult",
    "DGBatchedAdjointResult",
    "dg_march_batched",
    "dg_adjoint_march_batched",
    "dg_element_functional_batched",
    "dg_estimate_batched",
    "make_dg_slab_solver_batched",
    "dg_march_batched_differentiable",
]


# ------------------------------------------------------------ small solves
def _det(rows):
    """Determinant of a tiny matrix given as nested lists of (B,)-arrays,
    by first-row cofactor expansion — unrolls to a fixed FMA chain."""
    n = len(rows)
    if n == 1:
        return rows[0][0]
    if n == 2:
        return rows[0][0] * rows[1][1] - rows[0][1] * rows[1][0]
    det = None
    for j in range(n):
        minor = [r[:j] + r[j + 1 :] for r in rows[1:]]
        term = rows[0][j] * _det(minor)
        if j % 2:
            term = -term
        det = term if det is None else det + term
    return det


def ge_solve_rows(jac, res):
    """Solve the n×n systems given as nested lists of same-shaped batch
    arrays by unrolled Gaussian elimination with BRANCH-FREE partial
    pivoting: each batch member selects its own pivot through elementwise
    compare-and-``where`` row swaps, so the whole factorization is a fixed
    chain of vector ops — no scalar control flow, no per-matrix pivot
    loops (what makes XLA's batched ``linalg.solve`` crawl on TPU).
    Works on any array type jnp ops accept, including Pallas register
    tiles — the Pallas slab kernel inlines this for Np > 4 where the
    Cramer expansion's O(n!·n) cofactor chain blows up.

    ``jac``: n lists of n entries; ``res``: n entries (the augmented
    column). Returns the list of n solution entries.
    """
    n = len(res)
    rows = [list(jac[i]) + [res[i]] for i in range(n)]
    for k in range(n):
        # bubble the largest |pivot| (per batch member) into row k — only
        # the live columns k..n swap (cols < k are already eliminated)
        for i in range(k + 1, n):
            take = jnp.abs(rows[i][k]) > jnp.abs(rows[k][k])
            live = zip(rows[k][k:], rows[i][k:])
            swapped = [
                (jnp.where(take, bi, ai), jnp.where(take, ai, bi))
                for ai, bi in live
            ]
            rows[k] = rows[k][:k] + [s[0] for s in swapped]
            rows[i] = rows[i][:k] + [s[1] for s in swapped]
        for i in range(k + 1, n):
            m = rows[i][k] / rows[k][k]
            rows[i] = [
                rows[i][j] - m * rows[k][j] for j in range(k + 1, n + 1)
            ]
            rows[i] = [None] * (k + 1) + rows[i]  # cols ≤ k eliminated
    x = [None] * n
    for i in range(n - 1, -1, -1):
        acc = rows[i][n]
        for j in range(i + 1, n):
            acc = acc - rows[i][j] * x[j]
        x[i] = acc / rows[i][i]
    return x


def solve_small(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``A x = b`` for a batch of tiny systems in closed form.

    ``a`` has shape ``(n, n, ...)`` (trailing batch axes broadcast against
    ``b``'s ``(n, ...)``). For n ≤ 4 uses Cramer's rule via cofactor
    expansion — ~260 fused multiply-adds of (B,)-wide vectors at n=4, no
    pivoting, no scalar loops. Accurate to roundoff for the well-conditioned
    DG slab systems (A → Sᵀ+B as h→0); pinned against ``jnp.linalg.solve``
    in tests. 4 < n ≤ 8 uses :func:`ge_solve_rows` (unrolled GE with
    branch-free partial pivoting — still pure vector arithmetic); n > 8
    transposes into XLA's batched solver.
    """
    n = a.shape[0]
    if a.shape[1] != n or b.shape[0] != n:
        raise ValueError(f"shape mismatch: a {a.shape}, b {b.shape}")
    if n > 8:
        # (n, n, B) -> (B, n, n) and back
        a_b = jnp.moveaxis(a, (0, 1), (-2, -1))
        b_b = jnp.moveaxis(b, 0, -1)[..., None]
        a_b = jnp.broadcast_to(a_b, b_b.shape[:-2] + (n, n))
        x = jnp.linalg.solve(a_b, b_b)[..., 0]
        return jnp.moveaxis(x, -1, 0)
    if n > 4:
        # broadcast every entry to a common batch shape first: the where-
        # swaps mix matrix and rhs entries, so scalars must widen
        shp = jnp.broadcast_shapes(a.shape[2:], b.shape[1:])
        dt = jnp.result_type(a, b)
        jac = [
            [jnp.broadcast_to(a[i, j].astype(dt), shp) for j in range(n)]
            for i in range(n)
        ]
        rhs = [jnp.broadcast_to(b[i].astype(dt), shp) for i in range(n)]
        return jnp.stack(ge_solve_rows(jac, rhs))
    rows = [[a[i, j] for j in range(n)] for i in range(n)]
    d = _det(rows)
    cols = []
    for i in range(n):
        rows_i = [
            [b[r] if c == i else a[r, c] for c in range(n)] for r in range(n)
        ]
        cols.append(_det(rows_i) / d)
    return jnp.stack(cols)


def _elementwise_df(f: Callable, u_q: jnp.ndarray, t_q: jnp.ndarray):
    """f(u_q, t_q) and ∂f/∂u pointwise via one jvp (f must be elementwise)."""
    return jax.jvp(lambda uu: f(uu, t_q), (u_q,), (jnp.ones_like(u_q),))


# ------------------------------------------------------------ forward march
class DGBatchedResult(NamedTuple):
    u: jnp.ndarray  # (B, K, Np) nodal solution
    newton_iters: jnp.ndarray  # (B, K) Newton updates until converged
    newton_resnorm: jnp.ndarray  # (B, K) final residual norm


def _norm_times(times, y0):
    times = jnp.asarray(times)
    y0 = jnp.atleast_1d(jnp.asarray(y0))
    if times.ndim == 1:
        times = jnp.broadcast_to(times[None, :], (y0.shape[0], times.shape[0]))
    if y0.shape[0] == 1 and times.shape[0] > 1:
        y0 = jnp.broadcast_to(y0, (times.shape[0],))
    if times.shape[0] != y0.shape[0]:
        raise ValueError(f"batch mismatch: times {times.shape}, y0 {y0.shape}")
    return times, y0


@f32_matmuls
def dg_march_batched(
    ops: DGTimeOperators,
    f: Callable,
    times: jnp.ndarray,  # (K+1,) shared or (B, K+1) per-member partitions
    y0,  # scalar or (B,)
    *,
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
    newton_iters: int | None = None,
) -> DGBatchedResult:
    """March B independent DG-in-time solves simultaneously.

    Same weak form and Newton semantics as :func:`~.dg_time.dg_march`
    (dg_march.m:44-68), batched over initial conditions and (optionally)
    per-member partitions. With ``newton_iters`` set, runs exactly that many
    Newton updates per element (static schedule, the TPU bench path)
    instead of the max-norm tolerance loop.
    """
    times, y0 = _norm_times(times, y0)
    dtype = jnp.result_type(times.dtype, y0.dtype)
    times = times.astype(dtype)
    y0 = y0.astype(dtype)  # mixed f32/f64 inputs: the scan carry is u_prev
    b = y0.shape[0]
    np_ = ops.np_
    phi = jnp.asarray(ops.phi, dtype)  # (Nq, Np)
    wq = jnp.asarray(ops.wq, dtype)  # (Nq,)
    rq = jnp.asarray(ops.rq, dtype)
    s = jnp.asarray(ops.stiff, dtype)
    a_mat = s.T + jnp.zeros((np_, np_), dtype).at[-1, -1].set(-1.0)

    t_lefts = jnp.swapaxes(times[:, :-1], 0, 1)  # (K, B)
    hs = jnp.swapaxes(times[:, 1:] - times[:, :-1], 0, 1)  # (K, B)

    def residual(u, u_prev, h, t_q):
        # u (Np, B); returns res (Np, B) and f(u_q) for reuse
        u_q = phi @ u  # (Nq, B)
        fq = f(u_q, t_q)
        m_tilde = (h / 2.0) * (phi.T @ (wq[:, None] * fq))
        res = a_mat @ u + m_tilde
        res = res.at[0].add(u_prev)
        return res

    def newton_update(u, u_prev, h, t_q):
        u_q = phi @ u
        fq, dfq = _elementwise_df(f, u_q, t_q)
        m_tilde = (h / 2.0) * (phi.T @ (wq[:, None] * fq))
        res = (a_mat @ u + m_tilde).at[0].add(u_prev)
        # jac[i,j,B] = a_mat[i,j] + h/2 Σ_q φ_qi (w_q df_q) φ_qj
        jac = a_mat[:, :, None] + (h / 2.0) * jnp.einsum(
            "qi,qb,qj->ijb", phi, wq[:, None] * dfq, phi
        )
        delta = solve_small(jac, res)
        return u - delta, jnp.sqrt(jnp.sum(delta * delta, axis=0))  # (B,)

    def solve_element(u_prev, slab):
        tl, h = slab  # (B,), (B,)
        t_q = tl[None, :] + (1.0 + rq)[:, None] * h[None, :] / 2.0  # (Nq, B)
        u0_el = jnp.broadcast_to(u_prev[None, :], (np_, b)) * jnp.ones(
            (np_, 1), dtype
        )

        if newton_iters is not None:

            def body(_, carry):
                u, _n = carry
                return newton_update(u, u_prev, h, t_q)

            u, _ = lax.fori_loop(
                0, newton_iters, body, (u0_el, jnp.zeros((b,), dtype))
            )
            iters = jnp.full((b,), newton_iters, jnp.int32)
        else:

            def cond(carry):
                _u, norm, it, _cnt = carry
                return (it <= newton_maxit) & (jnp.max(norm) > newton_tol)

            def body(carry):
                u, norm, it, cnt = carry
                u, new_norm = newton_update(u, u_prev, h, t_q)
                # per-member count: this update "worked" for members still
                # above tolerance before it ran
                cnt = cnt + (norm > newton_tol).astype(jnp.int32)
                return u, new_norm, it + 1, cnt

            u, _, _, iters = lax.while_loop(
                cond,
                body,
                (
                    u0_el,
                    jnp.full((b,), jnp.inf, dtype),
                    0,
                    jnp.zeros((b,), jnp.int32),
                ),
            )
        res = residual(u, u_prev, h, t_q)
        resnorm = jnp.sqrt(jnp.sum(res * res, axis=0))
        return u[-1], (u, iters, resnorm)

    _, (u, iters, resnorm) = lax.scan(solve_element, y0, (t_lefts, hs))
    # (K, Np, B) -> (B, K, Np)
    return DGBatchedResult(
        u=jnp.transpose(u, (2, 0, 1)),
        newton_iters=jnp.swapaxes(iters, 0, 1),
        newton_resnorm=jnp.swapaxes(resnorm, 0, 1),
    )


# ------------------------------------------------------------ adjoint march
class DGBatchedAdjointResult(NamedTuple):
    v: jnp.ndarray  # (B, K, Np_adj)
    err: jnp.ndarray  # (B, K) adjoint-weighted residual contributions


@f32_matmuls
def dg_adjoint_march_batched(
    ops_adj: DGTimeOperators,
    f: Callable,
    u_primal: jnp.ndarray,  # (B, K, Np_primal) from dg_march_batched
    times: jnp.ndarray,  # (K+1,) or (B, K+1)
    y0,
    *,
    g_u: Callable = lambda u, t: jnp.ones_like(u),
    v_terminal: float = 0.0,
) -> DGBatchedAdjointResult:
    """Batched backward adjoint sweep + per-element error contributions —
    the linear-solve analogue of :func:`~.dg_time.dg_adjoint_march`
    (adj_march.m:65-120, in-element quadrature form), over the same
    ensemble axes as :func:`dg_march_batched`. One closed-form Np×Np solve
    per element; everything else is (B,)-wide arithmetic.
    """
    from adjoint_ode_adaptivity_tpu.ops.jacobi import jacobi_gl
    from adjoint_ode_adaptivity_tpu.ops.operators import interp_matrix_1d
    import numpy as np

    b = u_primal.shape[0]
    times, y0 = _norm_times(times, jnp.broadcast_to(jnp.asarray(y0), (b,)))
    dtype = u_primal.dtype
    times = times.astype(dtype)
    y0 = y0.astype(dtype)
    n_primal = u_primal.shape[2] - 1
    np_a = ops_adj.np_
    r_p = jacobi_gl(0.0, 0.0, n_primal)
    to_nodes = jnp.asarray(interp_matrix_1d(n_primal, r_p, np.asarray(ops_adj.r)), dtype)
    to_quad = jnp.asarray(interp_matrix_1d(n_primal, r_p, np.asarray(ops_adj.rq)), dtype)
    s = jnp.asarray(ops_adj.stiff, dtype)
    m_ref = jnp.asarray(ops_adj.mass, dtype)
    phi = jnp.asarray(ops_adj.phi, dtype)
    wq = jnp.asarray(ops_adj.wq, dtype)
    rq = jnp.asarray(ops_adj.rq, dtype)
    r_adj = jnp.asarray(ops_adj.r, dtype)
    base = -s.T - jnp.zeros((np_a, np_a), dtype).at[0, 0].set(1.0)

    t_lefts = jnp.swapaxes(times[:, :-1], 0, 1)  # (K, B)
    hs = jnp.swapaxes(times[:, 1:] - times[:, :-1], 0, 1)
    u_elems = jnp.transpose(u_primal, (1, 2, 0))  # (K, Np_p, B)
    u_prevs = jnp.concatenate(
        [y0[None, :], u_primal[:, :-1, -1].swapaxes(0, 1)], axis=0
    )  # (K, B)

    def solve_element(v_inflow, xs):
        u_el, tl, h, u_prev = xs  # (Np_p, B), (B,), (B,), (B,)
        u_q = to_quad @ u_el  # (Nq, B)
        t_q = tl[None, :] + (1.0 + rq)[:, None] * h[None, :] / 2.0
        fq, dfq = _elementwise_df(f, u_q, t_q)
        m_w = jnp.einsum("qi,qb,qj->ijb", phi, wq[:, None] * dfq, phi) * (
            h / 2.0
        )
        a_mat = base[:, :, None] + m_w  # (Np_a, Np_a, B)
        t_n = tl[None, :] + (1.0 + r_adj)[:, None] * h[None, :] / 2.0
        u_h = to_nodes @ u_el  # (Np_a, B)
        rhs = -((h / 2.0) * (m_ref @ g_u(u_h, t_n)))
        rhs = rhs.at[-1].add(-v_inflow)
        v_el = solve_small(a_mat, rhs)  # (Np_a, B)

        m_tilde = (h / 2.0) * (phi.T @ (wq[:, None] * fq))
        res = (s.T @ u_h + m_tilde).at[-1].add(-u_h[-1]).at[0].add(u_prev)
        err_el = jnp.sum(v_el * res, axis=0)  # (B,)
        return v_el[0], (v_el, err_el)

    _, (v, err) = lax.scan(
        solve_element,
        jnp.full((b,), v_terminal, dtype),
        (u_elems, t_lefts, hs, u_prevs),
        reverse=True,
    )
    return DGBatchedAdjointResult(
        v=jnp.transpose(v, (2, 0, 1)), err=jnp.swapaxes(err, 0, 1)
    )


@f32_matmuls
def dg_element_functional_batched(
    ops: DGTimeOperators,
    u: jnp.ndarray,  # (B, K, Np)
    times: jnp.ndarray,  # (K+1,) or (B, K+1)
    g: Callable = lambda u, t: u,
) -> jnp.ndarray:
    """J_b = Σ_k ∫_k g(u_h) dt per ensemble member (MAIN.m:55-73)."""
    b = u.shape[0]
    times, _ = _norm_times(times, jnp.zeros((b,), u.dtype))
    hs = times[:, 1:] - times[:, :-1]  # (B, K)
    phi = jnp.asarray(ops.phi, u.dtype)
    wq = jnp.asarray(ops.wq, u.dtype)
    rq = jnp.asarray(ops.rq, u.dtype)
    u_q = jnp.einsum("qi,bki->bkq", phi, u)
    t_q = times[:, :-1, None] + (1.0 + rq)[None, None, :] * hs[:, :, None] / 2.0
    return jnp.sum(
        hs / 2.0 * jnp.einsum("q,bkq->bk", wq, g(u_q, t_q)), axis=1
    )


def dg_estimate_batched(
    ops_p: DGTimeOperators,
    ops_a: DGTimeOperators,
    f: Callable,
    times: jnp.ndarray,
    y0,
    *,
    g_u: Callable = lambda u, t: jnp.ones_like(u),
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
    newton_iters: int | None = None,
):
    """Full batched fwd(n) + adjoint(n+1) + per-element AWR pipeline.

    Returns ``(u (B,K,Np), v (B,K,Np+1), err (B,K))`` — the whole-ensemble
    refinement signal the reference computes one vmapped FD solve at a time
    (Main_variable_params.py:330-341), here for the DG-in-time strand.
    """
    fwd = dg_march_batched(
        ops_p,
        f,
        times,
        y0,
        newton_tol=newton_tol,
        newton_maxit=newton_maxit,
        newton_iters=newton_iters,
    )
    adj = dg_adjoint_march_batched(ops_a, f, fwd.u, times, y0, g_u=g_u)
    return fwd.u, adj.v, adj.err


# ------------------------------------------------ differentiable (IFT) march
#
# jax.grad cannot flow through the Newton loops above; the right adjoint of
# an implicit solve is the implicit function theorem (march/dg_time.py's
# make_dg_slab_solver, SURVEY.md §7 hard part 3) — here batched: at the
# solved slab R(u*) = 0, the vjp is ONE closed-form Np×Np transpose solve
# per ensemble member plus one residual VJP, independent of the Newton
# iteration count. This is how a neural right-hand side trains *through*
# the implicit DG solver at ensemble scale.


def _residual_b(ops, f, u, u_prev, h, t_left, params, dtype):
    """Batched slab residual R(U) (Np, B) with an explicit params pytree:
    ``f(u, t, params)`` elementwise (the dg_march_batched weak form)."""
    np_ = ops.np_
    phi = jnp.asarray(ops.phi, dtype)
    wq = jnp.asarray(ops.wq, dtype)
    rq = jnp.asarray(ops.rq, dtype)
    s = jnp.asarray(ops.stiff, dtype)
    a_mat = s.T + jnp.zeros((np_, np_), dtype).at[-1, -1].set(-1.0)
    u_q = phi @ u
    t_q = t_left[None, :] + (1.0 + rq)[:, None] * h[None, :] / 2.0
    m_tilde = (h / 2.0) * (phi.T @ (wq[:, None] * f(u_q, t_q, params)))
    return (a_mat @ u + m_tilde).at[0].add(u_prev)


def make_dg_slab_solver_batched(
    ops: DGTimeOperators,
    f: Callable,
    *,
    newton_iters: int = 8,
):
    """Returns ``solve(u_prev, h, t_left, params) -> u (Np, B)`` — one DG
    slab solved for the whole (B,) ensemble by fixed-count Newton with
    closed-form Cramer solves, wrapped in ``jax.custom_vjp`` via the
    implicit function theorem. Gradients are exact w.r.t. ``u_prev``,
    ``h``, ``t_left`` AND ``params`` (one transposed :func:`solve_small`
    plus one residual VJP — never through the iteration).

    ``f(u, t, params)`` must be elementwise in ``u``/``t``.
    """

    @f32_matmuls
    def _newton(u_prev, h, t_left, params):
        dtype = jnp.result_type(u_prev, h)
        np_ = ops.np_
        b = u_prev.shape[0]
        phi = jnp.asarray(ops.phi, dtype)
        wq = jnp.asarray(ops.wq, dtype)
        rq = jnp.asarray(ops.rq, dtype)
        t_q = t_left[None, :] + (1.0 + rq)[:, None] * h[None, :] / 2.0

        def body(_, u):
            res = _residual_b(ops, f, u, u_prev, h, t_left, params, dtype)
            _, dfq = jax.jvp(
                lambda uu: f(uu, t_q, params),
                (phi @ u,),
                (jnp.ones((phi.shape[0], b), dtype),),
            )
            jac = jnp.asarray(ops.stiff, dtype).T[:, :, None] + jnp.zeros(
                (np_, np_, 1), dtype
            ).at[-1, -1, 0].set(-1.0) + (h / 2.0) * jnp.einsum(
                "qi,qb,qj->ijb", phi, wq[:, None] * dfq, phi
            )
            return u - solve_small(jac, res)

        u0_el = jnp.broadcast_to(u_prev[None, :], (np_, b)).astype(dtype)
        return lax.fori_loop(0, newton_iters, body, u0_el + 0.0)

    @jax.custom_vjp
    def solve(u_prev, h, t_left, params):
        return _newton(u_prev, h, t_left, params)

    def fwd(u_prev, h, t_left, params):
        u = _newton(u_prev, h, t_left, params)
        return u, (u, u_prev, h, t_left, params)

    @f32_matmuls
    def bwd(saved, g):
        u, u_prev, h, t_left, params = saved
        dtype = u.dtype
        np_ = ops.np_
        b = u.shape[1]
        phi = jnp.asarray(ops.phi, dtype)
        wq = jnp.asarray(ops.wq, dtype)
        rq = jnp.asarray(ops.rq, dtype)
        t_q = t_left[None, :] + (1.0 + rq)[:, None] * h[None, :] / 2.0
        _, dfq = jax.jvp(
            lambda uu: f(uu, t_q, params),
            (phi @ u,),
            (jnp.ones((phi.shape[0], b), dtype),),
        )
        jac = jnp.asarray(ops.stiff, dtype).T[:, :, None] + jnp.zeros(
            (np_, np_, 1), dtype
        ).at[-1, -1, 0].set(-1.0) + (h / 2.0) * jnp.einsum(
            "qi,qb,qj->ijb", phi, wq[:, None] * dfq, phi
        )
        # transpose solve: jacT[i,j] = jac[j,i]
        w = solve_small(jnp.swapaxes(jac, 0, 1), g)
        _, vjp_rest = jax.vjp(
            lambda up, hh, tl, p: _residual_b(ops, f, u, up, hh, tl, p, dtype),
            u_prev, h, t_left, params,
        )
        return vjp_rest(jax.tree_util.tree_map(lambda x: -x, w))

    solve.defvjp(fwd, bwd)
    return solve


def dg_march_batched_differentiable(
    ops: DGTimeOperators,
    f: Callable,
    times: jnp.ndarray,  # (K+1,) or (B, K+1)
    y0,  # (B,)
    params=None,
    *,
    newton_iters: int = 8,
) -> jnp.ndarray:
    """Ensemble DG-in-time march that ``jax.grad`` can differentiate — a
    ``lax.scan`` of IFT-wrapped batched slab solves. Returns the
    (B, K, Np) nodal solution; gradients flow to ``y0``, ``times`` and
    ``params`` (e.g. a neural right-hand side trained through the implicit
    solver over the whole IC ensemble — the batched form of
    :func:`~.dg_time.dg_march_differentiable`)."""
    times, y0 = _norm_times(times, y0)
    dtype = jnp.result_type(times.dtype, y0.dtype)
    times = times.astype(dtype)
    y0 = y0.astype(dtype)
    solve = make_dg_slab_solver_batched(ops, f, newton_iters=newton_iters)
    t_lefts = jnp.swapaxes(times[:, :-1], 0, 1)  # (K, B)
    hs = jnp.swapaxes(times[:, 1:] - times[:, :-1], 0, 1)

    def step(u_prev, slab):
        tl, h = slab
        u = solve(u_prev, h, tl, params)
        return u[-1], u

    _, u = lax.scan(step, y0, (t_lefts, hs))
    return jnp.transpose(u, (2, 0, 1))  # (B, K, Np)
