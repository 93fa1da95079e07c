"""Discontinuous-Galerkin-in-time ODE solver: element-by-element slab march
with Newton iteration.

Reference parity: ``matlab/dg_march.m`` (weak form, upwind inter-element
flux, Newton with residual R = A·U + M̃(U) + F, A = Sᵀ + B, B[end,end] = −1,
F[0] = u_prev, M̃ = h/2·Φᵀ(w ⊙ f(u_q)), dR/dU = A + h/2·Φᵀdiag(w⊙f'(u_q))Φ)
and ``matlab/fem_setup.m`` (per-slab operators).

TPU-first design:
- All elements share one static operator set (order n, quadrature n_gq) —
  the reference rebuilds `fem_setup` per element per Newton sweep; here the
  reference-element matrices are constants and only the slab size h_k varies.
- The element march is a ``lax.scan`` (carry = inflow value u_prev); Newton
  runs as a ``lax.while_loop`` at fixed Np with norm-based convergence,
  matching tol 1e-7 / maxit 500 (dg_march.m:34-36).
- Nodal→quadrature interpolation is the precomputed Φ matrix — the
  reference's per-iteration ``polyfit``/``polyval`` is numerically identical
  for exact-degree fits but ill-conditioned; Φ is assembled once from the
  orthonormal basis.
- Np is tiny, so the Np×Np Newton solves vectorise over nothing — but the
  whole march jits into one XLA while/scan nest with zero host round-trips,
  and vmaps over ensembles of initial conditions or time partitions.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from adjoint_ode_adaptivity_tpu.ops.jacobi import jacobi_gl, jacobi_gq
from adjoint_ode_adaptivity_tpu.ops.operators import (
    interp_matrix_1d,
    mass_matrix,
    stiffness_matrix,
    vandermonde_1d,
    dmatrix_1d,
)

__all__ = [
    "DGTimeOperators",
    "dg_time_operators",
    "dg_march",
    "DGMarchResult",
    "make_dg_slab_solver",
    "dg_march_differentiable",
    "f32_matmuls",
]


def f32_matmuls(fn):
    """Trace ``fn`` with all matmuls/einsums at HIGHEST precision — the
    repo-wide invariant (CLAUDE.md): TPU's default matmul precision runs
    bf16 passes and costs ~3 significant digits, which breaks the adaptive
    loops' error estimates (measured: the f32 ensemble-mean DG signal went
    from converging on CPU to stuck at a 6×-larger plateau on TPU). The
    contraction dims here are tiny (Np, Nq ≤ 10), so exact-f32 costs
    nothing."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper


class DGTimeOperators(NamedTuple):
    """Static reference-element operators for order-n DG-in-time slabs."""

    n: int
    np_: int
    r: np.ndarray  # (Np,) GL nodes
    v: np.ndarray  # (Np, Np)
    mass: np.ndarray  # (Np, Np) reference mass (V Vᵀ)^{-1}
    stiff: np.ndarray  # (Np, Np) S = mass @ Dr
    rq: np.ndarray  # (Nq,) Gauss quadrature points
    wq: np.ndarray  # (Nq,)
    phi: np.ndarray  # (Nq, Np) nodal -> quadrature interpolation


def dg_time_operators(n: int, n_gq: int | None = None) -> DGTimeOperators:
    """Order-n operators with an (n_gq+1)-point Gauss rule.

    Default n_gq = 3n+6: enough oversampling that quadrature error of a
    smooth nonlinearity on O(1)-sized slabs sits below the 1e-10 effectivity
    floor (the reference uses 30·n, dg_march.m:29 — available by passing it
    explicitly; 2n+2 is NOT enough for sin(u) on h≈1 elements).
    """
    if n_gq is None:
        n_gq = 3 * n + 6
    r = jacobi_gl(0.0, 0.0, n)
    v = vandermonde_1d(n, r)
    dr = dmatrix_1d(n, r, v)
    rq, wq = jacobi_gq(0.0, 0.0, n_gq)
    return DGTimeOperators(
        n=n,
        np_=n + 1,
        r=r,
        v=v,
        mass=mass_matrix(v),
        stiff=stiffness_matrix(v, dr),
        rq=rq,
        wq=wq,
        phi=interp_matrix_1d(n, r, rq),
    )


class DGMarchResult(NamedTuple):
    u: jnp.ndarray  # (K, Np) nodal solution per element
    t: jnp.ndarray  # (K, Np) node times per element
    newton_iters: jnp.ndarray  # (K,) iterations used
    newton_resnorm: jnp.ndarray  # (K,) final residual norm


def _slab_residual(ops: DGTimeOperators, f: Callable, u, u_prev, h, t_left, dtype):
    """R(U) = A·U + M̃(U) + F on one slab (dg_march.m:44-62 weak form)."""
    s = jnp.asarray(ops.stiff, dtype)
    phi = jnp.asarray(ops.phi, dtype)
    wq = jnp.asarray(ops.wq, dtype)
    a_mat = s.T + jnp.zeros((ops.np_, ops.np_), dtype).at[-1, -1].set(-1.0)
    u_q = phi @ u
    t_q = t_left + (1.0 + jnp.asarray(ops.rq, dtype)) * h / 2.0
    m_tilde = h / 2.0 * (phi.T @ (wq * f(u_q, t_q)))
    f_vec = jnp.zeros((ops.np_,), dtype).at[0].set(u_prev)
    return a_mat @ u + m_tilde + f_vec


def _slab_jacobian(ops: DGTimeOperators, f: Callable, u, h, t_left, dtype):
    s = jnp.asarray(ops.stiff, dtype)
    phi = jnp.asarray(ops.phi, dtype)
    wq = jnp.asarray(ops.wq, dtype)
    a_mat = s.T + jnp.zeros((ops.np_, ops.np_), dtype).at[-1, -1].set(-1.0)
    u_q = phi @ u
    t_q = t_left + (1.0 + jnp.asarray(ops.rq, dtype)) * h / 2.0
    df = jax.vmap(jax.grad(lambda uu, tt: f(uu, tt)))(u_q, t_q)
    dmt = h / 2.0 * (phi.T @ (wq[:, None] * df[:, None] * phi))
    return a_mat + dmt


@f32_matmuls
def dg_march(
    ops: DGTimeOperators,
    f: Callable,
    times: jnp.ndarray,
    y0,
    *,
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
) -> DGMarchResult:
    """March the DG-in-time solution over the partition ``times``.

    ``f(u, t)`` is the scalar ODE right-hand side (vmapped over quadrature
    points internally — pass jnp-traceable functions). Returns per-element
    nodal values, node times, and Newton telemetry (dg_march.m:69-73 prints).
    """
    times = jnp.asarray(times)
    dtype = times.dtype
    r = jnp.asarray(ops.r, dtype)
    t_left = times[:-1]
    t_right = times[1:]
    hs = t_right - t_left

    def solve_element(u_prev, slab):
        tl, h = slab

        def newton_cond(state):
            u, du_norm, it = state
            return (it <= newton_maxit) & (du_norm > newton_tol)

        def newton_body(state):
            u, _, it = state
            res = _slab_residual(ops, f, u, u_prev, h, tl, dtype)
            jac = _slab_jacobian(ops, f, u, h, tl, dtype)
            delta = jnp.linalg.solve(jac, res)
            u_new = u - delta
            return (u_new, jnp.linalg.norm(delta), it + 1)

        u0_el = u_prev * jnp.ones((ops.np_,), dtype)
        u, _, iters = lax.while_loop(
            newton_cond, newton_body, (u0_el, jnp.asarray(jnp.inf, dtype), 0)
        )
        res_norm = jnp.linalg.norm(_slab_residual(ops, f, u, u_prev, h, tl, dtype))
        t_nodes = tl + (1.0 + r) * h / 2.0
        return u[-1], (u, t_nodes, iters, res_norm)

    _, (u, t, iters, resn) = lax.scan(
        solve_element, jnp.asarray(y0, dtype), (t_left, hs)
    )
    return DGMarchResult(u=u, t=t, newton_iters=iters, newton_resnorm=resn)


# ------------------------------------------------------- differentiable march
#
# jax.grad cannot flow through the Newton while_loop above. The right adjoint
# of an implicit solve is the implicit function theorem, not differentiating
# the iteration (SURVEY.md §7 hard part 3): at the solved slab R(u*) = 0,
# du*/dθ = −J⁻¹ ∂R/∂θ, so the vjp is one linear solve with Jᵀ plus one VJP
# of the residual — independent of how many Newton steps ran.


def _slab_residual_p(ops, f, u, u_prev, h, t_left, params, dtype):
    """R(U) with an explicit parameter pytree threaded to ``f(u, t, params)``
    (e.g. neural-network right-hand sides trained through the solver).
    Delegates to :func:`_slab_residual` so the weak form lives in one place;
    ``params`` stays a traced value through the closure, which is fine for
    the IFT vjp (the vjp traces the enclosing lambda, params included)."""
    return _slab_residual(
        ops, lambda uu, tt: f(uu, tt, params), u, u_prev, h, t_left, dtype
    )


def make_dg_slab_solver(
    ops: DGTimeOperators,
    f: Callable,
    *,
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
):
    """Returns ``solve(u_prev, h, t_left, params) -> u`` — one DG time slab
    solved by Newton, wrapped in ``jax.custom_vjp`` via the implicit function
    theorem. ``jax.grad`` through it is exact w.r.t. ``u_prev``, ``h``,
    ``t_left`` AND ``params``: the backward pass solves ``Jᵀ w = g`` at the
    converged state and pulls ``−w`` back through one residual VJP.
    """

    def _newton(u_prev, h, t_left, params):
        dtype = jnp.result_type(u_prev, h)

        def cond(state):
            u, du_norm, it = state
            return (it <= newton_maxit) & (du_norm > newton_tol)

        def body(state):
            u, _, it = state
            res = _slab_residual_p(ops, f, u, u_prev, h, t_left, params, dtype)
            jac = jax.jacfwd(
                lambda uu: _slab_residual_p(
                    ops, f, uu, u_prev, h, t_left, params, dtype
                )
            )(u)
            delta = jnp.linalg.solve(jac, res)
            return (u - delta, jnp.linalg.norm(delta), it + 1)

        u0_el = u_prev * jnp.ones((ops.np_,), dtype)
        u, _, _ = lax.while_loop(cond, body, (u0_el, jnp.asarray(jnp.inf, dtype), 0))
        return u

    @jax.custom_vjp
    def solve(u_prev, h, t_left, params):
        return _newton(u_prev, h, t_left, params)

    def fwd(u_prev, h, t_left, params):
        u = _newton(u_prev, h, t_left, params)
        return u, (u, u_prev, h, t_left, params)

    def bwd(saved, g):
        u, u_prev, h, t_left, params = saved
        dtype = u.dtype
        jac = jax.jacfwd(
            lambda uu: _slab_residual_p(ops, f, uu, u_prev, h, t_left, params, dtype)
        )(u)
        w = jnp.linalg.solve(jac.T, g)
        # cotangents of the remaining arguments: −wᵀ ∂R/∂(·)
        _, vjp_rest = jax.vjp(
            lambda up, hh, tl, p: _slab_residual_p(ops, f, u, up, hh, tl, p, dtype),
            u_prev, h, t_left, params,
        )
        bars = vjp_rest(-w)
        return bars

    # wrap fwd AND bwd: the bwd rule is traced later, during jax.grad,
    # outside any context active now
    solve.defvjp(f32_matmuls(fwd), f32_matmuls(bwd))
    return f32_matmuls(solve)


@f32_matmuls
def dg_march_differentiable(
    ops: DGTimeOperators,
    f: Callable,
    times: jnp.ndarray,
    y0,
    params=None,
    *,
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
) -> jnp.ndarray:
    """DG-in-time march that ``jax.grad`` can differentiate: a ``lax.scan``
    of IFT-wrapped slab solves. ``f(u, t, params)`` takes the parameter
    pytree explicitly (pass ``params=None`` and ignore it for plain ODEs).
    Returns the (K, Np) nodal solution (same values as :func:`dg_march` to
    Newton tolerance).

    Gradients flow to ``y0``, ``times`` (through both the slab sizes and the
    quadrature times) and ``params`` — this is how a neural right-hand side
    trains *through* the implicit solver (the reference's Main_kk1d.py
    intent) without unrolling Newton into the AD graph.
    """
    times = jnp.asarray(times)
    dtype = times.dtype
    solve = make_dg_slab_solver(ops, f, newton_tol=newton_tol, newton_maxit=newton_maxit)
    t_left = times[:-1]
    hs = times[1:] - times[:-1]

    def step(u_prev, slab):
        tl, h = slab
        u = solve(u_prev, h, tl, params)
        return u[-1], u

    _, u = lax.scan(step, jnp.asarray(y0, dtype), (t_left, hs))
    return u
