"""Discrete adjoint of one-step time marches: O(N) reverse scan of VJPs.

The reference assembles the full (N+1)×(N+1) Jacobian of the discrete map and
dense-solves ``(JFᵀ − I) v = −K`` (python/Main_finite_difference.py:54-76,
factory.py:344-363) — an O(N³) solve of a *bidiagonal* system — or runs an
O(N²) pair of Python loops of ``jax.grad`` calls
(python/Main_new_loss.py:76-102). Both compute the same recurrence

    v_N = K_N,      v_n = K_n + (∂G_{n+1}/∂u_n)ᵀ · v_{n+1}

where ``G_{n+1}`` is the step map producing ``u_{n+1}`` from ``u_n``. That is
a single reverse ``lax.scan`` with one per-step VJP: O(N) work, O(1) control
overhead, vmappable over ensembles, and exactly equal (to rounding) to the
dense solve — which is kept here as a test oracle.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from adjoint_ode_adaptivity_tpu.march.fd import times_from_dt

__all__ = [
    "adjoint_march",
    "adjoint_march_per_step",
    "adjoint_march_linearized",
    "adjoint_dense_oracle",
]


def adjoint_march(
    step_fn: Callable,
    u_traj: jnp.ndarray,
    dt: jnp.ndarray,
    k_vec: jnp.ndarray,
    t0: float = 0.0,
) -> jnp.ndarray:
    """Adjoint trajectory v on the same grid as ``u_traj``.

    ``u_traj`` is the (possibly interpolated) primal at the N+1 nodes,
    ``k_vec`` = ∂J/∂U (length N+1). Returns v with v[n] = dJ/d(u_n holding
    the march fixed upstream) — the reference's ``adjSolve`` solution.
    """

    t = times_from_dt(dt, t0)

    def body(v_next, xs):
        u_n, t_n, dt_n, k_n = xs
        _, vjp = jax.vjp(lambda u: step_fn(u, t_n, dt_n), u_n)
        v_n = k_n + vjp(v_next)[0]
        return v_n, v_n

    v_last = k_vec[-1] * jnp.ones_like(u_traj[-1])
    _, vs = lax.scan(
        body,
        v_last,
        (u_traj[:-1], t[:-1], dt, k_vec[:-1]),
        reverse=True,
    )
    return jnp.concatenate([vs, v_last[None]])


def adjoint_march_per_step(
    step_fn: Callable,
    u_traj: jnp.ndarray,
    dt: jnp.ndarray,
    k_vec: jnp.ndarray,
    params_stacked: Any,
    t0: float = 0.0,
) -> jnp.ndarray:
    """Per-step-parameter variant: step n uses ``params_stacked[n]``.

    Mirrors python/Main_variable_params.py:74-101 (which does the O(N²)
    loop with ``params_list[(j-1)//ref_factor]``) — parameter selection per
    *fine* step is done by the caller when stacking.
    """
    t = times_from_dt(dt, t0)

    def body(v_next, xs):
        u_n, t_n, dt_n, k_n, p_n = xs
        _, vjp = jax.vjp(lambda u: step_fn(u, t_n, dt_n, p_n), u_n)
        v_n = k_n + vjp(v_next)[0]
        return v_n, v_n

    v_last = k_vec[-1] * jnp.ones_like(u_traj[-1])
    _, vs = lax.scan(
        body,
        v_last,
        (u_traj[:-1], t[:-1], dt, k_vec[:-1], params_stacked),
        reverse=True,
    )
    return jnp.concatenate([vs, v_last[None]])


def adjoint_march_linearized(
    f_u: Callable,
    u_traj: jnp.ndarray,
    dt: jnp.ndarray,
    k_vec: jnp.ndarray,
    t0: float = 0.0,
) -> jnp.ndarray:
    """Fast-path adjoint for forward-Euler steps with a closed-form Jacobian:
    d_n = 1 + f_u(u_n, t_n)·dt_n, then v_n = k_n + d_n·v_{n+1} as a pure
    arithmetic reverse scan (no per-step VJP tracing — noticeably cheaper to
    compile and run when vmapped over large IC ensembles).

    Equals :func:`adjoint_march` with ``euler_step(f)`` to rounding (tested).
    """
    t = times_from_dt(dt, t0)
    d = 1.0 + f_u(u_traj[:-1], t[:-1]) * dt

    def body(v_next, xs):
        d_n, k_n = xs
        v_n = k_n + d_n * v_next
        return v_n, v_n

    v_last = k_vec[-1] * jnp.ones_like(u_traj[-1])
    _, vs = lax.scan(body, v_last, (d, k_vec[:-1]), reverse=True)
    return jnp.concatenate([vs, v_last[None]])


def adjoint_dense_oracle(
    step_fn: Callable,
    u_traj: jnp.ndarray,
    dt: jnp.ndarray,
    k_vec: jnp.ndarray,
    t0: float = 0.0,
) -> jnp.ndarray:
    """Dense-solve oracle: assemble sub-diagonal JF (∂G_n/∂u_{n-1}) and solve
    ``(JFᵀ − I) v = −K`` exactly as python/Main_finite_difference.py:69-73.

    O(N³); scalar state only; used in tests to pin the reverse scan to the
    reference's linear algebra to machine precision.
    """
    t = times_from_dt(dt, t0)
    n_nodes = u_traj.shape[0]
    dstep = jax.vmap(lambda u, tt, dd: jax.grad(lambda uu: step_fn(uu, tt, dd))(u))(
        u_traj[:-1], t[:-1], dt
    )
    jf = jnp.zeros((n_nodes, n_nodes), dtype=u_traj.dtype)
    jf = jf.at[jnp.arange(1, n_nodes), jnp.arange(n_nodes - 1)].set(dstep)
    a = jf.T - jnp.eye(n_nodes, dtype=u_traj.dtype)
    return jnp.linalg.solve(a, -k_vec)
