"""Element-sharded DG advection: the K axis distributed over the mesh with
``lax.ppermute`` halo exchange across ICI.

1D DG coupling is nearest-neighbour only (one trace value per face), so the
halo is a single (1,)-vector ppermute per RHS evaluation — bandwidth-trivial,
latency-bound. The shift-based local RHS is identical to the single-chip
kernel; only the two boundary faces of each shard talk to neighbours.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from adjoint_ode_adaptivity_tpu.march.advec import AdvecOperators
from adjoint_ode_adaptivity_tpu.march.lsrk import RK4A, RK4B, RK4C

__all__ = ["advec_rhs_local", "advec_march_sharded", "advec_fwd_adj_estimate_sharded"]


def advec_rhs_local(
    ops_local: AdvecOperators,
    u: jnp.ndarray,
    t,
    axis: str,
    inflow: bool = True,
) -> jnp.ndarray:
    """Local-shard advection RHS with ppermute halo exchange.

    ``u`` is the local (Np, K_local) block. Each shard sends its last
    element's right-trace to the next shard and its first element's
    left-trace to the previous shard (periodic ring; the global boundary
    conditions overwrite the wrapped values on the first/last shard).
    """
    a, alpha = ops_local.a, ops_local.alpha
    n_dev = lax.axis_size(axis)
    idx = lax.axis_index(axis)

    u_left = u[0, :]
    u_right = u[-1, :]

    # halo: right-trace of previous shard, left-trace of next shard
    prev_right = lax.ppermute(
        u_right[-1:], axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
    )
    next_left = lax.ppermute(
        u_left[:1], axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
    )

    u_left_nbr = jnp.concatenate([prev_right, u_right[:-1]])
    u_right_nbr = jnp.concatenate([u_left[1:], next_left])

    flux_fac = (a * ops_local.nx - (1 - alpha) * jnp.abs(a * ops_local.nx)) / 2.0
    du_left = (u_left - u_left_nbr) * flux_fac[0]
    du_right = (u_right - u_right_nbr) * flux_fac[1]

    # global BCs on the first/last shard only (branch-free masks)
    uin = -jnp.sin(a * t) if inflow else jnp.zeros((), u.dtype)
    is_first = (idx == 0).astype(u.dtype)
    is_last = (idx == n_dev - 1).astype(u.dtype)
    bc_left = (u_left[0] - uin) * flux_fac[0, 0]
    du_left = du_left.at[0].set(is_first * bc_left + (1 - is_first) * du_left[0])
    du_right = du_right.at[-1].set((1 - is_last) * du_right[-1])

    du = jnp.stack([du_left, du_right])
    hi = jax.lax.Precision.HIGHEST
    return -a * ops_local.rx * jnp.matmul(ops_local.dr, u, precision=hi) + jnp.matmul(
        ops_local.lift, ops_local.fscale * du, precision=hi
    )


def advec_march_sharded(
    ops: AdvecOperators,
    mesh: Mesh,
    u0: jnp.ndarray,
    dt,
    n_steps: int,
    axis: str = "space",
    t0: float = 0.0,
) -> jnp.ndarray:
    """LSRK4(5) march with the element axis sharded over ``axis``.

    ``u0`` is the global (Np, K) state (sharded or not; shard_map partitions
    it). Operators' per-element fields (rx, fscale, nx) are sharded along K
    automatically by the in_specs.
    """
    rk4a, rk4b, rk4c = (jnp.asarray(c, u0.dtype) for c in (RK4A, RK4B, RK4C))

    def local_march(u, rx, fscale, nx):
        ops_local = ops._replace(rx=rx, fscale=fscale, nx=nx)

        def one_step(carry, step_idx):
            u, resu = carry
            t = t0 + step_idx * dt
            for s in range(5):
                rhs = advec_rhs_local(ops_local, u, t + rk4c[s] * dt, axis)
                resu = rk4a[s] * resu + dt * rhs
                u = u + rk4b[s] * resu
            return (u, resu), None

        (u, _), _ = lax.scan(one_step, (u, jnp.zeros_like(u)), jnp.arange(n_steps))
        return u

    return shard_map(
        local_march,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
    )(u0, ops.rx, ops.fscale, ops.nx)


def _lsrk_step_local(ops_local, u, t, dt, axis, inflow=True):
    """One LSRK4(5) step on the local element shard (halo via ppermute)."""
    rk4a = jnp.asarray(RK4A, u.dtype)
    rk4b = jnp.asarray(RK4B, u.dtype)
    rk4c = jnp.asarray(RK4C, u.dtype)
    resu = jnp.zeros_like(u)
    for s in range(5):
        rhs = advec_rhs_local(ops_local, u, t + rk4c[s] * dt, axis, inflow=inflow)
        resu = rk4a[s] * resu + dt * rhs
        u = u + rk4b[s] * resu
    return u


def advec_fwd_adj_estimate_sharded(
    ops: AdvecOperators,
    mesh: Mesh,
    u0: jnp.ndarray,
    lam_end: jnp.ndarray,
    dt,
    n_steps: int,
    segment: int = 32,
    axis: str = "space",
    t0: float = 0.0,
):
    """The full north-star pipeline — forward march, fine (half-step-squared)
    adjoint sweep, per-element adjoint-weighted step-doubling estimate, with
    two-level checkpointing — over an element-sharded mesh.

    Structure mirrors adjoint/advec.py::advec_fwd_adj_estimate; the halo
    exchanges ride ``lax.ppermute`` over ICI and their adjoints are generated
    by ``jax.linear_transpose`` (ppermute transposes to the inverse
    permutation automatically). Tested equal to the single-device pipeline.

    Returns (u_final, lam0, eta, j_value) with global shardings
    (P(None, axis), P(None, axis), P(axis), replicated scalar).
    """
    if n_steps % segment != 0:
        raise ValueError(f"n_steps={n_steps} not a multiple of segment={segment}")
    n_seg = n_steps // segment

    def local_pipeline(u0_l, lam_l, rx, fscale, nx):
        ops_local = ops._replace(rx=rx, fscale=fscale, nx=nx)
        dt_ = jnp.asarray(dt, u0_l.dtype)

        def step(u, t):
            return _lsrk_step_local(ops_local, u, t, dt_, axis)

        def fwd_scan(u, seg_idx):
            def body(carry, i):
                (u,) = carry
                return (step(u, t0 + i * dt_),), None

            (u_out,), _ = lax.scan(
                body, (u,), seg_idx * segment + jnp.arange(segment)
            )
            return u_out, u  # store the segment-entry state

        u_final, seg_starts = lax.scan(fwd_scan, u0_l, jnp.arange(n_seg))
        j_value = lax.psum(jnp.sum(lam_l * u_final), axis)

        half_t = jax.linear_transpose(
            lambda v: _lsrk_step_local(ops_local, v, jnp.zeros((), u0_l.dtype),
                                       dt_ / 2, axis, inflow=False),
            lam_l,
        )

        def adj_segment(carry, seg_rev_idx):
            lam, eta = carry
            seg_idx = n_seg - 1 - seg_rev_idx
            u_in = seg_starts[seg_idx]

            def recompute(u, i):
                t = t0 + (seg_idx * segment + i) * dt_
                u_next = step(u, t)
                return u_next, (u, u_next, t)

            _, (us, u_nexts, ts) = lax.scan(recompute, u_in, jnp.arange(segment))

            def rev_body(carry, xs):
                lam, eta = carry
                u_n, u_np1, t_n = xs
                half = _lsrk_step_local(ops_local, u_n, t_n, dt_ / 2, axis)
                half2 = _lsrk_step_local(
                    ops_local, half, t_n + dt_ / 2, dt_ / 2, axis
                )
                r = u_np1 - half2
                eta = eta + jnp.sum(lam * r, axis=0)
                (lam,) = half_t(lam)
                (lam,) = half_t(lam)
                return (lam, eta), None

            (lam, eta), _ = lax.scan(
                rev_body, (lam, eta), (us, u_nexts, ts), reverse=True
            )
            return (lam, eta), None

        # eta starts as constant zeros but becomes shard-varying: mark it
        eta0 = lax.pcast(jnp.zeros((u0_l.shape[1],), u0_l.dtype), (axis,), to="varying")
        (lam0, eta), _ = lax.scan(adj_segment, (lam_l, eta0), jnp.arange(n_seg))
        return u_final, lam0, eta, j_value

    return shard_map(
        local_pipeline,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(None, axis),
                  P(None, axis)),
        out_specs=(P(None, axis), P(None, axis), P(axis), P()),
    )(u0, lam_end, ops.rx, ops.fscale, ops.nx)
