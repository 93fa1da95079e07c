"""Element-sharded composition of the fused Pallas DG pipeline: the
blocked-single stored-trajectory kernels run per device under ``shard_map``
with ``lax.ppermute`` ghost halos exchanged at segment (chunk) boundaries.

Why ghosts instead of per-stage halo exchange: the fused kernels advance
``segment`` full LSRK steps per launch with zero HBM traffic between stages;
a per-stage ppermute would break the fusion (the XLA-only sharded path,
``parallel/dg_shard.py``, pays exactly that price). The flux stencil couples
±1 element per stage, so after S stages a ghost region of width S has
degraded end-to-end while every LOCAL element is still exact. Per segment
the devices therefore:

1. refresh a ``W``-element ghost ring on each side via two ppermutes
   (bandwidth: Np·W·4 B — trivial on ICI),
2. run the fused blocked-single kernel on the extended (Np, L + 2W) block,
3. keep the local slice, discard the ghosts.

Ghost-width accounting (per segment of ``seg`` coarse steps):
- forward march: 5 stages/step → needs W ≥ 5·seg,
- reverse sweep: 2 half-transposes (10 stages) per step degrade λ by 10/step
  → W ≥ 10·seg; the stored u_n (degraded 5·n at store time) must still be
  exact on ±10 lanes for the step-doubling half-steps → W ≥ 5·seg + 10.
``W = 10·seg + 10`` covers all three with margin (then rounded up so the
extended length tiles the 8 sublanes of the blocked layout).

Redundant ghost compute: 2W / L per device — ~6% at the north-star size
(K=10⁴ over 8 devices, seg=8). The global inflow/outflow boundary masks are
device-dependent, so they arrive as SMEM scalars (extended-layout element
indices; −1 = not on this device) instead of the single-device kernels'
trace-time constants.

Reference analogue: the ensemble/scale-up intent of
``Main_variable_params.py:234,330-341`` — the reference itself has no
distributed execution (SURVEY.md §2.7). Uniform meshes only (the graded-mesh
geom operands would need per-device ghost slices; use the XLA sharded path
for those).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from adjoint_ode_adaptivity_tpu.ops.mesh import Discretization1D
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
    PallasAdvecConfig,
    _check_uniform,
    _lsrk_step_b,
    _lsrk_step_t_b,
    _shift_m1_blk,
    _shift_p1_blk,
)

__all__ = ["make_pallas_fwd_adj_estimate_sharded_blocked", "ghost_width"]


def ghost_width(segment: int, l_local: int) -> int:
    """Required ghost width for ``segment`` steps between exchanges, rounded
    up so the extended local block (L + 2W) tiles 8 sublanes."""
    w = 10 * segment + 10
    while (l_local + 2 * w) % 8:
        w += 1
    return w


def _masks_from_idx(idx_ref, m):
    """first/last element masks in the blocked (8, m) layout from the SMEM
    extended-element indices (−1 ⇒ the boundary is not on this device)."""
    e = (
        lax.broadcasted_iota(jnp.int32, (8, m), 0) * m
        + lax.broadcasted_iota(jnp.int32, (8, m), 1)
    )
    return e == idx_ref[0], e == idx_ref[1]


def _fwd_seg_kernel(cfg, dr, lift, seg, idx_ref, t0_ref, u_ref, traj_out,
                    ufinal_out):
    """Forward phase of ONE segment on the extended local block: stores
    every coarse state (the stored-trajectory contract of
    ``_fwd_traj_grid_kernel_b``), masks from SMEM indices."""
    np_, m = cfg.np_, cfg.k
    first, last = _masks_from_idx(idx_ref, m)
    sp1 = lambda x: _shift_p1_blk(x, m)  # noqa: E731
    sm1 = lambda x: _shift_m1_blk(x, m)  # noqa: E731
    dt = cfg.dt

    def body(n, u):
        for ii in range(np_):
            traj_out[n, ii] = u[ii]
        return _lsrk_step_b(
            cfg, dr, lift, first, last, u, t0_ref[0] + n * dt, dt, sp1, sm1,
            None,
        )

    rows = tuple(u_ref[ii] for ii in range(np_))
    rows = jax.lax.fori_loop(0, seg, body, rows)
    ufinal_out[:] = jnp.stack(rows, axis=0)


def _rev_seg_kernel(cfg, dr, lift, seg, idx_ref, t0_ref, lam_ref, bound_ref,
                    traj_ref, lam_out, eta_out):
    """Reverse sweep of ONE segment over its stored trajectory: per step the
    adjoint-weighted step-doubling residual plus the fine (half-step-squared)
    transpose — the per-segment body of ``_adj_est_grid_kernel_b_stored``
    with the segment-boundary state as an explicit input."""
    np_, m = cfg.np_, cfg.k
    first, last = _masks_from_idx(idx_ref, m)
    sp1 = lambda x: _shift_p1_blk(x, m)  # noqa: E731
    sm1 = lambda x: _shift_m1_blk(x, m)  # noqa: E731
    dt = cfg.dt

    def bwd_body(j, carry):
        lu, eta = carry
        n = seg - 1 - j
        t_n = t0_ref[0] + n * dt
        u_n = tuple(traj_ref[n, ii] for ii in range(np_))
        blk_np1 = traj_ref[jnp.minimum(n + 1, seg - 1)]
        is_last = n == seg - 1
        u_np1 = tuple(
            jnp.where(is_last, bound_ref[ii], blk_np1[ii]) for ii in range(np_)
        )
        half = _lsrk_step_b(
            cfg, dr, lift, first, last, u_n, t_n, dt / 2, sp1, sm1, None
        )
        half2 = _lsrk_step_b(
            cfg, dr, lift, first, last, half, t_n + dt / 2, dt / 2, sp1, sm1,
            None,
        )
        acc = lu[0] * (u_np1[0] - half2[0])
        for ii in range(1, np_):
            acc = acc + lu[ii] * (u_np1[ii] - half2[ii])
        eta = eta + acc
        lu = _lsrk_step_t_b(cfg, dr, lift, first, last, lu, dt / 2, sp1, sm1,
                            None)
        lu = _lsrk_step_t_b(cfg, dr, lift, first, last, lu, dt / 2, sp1, sm1,
                            None)
        return (lu, eta)

    lu0 = tuple(lam_ref[ii] for ii in range(np_))
    lu, eta = jax.lax.fori_loop(
        0, seg, bwd_body, (lu0, jnp.zeros((8, m), lam_ref.dtype))
    )
    lam_out[:] = jnp.stack(lu, axis=0)
    eta_out[:] = eta


def _ghost_exchange(x_loc, w, axis):
    """Extend the local (Np, L) block with W-wide ghost rings from both
    ring neighbours: one ppermute each way, Np·W·4 B of ICI traffic."""
    n = lax.axis_size(axis)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    left = lax.ppermute(x_loc[:, -w:], axis, fwd)
    right = lax.ppermute(x_loc[:, :w], axis, bwd)
    return jnp.concatenate([left, x_loc, right], axis=1)


def make_pallas_fwd_adj_estimate_sharded_blocked(
    disc: Discretization1D,
    a: float,
    dt: float,
    mesh: Mesh,
    *,
    segment: int = 8,
    n_segments: int = 256,
    axis: str = "space",
    interpret: bool = False,
):
    """Element-sharded fused Pallas pipeline (forward + stored-trajectory
    reverse sweep + per-element estimate) over ``mesh[axis]``.

    Returns ``run(u0, t0, lam_end) -> (u_final, lam0, eta, j_value)`` with
    the same global contract as the single-device
    ``make_pallas_fwd_adj_estimate_grid_single_blocked`` (pinned equal in
    tests) plus the replicated scalar J. K must split evenly (even local
    share ≥ the ghost width); f32; uniform meshes.
    """
    n_dev = mesh.shape[axis]
    k = disc.k
    if k % n_dev:
        raise ValueError(f"K={k} not divisible by {n_dev} devices")
    l_loc = k // n_dev
    if l_loc % 2:
        raise ValueError(f"local share L={l_loc} must be even (8-sublane tiling)")
    w = ghost_width(segment, l_loc)
    if w > l_loc:
        raise ValueError(
            f"ghost width {w} exceeds local share {l_loc} — use fewer devices "
            f"or a smaller segment"
        )
    l_ext = l_loc + 2 * w
    me = l_ext // 8
    rx, fs = _check_uniform(disc)
    cfg = PallasAdvecConfig(
        np_=disc.np_, k=me, a=a, rx=rx, fscale=fs, dt=dt,
        steps_per_call=segment, interpret=interpret,
    )
    dr_host = np.ascontiguousarray(disc.dr, dtype=np.float32)
    lift_host = np.ascontiguousarray(disc.lift, dtype=np.float32)
    np_ = disc.np_
    n_steps = segment * n_segments

    fwd_kern = functools.partial(_fwd_seg_kernel, cfg, dr_host, lift_host,
                                 segment)
    rev_kern = functools.partial(_rev_seg_kernel, cfg, dr_host, lift_host,
                                 segment)
    smem2 = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    def fwd_call(idx, t0s, u_ext):
        return pl.pallas_call(
            fwd_kern,
            out_shape=(
                jax.ShapeDtypeStruct((segment, np_, 8, me), u_ext.dtype),
                jax.ShapeDtypeStruct((np_, 8, me), u_ext.dtype),
            ),
            in_specs=[smem2, smem2, vmem],
            out_specs=(vmem, vmem),
            interpret=interpret,
        )(idx, t0s, u_ext)

    def rev_call(idx, t0s, lam_ext, bound, traj):
        return pl.pallas_call(
            rev_kern,
            out_shape=(
                jax.ShapeDtypeStruct((np_, 8, me), lam_ext.dtype),
                jax.ShapeDtypeStruct((8, me), lam_ext.dtype),
            ),
            in_specs=[smem2, smem2, vmem, vmem, vmem],
            out_specs=(vmem, vmem),
            interpret=interpret,
        )(idx, t0s, lam_ext, bound, traj)

    def local_pipeline(u_loc, lam_loc, t0):
        didx = lax.axis_index(axis)
        idx = jnp.stack(
            [
                jnp.where(didx == 0, w, -1),
                jnp.where(didx == n_dev - 1, w + l_loc - 1, -1),
            ]
        ).astype(jnp.int32)
        dt_ = jnp.asarray(dt, u_loc.dtype)

        def fwd_step(carry, s):
            u, _ = carry
            u_ext = _ghost_exchange(u, w, axis).reshape(np_, 8, me)
            t0s = jnp.reshape(t0 + s * segment * dt_, (1,))
            traj, u_ext_out = fwd_call(idx, t0s, u_ext)
            u_flat = u_ext_out.reshape(np_, l_ext)
            return (u_flat[:, w : w + l_loc], u_ext_out), traj

        zeros_ext = jnp.zeros((np_, 8, me), u_loc.dtype)
        (u_final, u_ext_final), trajs = lax.scan(
            fwd_step, (u_loc, zeros_ext), jnp.arange(n_segments)
        )
        j_value = lax.psum(jnp.sum(lam_loc * u_final), axis)

        # segment-boundary states for the reverse sweep: segment s ends at
        # segment s+1's (ghost-fresh) entry state; the last segment ends at
        # the final extended state (its ghosts are degraded, but the
        # boundary state only feeds the residual on LOCAL elements)
        bounds = jnp.concatenate(
            [trajs[1:, 0], u_ext_final[None]], axis=0
        )  # (n_seg, Np, 8, me)

        def rev_step(carry, xs):
            lam, eta = carry
            traj_s, bound_s, s = xs
            lam_ext = _ghost_exchange(lam, w, axis).reshape(np_, 8, me)
            t0s = jnp.reshape(t0 + s * segment * dt_, (1,))
            lam_ext_out, eta_ext = rev_call(idx, t0s, lam_ext, bound_s, traj_s)
            lam = lam_ext_out.reshape(np_, l_ext)[:, w : w + l_loc]
            eta = eta + eta_ext.reshape(l_ext)[w : w + l_loc]
            return (lam, eta), None

        eta0 = jnp.zeros((l_loc,), u_loc.dtype)
        (lam0, eta), _ = lax.scan(
            rev_step,
            (lam_loc, eta0),
            (trajs, bounds, jnp.arange(n_segments)),
            reverse=True,
        )
        return u_final, lam0, eta, j_value

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation (jax would otherwise demand `vma=` on every out_shape)
    sharded = shard_map(
        local_pipeline,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P()),
        out_specs=(P(None, axis), P(None, axis), P(axis), P()),
        check_vma=False,
    )

    def run(u0, t0, lam_end):
        return sharded(u0, lam_end, jnp.asarray(t0, u0.dtype))

    run.n_steps = n_steps
    run.ghost = w
    return run
