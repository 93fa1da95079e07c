"""MXU-layout fused pipeline for high-order elements: the O(Np²) volume
contraction on the systolic array. **Measured NET RESULT: 0.74× the
row-tuple kernel at N=7 — kept as a documented negative experiment**
(VERDICT r2 item 5); see the roofline accounting below.

The row-tuple kernels (``dg_rhs.py``) hold each nodal row as a separate
(B, K) tile and unroll the volume contraction into Np² scalar·vector FMAs —
at Np = 8 that chain measures 2.19 TFLOP/s, the VPU roofline, and the N=7
pipeline is volume-dominated (BASELINE.md: 1.68e10 DoF-steps/s). This
module instead keeps the state as ONE (Np, B·K) array — Np rides the 8
sublanes (Np = 8 fills them exactly), elements ride the lanes — and issues
the volume term as ``jax.lax.dot_general`` on (Np, Np) × (Np, B·K):
measured **25.1 TFLOP/s on the v5e MXU, 11.4× the FMA chain** in isolation
(micro-bench, round 3). Surface terms are rank-1 broadcasts: (Np, 1) lift
columns times the (1, B·K) flux rows.

Why the full pipeline still loses (measured 26.8 vs 19.9 ms at N=7,
K=10⁴, seg=2, 256 steps): per stage the row-tuple layout spends ~64
volume FMAs + ~24 flux/update ops, ALL on full-height (8, K) tiles
(~88 × 79 tiles ≈ 7.0k tile-cycles). The MXU layout collapses the volume
to ~0.4 µs, but every (1, B·K) flux row op now spans 625 one-row-utilized
tiles and each full-array update/edge op spans 625 full tiles —
~(4 full + 6 row-sparse) × 625 + dot ≈ 6.6k tile-cycles, i.e. the volume
win is fully offset by losing the 8× register height on the row-sparse
surface algebra, plus small-M MXU pipeline overhead. A 3D
``dot_general`` contracting the leading axis of (Np, B, K) — which would
keep the flux rows full-height — does not lower in Mosaic (compile
error, tested). Correctness is pinned against the XLA oracle at all
orders; revisit if Mosaic gains batched/leading-axis matmuls.

Batched-state semantics are identical to
``make_pallas_fwd_adj_estimate_grid_batched(store_trajectory=True)``:
B independent marches, inflow/outflow BCs per state. Flattening (B, K) to
one lane axis makes the ±1 element shifts cross state boundaries — but
exactly at positions where the per-state first/last masks
(``lane % K == 0`` / ``K−1``) already replace the flux with the BCs, so
the contamination never enters the update (same argument as the blocked
layout's sublane wrap; pinned against the XLA oracle in tests).

Uniform meshes, f32. Reference parity: the same AdvecRHS1D + LSRK + fine
(half-step-squared) transpose + step-doubling estimate as dg_rhs.py
(utils/AdvecRHS1D.m:9-19, One_code.mlx LSRK loop).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adjoint_ode_adaptivity_tpu.march.lsrk import RK4A, RK4B, RK4C
from adjoint_ode_adaptivity_tpu.ops.mesh import Discretization1D
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import _check_uniform

__all__ = ["make_pallas_fwd_adj_estimate_grid_mxu"]


class _MxuCfg:
    def __init__(self, np_, b, k, a, rx, dt, segment, interpret):
        self.np_ = np_
        self.b = b
        self.k = k
        self.n = b * k
        self.a = a
        self.rx = rx
        self.dt = dt
        self.segment = segment
        self.interpret = interpret

    def tables(self, dr, lift, dt):
        """dt- and factor-folded coefficient tables (host numpy):
        drc (Np, Np) volume, liftl/liftr (Np, 1) surface columns."""
        drc = np.asarray(-self.a * self.rx * dt * np.asarray(dr), np.float32)
        fac_l = -self.a / 2.0 * self.rx * dt
        fac_r = self.a / 2.0 * self.rx * dt
        liftl = np.asarray(lift[:, 0:1] * fac_l, np.float32)
        liftr = np.asarray(lift[:, 1:2] * fac_r, np.float32)
        return drc, liftl, liftr


def _masks(cfg):
    lane = lax.broadcasted_iota(jnp.int32, (1, cfg.n), 1) % cfg.k
    return lane == 0, lane == cfg.k - 1


def _sh_m1(x):
    """out[j] = x[j+1] (element k+1 source), lane axis of a (1, N) row."""
    return jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)


def _sh_p1(x):
    """out[j] = x[j−1]."""
    return jnp.concatenate([x[:, -1:], x[:, :-1]], axis=1)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _lsrk_step_m(cfg, tabs, first, last, u, t, dt):
    """One LSRK4(5) step on the (Np, N) state: volume on the MXU, surface
    as rank-1 broadcasts."""
    drc, liftl, liftr = tabs
    np_ = cfg.np_
    resu = jnp.zeros_like(u)
    for s in range(5):
        ts = t + float(RK4C[s]) * dt
        u_l = u[0:1]
        u_r = u[np_ - 1 : np_]
        uin = -jnp.sin(cfg.a * ts)
        du_l = jnp.where(first, u_l - uin, u_l - _sh_p1(u_r))
        du_r = jnp.where(last, 0.0, u_r - _sh_m1(u_l))
        rhs = _dot(drc, u) + liftl * du_l + liftr * du_r
        resu = float(RK4A[s]) * resu + rhs
        u = u + float(RK4B[s]) * resu
    return u


def _lsrk_step_t_m(cfg, tabs, first, last, lu, dt):
    """Exact transpose of :func:`_lsrk_step_m` (stages reversed; the
    transpose of the ±1 lane shift is the ∓1 shift)."""
    drc, liftl, liftr = tabs
    drc_t = drc.T
    liftl_r = liftl.T  # (1, Np)
    liftr_r = liftr.T
    np_ = cfg.np_
    lr = jnp.zeros_like(lu)
    for s in (4, 3, 2, 1, 0):
        w = float(RK4B[s]) * lu + lr
        lr = float(RK4A[s]) * w
        w0 = _dot(liftl_r, w)  # (1, N)
        w1 = _dot(liftr_r, w)
        s0 = w0
        s1 = jnp.where(last, 0.0, w1)
        p0 = jnp.where(last, 0.0, _sh_m1(s0))
        p1 = jnp.where(first, 0.0, _sh_p1(s1))
        acc = _dot(drc_t, w)
        edge = jnp.concatenate(
            [s0 - p1, jnp.zeros((np_ - 2, cfg.n), lu.dtype), s1 - p0], axis=0
        )
        lu = lu + acc + edge
    return lu


def _fwd_traj_kernel_m(cfg, n_seg, t0_ref, u0_ref, drc_ref, ll_ref, lr_ref,
                       traj_out, ufinal_out, u_scr):
    i = pl.program_id(0)
    seg = cfg.segment
    # coefficient tables ride as VMEM operands (pallas kernels cannot
    # capture array constants)
    tabs = (drc_ref[:], ll_ref[:], lr_ref[:])
    first, last = _masks(cfg)
    dt = cfg.dt

    @pl.when(i == 0)
    def _():
        u_scr[:] = u0_ref[:]

    t0 = t0_ref[0] + (i * seg) * dt

    def body(n, u):
        traj_out[n] = u
        return _lsrk_step_m(cfg, tabs, first, last, u, t0 + n * dt, dt)

    u = jax.lax.fori_loop(0, seg, body, u_scr[:])
    u_scr[:] = u

    @pl.when(i == n_seg - 1)
    def _():
        ufinal_out[:] = u


def _adj_est_kernel_m(cfg, n_seg, t0_ref, lam_ref, ufinal_ref, traj_ref,
                      drch_ref, llh_ref, lrh_ref, lam0_out, eta_out, lu_scr,
                      eta_scr, bound_scr):
    i = pl.program_id(0)
    seg = cfg.segment
    # half-step (dt/2) tables only: the reverse sweep runs the residual
    # half-steps and the fine transposes exclusively at dt/2
    tabs_h = (drch_ref[:], llh_ref[:], lrh_ref[:])
    first, last = _masks(cfg)
    dt = cfg.dt
    seg_idx = n_seg - 1 - i
    t0 = t0_ref[0] + (seg_idx * seg) * dt

    @pl.when(i == 0)
    def _():
        lu_scr[:] = lam_ref[:]
        eta_scr[:] = jnp.zeros_like(eta_scr)
        bound_scr[:] = ufinal_ref[:]

    def bwd_body(j, carry):
        lu, eta = carry
        n = seg - 1 - j
        t_n = t0 + n * dt
        u_n = traj_ref[n]
        is_last = n == seg - 1
        u_np1 = jnp.where(
            is_last, bound_scr[:], traj_ref[jnp.minimum(n + 1, seg - 1)]
        )
        half = _lsrk_step_m(cfg, tabs_h, first, last, u_n, t_n, dt / 2)
        half2 = _lsrk_step_m(
            cfg, tabs_h, first, last, half, t_n + dt / 2, dt / 2
        )
        eta = eta + jnp.sum(lu * (u_np1 - half2), axis=0, keepdims=True)
        lu = _lsrk_step_t_m(cfg, tabs_h, first, last, lu, dt / 2)
        lu = _lsrk_step_t_m(cfg, tabs_h, first, last, lu, dt / 2)
        return (lu, eta)

    lu, eta = jax.lax.fori_loop(
        0, seg, bwd_body, (lu_scr[:], eta_scr[:])
    )
    bound_scr[:] = traj_ref[0]
    lu_scr[:] = lu
    eta_scr[:] = eta

    @pl.when(i == n_seg - 1)
    def _():
        lam0_out[:] = lu
        eta_out[:] = eta


def make_pallas_fwd_adj_estimate_grid_mxu(
    disc: Discretization1D,
    a: float,
    dt: float,
    segment: int = 4,
    n_segments: int = 512,
    batch: int = 8,
    interpret: bool = False,
):
    """Stored-trajectory fused pipeline in the MXU layout.

    Returns ``run(u0, t0, lam_end) -> (u_final, lam0, eta)`` with the
    batched contract — ``u0/lam_end`` (Np, B, K), ``eta`` (B, K) — same
    outputs as ``make_pallas_fwd_adj_estimate_grid_batched`` (tested).
    Built for high orders (Np = 8 fills the sublanes and the volume dot
    dominates); correct for 2 ≤ Np ≤ 8 (the transpose's edge-row
    concatenate needs distinct first/last rows — Np = 1 would be plain
    upwind finite volume, which none of the DG pipelines target).
    """
    rx, _ = _check_uniform(disc)
    np_, k, b = disc.np_, disc.k, batch
    if not 2 <= np_ <= 8:
        raise ValueError(f"Np={np_} unsupported (need 2 <= Np <= 8)")
    cfg = _MxuCfg(np_, b, k, a, rx, dt, segment, interpret)
    n = b * k
    dr_host = np.ascontiguousarray(disc.dr, dtype=np.float32)
    lift_host = np.ascontiguousarray(disc.lift, dtype=np.float32)
    n_steps = segment * n_segments
    # reverse-kernel capacity guard: shared measured model (_vmem.py)
    from adjoint_ode_adaptivity_tpu.ops.pallas._vmem import (
        STORED_VMEM_LIMIT_BYTES,
        stored_vmem_bytes,
        stored_vmem_fits,
    )

    if not interpret and not stored_vmem_fits(segment, np_, 1, n):
        raise ValueError(
            f"MXU pipeline at segment={segment}, Np={np_}, B={b}, K={k} "
            f"needs ~{stored_vmem_bytes(segment, np_, 1, n) / 2**20:.0f} MB "
            f"scoped VMEM ({STORED_VMEM_LIMIT_BYTES // 2**20} MB limit) — "
            "reduce `segment`"
        )

    tabs_full = tuple(
        jnp.asarray(t) for t in cfg.tables(dr_host, lift_host, dt)
    )
    tabs_half = tuple(
        jnp.asarray(t) for t in cfg.tables(dr_host, lift_host, dt / 2)
    )
    tab_specs = [
        pl.BlockSpec((np_, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((np_, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((np_, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]

    def run(u0, t0, lam_end):
        u0_f = u0.reshape(np_, n)
        lam_f = lam_end.reshape(np_, n)
        fwd = functools.partial(_fwd_traj_kernel_m, cfg, n_segments)
        traj, u_final = pl.pallas_call(
            fwd,
            grid=(n_segments,),
            out_shape=(
                jax.ShapeDtypeStruct((n_steps, np_, n), jnp.float32),
                jax.ShapeDtypeStruct((np_, n), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((np_, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                *tab_specs,
            ],
            out_specs=(
                pl.BlockSpec((segment, np_, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((np_, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((np_, n), jnp.float32)],
            interpret=interpret,
        )(jnp.reshape(t0, (1,)), u0_f, *tabs_full)

        adj = functools.partial(_adj_est_kernel_m, cfg, n_segments)
        lam0, eta = pl.pallas_call(
            adj,
            grid=(n_segments,),
            out_shape=(
                jax.ShapeDtypeStruct((np_, n), jnp.float32),
                jax.ShapeDtypeStruct((1, n), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((np_, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((np_, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (segment, np_, n),
                    lambda i: (n_segments - 1 - i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                *tab_specs,
            ],
            out_specs=(
                pl.BlockSpec((np_, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((np_, n), jnp.float32),
                pltpu.VMEM((1, n), jnp.float32),
                pltpu.VMEM((np_, n), jnp.float32),
            ],
            interpret=interpret,
        )(jnp.reshape(t0, (1,)), lam_f, u_final, traj, *tabs_half)
        return (
            u_final.reshape(np_, b, k),
            lam0.reshape(np_, b, k),
            eta.reshape(b, k),
        )

    return run
