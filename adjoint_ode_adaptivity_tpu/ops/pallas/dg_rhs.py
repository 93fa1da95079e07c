"""Pallas TPU kernels: fused DG advection LSRK march, its exact transpose
(the adjoint march), and the fused adjoint+error-estimate segment sweep.

The north-star hot loop (BASELINE.md): 5-stage LSRK steps of the upwind DG
advection RHS at K = 10⁴ elements, Np = N+1 nodes. The whole state
(Np·K·4B ≈ 120 KB) lives in VMEM, so each ``pallas_call`` runs
``steps_per_call`` complete time steps with **zero HBM traffic between
stages or steps**. The XLA scan path (march/advec.py) issues ~10 HBM-bound
ops per stage; these kernels are the speed-of-light version (measured ~5-7×
the XLA path on v5e).

Because LSRK stage 0 has a₀ = 0, the low-storage register ``resu`` never
carries information across steps — kernels carry only ``u`` (forward) /
``λu`` (adjoint), and the adjoint's ``λr`` is provably zero at every step
boundary.

Precision note: all contractions here are exact f32 FMAs. XLA's default
TPU matmul precision is lower (bf16 passes); the XLA oracle must be run
under ``jax.default_matmul_precision('float32')`` when comparing.

Assumptions (checked): upwind flux (alpha=1), inflow BC ``uin = −sin(a·t)``
(frozen to 0 in the adjoint — it is state-independent). The unbatched
kernels require a uniform mesh (factors folded into the tables); the
batched and blocked-single pipelines also take non-uniform/graded meshes —
per-element rx/fscale ride as trace-time vector tables with one extra
volume post-scale per row per stage (see _dt_tables/_geom_or_uniform).

Error estimate: per-element adjoint-weighted step-doubling residual,
``η_k = Σ_n Σ_nodes λ_{n+1} ⊙ (u_{n+1} − Φ_{dt/2}²(u_n))`` — the fused
segment kernel recomputes the forward states of a segment into VMEM scratch
(stacked along sublanes), then runs the backward sweep accumulating η and
applying the transpose step, all in one kernel launch per segment.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adjoint_ode_adaptivity_tpu.march.lsrk import RK4A, RK4B, RK4C
from adjoint_ode_adaptivity_tpu.ops.mesh import Discretization1D

__all__ = [
    "PallasAdvecConfig",
    "make_pallas_advec_march",
    "make_pallas_advec_march_single_blocked",
    "make_pallas_advec_adjoint",
    "make_pallas_fwd_adj_estimate",
    "make_pallas_fwd_adj_estimate_grid",
    "make_pallas_fwd_adj_estimate_grid_batched",
    "make_pallas_fwd_adj_estimate_grid_single_blocked",
]


class PallasAdvecConfig(NamedTuple):
    np_: int
    k: int
    a: float
    rx: float  # 2/h (uniform; 0.0 when geom carries per-element vectors)
    fscale: float  # 2/h (uniform; 0.0 when geom is set)
    dt: float
    steps_per_call: int
    interpret: bool = False
    # non-uniform meshes: (rx, fscale_left, fscale_right) as host numpy
    # arrays already reshaped to the layout's row shape ((1, K) for the
    # batched lane layout, (8, K/8) for blocked-single); None = uniform
    geom: tuple = None


def _is_uniform(disc: Discretization1D, rx0: float) -> bool:
    # rtol between the roundoff wobble of uniform-by-construction meshes
    # and real grading: f64 linspace vertices carry ~K·2^-52 relative
    # wobble in the element widths (~2e-10 at K=10^6) so 1e-7 accepts
    # them with margin, while a mesh graded by even 1e-6 must NOT be
    # silently flattened onto element 0's geometry (allclose's default
    # 1e-5 rtol did exactly that). Wobble above 1e-7 — e.g. vertices
    # round-tripped through f32 — is indistinguishable from real fine
    # grading and correctly takes the geom path (or raises where only
    # uniform is supported).
    return bool(
        np.allclose(disc.rx, rx0, rtol=1e-7, atol=0.0)
        and np.allclose(disc.fscale, rx0, rtol=1e-7, atol=0.0)
    )


def _check_uniform(disc: Discretization1D) -> tuple[float, float]:
    rx = float(disc.rx[0, 0])
    if not _is_uniform(disc, rx):
        raise ValueError("pallas DG kernels require a uniform mesh")
    return rx, rx


def _geom_or_uniform(disc: Discretization1D, m: int | None = None):
    """(rx, fscale, geom) for PallasAdvecConfig: scalars + None on a
    uniform mesh (factors fold into the coefficient tables); zeros + the
    per-element vector tables otherwise (non-uniform/graded meshes from
    ``startup_1d(vx=...)``). ``m``: lane count of the blocked-single
    layout (K/8); None = the batched lane layout ((1, K) rows)."""
    rx0 = float(disc.rx[0, 0])
    if _is_uniform(disc, rx0):
        return rx0, rx0, None
    shape = (1, disc.k) if m is None else (8, m)
    rxv = np.ascontiguousarray(disc.rx[0, :], dtype=np.float32)
    fsl = np.ascontiguousarray(disc.fscale[0, :], dtype=np.float32)
    fsr = np.ascontiguousarray(disc.fscale[1, :], dtype=np.float32)
    return 0.0, 0.0, tuple(v.reshape(shape) for v in (rxv, fsl, fsr))


def _shift_m1(x, k):
    """x[k] -> x[k+1] source (logical left-shift): out[j] = x[j+1]."""
    return jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)


def _shift_p1(x, k):
    """out[j] = x[j−1] (logical right-shift)."""
    return jnp.concatenate([x[:, k - 1 :], x[:, : k - 1]], axis=1)


def _masks(k):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    return lane == 0, lane == k - 1


def _lsrk_step(cfg, dr, lift, first, last, u, t, dt):
    """One full LSRK step at step-size ``dt`` (a Python float at every call
    site, including the dt/2 half steps — constants fold at trace time)."""
    np_, k, a = cfg.np_, cfg.k, cfg.a
    drc, fac_l, fac_r, _ = _dt_tables(cfg, dr, dt)
    resu = jnp.zeros_like(u)
    for s in range(5):
        ts = t + float(RK4C[s]) * dt
        u_l = u[0:1, :]
        u_r = u[np_ - 1 : np_, :]
        u_l_nbr = _shift_p1(u_r, k)
        u_r_nbr = _shift_m1(u_l, k)
        uin = -jnp.sin(a * ts)
        du_l = jnp.where(first, (u_l - uin) * fac_l, (u_l - u_l_nbr) * fac_l)
        du_r = jnp.where(last, 0.0, (u_r - u_r_nbr) * fac_r)
        rows = []
        for ii in range(np_):
            acc = drc[ii, 0] * u[0:1, :]
            for jj in range(1, np_):
                acc = acc + drc[ii, jj] * u[jj : jj + 1, :]
            acc = acc + lift[ii, 0] * du_l + lift[ii, 1] * du_r
            rows.append(acc)
        rhs = jnp.concatenate(rows, axis=0)
        resu = float(RK4A[s]) * resu + rhs
        u = u + float(RK4B[s]) * resu
    return u


def _lsrk_step_t(cfg, dr, lift, first, last, lu, dt):
    """Exact transpose of the homogeneous LSRK step (stages reversed);
    dt and the volume factor pre-folded into the tables (_dt_tables)."""
    np_, k, a = cfg.np_, cfg.k, cfg.a
    drc, fac_l, fac_r, _ = _dt_tables(cfg, dr, dt)

    def at_t_dt(lam):
        w0 = lift[0, 0] * lam[0:1, :]
        w1 = lift[0, 1] * lam[0:1, :]
        for ii in range(1, np_):
            w0 = w0 + lift[ii, 0] * lam[ii : ii + 1, :]
            w1 = w1 + lift[ii, 1] * lam[ii : ii + 1, :]
        s0 = w0 * fac_l
        s1 = jnp.where(last, 0.0, w1 * fac_r)
        p0 = jnp.where(last, 0.0, _shift_m1(s0, k))
        p1 = jnp.where(first, 0.0, _shift_p1(s1, k))
        rows = []
        for ii in range(np_):
            acc = drc[0, ii] * lam[0:1, :]
            for jj in range(1, np_):
                acc = acc + drc[jj, ii] * lam[jj : jj + 1, :]
            if ii == 0:
                acc = acc + s0 - p1
            if ii == np_ - 1:
                acc = acc + s1 - p0
            rows.append(acc)
        return jnp.concatenate(rows, axis=0)

    lr = jnp.zeros_like(lu)
    for s in (4, 3, 2, 1, 0):
        w = float(RK4B[s]) * lu + lr
        lr = float(RK4A[s]) * w
        lu = lu + at_t_dt(w)
    return lu



def _lsrk_step_loop(cfg, dr, lift, rk_ref, first, last, u, t, dt):
    """One full LSRK step with the 5 stages as a fori_loop (small live set —
    the unrolled variant blows Mosaic's scoped-VMEM stack in large kernels).
    ``rk_ref`` is an SMEM ref holding [a0..a4, b0..b4, c0..c4]."""
    np_, k, a = cfg.np_, cfg.k, cfg.a
    drc, fac_l, fac_r, _ = _dt_tables(cfg, dr, dt)

    def stage(s, carry):
        u, resu = carry
        ts = t + rk_ref[10 + s] * dt
        u_l = u[0:1, :]
        u_r = u[np_ - 1 : np_, :]
        u_l_nbr = _shift_p1(u_r, k)
        u_r_nbr = _shift_m1(u_l, k)
        uin = -jnp.sin(a * ts)
        du_l = jnp.where(first, (u_l - uin) * fac_l, (u_l - u_l_nbr) * fac_l)
        du_r = jnp.where(last, 0.0, (u_r - u_r_nbr) * fac_r)
        rows = []
        for ii in range(np_):
            acc = drc[ii, 0] * u[0:1, :]
            for jj in range(1, np_):
                acc = acc + drc[ii, jj] * u[jj : jj + 1, :]
            acc = acc + lift[ii, 0] * du_l + lift[ii, 1] * du_r
            rows.append(acc)
        rhs = jnp.concatenate(rows, axis=0)
        resu = rk_ref[s] * resu + rhs
        u = u + rk_ref[5 + s] * resu
        return (u, resu)

    u, _ = jax.lax.fori_loop(0, 5, stage, (u, jnp.zeros_like(u)))
    return u


def _lsrk_step_t_loop(cfg, dr, lift, rk_ref, first, last, lu, dt):
    """Transpose step with the 5 reversed stages as a fori_loop."""
    np_, k, a = cfg.np_, cfg.k, cfg.a
    drc, fac_l, fac_r, _ = _dt_tables(cfg, dr, dt)

    def stage(i, carry):
        lu, lr = carry
        s = 4 - i
        w = rk_ref[5 + s] * lu + lr
        lr = rk_ref[s] * w
        # dt·(A^T w), dt pre-folded into the tables
        w0 = lift[0, 0] * w[0:1, :]
        w1 = lift[0, 1] * w[0:1, :]
        for ii in range(1, np_):
            w0 = w0 + lift[ii, 0] * w[ii : ii + 1, :]
            w1 = w1 + lift[ii, 1] * w[ii : ii + 1, :]
        s0 = w0 * fac_l
        s1 = jnp.where(last, 0.0, w1 * fac_r)
        p0 = jnp.where(last, 0.0, _shift_m1(s0, k))
        p1 = jnp.where(first, 0.0, _shift_p1(s1, k))
        rows = []
        for ii in range(np_):
            acc = drc[0, ii] * w[0:1, :]
            for jj in range(1, np_):
                acc = acc + drc[jj, ii] * w[jj : jj + 1, :]
            if ii == 0:
                acc = acc + s0 - p1
            if ii == np_ - 1:
                acc = acc + s1 - p0
            rows.append(acc)
        lu = lu + jnp.concatenate(rows, axis=0)
        return (lu, lr)

    lu, _ = jax.lax.fori_loop(0, 5, stage, (lu, jnp.zeros_like(lu)))
    return lu


RK_PACKED = np.concatenate([RK4A, RK4B, RK4C]).astype(np.float32)


# ------------------------------------------------------------------ forward


def _forward_kernel(cfg, dr, lift, t0_ref, u_ref, u_out):
    first, last = _masks(cfg.k)
    t0 = t0_ref[0]
    dt = cfg.dt

    def one_step(i, u):
        return _lsrk_step(cfg, dr, lift, first, last, u, t0 + i * dt, dt)

    u_out[:] = jax.lax.fori_loop(0, cfg.steps_per_call, one_step, u_ref[:])


def _make_fwd_chunk(cfg, dr_host, lift_host, interpret):
    """One forward-march kernel launch: ``chunk(u, t0) -> u`` advancing
    ``cfg.steps_per_call`` steps. Shared by the plain march and the
    chunked fwd+adj pipeline (which launches it once per segment)."""

    def chunk(u, t0):
        kern = functools.partial(_forward_kernel, cfg, dr_host, lift_host)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(jnp.reshape(t0, (1,)), u)

    return chunk


def make_pallas_advec_march(
    disc: Discretization1D,
    a: float,
    dt: float,
    steps_per_call: int = 256,
    interpret: bool = False,
):
    """Returns ``march(u0, t0, n_calls) -> u`` running
    ``n_calls · steps_per_call`` fused steps."""
    rx, fs = _check_uniform(disc)
    cfg = PallasAdvecConfig(
        np_=disc.np_, k=disc.k, a=a, rx=rx, fscale=fs, dt=dt,
        steps_per_call=steps_per_call, interpret=interpret,
    )
    dr_host = np.ascontiguousarray(disc.dr, dtype=np.float32)
    lift_host = np.ascontiguousarray(disc.lift, dtype=np.float32)
    chunk = _make_fwd_chunk(cfg, dr_host, lift_host, interpret)
    steps_per_call = cfg.steps_per_call

    def march(u0, t0, n_calls: int):
        def body(u, i):
            t = (t0 + i * (steps_per_call * dt)).astype(u0.dtype)
            return chunk(u, t), None

        u, _ = jax.lax.scan(body, u0, jnp.arange(n_calls))
        return u

    return march


# ------------------------------------------------------------------ adjoint


def _adjoint_kernel(cfg, dr, lift, lu_ref, lu_out):
    first, last = _masks(cfg.k)

    def one_step(i, lu):
        return _lsrk_step_t(cfg, dr, lift, first, last, lu, cfg.dt)

    lu_out[:] = jax.lax.fori_loop(0, cfg.steps_per_call, one_step, lu_ref[:])


def make_pallas_advec_adjoint(
    disc: Discretization1D,
    a: float,
    dt: float,
    steps_per_call: int = 256,
    interpret: bool = False,
):
    """Returns ``adjoint(lam_end, n_calls) -> lam0`` applying the exact
    transpose of ``n_calls · steps_per_call`` forward steps."""
    rx, fs = _check_uniform(disc)
    cfg = PallasAdvecConfig(
        np_=disc.np_, k=disc.k, a=a, rx=rx, fscale=fs, dt=dt,
        steps_per_call=steps_per_call, interpret=interpret,
    )
    dr_host = np.ascontiguousarray(disc.dr, dtype=np.float32)
    lift_host = np.ascontiguousarray(disc.lift, dtype=np.float32)

    def chunk(lu):
        kern = functools.partial(_adjoint_kernel, cfg, dr_host, lift_host)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(lu.shape, lu.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(lu)

    def adjoint(lam_end, n_calls: int):
        def body(lu, _):
            return chunk(lu), None

        lu, _ = jax.lax.scan(body, lam_end, None, length=n_calls)
        return lu

    return adjoint


# -------------------------------------------- fused adjoint + estimate sweep


def _adj_estimate_kernel(cfg, dr, lift, t0_ref, rk_ref, ckpt_ref, lu_ref, eta_ref,
                         lu_out, eta_out, traj):
    """One segment of the reverse sweep: recompute the segment's forward
    states into VMEM scratch (stacked on sublanes), then sweep backward
    accumulating the per-element step-doubling AWR and applying the
    transpose step."""
    np_, k, dt = cfg.np_, cfg.k, cfg.dt
    seg = cfg.steps_per_call
    first, last = _masks(k)
    t0 = t0_ref[0]

    # forward recompute; traj holds states 0..seg (inclusive), each in an
    # 8-sublane slot so the dynamic store offset is provably 8-aligned
    def fwd_body(n, u):
        traj[pl.ds(pl.multiple_of(n * 8, 8), np_), :] = u
        return _lsrk_step_loop(cfg, dr, lift, rk_ref, first, last, u, t0 + n * dt, dt)

    u_final = jax.lax.fori_loop(0, seg, fwd_body, ckpt_ref[:])
    traj[pl.ds(pl.multiple_of(seg * 8, 8), np_), :] = u_final

    def bwd_body(i, carry):
        lu, eta = carry
        n = seg - 1 - i
        t_n = t0 + n * dt
        u_n = traj[pl.ds(pl.multiple_of(n * 8, 8), np_), :]
        u_np1 = traj[pl.ds(pl.multiple_of((n + 1) * 8, 8), np_), :]
        half = _lsrk_step_loop(cfg, dr, lift, rk_ref, first, last, u_n, t_n, dt / 2)
        half2 = _lsrk_step_loop(cfg, dr, lift, rk_ref, first, last, half, t_n + dt / 2, dt / 2)
        r = u_np1 - half2
        acc = lu[0:1, :] * r[0:1, :]
        for ii in range(1, np_):
            acc = acc + lu[ii : ii + 1, :] * r[ii : ii + 1, :]
        eta = eta + acc
        # fine (half-step-squared) transpose: makes Ση == J(u_dt) − J(u_dt/2)
        # exact to roundoff (see adjoint/advec.py module docstring)
        lu = _lsrk_step_t_loop(cfg, dr, lift, rk_ref, first, last, lu, dt / 2)
        lu = _lsrk_step_t_loop(cfg, dr, lift, rk_ref, first, last, lu, dt / 2)
        return (lu, eta)

    lu, eta = jax.lax.fori_loop(0, seg, bwd_body, (lu_ref[:], eta_ref[:]))
    lu_out[:] = lu
    eta_out[:] = eta


def make_pallas_fwd_adj_estimate(
    disc: Discretization1D,
    a: float,
    dt: float,
    segment: int = 32,
    interpret: bool = False,
):
    """Fused forward + adjoint + error-estimate pipeline.

    Returns ``run(u0, t0, n_segments, lam_end) -> (u_final, lam0, eta)``
    where ``eta`` is the per-element adjoint-weighted step-doubling error
    contribution over all ``n_segments · segment`` steps. Segment states are
    checkpointed to HBM (one per segment); each reverse segment is a single
    kernel launch. VMEM use ≈ (segment+1)·8·K·4B — each stored state sits in
    an 8-sublane slot for Mosaic's dynamic-offset alignment (≈ 10.6 MB at
    the north-star size with segment=32).
    """
    rx, fs = _check_uniform(disc)
    cfg = PallasAdvecConfig(
        np_=disc.np_, k=disc.k, a=a, rx=rx, fscale=fs, dt=dt,
        steps_per_call=segment, interpret=interpret,
    )
    dr_host = np.ascontiguousarray(disc.dr, dtype=np.float32)
    lift_host = np.ascontiguousarray(disc.lift, dtype=np.float32)
    fwd_chunk = _make_fwd_chunk(cfg, dr_host, lift_host, interpret)

    def adj_chunk(lu, eta, ckpt, t0):
        kern = functools.partial(_adj_estimate_kernel, cfg, dr_host, lift_host)
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct(lu.shape, lu.dtype),
                jax.ShapeDtypeStruct(eta.shape, eta.dtype),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM(((segment + 1) * 8, cfg.k), jnp.float32)
            ],
            interpret=interpret,
        )(jnp.reshape(t0, (1,)), jnp.asarray(RK_PACKED), ckpt, lu, eta)

    def run(u0, t0, n_segments: int, lam_end):
        seg_dt = segment * dt

        def fwd_body(u, i):
            t = (t0 + i * seg_dt).astype(u0.dtype)
            u_next = fwd_chunk(u, t)
            return u_next, u  # save the segment-entry state

        u_final, ckpts = jax.lax.scan(fwd_body, u0, jnp.arange(n_segments))

        eta0 = jnp.zeros((1, cfg.k), u0.dtype)

        def adj_body(carry, i):
            lu, eta = carry
            seg_idx = n_segments - 1 - i
            ckpt = ckpts[seg_idx]
            t_seg = (t0 + seg_idx * seg_dt).astype(u0.dtype)
            lu, eta = adj_chunk(lu, eta, ckpt, t_seg)
            return (lu, eta), None

        (lam0, eta), _ = jax.lax.scan(
            adj_body, (lam_end, eta0), jnp.arange(n_segments)
        )
        return u_final, lam0, eta[0]

    return run


# ------------------------------------ single-launch grid pipeline (fastest)


def _fwd_ckpt_grid_kernel(cfg, dr, lift, n_seg, t0_ref, rk_ref, u0_ref,
                          ckpt_out, ufinal_out, u_scr):
    """Grid dim = segment index; carries the state in scratch across the
    sequential TPU grid, writing one checkpoint block per grid step. ONE
    kernel launch for the whole forward phase (the per-launch latency of
    the chunked variant dominates at small segments)."""
    i = pl.program_id(0)
    seg = cfg.steps_per_call
    first, last = _masks(cfg.k)
    dt = cfg.dt

    @pl.when(i == 0)
    def _():
        u_scr[:] = u0_ref[:]

    ckpt_out[0] = u_scr[:]
    t0 = t0_ref[0] + (i * seg) * dt

    def body(n, u):
        return _lsrk_step_loop(cfg, dr, lift, rk_ref, first, last, u, t0 + n * dt, dt)

    u_scr[:] = jax.lax.fori_loop(0, seg, body, u_scr[:])

    @pl.when(i == n_seg - 1)
    def _():
        ufinal_out[:] = u_scr[:]


def _adj_est_grid_kernel(cfg, dr, lift, n_seg, unroll, t0_ref, rk_ref, lam_ref,
                         ckpt_ref, lam0_out, eta_out, traj, lu_scr, eta_scr):
    """Reverse sweep over segments as one kernel launch: grid step i
    processes segment n_seg−1−i (the checkpoint BlockSpec index_map feeds
    blocks in reverse); λu and η accumulate in scratch across grid steps."""
    i = pl.program_id(0)
    seg = cfg.steps_per_call
    np_ = cfg.np_
    first, last = _masks(cfg.k)
    dt = cfg.dt
    seg_idx = n_seg - 1 - i
    t0 = t0_ref[0] + (seg_idx * seg) * dt

    @pl.when(i == 0)
    def _():
        lu_scr[:] = lam_ref[:]
        eta_scr[:] = jnp.zeros_like(eta_scr)

    if unroll:  # unrolled stages: faster, larger scoped-VMEM stack
        step_fn = lambda u, t, d: _lsrk_step(cfg, dr, lift, first, last, u, t, d)
        step_t_fn = lambda lu, d: _lsrk_step_t(cfg, dr, lift, first, last, lu, d)
    else:
        step_fn = lambda u, t, d: _lsrk_step_loop(
            cfg, dr, lift, rk_ref, first, last, u, t, d
        )
        step_t_fn = lambda lu, d: _lsrk_step_t_loop(
            cfg, dr, lift, rk_ref, first, last, lu, d
        )

    # recompute the segment's forward states into traj (8-aligned slots)
    def fwd_body(n, u):
        traj[pl.ds(pl.multiple_of(n * 8, 8), np_), :] = u
        return step_fn(u, t0 + n * dt, dt)

    u_final = jax.lax.fori_loop(0, seg, fwd_body, ckpt_ref[0])
    traj[pl.ds(pl.multiple_of(seg * 8, 8), np_), :] = u_final

    def bwd_body(j, carry):
        lu, eta = carry
        n = seg - 1 - j
        t_n = t0 + n * dt
        u_n = traj[pl.ds(pl.multiple_of(n * 8, 8), np_), :]
        u_np1 = traj[pl.ds(pl.multiple_of((n + 1) * 8, 8), np_), :]
        half = step_fn(u_n, t_n, dt / 2)
        half2 = step_fn(half, t_n + dt / 2, dt / 2)
        r = u_np1 - half2
        acc = lu[0:1, :] * r[0:1, :]
        for ii in range(1, np_):
            acc = acc + lu[ii : ii + 1, :] * r[ii : ii + 1, :]
        eta = eta + acc
        # fine (half-step-squared) transpose — exact effectivity identity
        lu = step_t_fn(step_t_fn(lu, dt / 2), dt / 2)
        return (lu, eta)

    lu, eta = jax.lax.fori_loop(0, seg, bwd_body, (lu_scr[:], eta_scr[:]))
    lu_scr[:] = lu
    eta_scr[:] = eta

    @pl.when(i == n_seg - 1)
    def _():
        lam0_out[:] = lu
        eta_out[:] = eta


def make_pallas_fwd_adj_estimate_grid(
    disc: Discretization1D,
    a: float,
    dt: float,
    segment: int = 32,
    n_segments: int = 64,
    interpret: bool = False,
    unroll: bool = False,
):
    """Single-launch-per-phase fused pipeline: the forward phase and the
    reverse adjoint+estimate phase are each ONE ``pallas_call`` with a grid
    over segments (sequential on TPU; state carried in scratch). Eliminates
    the per-launch latency that dominates the chunked variant.

    Returns ``run(u0, t0, lam_end) -> (u_final, lam0, eta)`` for exactly
    ``n_segments · segment`` steps (both phase sizes are baked into the
    compiled grids).
    """
    rx, fs = _check_uniform(disc)
    cfg = PallasAdvecConfig(
        np_=disc.np_, k=disc.k, a=a, rx=rx, fscale=fs, dt=dt,
        steps_per_call=segment, interpret=interpret,
    )
    dr_host = np.ascontiguousarray(disc.dr, dtype=np.float32)
    lift_host = np.ascontiguousarray(disc.lift, dtype=np.float32)
    np_, k = cfg.np_, cfg.k

    def run(u0, t0, lam_end):
        fwd_kern = functools.partial(
            _fwd_ckpt_grid_kernel, cfg, dr_host, lift_host, n_segments
        )
        ckpts, u_final = pl.pallas_call(
            fwd_kern,
            grid=(n_segments,),
            out_shape=(
                jax.ShapeDtypeStruct((n_segments, np_, k), u0.dtype),
                jax.ShapeDtypeStruct((np_, k), u0.dtype),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((np_, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, np_, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((np_, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((np_, k), jnp.float32)],
            interpret=interpret,
        )(jnp.reshape(t0, (1,)), jnp.asarray(RK_PACKED), u0)

        adj_kern = functools.partial(
            _adj_est_grid_kernel, cfg, dr_host, lift_host, n_segments, unroll
        )
        lam0, eta = pl.pallas_call(
            adj_kern,
            grid=(n_segments,),
            out_shape=(
                jax.ShapeDtypeStruct((np_, k), u0.dtype),
                jax.ShapeDtypeStruct((1, k), u0.dtype),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((np_, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, np_, k),
                    lambda i: (n_segments - 1 - i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec((np_, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM(((segment + 1) * 8, k), jnp.float32),
                pltpu.VMEM((np_, k), jnp.float32),
                pltpu.VMEM((1, k), jnp.float32),
            ],
            interpret=interpret,
        )(jnp.reshape(t0, (1,)), jnp.asarray(RK_PACKED), lam_end, ckpts)
        return u_final, lam0, eta[0]

    return run


# --------------------------- batched single-launch grid pipeline (8× VPU)
#
# The unbatched kernels operate on (1, K) row slices: every vector op uses 1
# of the 8 sublanes in each VPU register — the chip runs ≥87% empty. Stacking
# B=8 independent states as (Np, B, K) makes every slice u[ii] a full (8, K)
# tile: the same instruction count processes 8 marches at once. This is the
# reference's ensemble axis (Main_variable_params.py:234 vmaps 100k ICs)
# applied to the DG benchmark.


def _shift_m1_b(x, k):
    """out[..., j] = x[..., j+1] (logical left shift along lanes)."""
    return jnp.concatenate([x[..., 1:], x[..., :1]], axis=-1)


def _shift_p1_b(x, k):
    """out[..., j] = x[..., j−1]."""
    return jnp.concatenate([x[..., k - 1 :], x[..., : k - 1]], axis=-1)


# --- blocked-single layout: ONE state's K elements tiled over the 8
# sublanes as contiguous blocks, element k = s·M + j with M = K/8. The
# element shifts are the same ±1 circular permutations as the lane-only
# layout, with the block boundary (lane 0 / lane M−1) patched from the
# neighbouring sublane — 2 extra vector ops per shift buys full register
# height for a SINGLE state (the row layout uses 1 of 8 sublanes).


def _shift_m1_blk(x, m):
    """Element k+1 source: out[s,j] = x[s,j+1]; out[s,M−1] = x[s+1,0]
    (wrapping to x[0,0] at s=7 — masked off by ``last`` downstream)."""
    y = jnp.concatenate([x[:, 1:], x[:, :1]], axis=-1)
    c = jnp.concatenate([x[1:, 0:1], x[0:1, 0:1]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == m - 1, c, y)


def _shift_p1_blk(x, m):
    """Element k−1 source: out[s,j] = x[s,j−1]; out[s,0] = x[s−1,M−1]
    (wrapping to x[7,M−1] at s=0 — masked off by ``first`` downstream)."""
    y = jnp.concatenate([x[:, m - 1 :], x[:, : m - 1]], axis=-1)
    c = jnp.concatenate([x[-1:, m - 1 : m], x[:-1, m - 1 : m]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, c, y)


def _masks_blk(m):
    """first/last element masks in the blocked-single (8, M) layout."""
    s = jax.lax.broadcasted_iota(jnp.int32, (8, m), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (8, m), 1)
    return (s == 0) & (j == 0), (s == 7) & (j == m - 1)


def _dt_tables(cfg, dr, dt, geom=None):
    """Fold the volume factor (−a·rx) and the step size dt into the
    coefficient tables at TRACE time (dr is a host numpy array and dt a
    Python float in every kernel call, including the dt/2 half steps).
    With rhs′ = dt·rhs the low-storage update ``resu = aₛ·resu + rhs′``
    is a single FMA and the per-row volume term needs no post-scale —
    2 fewer vector ops per row per stage.

    Non-uniform meshes (``geom`` = the (rx, fscale_l, fscale_r) row
    arrays read from the kernel's geom refs): rx cannot fold into the
    scalar table — the volume term gets a per-element vector post-scale
    ``rxv`` (4th return, None when uniform) and the surface factors become
    per-element vectors (affine 1D elements have equal left/right face
    Jacobians, but both rows are carried for generality)."""
    if geom is None:
        drc = np.asarray(-cfg.a * cfg.rx * dt * np.asarray(dr), dtype=np.float32)
        fac_l = float(-cfg.a / 2.0 * cfg.fscale * dt)
        fac_r = float(cfg.a / 2.0 * cfg.fscale * dt)
        return drc, fac_l, fac_r, None
    rxv, fsl, fsr = geom
    drc = np.asarray(-cfg.a * dt * np.asarray(dr), dtype=np.float32)
    fac_l = (-cfg.a / 2.0 * dt) * fsl
    fac_r = (cfg.a / 2.0 * dt) * fsr
    return drc, fac_l, fac_r, rxv


def _lsrk_step_b(cfg, dr, lift, first, last, u, t, dt,
                 shift_p1=None, shift_m1=None, geom=None):
    """One LSRK step on a batched state held as a TUPLE of Np (B, K) rows —
    full-height register tiles, stages unrolled, no stack/concatenate in the
    hot loop (measured ~2x the stacked fori-stage form: 7.75 -> 4.0 us
    per batched step-equivalent). Constant factors and dt are pre-folded
    into the coefficient tables (see _dt_tables). ``shift_p1/shift_m1``
    override the element-neighbour shifts (blocked-single layout)."""
    np_, k, a = cfg.np_, cfg.k, cfg.a
    shift_p1 = shift_p1 or (lambda x: _shift_p1_b(x, k))
    shift_m1 = shift_m1 or (lambda x: _shift_m1_b(x, k))
    drc, fac_l, fac_r, rxv = _dt_tables(cfg, dr, dt, geom)
    if rxv is None:
        # uniform: the scalar surface factors fold into the per-row lift
        # coefficients — the flux differences need no vector scaling at all
        liftl = tuple(float(lift[ii, 0]) * fac_l for ii in range(np_))
        liftr = tuple(float(lift[ii, 1]) * fac_r for ii in range(np_))
    else:
        liftl = tuple(float(lift[ii, 0]) for ii in range(np_))
        liftr = tuple(float(lift[ii, 1]) for ii in range(np_))
    resu = tuple(jnp.zeros_like(r) for r in u)
    for s in range(5):
        ts = t + float(RK4C[s]) * dt
        u_l, u_r = u[0], u[np_ - 1]
        u_l_nbr = shift_p1(u_r)
        u_r_nbr = shift_m1(u_l)
        uin = -jnp.sin(a * ts)
        du_l = jnp.where(first, u_l - uin, u_l - u_l_nbr)
        du_r = jnp.where(last, 0.0, u_r - u_r_nbr)
        if rxv is not None:
            du_l = du_l * fac_l
            du_r = du_r * fac_r
        new_u, new_r = [], []
        for ii in range(np_):
            acc = drc[ii, 0] * u[0]
            for jj in range(1, np_):
                acc = acc + drc[ii, jj] * u[jj]
            if rxv is not None:
                acc = acc * rxv
            rhs = acc + liftl[ii] * du_l + liftr[ii] * du_r
            r_ii = float(RK4A[s]) * resu[ii] + rhs
            new_r.append(r_ii)
            new_u.append(u[ii] + float(RK4B[s]) * r_ii)
        u, resu = tuple(new_u), tuple(new_r)
    return u


def _lsrk_step_t_b(cfg, dr, lift, first, last, lu, dt,
                   shift_p1=None, shift_m1=None, geom=None):
    """Transpose step on a batched cotangent held as a tuple of Np (B, K)
    rows (stages reversed, unrolled, stack-free). dt and the volume factor
    are pre-folded into the tables (see _dt_tables) so the cotangent update
    ``lu += dt·AᵀW`` needs no per-row post-scale. ``shift_p1/shift_m1``
    override the element shifts (blocked-single layout); the transpose of a
    circular ±1 element shift is the ∓1 shift in ANY element indexing, so
    the same overrides serve both directions."""
    np_, k, a = cfg.np_, cfg.k, cfg.a
    shift_p1 = shift_p1 or (lambda x: _shift_p1_b(x, k))
    shift_m1 = shift_m1 or (lambda x: _shift_m1_b(x, k))
    drc, fac_l, fac_r, rxv = _dt_tables(cfg, dr, dt, geom)
    if rxv is None:
        liftl = tuple(float(lift[ii, 0]) * fac_l for ii in range(np_))
        liftr = tuple(float(lift[ii, 1]) * fac_r for ii in range(np_))
    else:
        liftl = tuple(float(lift[ii, 0]) for ii in range(np_))
        liftr = tuple(float(lift[ii, 1]) for ii in range(np_))
    lr = tuple(jnp.zeros_like(r) for r in lu)
    for s in (4, 3, 2, 1, 0):
        w = tuple(float(RK4B[s]) * lu[ii] + lr[ii] for ii in range(np_))
        lr = tuple(float(RK4A[s]) * w[ii] for ii in range(np_))
        w0 = liftl[0] * w[0]
        w1 = liftr[0] * w[0]
        for ii in range(1, np_):
            w0 = w0 + liftl[ii] * w[ii]
            w1 = w1 + liftr[ii] * w[ii]
        if rxv is not None:
            w0 = w0 * fac_l
            w1 = w1 * fac_r
        s0 = w0
        s1 = jnp.where(last, 0.0, w1)
        p0 = jnp.where(last, 0.0, shift_m1(s0))
        p1 = jnp.where(first, 0.0, shift_p1(s1))
        new_lu = []
        for ii in range(np_):
            acc = drc[0, ii] * w[0]
            for jj in range(1, np_):
                acc = acc + drc[jj, ii] * w[jj]
            if rxv is not None:
                # diag(rx) acts per element, commuting with the in-element
                # Dr contraction — scale the volume part only; the surface
                # terms below carry their own per-element fscale already
                acc = acc * rxv
            if ii == 0:
                acc = acc + s0 - p1
            if ii == np_ - 1:
                acc = acc + s1 - p0
            new_lu.append(lu[ii] + acc)
        lu = tuple(new_lu)
    return lu


def _split_geom_refs(cfg, rest):
    """Strip the 3 per-element geometry refs (rx, fscale_l, fscale_r) off
    the front of a kernel's trailing refs when cfg.geom is set — the single
    place that encodes the geom operand-ordering contract (geom inputs are
    always the LAST pallas_call inputs, so they lead ``rest``)."""
    if cfg.geom is None:
        return None, rest
    rx_ref, fsl_ref, fsr_ref = rest[:3]
    return (rx_ref[:], fsl_ref[:], fsr_ref[:]), rest[3:]


def _fwd_ckpt_grid_kernel_b(cfg, dr, lift, n_seg, t0_ref, u0_ref, *rest):
    geom, (ckpt_out, ufinal_out, u_scr) = _split_geom_refs(cfg, rest)
    i = pl.program_id(0)
    seg = cfg.steps_per_call
    first, last = _masks(cfg.k)
    dt = cfg.dt

    @pl.when(i == 0)
    def _():
        u_scr[:] = u0_ref[:]

    ckpt_out[0] = u_scr[:]
    t0 = t0_ref[0] + (i * seg) * dt
    np_ = cfg.np_

    def body(n, u):
        return _lsrk_step_b(cfg, dr, lift, first, last, u, t0 + n * dt, dt,
                            geom=geom)

    rows = tuple(u_scr[ii] for ii in range(np_))
    rows = jax.lax.fori_loop(0, seg, body, rows)
    u_scr[:] = jnp.stack(rows, axis=0)

    @pl.when(i == n_seg - 1)
    def _():
        ufinal_out[:] = u_scr[:]


def _adj_est_grid_kernel_b(cfg, dr, lift, n_seg, t0_ref, lam_ref,
                           ckpt_ref, *rest):
    """Batched reverse sweep: recompute the segment's (Np, B, K) states into
    traj (leading-axis slots, each (B, K) block is one full tile set), then
    sweep backward with the fine (half-step-squared) transpose."""
    geom, (lam0_out, eta_out, traj, lu_scr, eta_scr) = _split_geom_refs(cfg, rest)
    i = pl.program_id(0)
    seg = cfg.steps_per_call
    np_ = cfg.np_
    first, last = _masks(cfg.k)
    dt = cfg.dt
    seg_idx = n_seg - 1 - i
    t0 = t0_ref[0] + (seg_idx * seg) * dt

    @pl.when(i == 0)
    def _():
        lu_scr[:] = lam_ref[:]
        eta_scr[:] = jnp.zeros_like(eta_scr)

    def fwd_body(n, u):
        traj[pl.ds(n * np_, np_)] = jnp.stack(u, axis=0)
        return _lsrk_step_b(cfg, dr, lift, first, last, u, t0 + n * dt, dt,
                            geom=geom)

    rows0 = tuple(ckpt_ref[0, ii] for ii in range(np_))
    u_final = jax.lax.fori_loop(0, seg, fwd_body, rows0)
    traj[pl.ds(seg * np_, np_)] = jnp.stack(u_final, axis=0)

    def bwd_body(j, carry):
        lu, eta = carry
        n = seg - 1 - j
        t_n = t0 + n * dt
        blk_n = traj[pl.ds(n * np_, np_)]
        blk_np1 = traj[pl.ds((n + 1) * np_, np_)]
        u_n = tuple(blk_n[ii] for ii in range(np_))
        half = _lsrk_step_b(cfg, dr, lift, first, last, u_n, t_n, dt / 2,
                            geom=geom)
        half2 = _lsrk_step_b(
            cfg, dr, lift, first, last, half, t_n + dt / 2, dt / 2, geom=geom
        )
        acc = lu[0] * (blk_np1[0] - half2[0])
        for ii in range(1, np_):
            acc = acc + lu[ii] * (blk_np1[ii] - half2[ii])
        eta = eta + acc
        # fine (half-step-squared) transpose — exact effectivity identity
        lu = _lsrk_step_t_b(cfg, dr, lift, first, last, lu, dt / 2, geom=geom)
        lu = _lsrk_step_t_b(cfg, dr, lift, first, last, lu, dt / 2, geom=geom)
        return (lu, eta)

    lu0 = tuple(lu_scr[ii] for ii in range(np_))
    lu, eta = jax.lax.fori_loop(0, seg, bwd_body, (lu0, eta_scr[:]))
    lu_stacked = jnp.stack(lu, axis=0)
    lu_scr[:] = lu_stacked
    eta_scr[:] = eta

    @pl.when(i == n_seg - 1)
    def _():
        lam0_out[:] = lu_stacked
        eta_out[:] = eta


def _layout_fns(cfg, blocked):
    """(first, last, shift_p1, shift_m1) for the batched lane layout or the
    blocked-single layout (cfg.k is the LANE count — K/8 when blocked)."""
    if blocked:
        first, last = _masks_blk(cfg.k)
        return (first, last,
                lambda x: _shift_p1_blk(x, cfg.k),
                lambda x: _shift_m1_blk(x, cfg.k))
    first, last = _masks(cfg.k)
    return first, last, None, None


def _fwd_traj_grid_kernel_b(cfg, dr, lift, n_seg, blocked, t0_ref, u0_ref,
                            *rest):
    """Forward phase that stores EVERY coarse state to HBM (block = this
    segment's ``seg`` states): the reverse kernel then reads instead of
    recomputing, cutting the pipeline from 6 to 5 LSRK step-equivalents per
    time step. HBM traffic (~state·n_steps each way) sits far below the
    VPU-bound kernel time at the north-star size and is pipelined by the
    BlockSpec index maps."""
    geom, (traj_out, ufinal_out, u_scr) = _split_geom_refs(cfg, rest)
    i = pl.program_id(0)
    seg = cfg.steps_per_call
    np_ = cfg.np_
    first, last, sp1, sm1 = _layout_fns(cfg, blocked)
    dt = cfg.dt

    @pl.when(i == 0)
    def _():
        u_scr[:] = u0_ref[:]

    t0 = t0_ref[0] + (i * seg) * dt

    def body(n, u):
        for ii in range(np_):
            traj_out[n, ii] = u[ii]
        return _lsrk_step_b(cfg, dr, lift, first, last, u, t0 + n * dt, dt,
                            sp1, sm1, geom)

    rows = tuple(u_scr[ii] for ii in range(np_))
    rows = jax.lax.fori_loop(0, seg, body, rows)
    u_scr[:] = jnp.stack(rows, axis=0)

    @pl.when(i == n_seg - 1)
    def _():
        ufinal_out[:] = u_scr[:]


def _fwd_grid_kernel_b(cfg, dr, lift, n_seg, blocked, t0_ref, u0_ref, *rest):
    """Forward-ONLY march (no trajectory, no checkpoints): the advance
    engine of the revolve-checkpointed pipeline (adjoint/revolve_vjp.py),
    where the binomial schedule re-advances segments instead of storing
    them — O(snaps) states total for marches whose stored trajectory
    exceeds HBM."""
    geom, (ufinal_out, u_scr) = _split_geom_refs(cfg, rest)
    i = pl.program_id(0)
    seg = cfg.steps_per_call
    np_ = cfg.np_
    first, last, sp1, sm1 = _layout_fns(cfg, blocked)
    dt = cfg.dt

    @pl.when(i == 0)
    def _():
        u_scr[:] = u0_ref[:]

    t0 = t0_ref[0] + (i * seg) * dt

    def body(n, u):
        return _lsrk_step_b(cfg, dr, lift, first, last, u, t0 + n * dt, dt,
                            sp1, sm1, geom)

    rows = tuple(u_scr[ii] for ii in range(np_))
    rows = jax.lax.fori_loop(0, seg, body, rows)
    stacked = jnp.stack(rows, axis=0)
    u_scr[:] = stacked

    @pl.when(i == n_seg - 1)
    def _():
        ufinal_out[:] = stacked


def make_pallas_advec_march_single_blocked(
    disc: Discretization1D,
    a: float,
    dt: float,
    segment: int = 8,
    n_segments: int = 16,
    interpret: bool = False,
):
    """Forward-only LSRK march in the blocked-single layout:
    ``march(u0, t0) -> u_final`` over ``segment · n_segments`` steps with
    ``u0``: (Np, K) and a TRACED start time ``t0`` (the revolve executor
    advances from arbitrary positions). Same stage math as the fused
    estimate pipelines (graded meshes via geom operands); K must be a
    multiple of 8."""
    if disc.k % 8:
        raise ValueError(f"K={disc.k} must be a multiple of 8 (blocked layout)")
    m = disc.k // 8
    rx, fs, geom = _geom_or_uniform(disc, m)
    cfg = PallasAdvecConfig(
        np_=disc.np_, k=m, a=a, rx=rx, fscale=fs, dt=dt,
        steps_per_call=segment, interpret=interpret, geom=geom,
    )
    dr_host = np.ascontiguousarray(disc.dr, dtype=np.float32)
    lift_host = np.ascontiguousarray(disc.lift, dtype=np.float32)
    np_ = disc.np_
    if cfg.geom is None:
        geom_arrays, geom_specs = (), []
    else:
        geom_arrays = tuple(jnp.asarray(g, jnp.float32) for g in cfg.geom)
        geom_specs = [
            pl.BlockSpec(cfg.geom[0].shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3

    def march(u0, t0):
        kern = functools.partial(
            _fwd_grid_kernel_b, cfg, dr_host, lift_host, n_segments, True
        )
        uf = pl.pallas_call(
            kern,
            grid=(n_segments,),
            out_shape=jax.ShapeDtypeStruct((np_, 8, m), u0.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((np_, 8, m), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                *geom_specs,
            ],
            out_specs=pl.BlockSpec((np_, 8, m), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((np_, 8, m), jnp.float32)],
            interpret=interpret,
        )(jnp.reshape(t0, (1,)), u0.reshape(np_, 8, m), *geom_arrays)
        return uf.reshape(np_, disc.k)

    return march


def _adj_est_grid_kernel_b_stored(cfg, dr, lift, n_seg, blocked, t0_ref,
                                  lam_ref, ufinal_ref, traj_ref, *rest):
    """Batched reverse sweep over a STORED trajectory: grid step i processes
    segment n_seg−1−i whose ``seg`` coarse states arrive as the input block;
    the segment-boundary state u_{(s+1)·seg} is carried across grid steps in
    ``bound_scr`` (seeded with u_final). No forward recompute — per time
    step the kernel runs exactly 2 half steps (the step-doubling residual)
    plus 2 half-transpose steps (the fine adjoint)."""
    geom, (lam0_out, eta_out, lu_scr, eta_scr, bound_scr) = _split_geom_refs(
        cfg, rest
    )
    i = pl.program_id(0)
    seg = cfg.steps_per_call
    np_ = cfg.np_
    first, last, sp1, sm1 = _layout_fns(cfg, blocked)
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
        blk_n = traj_ref[n]
        u_n = tuple(blk_n[ii] for ii in range(np_))
        # u_{n+1}: within-block read, except the segment's last step which
        # uses the boundary state carried from the previously-processed
        # (later-in-time) segment
        blk_np1 = traj_ref[jnp.minimum(n + 1, seg - 1)]
        is_last = n == seg - 1
        u_np1 = tuple(
            jnp.where(is_last, bound_scr[ii], blk_np1[ii]) for ii in range(np_)
        )
        half = _lsrk_step_b(cfg, dr, lift, first, last, u_n, t_n, dt / 2,
                            sp1, sm1, geom)
        half2 = _lsrk_step_b(
            cfg, dr, lift, first, last, half, t_n + dt / 2, dt / 2, sp1, sm1,
            geom,
        )
        acc = lu[0] * (u_np1[0] - half2[0])
        for ii in range(1, np_):
            acc = acc + lu[ii] * (u_np1[ii] - half2[ii])
        eta = eta + acc
        # fine (half-step-squared) transpose — exact effectivity identity
        lu = _lsrk_step_t_b(cfg, dr, lift, first, last, lu, dt / 2, sp1, sm1,
                            geom)
        lu = _lsrk_step_t_b(cfg, dr, lift, first, last, lu, dt / 2, sp1, sm1,
                            geom)
        return (lu, eta)

    lu0 = tuple(lu_scr[ii] for ii in range(np_))
    lu, eta = jax.lax.fori_loop(0, seg, bwd_body, (lu0, eta_scr[:]))
    # boundary for the next (earlier) segment: this segment's first state
    bound_scr[:] = traj_ref[0]
    lu_stacked = jnp.stack(lu, axis=0)
    lu_scr[:] = lu_stacked
    eta_scr[:] = eta

    @pl.when(i == n_seg - 1)
    def _():
        lam0_out[:] = lu_stacked
        eta_out[:] = eta


def _make_stored_run(cfg, dr_host, lift_host, n_segments, b, blocked):
    """run(u0, t0, lam_end) for the stored-trajectory pipeline on (Np, b, k)
    states — shared by the batched (b independent states on sublanes) and
    blocked-single (one state's elements tiled over sublanes) layouts.
    Segment length, Np, lane count, and interpret mode come from ``cfg``
    (the kernels index trajectory blocks with cfg.steps_per_call — a
    separately-passed segment could silently misalign them)."""
    segment, np_, k = cfg.steps_per_call, cfg.np_, cfg.k
    interpret = cfg.interpret
    n_steps = segment * n_segments
    # capacity guard: the shared measured model lives in _vmem.py (limit,
    # stack factor, calibration note) — keep all three guards in sync there
    from adjoint_ode_adaptivity_tpu.ops.pallas._vmem import (
        STORED_VMEM_LIMIT_BYTES,
        stored_vmem_bytes,
        stored_vmem_fits,
    )

    if not interpret and not stored_vmem_fits(segment, np_, b, k):
        raise ValueError(
            f"stored-trajectory pipeline at segment={segment}, Np={np_}, "
            f"B={b}, lanes={k} needs "
            f"~{stored_vmem_bytes(segment, np_, b, k) / 2**20:.0f} MB of "
            f"scoped VMEM ({STORED_VMEM_LIMIT_BYTES // 2**20} MB limit) — "
            "reduce `segment` (the trajectory block halves with it; see "
            "BASELINE.md's N=7 note)"
        )
    if cfg.geom is None:
        geom_arrays, geom_specs = (), []
    else:
        geom_arrays = tuple(jnp.asarray(g, jnp.float32) for g in cfg.geom)
        gshape = cfg.geom[0].shape
        geom_specs = [
            pl.BlockSpec(gshape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        ] * 3

    def run(u0, t0, lam_end):
        fwd_kern = functools.partial(
            _fwd_traj_grid_kernel_b, cfg, dr_host, lift_host, n_segments,
            blocked,
        )
        traj, u_final = pl.pallas_call(
            fwd_kern,
            grid=(n_segments,),
            out_shape=(
                jax.ShapeDtypeStruct((n_steps, np_, b, k), u0.dtype),
                jax.ShapeDtypeStruct((np_, b, k), u0.dtype),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (np_, b, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                ),
                *geom_specs,
            ],
            out_specs=(
                pl.BlockSpec(
                    (segment, np_, b, k),
                    lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (np_, b, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                ),
            ),
            scratch_shapes=[pltpu.VMEM((np_, b, k), jnp.float32)],
            interpret=interpret,
        )(jnp.reshape(t0, (1,)), u0, *geom_arrays)

        adj_kern = functools.partial(
            _adj_est_grid_kernel_b_stored, cfg, dr_host, lift_host,
            n_segments, blocked,
        )
        lam0, eta = pl.pallas_call(
            adj_kern,
            grid=(n_segments,),
            out_shape=(
                jax.ShapeDtypeStruct((np_, b, k), u0.dtype),
                jax.ShapeDtypeStruct((b, k), u0.dtype),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (np_, b, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (np_, b, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (segment, np_, b, k),
                    lambda i: (n_segments - 1 - i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                *geom_specs,
            ],
            out_specs=(
                pl.BlockSpec(
                    (np_, b, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((np_, b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((np_, b, k), jnp.float32),
            ],
            interpret=interpret,
        )(jnp.reshape(t0, (1,)), lam_end, u_final, traj, *geom_arrays)
        return u_final, lam0, eta

    return run


def make_pallas_fwd_adj_estimate_grid_single_blocked(
    disc: Discretization1D,
    a: float,
    dt: float,
    segment: int = 4,
    n_segments: int = 512,
    interpret: bool = False,
):
    """Stored-trajectory fused pipeline for a SINGLE state at full VPU
    register height: the K elements are tiled over the 8 sublanes as
    contiguous blocks ((Np, 8, K/8) layout, element k = s·(K/8) + j), so
    every vector op does 8× the work of the row layout. Element-neighbour
    flux shifts patch the block boundary from the adjacent sublane (2 extra
    ops per shift — see _shift_m1_blk/_shift_p1_blk); first/last masks are
    the true global element masks, so BCs land on elements 0 and K−1
    exactly as in the row layout.

    Returns ``run(u0, t0, lam_end) -> (u_final, lam0, eta)`` with
    ``u0/lam_end``: (Np, K) and ``eta``: (K,) — the same contract as
    ``make_pallas_fwd_adj_estimate_grid`` (tested equal).
    """
    if disc.k % 8:
        raise ValueError(f"K={disc.k} must be a multiple of 8 (blocked layout)")
    m = disc.k // 8
    rx, fs, geom = _geom_or_uniform(disc, m)
    cfg = PallasAdvecConfig(
        np_=disc.np_, k=m, a=a, rx=rx, fscale=fs, dt=dt,
        steps_per_call=segment, interpret=interpret, geom=geom,
    )
    dr_host = np.ascontiguousarray(disc.dr, dtype=np.float32)
    lift_host = np.ascontiguousarray(disc.lift, dtype=np.float32)
    np_ = disc.np_
    inner = _make_stored_run(cfg, dr_host, lift_host, n_segments, 8, blocked=True)

    def run(u0, t0, lam_end):
        uf, lam0, eta = inner(
            u0.reshape(np_, 8, m), t0, lam_end.reshape(np_, 8, m)
        )
        return uf.reshape(np_, disc.k), lam0.reshape(np_, disc.k), eta.reshape(disc.k)

    return run


def make_pallas_fwd_adj_estimate_grid_batched(
    disc: Discretization1D,
    a: float,
    dt: float,
    segment: int = 4,
    n_segments: int = 512,
    batch: int = 8,
    interpret: bool = False,
    store_trajectory: bool = False,
):
    """Batched single-launch fused pipeline: B independent initial states
    march + adjoint-sweep + estimate together, stacked on the sublane axis
    so every VPU op runs at full register height (8× the per-op work of the
    unbatched kernel at the same instruction count).

    Returns ``run(u0, t0, lam_end) -> (u_final, lam0, eta)`` with
    ``u0/lam_end``: (Np, B, K), ``eta``: (B, K) — exactly ``batch``
    independent copies of the unbatched pipeline (tested equal).
    VMEM: traj scratch (segment+1)·Np·B·K·4B — use segment=4 at the
    north-star size (4.8 MB; segment=8 blows Mosaic's 16 MB scoped-VMEM
    stack once the reverse-body temporaries are added).

    ``store_trajectory=True`` switches to the stored-trajectory variant:
    the forward phase writes every coarse state to HBM
    ((n_steps, Np, B, K) ≈ 2 GB at the north-star size) and the reverse
    phase streams it back instead of recomputing — 5 instead of 6 LSRK
    step-equivalents per time step (~17% less work; the extra HBM traffic
    is pipelined and far below the chip's bandwidth at this size).
    """
    rx, fs, geom = _geom_or_uniform(disc)
    cfg = PallasAdvecConfig(
        np_=disc.np_, k=disc.k, a=a, rx=rx, fscale=fs, dt=dt,
        steps_per_call=segment, interpret=interpret, geom=geom,
    )
    dr_host = np.ascontiguousarray(disc.dr, dtype=np.float32)
    lift_host = np.ascontiguousarray(disc.lift, dtype=np.float32)
    np_, k, b = cfg.np_, cfg.k, batch

    if store_trajectory:
        return _make_stored_run(
            cfg, dr_host, lift_host, n_segments, b, blocked=False
        )

    if cfg.geom is None:
        geom_arrays, geom_specs = (), []
    else:
        geom_arrays = tuple(jnp.asarray(g, jnp.float32) for g in cfg.geom)
        geom_specs = [
            pl.BlockSpec(cfg.geom[0].shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3

    def run(u0, t0, lam_end):
        fwd_kern = functools.partial(
            _fwd_ckpt_grid_kernel_b, cfg, dr_host, lift_host, n_segments
        )
        ckpts, u_final = pl.pallas_call(
            fwd_kern,
            grid=(n_segments,),
            out_shape=(
                jax.ShapeDtypeStruct((n_segments, np_, b, k), u0.dtype),
                jax.ShapeDtypeStruct((np_, b, k), u0.dtype),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((np_, b, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                *geom_specs,
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, np_, b, k), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((np_, b, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((np_, b, k), jnp.float32)],
            interpret=interpret,
        )(jnp.reshape(t0, (1,)), u0, *geom_arrays)

        adj_kern = functools.partial(
            _adj_est_grid_kernel_b, cfg, dr_host, lift_host, n_segments
        )
        lam0, eta = pl.pallas_call(
            adj_kern,
            grid=(n_segments,),
            out_shape=(
                jax.ShapeDtypeStruct((np_, b, k), u0.dtype),
                jax.ShapeDtypeStruct((b, k), u0.dtype),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((np_, b, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, np_, b, k),
                    lambda i: (n_segments - 1 - i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                *geom_specs,
            ],
            out_specs=(
                pl.BlockSpec((np_, b, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM(((segment + 1) * np_, b, k), jnp.float32),
                pltpu.VMEM((np_, b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.float32),
            ],
            interpret=interpret,
        )(jnp.reshape(t0, (1,)), lam_end, ckpts, *geom_arrays)
        return u_final, lam0, eta

    return run
