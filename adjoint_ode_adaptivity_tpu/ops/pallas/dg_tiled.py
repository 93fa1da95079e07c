"""Element-tiled fused pipeline: K beyond VMEM residency on ONE device.

The resident pipelines (``dg_rhs.py``) keep the whole (Np, 8, K) state and
a trajectory block in scoped VMEM, which caps the envelope near K ~ 10⁵
for a single state (and ~10⁴ for the batched-8 layout). This variant keeps
the global state and the stored trajectory in HBM and streams **element
chunks** through VMEM:

- Per segment of ``seg`` steps, every chunk depends only on the
  segment-entry state (chunks are data-independent within a segment), so
  chunk c's kernel reads the extended slice [c·L − W, (c+1)·L + W) of the
  periodically-padded global array via one ``dynamic_slice`` — the same
  ghost-column construction as the multi-chip composition
  (``dg_sharded.py``), with HBM slicing replacing the ppermute.
- The kernels ARE ``dg_sharded``'s per-segment kernels (one compilation
  for all chunks: the global-boundary masks ride as SMEM element indices,
  ``where(c == 0, W, −1)`` etc.).
- Ghost degradation bounds are identical: W ≥ 10·seg + 10 covers the
  forward march, the reverse half-transposes, and the stored states' ±10
  half-step reach (see dg_sharded.py's accounting).

Cost model at K = 10⁵, C = 8 chunks, seg = 8: ghost recompute
2·W·C/K ≈ 1.4%, C·n_seg kernel launches of ~µs each, and the stored
trajectory streams (L_ext/L)·state·n_steps ≈ 1.05× the resident variant's
HBM traffic. Measured throughput lands within ~15% of the resident
blocked-single kernel at K = 10⁴ (BASELINE.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adjoint_ode_adaptivity_tpu.ops.mesh import Discretization1D
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
    PallasAdvecConfig,
    _check_uniform,
)
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_sharded import (
    _fwd_seg_kernel,
    _rev_seg_kernel,
    ghost_width,
)

__all__ = [
    "make_pallas_fwd_adj_estimate_tiled",
    "make_pallas_fwd_adj_estimate_tiled_grid",
]


def make_pallas_fwd_adj_estimate_tiled(
    disc: Discretization1D,
    a: float,
    dt: float,
    *,
    segment: int = 8,
    n_segments: int = 64,
    chunks: int = 8,
    interpret: bool = False,
):
    """Streamed fwd + stored-trajectory reverse + estimate for a single
    state with K elements chunked through VMEM.

    Returns ``run(u0, t0, lam_end) -> (u_final, lam0, eta)`` — the same
    contract (and tested-equal outputs) as
    ``make_pallas_fwd_adj_estimate_grid_single_blocked``, but with an
    HBM-resident state/trajectory: the envelope is bounded by HBM
    (state·n_steps), not scoped VMEM. K/chunks must be even; uniform
    meshes (f32).
    """
    k = disc.k
    if k % chunks:
        raise ValueError(f"K={k} not divisible by chunks={chunks}")
    l_loc = k // chunks
    if l_loc % 2:
        raise ValueError(f"chunk width {l_loc} must be even (8-sublane tiling)")
    w = ghost_width(segment, l_loc)
    if w > l_loc:
        raise ValueError(
            f"ghost width {w} exceeds chunk width {l_loc} — use fewer chunks "
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
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    def fwd_call(idx, t0s, u_ext):
        return pl.pallas_call(
            fwd_kern,
            out_shape=(
                jax.ShapeDtypeStruct((segment, np_, 8, me), u_ext.dtype),
                jax.ShapeDtypeStruct((np_, 8, me), u_ext.dtype),
            ),
            in_specs=[smem, smem, vmem],
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
            in_specs=[smem, smem, vmem, vmem, vmem],
            out_specs=(vmem, vmem),
            interpret=interpret,
        )(idx, t0s, lam_ext, bound, traj)

    def _chunk_idx(c):
        """SMEM global-boundary element indices for chunk ``c`` (extended
        coords; −1 = boundary not in this chunk)."""
        return jnp.stack(
            [
                jnp.where(c == 0, w, -1),
                jnp.where(c == chunks - 1, w + l_loc - 1, -1),
            ]
        ).astype(jnp.int32)

    def _ext_slice(gpad, c):
        """Chunk c's extended block from the periodically-padded global."""
        return lax.dynamic_slice_in_dim(gpad, c * l_loc, l_ext, axis=1)

    def run(u0, t0, lam_end):
        t0 = jnp.asarray(t0, u0.dtype)
        dt_ = jnp.asarray(dt, u0.dtype)

        def fwd_segment(u_glob, s):
            gpad = jnp.concatenate(
                [u_glob[:, -w:], u_glob, u_glob[:, :w]], axis=1
            )
            t0s = jnp.reshape(t0 + s * segment * dt_, (1,))

            def chunk_body(_, c):
                u_ext = _ext_slice(gpad, c).reshape(np_, 8, me)
                traj_c, u_ext_out = fwd_call(_chunk_idx(c), t0s, u_ext)
                u_loc = u_ext_out.reshape(np_, l_ext)[:, w : w + l_loc]
                return 0, (traj_c, u_loc)

            _, (traj_s, u_locs) = lax.scan(
                chunk_body, 0, jnp.arange(chunks)
            )
            # u_locs: (C, Np, L) -> (Np, K)
            u_next = jnp.transpose(u_locs, (1, 0, 2)).reshape(np_, k)
            return u_next, traj_s

        u_final, trajs = lax.scan(fwd_segment, u0, jnp.arange(n_segments))
        # trajs: (n_seg, C, seg, Np, 8, me) — extended chunks in HBM.
        # segment-boundary states (chunked+extended) for the reverse sweep:
        # segment s ends at segment s+1's entry = trajs[s+1][:, 0]; the
        # last segment's boundary is built from the final global state
        # (ghost columns refreshed by the same periodic padding)
        gpad_f = jnp.concatenate(
            [u_final[:, -w:], u_final, u_final[:, :w]], axis=1
        )
        bound_last = jnp.stack(
            [
                _ext_slice(gpad_f, c).reshape(np_, 8, me)
                for c in range(chunks)
            ]
        )
        bounds = jnp.concatenate(
            [trajs[1:, :, 0], bound_last[None]], axis=0
        )  # (n_seg, C, Np, 8, me)

        def rev_segment(carry, xs):
            lam_glob, eta_glob = carry
            traj_s, bound_s, s = xs
            lpad = jnp.concatenate(
                [lam_glob[:, -w:], lam_glob, lam_glob[:, :w]], axis=1
            )
            t0s = jnp.reshape(t0 + s * segment * dt_, (1,))

            def chunk_body(_, c):
                lam_ext = _ext_slice(lpad, c).reshape(np_, 8, me)
                lam_out, eta_ext = rev_call(
                    _chunk_idx(c), t0s, lam_ext, bound_s[c], traj_s[c]
                )
                return 0, (
                    lam_out.reshape(np_, l_ext)[:, w : w + l_loc],
                    eta_ext.reshape(l_ext)[w : w + l_loc],
                )

            _, (lam_locs, eta_locs) = lax.scan(
                chunk_body, 0, jnp.arange(chunks)
            )
            lam_new = jnp.transpose(lam_locs, (1, 0, 2)).reshape(np_, k)
            eta_new = eta_glob + eta_locs.reshape(k)
            return (lam_new, eta_new), None

        (lam0, eta), _ = lax.scan(
            rev_segment,
            (lam_end, jnp.zeros((k,), u0.dtype)),
            (trajs, bounds, jnp.arange(n_segments)),
            reverse=True,
        )
        return u_final, lam0, eta

    run.n_steps = n_steps
    run.ghost = w
    return run


# ---------------------------------------------------------------------------
# Grid-streamed variant: chunks as a Pallas GRID dimension on the LANE axis
# of the GLOBAL blocked layout.
#
# The scan-of-pallas_calls variant above leaves ~2x on the table at K=10^6:
# every chunk pays an XLA `concatenate` (the periodic pad), a
# `dynamic_slice` copy, a (Np, l_ext) -> (Np, 8, me) relayout, and its own
# kernel launch — and none of that HBM traffic overlaps compute.  This
# variant removes all four costs:
#
# - The state stays in the RESIDENT kernel's global blocked layout
#   (Np, 8, M), M = K/8 (element k = s*M + lane g) — zero relayouts.
# - Chunks partition the LANE axis (M = C*Lm).  Chunk c's kernel window is
#   lanes [c*Lm - W, (c+1)*Lm + W).  In this layout the sublane-boundary
#   flux patching of `_shift_{p,m}1_blk` becomes UNNECESSARY: element
#   s*M + g couples to g±1 on the SAME sublane everywhere except g=0 /
#   g=M-1, which only occur inside the ghost regions of chunks 0 and C-1 —
#   and a sublane-ROLLED ghost fill makes even those pure lane shifts
#   (ghost lane -j of sublane s holds element s*M - j, i.e. chunk C-1's
#   lane M-j of sublane s-1).  The kernels therefore run with PLAIN lane
#   shifts — cheaper than the resident kernel's patched shifts.
# - The ghosts are assembled host-side (XLA) as two tiny (Np, 8, C, W)
#   edge arrays per segment (gather + one sublane roll on the wrap chunks)
#   instead of a full-state periodic pad.
# - One `pallas_call` per segment with grid=(C,): Mosaic's pipeline
#   machinery double-buffers the per-chunk block DMAs (state in, stored
#   trajectory out), overlapping all HBM streaming with compute.
#
# Ghost-width accounting is identical to `ghost_width` (W >= 10*seg + 10
# lanes — one lane = one element), but with NO divisibility rounding: the
# extended window's lane count is arbitrary (the 8-sublane axis is fixed by
# the layout itself).
# ---------------------------------------------------------------------------


def _plain_shifts(m_ext):
    """Pure lane shifts on (8, m_ext) windows — the rolled ghost fill makes
    sublane patching unnecessary (see module comment); window-edge wrap
    values land on ghost lanes that are discarded."""
    sp1 = lambda x: jnp.concatenate([x[:, m_ext - 1:], x[:, :m_ext - 1]], axis=-1)  # noqa: E731,E501
    sm1 = lambda x: jnp.concatenate([x[:, 1:], x[:, :1]], axis=-1)  # noqa: E731
    return sp1, sm1


def _grid_masks(c, cf, cl, w, lm, m_ext):
    """first/last global-element masks inside chunk ``c``'s extended window
    (global element 0 = sublane 0, local lane w of chunk ``cf``; element K-1
    = sublane 7, local lane w+lm-1 of chunk ``cl``).  ``cf``/``cl`` arrive
    as SMEM scalars so the same compiled kernel serves every shard of the
    multi-chip composition (−1 ⇒ the boundary is not on this device)."""
    s_i = lax.broadcasted_iota(jnp.int32, (8, m_ext), 0)
    j_i = lax.broadcasted_iota(jnp.int32, (8, m_ext), 1)
    first = (s_i == 0) & (j_i == w) & (c == cf)
    last = (s_i == 7) & (j_i == w + lm - 1) & (c == cl)
    return first, last


def _fwd_seg_grid_kernel(cfg, dr, lift, seg, w, lm, t0_ref, cfl_ref, lg_ref,
                         uc_ref, rg_ref, traj_out, u_out):
    """Forward phase of one segment for ONE lane-chunk (grid program):
    assemble the extended window from the ghost blocks, march ``seg`` steps
    storing every entry state, write back the local lane slice."""
    from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import _lsrk_step_b

    np_, m_ext = cfg.np_, cfg.k
    c = pl.program_id(0)
    sp1, sm1 = _plain_shifts(m_ext)
    first, last = _grid_masks(c, cfl_ref[0], cfl_ref[1], w, lm, m_ext)
    dt = cfg.dt
    rows = tuple(
        jnp.concatenate(
            [lg_ref[0, ii], uc_ref[0, ii], rg_ref[0, ii]], axis=-1
        )
        for ii in range(np_)
    )

    def body(n, u):
        for ii in range(np_):
            traj_out[0, n, ii] = u[ii]
        return _lsrk_step_b(
            cfg, dr, lift, first, last, u, t0_ref[0] + n * dt, dt, sp1, sm1,
            None,
        )

    rows = jax.lax.fori_loop(0, seg, body, rows)
    for ii in range(np_):
        u_out[0, ii] = rows[ii][:, w : w + lm]


def _rev_seg_grid_kernel(cfg, dr, lift, seg, w, lm, t0_ref, cfl_ref, lg_ref,
                         lc_ref, rg_ref, bound_ref, traj_ref, lam_out,
                         eta_out):
    """Reverse sweep of one segment for one lane-chunk over its stored
    trajectory block: per step the adjoint-weighted step-doubling residual
    plus the fine (half-step-squared) transpose."""
    from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
        _lsrk_step_b,
        _lsrk_step_t_b,
    )

    np_, m_ext = cfg.np_, cfg.k
    c = pl.program_id(0)
    sp1, sm1 = _plain_shifts(m_ext)
    first, last = _grid_masks(c, cfl_ref[0], cfl_ref[1], w, lm, m_ext)
    dt = cfg.dt

    def bwd_body(j, carry):
        lu, eta = carry
        n = seg - 1 - j
        t_n = t0_ref[0] + n * dt
        u_n = tuple(traj_ref[0, n, ii] for ii in range(np_))
        blk_np1 = traj_ref[0, jnp.minimum(n + 1, seg - 1)]
        is_last = n == seg - 1
        u_np1 = tuple(
            jnp.where(is_last, bound_ref[0, ii], blk_np1[ii])
            for ii in range(np_)
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

    lu0 = tuple(
        jnp.concatenate(
            [lg_ref[0, ii], lc_ref[0, ii], rg_ref[0, ii]], axis=-1
        )
        for ii in range(np_)
    )
    lu, eta = jax.lax.fori_loop(
        0, seg, bwd_body, (lu0, jnp.zeros((8, m_ext), lc_ref.dtype))
    )
    for ii in range(np_):
        lam_out[0, ii] = lu[ii][:, w : w + lm]
    eta_out[0] = eta[:, w : w + lm]


def _make_grid_calls(cfg, dr_host, lift_host, segment, w, lm, chunks,
                     interpret):
    """``(fwd_call, rev_call)`` pallas_call builders for the grid-streamed
    per-segment kernels — shared by the single-device factory below and the
    multi-chip composition (``dg_tiled_sharded.py``).  Both calls take the
    SMEM float t0 and the SMEM (2,) int32 ``[cf, cl]`` global-boundary
    chunk indices (−1 ⇒ that boundary is not on this device)."""
    np_, m_ext = cfg.np_, cfg.k
    c = chunks
    fwd_kern = functools.partial(
        _fwd_seg_grid_kernel, cfg, dr_host, lift_host, segment, w, lm
    )
    rev_kern = functools.partial(
        _rev_seg_grid_kernel, cfg, dr_host, lift_host, segment, w, lm
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ghost_spec = pl.BlockSpec((1, np_, 8, w), lambda i: (i, 0, 0, 0))
    center_spec = pl.BlockSpec((1, np_, 8, lm), lambda i: (i, 0, 0, 0))
    traj_spec = pl.BlockSpec(
        (1, segment, np_, 8, m_ext), lambda i: (i, 0, 0, 0, 0)
    )
    bound_spec = pl.BlockSpec((1, np_, 8, m_ext), lambda i: (i, 0, 0, 0))
    eta_spec = pl.BlockSpec((1, 8, lm), lambda i: (i, 0, 0))

    def fwd_call(t0s, cfl, lg, u_c, rg):
        return pl.pallas_call(
            fwd_kern,
            grid=(c,),
            out_shape=(
                jax.ShapeDtypeStruct((c, segment, np_, 8, m_ext), u_c.dtype),
                jax.ShapeDtypeStruct((c, np_, 8, lm), u_c.dtype),
            ),
            in_specs=[smem, smem, ghost_spec, center_spec, ghost_spec],
            out_specs=(traj_spec, center_spec),
            interpret=interpret,
        )(t0s, cfl, lg, u_c, rg)

    def rev_call(t0s, cfl, lg, lam_c, rg, bound, traj):
        return pl.pallas_call(
            rev_kern,
            grid=(c,),
            out_shape=(
                jax.ShapeDtypeStruct((c, np_, 8, lm), lam_c.dtype),
                jax.ShapeDtypeStruct((c, 8, lm), lam_c.dtype),
            ),
            in_specs=[smem, smem, ghost_spec, center_spec, ghost_spec,
                      bound_spec, traj_spec],
            out_specs=(center_spec, eta_spec),
            interpret=interpret,
        )(t0s, cfl, lg, lam_c, rg, bound, traj)

    return fwd_call, rev_call


def _run_grid_pipeline(fwd_call, rev_call, ghosts_fn, cfl, segment,
                       n_segments, u_c0, lam_c0, t0, dt):
    """Shared segment-scan driver for the grid-streamed pipelines (the
    single-device factory below and ``dg_tiled_sharded.py``): forward scan
    storing each segment's trajectory block, then the reverse sweep.  Each
    segment's boundary state (its END state = the next segment's
    ghost-fresh entry; the final segment's is rebuilt from the final
    state) rides the reverse scan's CARRY: the reverse iteration over
    segment s+1 already holds traj_{s+1} and hands its entry block down —
    zero extra HBM footprint or traffic (materializing a boundary array
    costs 1/segment of the trajectory footprint, and in-scan gathers of
    the big trajectory do not fuse: both measured slower in exactly the
    HBM-envelope regime these pipelines exist for).  Returns
    ``(u_final_c, lam0_c, eta_c)`` in the chunk-major (C, Np, 8, Lm)
    layout."""
    dt_ = jnp.asarray(dt, u_c0.dtype)

    def fwd_segment(u_c, s):
        lg, rg = ghosts_fn(u_c)
        t0s = jnp.reshape(t0 + s * segment * dt_, (1,))
        traj_s, u_next = fwd_call(t0s, cfl, lg, u_c, rg)
        return u_next, traj_s

    u_final_c, trajs = lax.scan(fwd_segment, u_c0, jnp.arange(n_segments))
    lg_f, rg_f = ghosts_fn(u_final_c)
    ext_final = jnp.concatenate([lg_f, u_final_c, rg_f], axis=-1)

    def rev_segment(carry, xs):
        lam_c, eta, bound_s = carry
        traj_s, s = xs
        lg, rg = ghosts_fn(lam_c)
        t0s = jnp.reshape(t0 + s * segment * dt_, (1,))
        lam_new, eta_c = rev_call(t0s, cfl, lg, lam_c, rg, bound_s, traj_s)
        # segment s-1 (next reverse iteration) ends at THIS segment's entry
        return (lam_new, eta + eta_c, traj_s[:, 0]), None

    eta0 = jnp.zeros((u_c0.shape[0], 8, u_c0.shape[3]), u_c0.dtype)
    (lam0_c, eta_c, _), _ = lax.scan(
        rev_segment,
        (lam_c0, eta0, ext_final),
        (trajs, jnp.arange(n_segments)),
        reverse=True,
    )
    return u_final_c, lam0_c, eta_c


def make_pallas_fwd_adj_estimate_tiled_grid(
    disc: Discretization1D,
    a: float,
    dt: float,
    *,
    segment: int = 8,
    n_segments: int = 64,
    chunks: int = 8,
    interpret: bool = False,
):
    """Grid-streamed fwd + stored-trajectory reverse + estimate for a single
    state: K beyond VMEM with the chunk loop as a Pallas grid dimension
    (see the module comment above — removes the scan variant's per-chunk
    XLA copies/launches and overlaps all HBM streaming with compute).

    Same contract and tested-equal outputs as
    ``make_pallas_fwd_adj_estimate_tiled`` /
    ``make_pallas_fwd_adj_estimate_grid_single_blocked``:
    ``run(u0, t0, lam_end) -> (u_final, lam0, eta)``.  Requirements:
    K % 8 == 0, (K/8) % chunks == 0, ghost width (10*segment + 10) <= the
    per-chunk lane count; uniform meshes, f32.

    Layout note (Mosaic block rule): the state rides CHUNK-MAJOR,
    (C, Np, 8, Lm), across the whole pipeline — every BlockSpec's last two
    dims then EQUAL the array dims (the lane axis is never block-split, so
    Lm needs no 128-divisibility).  Only the entry/exit reshapes touch the
    flat (Np, K) element order.
    """
    k = disc.k
    if k % 8:
        raise ValueError(f"K={k} must be divisible by 8 (blocked layout)")
    m = k // 8
    if m % chunks:
        raise ValueError(f"lane count M={m} not divisible by chunks={chunks}")
    lm = m // chunks
    w = 10 * segment + 10
    if w > lm:
        raise ValueError(
            f"ghost width {w} exceeds chunk lane width {lm} — use fewer "
            f"chunks or a smaller segment"
        )
    m_ext = lm + 2 * w
    rx, fs = _check_uniform(disc)
    cfg = PallasAdvecConfig(
        np_=disc.np_, k=m_ext, a=a, rx=rx, fscale=fs, dt=dt,
        steps_per_call=segment, interpret=interpret,
    )
    dr_host = np.ascontiguousarray(disc.dr, dtype=np.float32)
    lift_host = np.ascontiguousarray(disc.lift, dtype=np.float32)
    np_ = disc.np_
    c = chunks
    n_steps = segment * n_segments

    fwd_call, rev_call = _make_grid_calls(
        cfg, dr_host, lift_host, segment, w, lm, c, interpret
    )
    cfl_host = jnp.asarray([0, c - 1], jnp.int32)

    cm1 = np.asarray([(i - 1) % c for i in range(c)])
    cp1 = np.asarray([(i + 1) % c for i in range(c)])

    def _ghosts(x_c):
        """(lg, rg) ghost blocks (C, Np, 8, W) for the chunk-major state
        ``x_c`` (C, Np, 8, Lm): neighbours' lane edges, with the wrap
        chunks' ghosts sublane-rolled so ghost lane -j of sublane s holds
        global element s*M - j (and lane Lm-1+j holds the analogous
        right-wrap element) — pure-lane-shift flux everywhere."""
        re = x_c[..., lm - w:]
        le = x_c[..., :w]
        lg = jnp.take(re, cm1, axis=0)
        lg = lg.at[0].set(jnp.roll(re[c - 1], 1, axis=1))
        rg = jnp.take(le, cp1, axis=0)
        rg = rg.at[c - 1].set(jnp.roll(le[0], -1, axis=1))
        return lg, rg

    def _to_chunked(x):
        # (Np, K) element order -> chunk-major (C, Np, 8, Lm)
        return jnp.moveaxis(x.reshape(np_, 8, c, lm), 2, 0)

    def _from_chunked(x_c):
        return jnp.moveaxis(x_c, 0, 2).reshape(np_, k)

    def run(u0, t0, lam_end):
        t0 = jnp.asarray(t0, u0.dtype)
        u_final_c, lam0_c, eta_c = _run_grid_pipeline(
            fwd_call, rev_call, _ghosts, cfl_host, segment, n_segments,
            _to_chunked(u0), _to_chunked(lam_end), t0, dt,
        )
        # (C, 8, Lm) chunk-blocked -> global blocked (8, M) -> element order
        eta = jnp.transpose(eta_c, (1, 0, 2)).reshape(k)
        return _from_chunked(u_final_c), _from_chunked(lam0_c), eta

    run.n_steps = n_steps
    run.ghost = w
    return run
