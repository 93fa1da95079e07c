"""Element-sharded + HBM-streamed fused pipeline: K beyond ONE device's
memory — the pod-scale composition of the two round-3 envelope paths.

``dg_sharded.py`` composes the fused kernels over a device mesh but keeps
each shard VMEM-resident (per-device envelope ~10^5 elements);
``dg_tiled.py`` streams element chunks through VMEM from HBM but runs on one
device (envelope = one device's HBM).  This module stacks the two: the K
elements shard contiguously over ``mesh[axis]``, each device keeps its local
share + stored trajectory in ITS HBM as chunk-major blocks, and every
segment runs the grid-streamed per-chunk kernels of ``dg_tiled.py``
(Mosaic double-buffers all HBM streaming against compute).  Total envelope
= D x (one device's HBM) — K ~ 10^7+ on a v5e pod slice.

Ghost plumbing per segment (the only inter-device traffic):

- Within a device the local blocked layout (local element l = s*m_loc + g)
  makes every flux shift a plain lane shift, exactly as in the single-device
  grid variant: interior chunks take their W-lane ghost edges from their
  lane-neighbour chunks, and the device's wrap chunks (local chunk 0 / C-1)
  take SUBLANE-ROLLED edges from the opposite end of the device.
- The roll's wrap row is the only off-device data: local element -j is the
  PREVIOUS device's element L-j (its sublane 7, last chunk, right edge) and
  local element 8*m_loc+j is the NEXT device's element j (sublane 0, first
  chunk, left edge).  One (Np, 1, W) ``lax.ppermute`` each way per ghost
  assembly — two in the forward segment, two in the reverse segment (plus
  two in the one-off final-state boundary build), i.e. 4·Np·W·4 B per
  segment of full fwd+reverse pipeline on ICI, independent of K.
- On a 1-device mesh the ppermutes are identities and the construction
  degenerates to exactly the single-device rolled wrap (pinned in tests).

The kernels are ``dg_tiled.py``'s own (one compilation for every shard):
the global first/last element masks arrive as SMEM ``[cf, cl]`` chunk
indices — ``[0, -1]`` on device 0, ``[-1, C-1]`` on device D-1, ``[-1, -1]``
elsewhere — computed from ``lax.axis_index`` inside ``shard_map``.

Ghost-width accounting is ``dg_tiled.py``'s: W = 10*segment + 10 lanes
covers the forward march, the reverse half-transposes, and the stored
states' half-step reach (see ``dg_sharded.py`` for the derivation).

Reference analogue: the reference has no distributed execution at all
(SURVEY.md section 2.7); this is the scale-up of its largest-ensemble
intent (Main_variable_params.py:234,330-341) along the element axis.
Uniform meshes, f32, single state.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from adjoint_ode_adaptivity_tpu.ops.mesh import Discretization1D
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
    PallasAdvecConfig,
    _check_uniform,
)
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_tiled import (
    _make_grid_calls,
    _run_grid_pipeline,
)

__all__ = ["make_pallas_fwd_adj_estimate_tiled_grid_sharded"]


def make_pallas_fwd_adj_estimate_tiled_grid_sharded(
    disc: Discretization1D,
    a: float,
    dt: float,
    mesh: Mesh,
    *,
    segment: int = 8,
    n_segments: int = 64,
    chunks: int = 8,
    axis: str = "space",
    interpret: bool = False,
):
    """Element-sharded, HBM-streamed fused pipeline (forward +
    stored-trajectory reverse sweep + per-element estimate) over
    ``mesh[axis]``, ``chunks`` VMEM chunks per device.

    Returns ``run(u0, t0, lam_end) -> (u_final, lam0, eta)`` with the same
    global contract (and tested-equal outputs) as the single-device
    ``make_pallas_fwd_adj_estimate_tiled_grid``.  Requirements: the local
    element share L = K/D must exist and satisfy L % 8 == 0 and
    (L/8) % chunks == 0, and the ghost width (10*segment + 10) must fit the
    per-chunk lane count; uniform meshes, f32.
    """
    n_dev = mesh.shape[axis]
    k = disc.k
    if k % n_dev:
        raise ValueError(f"K={k} not divisible by {n_dev} devices")
    l_elem = k // n_dev
    if l_elem % 8:
        raise ValueError(
            f"local share L={l_elem} must be divisible by 8 (blocked layout)"
        )
    m_loc = l_elem // 8
    if m_loc % chunks:
        raise ValueError(
            f"local lane count M={m_loc} not divisible by chunks={chunks}"
        )
    lm = m_loc // chunks
    w = 10 * segment + 10
    if w > lm:
        raise ValueError(
            f"ghost width {w} exceeds chunk lane width {lm} — use fewer "
            f"chunks/devices or a smaller segment"
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

    cm1 = np.asarray([(i - 1) % c for i in range(c)])
    cp1 = np.asarray([(i + 1) % c for i in range(c)])
    fwd_ring = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd_ring = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def _ghosts(x_c):
        """(lg, rg) ghost blocks (C, Np, 8, W) for the device-local
        chunk-major state ``x_c`` (C, Np, 8, Lm): lane-neighbour chunk
        edges, with the device's wrap chunks sublane-rolled and their wrap
        row exchanged with the ring neighbours (see module docstring)."""
        re = x_c[..., lm - w:]
        le = x_c[..., :w]
        lg = jnp.take(re, cm1, axis=0)
        rg = jnp.take(le, cp1, axis=0)
        prev = lax.ppermute(re[c - 1][:, 7:8], axis, fwd_ring)
        nxt = lax.ppermute(le[0][:, 0:1], axis, bwd_ring)
        lg = lg.at[0].set(jnp.concatenate([prev, re[c - 1][:, :7]], axis=1))
        rg = rg.at[c - 1].set(jnp.concatenate([le[0][:, 1:], nxt], axis=1))
        return lg, rg

    def _to_chunked(x):
        # local (Np, L) element order -> chunk-major (C, Np, 8, Lm)
        return jnp.moveaxis(x.reshape(np_, 8, c, lm), 2, 0)

    def _from_chunked(x_c):
        return jnp.moveaxis(x_c, 0, 2).reshape(np_, l_elem)

    def local_pipeline(u_loc, lam_loc, t0):
        didx = lax.axis_index(axis)
        cfl = jnp.stack(
            [
                jnp.where(didx == 0, 0, -1),
                jnp.where(didx == n_dev - 1, c - 1, -1),
            ]
        ).astype(jnp.int32)
        u_final_c, lam0_c, eta_c = _run_grid_pipeline(
            fwd_call, rev_call, _ghosts, cfl, segment, n_segments,
            _to_chunked(u_loc), _to_chunked(lam_loc), t0, dt,
        )
        eta = jnp.transpose(eta_c, (1, 0, 2)).reshape(l_elem)
        return _from_chunked(u_final_c), _from_chunked(lam0_c), eta

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation (same as dg_sharded.py)
    sharded = shard_map(
        local_pipeline,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P()),
        out_specs=(P(None, axis), P(None, axis), P(axis)),
        check_vma=False,
    )

    def run(u0, t0, lam_end):
        return sharded(u0, lam_end, jnp.asarray(t0, u0.dtype))

    run.n_steps = n_steps
    run.ghost = w
    return run
