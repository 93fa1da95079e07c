"""Fused Pallas kernel for the limited Burgers march.

The nonlinear-conservation-law strand (march/burgers.py: u_t + (u²/2)_x = 0,
local Lax–Friedrichs flux, ΠN minmod limiting after every LSRK stage)
completes the reference's never-driven limiter toolkit; this kernel is its
speed-of-light form: batched states on the sublane axis (tuple-of-rows,
unrolled stages — the layout/form measured ~2× on the advection kernels),
whole state resident in VMEM, limiter fused into each stage, one kernel
launch for the whole march (grid over step chunks).

Everything reduces to scalar-coefficient row combinations on the uniform
mesh:
- cell average: ``vk = Σ_j (V[0,0]·invV[0,j]) u_j``
- limited-slope coefficient row: ``(Dr @ Π¹)[0,:]`` with
  ``Π¹ = V[:, :2] @ invV[:2, :]`` (host-precomputed floats)
- node offsets from the cell centre: fixed per-node floats ξ_i
- minmod: elementwise sign-unanimity + min magnitude

Limiter neighbour averages use copied endpoints (exactly
ops/limiters.py::_neighbor_averages, i.e. utils/SlopeLimitN.m) while the
flux is periodic — both faithfully reproduced; the kernel is pinned against
march/burgers.py::burgers_march per batch column (tested). Non-uniform
meshes ride a per-element geometry operand (rx, fscale, 1/h, node
offsets — see _host_tables); uniform meshes keep the folded-scalar path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adjoint_ode_adaptivity_tpu.march.lsrk import RK4A, RK4B
from adjoint_ode_adaptivity_tpu.ops.mesh import Discretization1D
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
    _is_uniform,
    _masks_blk,
    _shift_m1_b as _shift_m1,
    _shift_m1_blk,
    _shift_p1_b as _shift_p1,
    _shift_p1_blk,
)

__all__ = ["make_pallas_burgers_march", "make_pallas_burgers_march_single_blocked"]


def _minmod3(a, b, c):
    s = (jnp.sign(a) + jnp.sign(b) + jnp.sign(c)) / 3.0
    unanimous = jnp.abs(s) == 1.0
    mag = jnp.minimum(jnp.abs(a), jnp.minimum(jnp.abs(b), jnp.abs(c)))
    return jnp.where(unanimous, s * mag, 0.0)


def _kernel(np_, k, blocked, nonuni, rx, fscale, h, dr_full, dr_ux, lift,
            c_avg, xi, limiter, n_chunks, steps, dt, *refs):
    if nonuni:
        # geom rows: [rx, fscale_l, fscale_r, 1/h, xi_0 .. xi_{Np-1}] — the
        # per-element geometric factors a graded mesh needs (the uniform
        # path folds them into the scalar tables instead)
        geom_ref, u0_ref, u_out, u_scr = refs
        rxv, fslv, fsrv, ihv = (geom_ref[j] for j in range(4))
        xiv = tuple(geom_ref[4 + ii] for ii in range(np_))
    else:
        u0_ref, u_out, u_scr = refs
        rxv = fslv = fsrv = ihv = xiv = None
    i = pl.program_id(0)
    if blocked:
        # blocked-single layout: k is the LANE count K/8, element K-1 sits
        # at (sublane 7, lane k-1). The blocked shifts wrap across the
        # sublane axis, which IS the periodic element neighbouring the
        # flux needs; the first/last masks give the limiter its
        # copied-endpoint neighbour averages.
        first, last = _masks_blk(k)
        sp1 = lambda x: _shift_p1_blk(x, k)
        sm1 = lambda x: _shift_m1_blk(x, k)
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        first, last = lane == 0, lane == k - 1
        sp1 = lambda x: _shift_p1(x, k)
        sm1 = lambda x: _shift_m1(x, k)

    @pl.when(i == 0)
    def _():
        u_scr[:] = u0_ref[:]

    def limit(u):
        if limiter == "none":
            return u
        vk = c_avg[0] * u[0]
        for jj in range(1, np_):
            vk = vk + c_avg[jj] * u[jj]
        # copied-endpoint neighbour averages (utils/SlopeLimitN.m)
        vkm1 = jnp.where(first, vk, sp1(vk))
        vkp1 = jnp.where(last, vk, sm1(vk))
        dm, dp = vk - vkm1, vkp1 - vk
        # ux = (2/h)·(Dr @ Π¹ u)[0] — one precomputed coefficient row
        ux = dr_ux[0] * u[0]
        for jj in range(1, np_):
            ux = ux + dr_ux[jj] * u[jj]
        if nonuni:
            ux = 2.0 * ux * ihv
            slope = _minmod3(ux, dp * ihv, dm * ihv)
        else:
            ux = (2.0 / h) * ux
            slope = _minmod3(ux, dp / h, dm / h)
        if limiter == "n":
            ve1 = vk - _minmod3(vk - u[0], dm, dp)
            ve2 = vk + _minmod3(u[np_ - 1] - vk, dm, dp)
            troubled = (jnp.abs(ve1 - u[0]) > 1e-8) | (
                jnp.abs(ve2 - u[np_ - 1]) > 1e-8
            )
            return tuple(
                jnp.where(
                    troubled,
                    vk + (xiv[ii] if nonuni else xi[ii]) * slope,
                    u[ii],
                )
                for ii in range(np_)
            )
        # "1": project + limit everywhere
        return tuple(
            vk + (xiv[ii] if nonuni else xi[ii]) * slope for ii in range(np_)
        )

    # volume factor (−rx), surface factor (fscale) and dt are folded into
    # the coefficient tables at trace time (dt is fixed for this kernel):
    # rhs′ = dt·rhs comes out of pure FMA chains and the low-storage update
    # is a single FMA per row per stage
    rxc = 1.0 if nonuni else rx
    fsc = 1.0 if nonuni else fscale
    drc = tuple(
        tuple(-rxc * dt * dr_full[ii][jj] for jj in range(np_))
        for ii in range(np_)
    )
    liftc = tuple(
        (fsc * dt * lift[ii][0], fsc * dt * lift[ii][1])
        for ii in range(np_)
    )

    def rhs_dt(u):
        f = tuple(0.5 * r * r for r in u)
        u_l, u_r = u[0], u[np_ - 1]
        u_l_ext = sp1(u_r)  # periodic flux
        u_r_ext = sm1(u_l)
        c_l = jnp.maximum(jnp.abs(u_l), jnp.abs(u_l_ext))
        c_r = jnp.maximum(jnp.abs(u_r), jnp.abs(u_r_ext))
        fstar_l = 0.5 * (0.5 * u_l**2 + 0.5 * u_l_ext**2) + 0.5 * c_l * (u_l_ext - u_l)
        fstar_r = 0.5 * (0.5 * u_r**2 + 0.5 * u_r_ext**2) - 0.5 * c_r * (u_r_ext - u_r)
        df_l = -(0.5 * u_l**2) + fstar_l
        df_r = (0.5 * u_r**2) - fstar_r
        if nonuni:
            df_l = df_l * fslv
            df_r = df_r * fsrv
        out = []
        for ii in range(np_):
            acc = drc[ii][0] * f[0]
            for jj in range(1, np_):
                acc = acc + drc[ii][jj] * f[jj]
            if nonuni:
                acc = acc * rxv
            out.append(acc + liftc[ii][0] * df_l + liftc[ii][1] * df_r)
        return tuple(out)

    def one_step(n, u):
        resu = tuple(jnp.zeros_like(r) for r in u)
        for s in range(5):
            r = rhs_dt(u)
            resu = tuple(
                float(RK4A[s]) * resu[ii] + r[ii] for ii in range(np_)
            )
            u = tuple(u[ii] + float(RK4B[s]) * resu[ii] for ii in range(np_))
            u = limit(u)
        return u

    rows = tuple(u_scr[ii] for ii in range(np_))
    rows = jax.lax.fori_loop(0, steps, one_step, rows)
    u_scr[:] = jnp.stack(rows, axis=0)

    @pl.when(i == n_chunks - 1)
    def _():
        u_out[:] = u_scr[:]


def _host_tables(disc: Discretization1D, limiter: str):
    """Precompute the scalar coefficient tables (host floats) shared by the
    batched and blocked-single Burgers kernels. The last return is the
    per-element geometry table for NON-UNIFORM meshes — a host float64
    array of rows [rx, fscale_l, fscale_r, 1/h, xi_0..xi_{Np-1}] shaped
    (4+Np, K), or None on a uniform mesh (factors fold into the scalars
    instead)."""
    if limiter not in ("n", "1", "none"):
        raise ValueError(limiter)
    np_ = disc.np_
    v = np.asarray(disc.v)
    inv_v = np.asarray(disc.inv_v)
    n_lin = min(2, np_)
    p_lin = v[:, :n_lin] @ inv_v[:n_lin, :]
    c_avg = tuple(float(v[0, 0] * inv_v[0, jj]) for jj in range(np_))
    x = np.asarray(disc.x)
    dr = np.asarray(disc.dr)
    dr_full = tuple(
        tuple(float(dr[ii, jj]) for jj in range(np_)) for ii in range(np_)
    )
    dr_ux = tuple(float(dd) for dd in (dr[0, :] @ p_lin))
    lift = tuple(
        (float(disc.lift[ii, 0]), float(disc.lift[ii, 1])) for ii in range(np_)
    )
    rx0 = float(disc.rx[0, 0])
    if _is_uniform(disc, rx0):
        h = float(x[-1, 0] - x[0, 0])
        x0 = float(x[0, 0] + h / 2)
        xi = tuple(float(x[ii, 0] - x0) for ii in range(np_))
        return rx0, h, dr_full, dr_ux, lift, c_avg, xi, None
    hv = x[-1, :] - x[0, :]
    xc = x[0, :] + hv / 2
    geom = np.concatenate(
        [
            np.asarray(disc.rx[0, :])[None],
            np.asarray(disc.fscale[0, :])[None],
            np.asarray(disc.fscale[1, :])[None],
            (1.0 / hv)[None],
            x - xc[None, :],
        ],
        axis=0,
    )
    return 0.0, 1.0, dr_full, dr_ux, lift, c_avg, (0.0,) * np_, geom


def make_pallas_burgers_march(
    disc: Discretization1D,
    dt: float,
    n_steps: int,
    batch: int = 8,
    steps_per_chunk: int = 64,
    limiter: str = "n",
    interpret: bool = False,
):
    """Returns ``run(u0) -> u_final`` for batched states (Np, B, K):
    ``n_steps`` fused LSRK4(5) Burgers steps with the ΠN (or Π¹) limiter
    applied after every stage, single kernel launch (grid over chunks)."""
    if n_steps % steps_per_chunk:
        raise ValueError(f"n_steps={n_steps} not a multiple of {steps_per_chunk}")
    rx, h, dr_full, dr_ux, lift, c_avg, xi, geom = _host_tables(disc, limiter)
    np_, k = disc.np_, disc.k
    n_chunks = n_steps // steps_per_chunk
    nonuni = geom is not None
    if nonuni:
        geom = geom[:, None, :]  # (4+Np, 1, K) — broadcasts over the batch

    kern = functools.partial(
        _kernel, np_, k, False, nonuni, rx, rx, h, dr_full, dr_ux, lift,
        c_avg, xi, limiter, n_chunks, steps_per_chunk, dt,
    )

    def run(u0):
        geom_in, geom_specs = (), []
        if nonuni:
            geom_in = (jnp.asarray(geom, u0.dtype),)
            geom_specs = [
                pl.BlockSpec(geom.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            ]
        return pl.pallas_call(
            kern,
            grid=(n_chunks,),
            out_shape=jax.ShapeDtypeStruct((np_, batch, k), u0.dtype),
            in_specs=[
                *geom_specs,
                pl.BlockSpec((np_, batch, k), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((np_, batch, k), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((np_, batch, k), u0.dtype)],
            interpret=interpret,
        )(*geom_in, u0)

    return run


def make_pallas_burgers_march_single_blocked(
    disc: Discretization1D,
    dt: float,
    n_steps: int,
    steps_per_chunk: int = 64,
    limiter: str = "n",
    interpret: bool = False,
):
    """Limited Burgers march for a SINGLE state at full VPU register
    height: the K elements tile the 8 sublanes as contiguous blocks
    ((Np, 8, K/8) layout, element k = s·(K/8) + j — the same layout as
    dg_rhs.make_pallas_fwd_adj_estimate_grid_single_blocked). The blocked
    ±1 shifts wrap across the sublane axis, which is exactly the periodic
    element neighbouring the Lax–Friedrichs flux needs; the limiter's
    copied-endpoint neighbour averages come from the true global
    first/last element masks. Returns ``run(u0) -> u_final`` on (Np, K)
    states — same contract as march/burgers.py::burgers_march (tested).
    """
    if n_steps % steps_per_chunk:
        raise ValueError(f"n_steps={n_steps} not a multiple of {steps_per_chunk}")
    if disc.k % 8:
        raise ValueError(f"K={disc.k} must be a multiple of 8 (blocked layout)")
    rx, h, dr_full, dr_ux, lift, c_avg, xi, geom = _host_tables(disc, limiter)
    np_, m = disc.np_, disc.k // 8
    n_chunks = n_steps // steps_per_chunk
    nonuni = geom is not None
    if nonuni:
        geom = geom.reshape(geom.shape[0], 8, m)

    kern = functools.partial(
        _kernel, np_, m, True, nonuni, rx, rx, h, dr_full, dr_ux, lift,
        c_avg, xi, limiter, n_chunks, steps_per_chunk, dt,
    )

    def run(u0):
        geom_in, geom_specs = (), []
        if nonuni:
            geom_in = (jnp.asarray(geom, u0.dtype),)
            geom_specs = [
                pl.BlockSpec(geom.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            ]
        out = pl.pallas_call(
            kern,
            grid=(n_chunks,),
            out_shape=jax.ShapeDtypeStruct((np_, 8, m), u0.dtype),
            in_specs=[
                *geom_specs,
                pl.BlockSpec((np_, 8, m), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((np_, 8, m), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((np_, 8, m), u0.dtype)],
            interpret=interpret,
        )(*geom_in, u0.reshape(np_, 8, m))
        return out.reshape(np_, disc.k)

    return run
