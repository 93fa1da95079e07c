"""Benchmark helpers: the north-star fwd+adjoint DG advection benchmark and
a NumPy element-style baseline standing in for the MATLAB reference.

The reference publishes no numbers (SURVEY.md §6); the driver-defined target
is fwd+adjoint DoF-steps/sec on 1D DG advection at 10k elements, >100× the
MATLAB wall-clock, with effectivity parity. The baseline here is a faithful
NumPy transliteration of the MATLAB compute pattern (vectorised Dr*u and
LIFT*(...) just like utils/AdvecRHS1D.m + the One_code.mlx LSRK loop) —
MATLAB's JIT on vectorised linear algebra performs comparably to NumPy.
"""
from __future__ import annotations

import time
from typing import NamedTuple

import numpy as np

from adjoint_ode_adaptivity_tpu.march.lsrk import RK4A, RK4B, RK4C
from adjoint_ode_adaptivity_tpu.ops.mesh import Discretization1D


class BaselineResult(NamedTuple):
    dof_steps_per_sec: float
    steps_measured: int


def numpy_advec_fwd_adj_baseline(
    disc: Discretization1D, a: float, dt: float, n_steps: int
) -> BaselineResult:
    """NumPy/MATLAB-style forward + adjoint march, timed.

    Forward: LSRK4(5) with the AdvecRHS1D formula (vectorised gathers).
    Adjoint: same cost profile — we run the transpose march via the
    transposed operators (the honest cost of an adjoint sweep in
    MATLAB/NumPy).
    """
    np_, k = disc.np_, disc.k
    dr = np.asarray(disc.dr)
    lift = np.asarray(disc.lift)
    rx = np.asarray(disc.rx)
    fscale = np.asarray(disc.fscale)
    nx = np.asarray(disc.nx)
    flux_fac = (a * nx - 0.0) / 2.0  # alpha=1 upwind

    def rhs(u, t):
        u_left = u[0, :]
        u_right = u[-1, :]
        du0 = (u_left - np.roll(u_right, 1)) * flux_fac[0]
        du1 = (u_right - np.roll(u_left, -1)) * flux_fac[1]
        du0[0] = (u_left[0] + np.sin(a * t)) * flux_fac[0, 0]
        du1[-1] = 0.0
        du = np.stack([du0, du1])
        return -a * rx * (dr @ u) + lift @ (fscale * du)

    def rhs_t(lam):
        # transpose of the homogeneous rhs (cost-equivalent apply)
        w = fscale * (lift.T @ lam)
        s0 = w[0] * flux_fac[0]
        s1 = w[1] * flux_fac[1]
        out = -a * rx * (dr.T @ lam)
        out[0, :] += s0
        out[-1, :] += s1
        out[-1, :] -= np.roll(s0, -1)
        out[0, :] -= np.roll(s1, 1)
        return out

    u = np.sin(np.asarray(disc.x))
    resu = np.zeros_like(u)
    t0 = time.perf_counter()
    t = 0.0
    for n in range(n_steps):
        for s in range(5):
            r = rhs(u, t + RK4C[s] * dt)
            resu = RK4A[s] * resu + dt * r
            u = u + RK4B[s] * resu
        t += dt
    lam = np.ones_like(u)
    resl = np.zeros_like(u)
    for n in range(n_steps):
        for s in range(5):
            r = rhs_t(lam)
            resl = RK4A[s] * resl + dt * r
            lam = lam + RK4B[s] * resl
    elapsed = time.perf_counter() - t0
    dof_steps = np_ * k * (2 * n_steps)
    return BaselineResult(dof_steps / elapsed, n_steps)
