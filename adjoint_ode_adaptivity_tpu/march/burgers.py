"""Nonlinear conservation law (Burgers) DG march with slope limiting.

BASELINE.json config 4 names a nonlinear conservation law with minmod slope
limiting; the reference carries the Hesthaven–Warburton limiter toolkit
(utils/SlopeLimit*.m) but never invokes it from any driver. Here the
capability is completed: u_t + (u²/2)_x = 0 discretised with nodal DG and a
local Lax–Friedrichs numerical flux, marched with LSRK4(5), with the ΠN/Π1
minmod limiters applied after every RK STAGE (the standard H-W pattern —
per-stage, not per-step; see ``burgers_march``).

TPU-first: same (Np, K) layout and shift-based neighbour traces as the
advection march; the limiter is the vectorised mask-based one from
ops/limiters.py, so the whole step (RHS + RK + limit) is one fused jit.
Periodic boundary conditions (the classic Burgers test setting).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from adjoint_ode_adaptivity_tpu.march.lsrk import RK4A, RK4B
from adjoint_ode_adaptivity_tpu.ops.limiters import slope_limit_1, slope_limit_n
from adjoint_ode_adaptivity_tpu.ops.mesh import Discretization1D

__all__ = ["BurgersOperators", "burgers_operators", "burgers_rhs", "burgers_march"]


class BurgersOperators(NamedTuple):
    dr: jnp.ndarray
    lift: jnp.ndarray
    rx: jnp.ndarray
    fscale: jnp.ndarray
    x: jnp.ndarray
    v: jnp.ndarray
    inv_v: jnp.ndarray


def burgers_operators(disc: Discretization1D, dtype=jnp.float64) -> BurgersOperators:
    return BurgersOperators(
        dr=jnp.asarray(disc.dr, dtype),
        lift=jnp.asarray(disc.lift, dtype),
        rx=jnp.asarray(disc.rx, dtype),
        fscale=jnp.asarray(disc.fscale, dtype),
        x=jnp.asarray(disc.x, dtype),
        v=jnp.asarray(disc.v, dtype),
        inv_v=jnp.asarray(disc.inv_v, dtype),
    )


def burgers_rhs(ops: BurgersOperators, u: jnp.ndarray) -> jnp.ndarray:
    """du/dt for u_t + (u²/2)_x = 0: DG volume term + local Lax–Friedrichs
    flux at faces, periodic BCs."""
    hi = jax.lax.Precision.HIGHEST
    f = 0.5 * u * u
    u_l, u_r = u[0, :], u[-1, :]
    # exterior traces (periodic)
    u_l_ext = jnp.roll(u_r, 1)
    u_r_ext = jnp.roll(u_l, -1)
    # local Lax-Friedrichs flux f* = {f} - C/2 [u] with C = max|u| at the face
    def llf(u_in, u_ext, nx):
        c = jnp.maximum(jnp.abs(u_in), jnp.abs(u_ext))
        f_star = 0.5 * (0.5 * u_in**2 + 0.5 * u_ext**2) - 0.5 * c * (u_ext - u_in) * nx
        return f_star

    fstar_l = llf(u_l, u_l_ext, -1.0)
    fstar_r = llf(u_r, u_r_ext, 1.0)
    # surface contribution: (f(u⁻)·n − f*·n) lifted
    df_l = -(0.5 * u_l**2) + fstar_l  # n = −1 at the left face
    df_r = (0.5 * u_r**2) - fstar_r  # n = +1 at the right face
    du = jnp.stack([df_l, df_r])
    return -ops.rx * jnp.matmul(ops.dr, f, precision=hi) + jnp.matmul(
        ops.lift, ops.fscale * du, precision=hi
    )


def burgers_march(
    ops: BurgersOperators,
    u0: jnp.ndarray,
    dt: float,
    n_steps: int,
    *,
    limiter: str = "n",
) -> jnp.ndarray:
    """LSRK4(5) march with the minmod limiter applied after every stage
    (H-W applies ΠN after each stage in the nonlinear solvers)."""
    rk4a = jnp.asarray(RK4A, u0.dtype)
    rk4b = jnp.asarray(RK4B, u0.dtype)

    if limiter == "n":
        limit = lambda u: slope_limit_n(u, ops.x, ops.v, ops.inv_v, ops.dr)
    elif limiter == "1":
        limit = lambda u: slope_limit_1(u, ops.x, ops.v, ops.inv_v, ops.dr)
    elif limiter == "none":
        limit = lambda u: u
    else:
        raise ValueError(limiter)

    def one_step(carry, _):
        u, resu = carry
        for s in range(5):
            rhs = burgers_rhs(ops, u)
            resu = rk4a[s] * resu + dt * rhs
            u = limit(u + rk4b[s] * resu)
        return (u, resu), None

    (u, _), _ = lax.scan(one_step, (u0, jnp.zeros_like(u0)), None, length=n_steps)
    return u
