"""1D advection DG semidiscretization and LSRK4(5) time march (XLA path).

Reference parity: ``utils/AdvecRHS1D.m`` (upwind face flux, inflow BC
``uin = −sin(a·t)``, volume term ``−a·rx·(Dr u)`` + surface lift) and the
``Advec1D`` time loop embedded in ``utils/One_code.mlx`` (CFL-based dt, five
low-storage stages per step).

TPU-first design:
- State layout ``(Np, K)``: the large element axis K rides the 128-lane
  dimension; ``Dr @ u`` and ``LIFT @ flux`` are (Np×Np)·(Np×K) GEMMs.
- The face gather through ``vmapM/vmapP`` degenerates on a 1D equidistant
  mesh to a shift along K: element k's left-face neighbour value is element
  k−1's last node. We use ``jnp.roll`` + boundary fixups instead of a
  general gather — XLA turns this into cheap lane rotations.
- The march is a ``lax.scan`` over time steps with a ``fori``-style inner
  loop over the 5 stages unrolled (static 5).
- The whole march is linear in ``u`` ⇒ its reverse-mode transpose *is* the
  discrete adjoint march; see adjoint/advec.py.

A Pallas-fused version of the same math lives in ops/pallas/dg_rhs.py; this
module is the semantics oracle it is tested against.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np
import jax
from jax import lax

from adjoint_ode_adaptivity_tpu.march.lsrk import RK4A, RK4B, RK4C
from adjoint_ode_adaptivity_tpu.ops.mesh import Discretization1D

__all__ = ["AdvecOperators", "advec_operators", "advec_rhs", "advec_march", "cfl_dt"]


class AdvecOperators(NamedTuple):
    """Static operator bundle for the advection RHS at a given dtype."""

    dr: jnp.ndarray  # (Np, Np)
    lift: jnp.ndarray  # (Np, 2)
    rx: jnp.ndarray  # (Np, K)
    fscale: jnp.ndarray  # (2, K)
    nx: jnp.ndarray  # (2, K)
    a: float  # advection speed
    alpha: float  # upwinding parameter (1 = central contribution off ⇒ pure upwind)


def advec_operators(
    disc: Discretization1D, a: float = 2 * np.pi, alpha: float = 1.0, dtype=jnp.float32
) -> AdvecOperators:
    return AdvecOperators(
        dr=jnp.asarray(disc.dr, dtype),
        lift=jnp.asarray(disc.lift, dtype),
        rx=jnp.asarray(disc.rx, dtype),
        fscale=jnp.asarray(disc.fscale, dtype),
        nx=jnp.asarray(disc.nx, dtype),
        a=a,
        alpha=alpha,
    )


def advec_rhs(
    ops: AdvecOperators, u: jnp.ndarray, t: jnp.ndarray, inflow: bool = True
) -> jnp.ndarray:
    """du/dt of the DG-discretised advection equation u_t + a u_x = 0.

    ``u`` is (Np, K). Upwind flux factor (a·nx − (1−alpha)|a·nx|)/2 per face;
    inflow Dirichlet BC u(x=0,t) = −sin(a·t) at the left boundary, zero flux
    difference at the outflow. ``inflow=False`` freezes the BC at zero —
    that is the homogeneous (linear-in-u) operator whose transpose is the
    adjoint march.
    """
    a, alpha = ops.a, ops.alpha
    # trace values at faces: uM[f, k]
    u_left = u[0, :]  # face 0 of each element
    u_right = u[-1, :]  # face 1 of each element
    # neighbour traces: left face of k pairs with right face of k-1, etc.
    u_left_nbr = jnp.roll(u_right, 1)  # (K,)
    u_right_nbr = jnp.roll(u_left, -1)  # (K,)

    flux_fac = (a * ops.nx - (1 - alpha) * jnp.abs(a * ops.nx)) / 2.0  # (2, K)
    du_left = (u_left - u_left_nbr) * flux_fac[0]
    du_right = (u_right - u_right_nbr) * flux_fac[1]

    # boundary conditions: inflow at the global left face, outflow zero
    uin = -jnp.sin(a * t) if inflow else jnp.zeros((), u.dtype)
    du_left = du_left.at[0].set((u_left[0] - uin) * flux_fac[0, 0])
    du_right = du_right.at[-1].set(0.0)

    du = jnp.stack([du_left, du_right])  # (2, K)
    # exact-f32 contractions: XLA's default TPU matmul precision (bf16
    # passes) costs ~3 decimal digits here, measured against f64
    hi = jax.lax.Precision.HIGHEST
    return -a * ops.rx * jnp.matmul(ops.dr, u, precision=hi) + jnp.matmul(
        ops.lift, ops.fscale * du, precision=hi
    )


def cfl_dt(disc: Discretization1D, a: float, cfl: float = 0.75, final_time: float = 2.0):
    """CFL time step exactly as the One_code.mlx driver: dt from the minimum
    node spacing, halved, then truncated so Nsteps·dt = FinalTime."""
    xmin = float(np.min(np.abs(disc.x[0, :] - disc.x[1, :])))
    dt = 0.5 * (cfl / a) * xmin
    n_steps = int(np.ceil(final_time / dt))
    return final_time / n_steps, n_steps


def advec_march(
    ops: AdvecOperators,
    u0: jnp.ndarray,
    dt: float,
    n_steps: int,
    t0: float = 0.0,
    *,
    post_stage: Callable | None = None,
    save_every: int = 0,
):
    """March ``n_steps`` LSRK4(5) steps. Returns the final state, or
    (final, saved-stack) when ``save_every > 0``.

    ``post_stage`` (e.g. a slope limiter ``u -> u``) is applied after each
    full RK step, mirroring how limiters wrap RK stages in the H-W codes.
    """
    rk4a = jnp.asarray(RK4A, u0.dtype)
    rk4b = jnp.asarray(RK4B, u0.dtype)
    rk4c = jnp.asarray(RK4C, u0.dtype)

    def one_step(carry, step_idx):
        u, resu = carry
        t = t0 + step_idx * dt
        for s in range(5):  # static unroll of the 5 stages
            rhs = advec_rhs(ops, u, t + rk4c[s] * dt)
            resu = rk4a[s] * resu + dt * rhs
            u = u + rk4b[s] * resu
        if post_stage is not None:
            u = post_stage(u)
        out = u if save_every else None
        return (u, resu), out

    resu0 = jnp.zeros_like(u0)
    if save_every:
        (u, _), saved = lax.scan(one_step, (u0, resu0), jnp.arange(n_steps))
        return u, saved[save_every - 1 :: save_every]
    (u, _), _ = lax.scan(one_step, (u0, resu0), jnp.arange(n_steps))
    return u
