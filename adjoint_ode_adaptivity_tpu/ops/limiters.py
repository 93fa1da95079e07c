"""Slope limiters for nodal DG (minmod, TVB minmod, Pi^1 and Pi^N limiters).

Reference parity: ``utils/minmod.m``, ``utils/minmodB.m``,
``utils/SlopeLimitLin.m``, ``utils/SlopeLimit1.m``, ``utils/SlopeLimitN.m``.

TPU-first: fully vectorised over elements (no troubled-cell index lists —
the limited reconstruction is computed everywhere and blended with a mask),
jit/vmap/grad-safe, static shapes. Operators (V, invV, Dr) come in as
constants from the discretization pytree.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["minmod", "minmod_tvb", "slope_limit_lin", "slope_limit_1", "slope_limit_n"]


def minmod(v: jnp.ndarray) -> jnp.ndarray:
    """Minmod along axis 0: sign-unanimous minimum magnitude, else 0.

    ``v`` is (m, K); returns (K,).
    """
    m = v.shape[0]
    s = jnp.sum(jnp.sign(v), axis=0) / m
    unanimous = jnp.abs(s) == 1.0
    return jnp.where(unanimous, s * jnp.min(jnp.abs(v), axis=0), 0.0)


def minmod_tvb(v: jnp.ndarray, m_const: float, h: jnp.ndarray) -> jnp.ndarray:
    """TVB-modified minmod: pass the first argument through when it is small
    relative to M·h² (Shu's TVB trick), else fall back to minmod."""
    mfunc = v[0]
    small = jnp.abs(mfunc) <= m_const * h**2
    return jnp.where(small, mfunc, minmod(v))


def _cell_averages(u: jnp.ndarray, v: jnp.ndarray, inv_v: jnp.ndarray) -> jnp.ndarray:
    """Cell averages via the mean mode: keep only modal coefficient 0."""
    uh0 = (inv_v @ u)[0:1, :]
    return (v[:, 0:1] @ uh0)[0]


def slope_limit_lin(
    ul: jnp.ndarray,
    xl: jnp.ndarray,
    vm1: jnp.ndarray,
    v0: jnp.ndarray,
    vp1: jnp.ndarray,
    dr: jnp.ndarray,
) -> jnp.ndarray:
    """Limit a piecewise-linear field to the minmod of its slope and the
    neighbour cell-average differences (``utils/SlopeLimitLin.m``)."""
    np_ = ul.shape[0]
    h = xl[np_ - 1, :] - xl[0, :]
    x0 = xl[0, :] + h / 2
    ux = (2.0 / h) * (dr @ ul)[0, :]
    slope = minmod(jnp.stack([ux, (vp1 - v0) / h, (v0 - vm1) / h]))
    return v0[None, :] + (xl - x0[None, :]) * slope[None, :]


def _neighbor_averages(vk: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Left/right neighbour cell averages with copied-endpoint boundaries."""
    vkm1 = jnp.concatenate([vk[:1], vk[:-1]])
    vkp1 = jnp.concatenate([vk[1:], vk[-1:]])
    return vkm1, vkp1


def slope_limit_1(
    u: jnp.ndarray, x: jnp.ndarray, v: jnp.ndarray, inv_v: jnp.ndarray, dr: jnp.ndarray
) -> jnp.ndarray:
    """Pi^1 limiter: project every element to linear, then slope-limit."""
    uh = inv_v @ u
    ul = v @ uh.at[2:, :].set(0.0) if uh.shape[0] > 2 else v @ uh
    vk = _cell_averages(u, v, inv_v)
    vkm1, vkp1 = _neighbor_averages(vk)
    return slope_limit_lin(ul, x, vkm1, vk, vkp1, dr)


def slope_limit_n(
    u: jnp.ndarray, x: jnp.ndarray, v: jnp.ndarray, inv_v: jnp.ndarray, dr: jnp.ndarray
) -> jnp.ndarray:
    """Pi^N limiter: detect troubled cells via minmod reconstruction of the
    endpoint values, and replace only those cells with the limited linear
    solution (``utils/SlopeLimitN.m``).

    Vectorised: the limited candidate is computed for all elements and
    selected with a per-element mask — no data-dependent index sets, so the
    whole limiter jits and differentiates.
    """
    eps0 = 1.0e-8
    np_ = u.shape[0]
    vk = _cell_averages(u, v, inv_v)
    vkm1, vkp1 = _neighbor_averages(vk)
    ue1 = u[0, :]
    ue2 = u[np_ - 1, :]
    ve1 = vk - minmod(jnp.stack([vk - ue1, vk - vkm1, vkp1 - vk]))
    ve2 = vk + minmod(jnp.stack([ue2 - vk, vk - vkm1, vkp1 - vk]))
    troubled = (jnp.abs(ve1 - ue1) > eps0) | (jnp.abs(ve2 - ue2) > eps0)

    uh = inv_v @ u
    ul = v @ (uh.at[2:, :].set(0.0) if np_ > 2 else uh)
    limited = slope_limit_lin(ul, x, vkm1, vk, vkp1, dr)
    return jnp.where(troubled[None, :], limited, u)
