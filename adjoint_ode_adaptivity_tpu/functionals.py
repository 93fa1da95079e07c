"""Output functionals J(u) on a discrete time grid, and their state gradients.

The reference hand-codes the gradient vector ``K = ∂J/∂U`` per functional
(``getK``: python/factory.py:126-150,164-205,250-265). Here each functional is
a *single jnp scalar function* of the trajectory and the K vector is obtained
by ``jax.grad`` — consistency between J and K is automatic, and the same
definitions serve the matrix-free adjoint (reference: ``outFnl`` +
``grad(outFnl)``, python/Main_new_loss.py:70-80).

Discrete conventions (must match the reference bit-for-bit for effectivity
parity):
- ``int_u``   : J = Σ_{n<N} u_n·dt_n          (left rectangle rule)
- ``int_u2``  : J = Σ_{n<N} u_n²·dt_n
- ``u_N``     : K = e_{N-1} — the reference's terminal functional places the
                unit at the *second-to-last* node of the refined grid
                (python/factory.py:135-138: k=zeros_like(dt); k[-1]=1 then a
                trailing 0 is appended), so J ≡ u_{N-1}. We reproduce exactly.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["Functional", "get_functional", "FUNCTIONAL_REGISTRY", "terminal_abs_error"]


class Functional(NamedTuple):
    name: str
    value: Callable  # value(u, dt) -> scalar J
    g_u: Callable | None  # integrand derivative g_u(u, t) for the continuous adjoint
    terminal: float  # continuous-adjoint terminal condition a(T)
    linear: bool


def _j_int_u(u: jnp.ndarray, dt: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(u[:-1] * dt)


def _j_int_u2(u: jnp.ndarray, dt: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(u[:-1] ** 2 * dt)


def _j_u_n(u: jnp.ndarray, dt: jnp.ndarray) -> jnp.ndarray:
    return u[-2]


FUNCTIONAL_REGISTRY: dict[str, Functional] = {
    "J=int(u)": Functional("J=int(u)", _j_int_u, lambda u, t: jnp.ones_like(u), 0.0, True),
    "J=int(u^2)": Functional("J=int(u^2)", _j_int_u2, lambda u, t: 2.0 * u, 0.0, False),
    "J=u_N": Functional("J=u_N", _j_u_n, lambda u, t: jnp.zeros_like(u), 1.0, True),
}


def get_functional(name: str) -> Functional:
    return FUNCTIONAL_REGISTRY[name]


def get_k(functional: Functional, u: jnp.ndarray, dt: jnp.ndarray) -> jnp.ndarray:
    """K = ∂J/∂U on the (fine) grid — by AD, matching the reference's
    hand-written vectors exactly."""
    return jax.grad(functional.value)(u, dt)


def terminal_abs_error(u: jnp.ndarray, true: jnp.ndarray) -> jnp.ndarray:
    """|u_N − u_true|: the goal functional of the NN-adaptivity drivers
    (``outFnl``, python/Main_new_loss.py:70-73)."""
    return jnp.abs(jnp.squeeze(u[-1]) - jnp.squeeze(true))
