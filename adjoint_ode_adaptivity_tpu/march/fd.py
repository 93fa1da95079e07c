"""Forward time marching (finite-difference / one-step update rules) as
``lax.scan``.

Reference parity: ``forwardSolve`` — the sequential Python loop in
``python/Main_finite_difference.py:34-51``, ``python/factory.py:380-397``
(NumPy) and ``python/factory.py:557-577`` / ``Main_variable_params.py:46-65``
(JAX ``.at[n].set`` unrolled loops). Here a single ``lax.scan`` compiles to a
tight XLA while-loop: O(N) compile, O(N) run, and reverse-mode AD through it
is the O(N) adjoint reverse scan (with optional rematerialisation for long
trajectories).

A *step function* has signature ``step_fn(u, t, dt) -> u_next``; the Euler
builder turns an ODE right-hand side into one. Per-step parameters (the
ResNetODE "one block per time step" pattern, python/models.py:106-126 and
Main_variable_params.py) are threaded as scanned pytrees with a leading time
axis — no Python lists of params.

Padding contract (TPU-first adaptivity): steps with ``dt == 0`` are identity
updates for any Euler-type rule, so grids padded to a static maximum length
march correctly with zero masking logic. See
:mod:`adjoint_ode_adaptivity_tpu.adapt`.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["euler_step", "forward_march", "forward_march_per_step", "times_from_dt"]


def euler_step(f: Callable) -> Callable:
    """Forward-Euler step u_{n+1} = u_n + f(u_n, t_n)·dt_n.

    Matches ``fwdUpdate`` (python/factory.py:107-108 for u'=sin u).
    """

    def step(u, t, dt):
        return u + f(u, t) * dt

    return step


def heun_step(f: Callable) -> Callable:
    """Heun (explicit trapezoid) step — 2nd order. The reference is
    Euler-only; higher-order one-step rules drop into the same march/
    adjoint/estimate machinery because everything is written against the
    generic ``step_fn(u, t, dt)`` contract (the adjoint differentiates the
    step with VJPs, whatever its order). Zero-dt padding steps remain exact
    identities."""

    def step(u, t, dt):
        k1 = f(u, t)
        k2 = f(u + dt * k1, t + dt)
        return u + dt / 2.0 * (k1 + k2)

    return step


def rk4_step(f: Callable) -> Callable:
    """Classical RK4 step — 4th order, same generic contract."""

    def step(u, t, dt):
        k1 = f(u, t)
        k2 = f(u + 0.5 * dt * k1, t + 0.5 * dt)
        k3 = f(u + 0.5 * dt * k2, t + 0.5 * dt)
        k4 = f(u + dt * k3, t + dt)
        return u + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    return step


def times_from_dt(dt: jnp.ndarray, t0: float = 0.0) -> jnp.ndarray:
    """Node times from step sizes: t = [t0, t0+cumsum(dt)]."""
    return jnp.concatenate([jnp.full((1,), t0, dtype=dt.dtype), t0 + jnp.cumsum(dt)])


def forward_march(
    step_fn: Callable,
    u0: Any,
    dt: jnp.ndarray,
    t0: float = 0.0,
    *,
    remat: bool | str = False,
) -> jnp.ndarray:
    """March u_{n+1} = step_fn(u_n, t_n, dt_n) over all steps.

    Returns the full trajectory stacked on a new leading axis,
    shape ``(len(dt)+1, *shape(u0))``.

    ``remat``:
    - ``True``: rematerialise each step in reverse-mode AD (jax.checkpoint
      on the step) — saves the per-step intermediates, keeps the carries.
    - ``"sqrt"``: two-level scan-of-checkpointed-scans — reverse-mode AD
      stores only O(√N) outer carries and recomputes inner segments, the
      jax-native analogue of the segmented/binomial checkpointing the
      adjoint kernels use (PAPERS.md retrievals). Requires len(dt) to have
      an integer-ish factorisation; the remainder runs unchunked.
    """
    u0 = jnp.asarray(u0)
    t = times_from_dt(dt, t0)

    if remat == "sqrt":
        import math

        n = dt.shape[0]
        inner = max(int(math.isqrt(n)), 1)
        n_outer = n // inner
        rem = n - n_outer * inner

        @jax.checkpoint
        def segment(u, xs):
            def body(u, x):
                t_n, dt_n = x
                u_next = step_fn(u, t_n, dt_n)
                return u_next, u_next

            return lax.scan(body, u, xs)

        xs_main = (
            t[: n_outer * inner].reshape(n_outer, inner),
            dt[: n_outer * inner].reshape(n_outer, inner),
        )
        u_mid, us_main = lax.scan(segment, u0, xs_main)
        us = us_main.reshape((n_outer * inner,) + u0.shape)
        if rem:
            _, us_tail = segment(u_mid, (t[n_outer * inner : -1], dt[n_outer * inner :]))
            us = jnp.concatenate([us, us_tail])
        return jnp.concatenate([u0[None], us])

    fn = jax.checkpoint(step_fn) if remat else step_fn

    def body(u, x):
        t_n, dt_n = x
        u_next = fn(u, t_n, dt_n)
        return u_next, u_next

    _, us = lax.scan(body, u0, (t[:-1], dt))
    return jnp.concatenate([u0[None], us])


def forward_march_per_step(
    step_fn: Callable,
    u0: Any,
    dt: jnp.ndarray,
    params_stacked: Any,
    t0: float = 0.0,
    *,
    remat: bool = False,
) -> jnp.ndarray:
    """March with per-step parameters: ``step_fn(u, t, dt, params_n)`` where
    ``params_stacked`` is a pytree with leading axis ``len(dt)`` scanned over.

    TPU-native form of the reference's ``params_list`` loops
    (python/Main_variable_params.py:46-65): a stacked pytree keeps a single
    compiled step and lets depth insertion be a pytree scatter.
    """
    u0 = jnp.asarray(u0)
    t = times_from_dt(dt, t0)
    fn = jax.checkpoint(step_fn) if remat else step_fn

    def body(u, x):
        t_n, dt_n, p_n = x
        u_next = fn(u, t_n, dt_n, p_n)
        return u_next, u_next

    _, us = lax.scan(body, u0, (t[:-1], dt, params_stacked))
    return jnp.concatenate([u0[None], us])
