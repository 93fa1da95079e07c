"""Training-data generation and batching.

Reference parity:
- ground truth from a reference integrator: the reference calls host
  ``scipy.integrate.odeint`` per IC (Main_FD_with_net.py:151,
  Main_new_loss.py:223-224). Here truth comes from a dense fixed-step RK4
  march on device, vmapped over the IC ensemble — no host round-trip, and
  accurate far beyond the forward-Euler solver being trained.
- batching: ``getTrainBatches`` (Main_FD_with_net.py:120-132) —
  jit-compiled permutation + vmapped dynamic slices.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import jax.random as jrand
from jax import lax

__all__ = ["rk4_truth", "make_batches", "train_test_split"]


def rk4_truth(
    f: Callable,
    u0: jnp.ndarray,
    t_span: tuple[float, float],
    n_sub: int = 512,
    save_times: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Dense RK4 integration of ``u' = f(u, t)`` from t_span[0] to t_span[1].

    ``u0`` may be batched (leading axes vmapped). Returns the terminal value,
    or the trajectory sampled at ``save_times`` (by linear interpolation of
    the dense grid) when given.
    """
    t0, t1 = t_span
    ts = jnp.linspace(t0, t1, n_sub + 1)
    h = (t1 - t0) / n_sub

    def step(u, t):
        k1 = f(u, t)
        k2 = f(u + 0.5 * h * k1, t + 0.5 * h)
        k3 = f(u + 0.5 * h * k2, t + 0.5 * h)
        k4 = f(u + h * k3, t + h)
        u_next = u + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        return u_next, u_next

    def solve_one(u0_scalar):
        u_end, hist = lax.scan(step, u0_scalar, ts[:-1])
        if save_times is None:
            return u_end
        traj = jnp.concatenate([u0_scalar[None], hist])
        return jnp.interp(save_times, ts, traj)

    if u0.ndim == 0:
        return solve_one(u0)
    return jax.vmap(solve_one)(u0.reshape(-1)).reshape(
        u0.shape + (() if save_times is None else (save_times.shape[0],))
    )


def make_batches(key, u0_train, true_train, batch_size: int):
    """Shuffle and slice fixed-size batches (drops the ragged tail).

    Returns (u0_batches, true_batches) with leading axis n_batches.
    """
    n = u0_train.shape[0]
    n_batches = n // batch_size
    perm = jrand.permutation(key, n)
    u0_shuffled = u0_train[perm]
    true_shuffled = jax.tree_util.tree_map(lambda x: x[perm], true_train)

    def batch(b):
        sl = lambda x: lax.dynamic_slice_in_dim(x, b * batch_size, batch_size)
        return sl(u0_shuffled), jax.tree_util.tree_map(sl, true_shuffled)

    return jax.vmap(batch)(jnp.arange(n_batches))


def train_test_split(u0: jnp.ndarray, true, n_test: int):
    """Split leading axis: first n_test entries are the held-out set
    (Main_FD_with_net.py:155-156 convention)."""
    u0_test, u0_train = u0[:n_test], u0[n_test:]
    tt = jax.tree_util.tree_map(lambda x: x[:n_test], true)
    tr = jax.tree_util.tree_map(lambda x: x[n_test:], true)
    return (u0_train, tr), (u0_test, tt)
