"""Flax model zoo: residual blocks used as ODE update rules.

Reference parity (python/models.py):
- ``SingleNeuronLayers``    (models.py:19-35) — scalar residual layers with
  sorted-bias init.
- ``ResBlockSimple``        (models.py:38-65) — explicit-parameter block
  ``u + W2 @ σ(W1 ⊙ (u − b))·dt`` with weights exposed for width surgery.
- ``ResBlock``              (models.py:68-85) — Dense→act→Dense with elu.
- ``ResNetBlock``           (models.py:88-103) — Dense(size)→act→Dense,
  ``u + f·dt``.
- ``ResNetODE``             (models.py:106-126) — one block per time step
  (depth ≡ time grid), returns the whole trajectory.

TPU-first notes: ``ResNetODE`` here runs its per-step blocks under
``lax.scan`` over a *stacked* parameter pytree instead of Python-unrolled
``.at[l].set`` loops — one compiled block regardless of depth, and depth
insertion is a pytree scatter (models/surgery.py) rather than a retrace.
``ResBlockSimple`` widths are static per module instance (dynamic-shape
surgery via surgery.grow_width); ``ResBlockSimpleMasked`` allocates a fixed
neuron *capacity* with a per-call active count so width growth is a
static-shape scatter (surgery.grow_width_padded) and jit caches survive
surgery.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "sorted_bias_init",
    "SingleNeuronLayers",
    "ResBlockSimple",
    "ResBlockSimpleMasked",
    "masked_params_from_simple",
    "ResBlock",
    "ResNetBlock",
    "ResNetODE",
    "resnet_ode_apply",
]

default_kernel_init = nn.initializers.lecun_normal()


def sorted_bias_init(key, shape, dtype=jnp.float32):
    """Bias init drawn from lecun-normal then sorted ascending — the width
    surgery relies on biases being ordered (models.py:15-16)."""
    return jnp.sort(default_kernel_init(key, shape, dtype), axis=None).reshape(shape)


class SingleNeuronLayers(nn.Module):
    """A chain of scalar residual layers: f ← f + act(w·f + b), returning
    the value after every layer (a per-layer trajectory)."""

    layers: int = 1
    activation: Callable = nn.relu
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        f = jnp.squeeze(inputs)
        ws = self.param("weight", default_kernel_init, (self.layers, 1, 1), self.param_dtype)
        bs = self.param("bias", nn.initializers.zeros_init(), (self.layers, 1, 1), self.param_dtype)

        def body(f, wb):
            w, b = wb
            f_next = f + self.activation(jnp.squeeze(w) * f + jnp.squeeze(b))
            return f_next, f_next

        _, outs = jax.lax.scan(body, f, (ws, bs))
        return jnp.concatenate([f[None], outs])


class ResBlockSimple(nn.Module):
    """u_{n+1} = u_n + W2 @ σ(W1 ⊙ (u_n − b)) · dt  with explicit parameters.

    The per-feature bias acts as a set of 'knot points' in u; width surgery
    inserts neurons at poorly-fit knots (models.py:38-65).
    """

    features: int
    activation: Callable = nn.relu
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, u_n, t_n, dt_n):
        u_in = jnp.asarray(u_n)
        u = jnp.atleast_1d(u_in)
        d = u.shape[-1]
        bias = self.param("bias", sorted_bias_init, (self.features, d), self.param_dtype)
        w1 = self.param("weights1", default_kernel_init, (self.features, d), self.param_dtype)
        w2 = self.param("weights2", default_kernel_init, (d, self.features), self.param_dtype)
        f = u[None, :] - bias  # (F, d)
        f = self.activation(w1 * f)
        f = jnp.einsum("df,fd->d", w2, f)
        out = u + f * dt_n
        return out.reshape(u_in.shape)


class ResBlockSimpleMasked(nn.Module):
    """``ResBlockSimple`` with a fixed neuron *capacity* and a per-call
    active-neuron count: ``u + W2 @ (m ⊙ σ(W1 ⊙ (u − b))) · dt`` with
    ``m = arange(capacity) < n_active``.

    Inactive slots contribute nothing to the output AND receive exactly zero
    gradient (the mask multiplies the activation), so padded parameters and
    adam moments stay frozen at their fill values. Width surgery
    (surgery.grow_width_padded) bumps ``n_active`` and scatters the new
    neuron in place — the compiled train step never retraces
    (Main_width_ref.py:225-312 rebuilds modules and shapes instead).
    """

    capacity: int
    activation: Callable = nn.relu
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, u_n, t_n, dt_n, n_active):
        u_in = jnp.asarray(u_n)
        u = jnp.atleast_1d(u_in)
        d = u.shape[-1]
        bias = self.param("bias", sorted_bias_init, (self.capacity, d), self.param_dtype)
        w1 = self.param("weights1", default_kernel_init, (self.capacity, d), self.param_dtype)
        w2 = self.param("weights2", default_kernel_init, (d, self.capacity), self.param_dtype)
        mask = (jnp.arange(self.capacity) < n_active).astype(u.dtype)[:, None]
        f = u[None, :] - bias  # (capacity, d)
        f = mask * self.activation(w1 * f)
        f = jnp.einsum("df,fd->d", w2, f)
        out = u + f * dt_n
        return out.reshape(u_in.shape)


def masked_params_from_simple(simple_params: dict, capacity: int) -> dict:
    """Embed ``ResBlockSimple(width)`` parameters into a
    ``ResBlockSimpleMasked(capacity)`` parameter dict.

    The active prefix is the simple net's parameters bit-for-bit, so a
    masked net at ``n_active = width`` reproduces the reference-faithful
    width-``width`` initialization exactly (initializing the masked module
    directly sorts lecun-normal draws across the FULL capacity, handing the
    active prefix only the lowest-tail knots). Padding slots are zero —
    inert by construction (exactly-zero gradients through the mask) and
    overwritten by surgery.insert_neuron_padded on growth.
    """
    f, d = simple_params["bias"].shape
    pad = capacity - f
    if pad < 0:
        raise ValueError(f"capacity={capacity} < width={f}")
    return {
        "bias": jnp.pad(simple_params["bias"], ((0, pad), (0, 0))),
        "weights1": jnp.pad(simple_params["weights1"], ((0, pad), (0, 0))),
        "weights2": jnp.pad(simple_params["weights2"], ((0, 0), (0, pad))),
    }


class ResBlock(nn.Module):
    """u_{n+1} = u_n + Dense→elu→Dense(u_n)·dt."""

    feature_size: int
    activation: Callable = nn.elu

    @nn.compact
    def __call__(self, u_n, t_n, dt_n):
        u_in = jnp.asarray(u_n)
        f = jnp.atleast_1d(u_in)
        f = nn.Dense(features=self.feature_size)(f)
        f = self.activation(f)
        f = nn.Dense(features=jnp.atleast_1d(u_in).shape[-1])(f)
        return (jnp.atleast_1d(u_in) + f * dt_n).reshape(u_in.shape)


class ResNetBlock(nn.Module):
    """u_{n+1} = u_n + MLP(u_n)·dt with a tuple of hidden widths."""

    size: Sequence[int] | int
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, u_n, t_n, dt_n):
        u_in = jnp.asarray(u_n)
        f = jnp.atleast_1d(u_in)
        in_sz = f.shape[-1]
        sizes = (self.size,) if isinstance(self.size, int) else tuple(self.size)
        for s in sizes:
            f = nn.Dense(features=s)(f)
            f = self.activation(f)
        f = nn.Dense(features=in_sz)(f)
        return (jnp.atleast_1d(u_in) + f * dt_n).reshape(u_in.shape)


class ResNetODE(nn.Module):
    """One ResNetBlock per time step; returns the full trajectory.

    Depth ≡ the time grid: ``dt`` (length = depth) is passed at call time
    (not baked in as a module attribute like the reference — that forced a
    re-init on every refinement, models.py:106-126). All blocks share one
    width spec so their stacked parameters scan.
    """

    width: int
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, u_0, dt):
        u_0 = jnp.atleast_1d(u_0)
        t = jnp.pad(jnp.cumsum(dt), (1, 0))
        scan_block = nn.scan(
            _CarryBlock,
            variable_axes={"params": 0},  # stacked per-step parameters
            split_rngs={"params": True},
            in_axes=0,
            out_axes=0,
        )
        _, ys = scan_block(self.width, self.activation)(u_0, (t[:-1], dt))
        return jnp.concatenate([u_0[None], ys])


class _CarryBlock(nn.Module):
    """ResNetBlock wrapped with a (carry, xs) signature for nn.scan."""

    width: int
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, carry, xs):
        t_n, dt_n = xs
        u_next = ResNetBlock(self.width, self.activation)(carry, t_n, dt_n)
        return u_next, u_next


def resnet_ode_apply(net: nn.Module, params, u_0, dt):
    """Convenience: full-trajectory apply for any per-step net via the
    framework march (march.fd.forward_march_per_step)."""
    from adjoint_ode_adaptivity_tpu.march.fd import forward_march_per_step

    def step(u, t, d, p):
        return net.apply({"params": p}, u, t, d)

    return forward_march_per_step(step, u_0, dt, params)
