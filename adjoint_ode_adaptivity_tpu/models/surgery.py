"""Network surgery: depth insertion (time refinement ≡ new layer) and width
growth (neuron insertion at poorly-fit bias knots).

Reference parity:
- depth: ``adapt`` (python/Main_variable_params.py:165-189) inserts new
  per-step params at the refined index, initialised either as tiny noise
  (1e-8·normal) or a copy of the left neighbour (Main_width_ref.py:201);
  the optimizer state for the new step is freshly initialised.
- width: ``adaptWidth`` (python/Main_width_ref.py:225-312) bins training
  samples by nearest sorted bias, computes per-bin mean loss, and inserts a
  neuron (bias ← bin mean u, weights ← 1e-5) where the bin loss exceeds
  tolerance.

TPU-first: parameters live as *stacked* pytrees with a leading step axis
(depth) and padded feature axes with an active-neuron mask (width), so both
surgeries are pure array scatters at static shapes — jit caches survive
every refinement. Dynamic-shape variants are provided for host-side use and
parity testing.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import jax.random as jrand

__all__ = [
    "insert_step_params",
    "insert_step_params_padded",
    "bin_losses",
    "insert_neuron",
    "grow_width",
]


def insert_step_params(
    params_stacked: Any,
    idx: int,
    *,
    mode: str = "copy_left",
    key: jax.Array | None = None,
    noise_scale: float = 1e-8,
) -> Any:
    """Insert a new step's parameters at position ``idx`` in the stacked
    (leading-axis = depth) parameter pytree. Dynamic shape (depth + 1).

    ``mode``: 'copy_left' duplicates step idx−1 (Main_width_ref.py:201);
    'noise' draws 1e-8·normal (Main_variable_params.py:178).
    """
    def insert(leaf):
        if mode == "copy_left":
            new = leaf[max(idx - 1, 0)]
        elif mode == "noise":
            assert key is not None
            new = noise_scale * jrand.normal(key, leaf.shape[1:], leaf.dtype)
        else:
            raise ValueError(mode)
        return jnp.concatenate([leaf[:idx], new[None], leaf[idx:]], axis=0)

    return jax.tree_util.tree_map(insert, params_stacked)


def insert_step_params_padded(
    params_stacked: Any,
    n_active: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    depth: int | None = None,
    fill: str = "copy_left",
) -> Any:
    """Static-shape depth insertion on padded stacks: shift steps ≥ idx right
    by one and fill slot idx (``copy_left``: duplicate step idx−1 — the
    Main_width_ref.py:201 init; ``zero``: zeros — fresh optimizer moments).
    The stack must be allocated with spare depth; steps ≥ n_active+1 are
    inert padding (their dt is 0).

    Leaves whose leading dimension differs from the stack depth (e.g. adam's
    scalar ``count``) pass through untouched; ``depth`` defaults to the
    largest leading dim among leaves.
    """
    leaves = jax.tree_util.tree_leaves(params_stacked)
    if depth is None:
        depth = max((l.shape[0] for l in leaves if l.ndim >= 1), default=0)

    def insert(leaf):
        if leaf.ndim < 1 or leaf.shape[0] != depth:
            return leaf  # non-stacked state (e.g. optax count)
        pos = jnp.arange(depth)
        shifted = leaf[jnp.maximum(pos - 1, 0)]
        take_orig = (pos < idx)[(...,) + (None,) * (leaf.ndim - 1)]
        out = jnp.where(take_orig, leaf, shifted)
        if fill == "zero":
            is_new = (pos == idx)[(...,) + (None,) * (leaf.ndim - 1)]
            out = jnp.where(is_new, jnp.zeros_like(out), out)
        return out

    return jax.tree_util.tree_map(insert, params_stacked)


def bin_losses(u_samples: jnp.ndarray, losses: jnp.ndarray, bias: jnp.ndarray):
    """Assign each sample to the bin of its nearest (sorted) bias knot and
    return (counts, mean u per bin, mean loss per bin) over len(bias)+1 bins.

    Vectorised segment-sum version of ``fillBins`` + the vmapped
    ``layerLoss`` accumulation (Main_width_ref.py:148-159, 214-222):
    bin k = i + (sgn>0 ? 0 : −1) + 1 where i is the argmin-|u−bias| index.
    """
    d = jnp.square(u_samples[:, None] - bias[None, :])
    i = jnp.argmin(d, axis=1)
    sgn = jnp.sign(u_samples - bias[i])
    k = i + jnp.where(sgn > 0, 0, -1) + 1
    n_bins = bias.shape[0] + 1
    counts = jax.ops.segment_sum(jnp.ones_like(u_samples), k, n_bins)
    u_sum = jax.ops.segment_sum(u_samples, k, n_bins)
    l_sum = jax.ops.segment_sum(losses, k, n_bins)
    safe = jnp.where(counts > 0, counts, 1.0)
    return counts, u_sum / safe, l_sum / safe


def insert_neuron(
    bias: jnp.ndarray,
    weights_in: jnp.ndarray,
    weights_out: jnp.ndarray | None,
    k: jnp.ndarray,
    new_bias: jnp.ndarray,
    new_weight: float = 1e-5,
):
    """Insert one neuron at bin index ``k``: shift knots ≥ k right, set
    bias[k] ← new_bias, incoming/outgoing weights ← ``new_weight``
    (Main_width_ref.py:256-266). Shapes grow by one (dynamic variant).

    ``bias``: (F,), ``weights_in``: (F, d) rows per neuron,
    ``weights_out``: (d, F) columns per neuron or None.
    """
    f = bias.shape[0]
    k = jnp.clip(k, 0, f)
    bias_new = jnp.concatenate([bias[:k], new_bias[None], bias[k:]])
    w_in_new = jnp.concatenate(
        [weights_in[:k], jnp.full((1,) + weights_in.shape[1:], new_weight, weights_in.dtype), weights_in[k:]],
        axis=0,
    )
    if weights_out is None:
        return bias_new, w_in_new, None
    w_out_new = jnp.concatenate(
        [weights_out[:, :k], jnp.full(weights_out.shape[:1] + (1,), new_weight, weights_out.dtype), weights_out[:, k:]],
        axis=1,
    )
    return bias_new, w_in_new, w_out_new


def grow_width(
    params: dict,
    u_samples: jnp.ndarray,
    losses: jnp.ndarray,
    *,
    tol: float = 5e-5,
    new_weight: float = 1e-5,
) -> tuple[dict, bool]:
    """Width-growth step for one ResBlockSimple layer's parameters
    {'bias': (F,d), 'weights1': (F,d), 'weights2': (d,F)}.

    Sorts by bias, bins the samples, and — if the worst bin's mean loss
    exceeds ``tol`` — inserts a neuron there (bias ← bin mean u, weights ←
    1e-5). Returns (new_params, inserted?). Scalar state (d=1) as in the
    reference.
    """
    bias = params["bias"][:, 0]
    order = jnp.argsort(bias)
    bias = bias[order]
    w1 = params["weights1"][order]
    w2 = params["weights2"][:, order]

    counts, u_bins, l_bins = bin_losses(u_samples, losses, bias)
    k = int(jnp.argmax(l_bins))
    if float(l_bins[k]) <= tol:
        return (
            {"bias": bias[:, None], "weights1": w1, "weights2": w2},
            False,
        )
    b_new, w1_new, w2_new = insert_neuron(
        bias, w1, w2, jnp.asarray(k), u_bins[k], new_weight
    )
    return {"bias": b_new[:, None], "weights1": w1_new, "weights2": w2_new}, True
