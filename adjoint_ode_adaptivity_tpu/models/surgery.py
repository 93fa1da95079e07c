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
    "sort_neurons_padded",
    "layer_knot_losses",
    "bin_losses_padded",
    "insert_neuron_padded",
    "grow_width_padded",
    "grow_width_all_steps",
    "zero_step_moments",
]

_BIG = 1e30  # sentinel distance for inactive neuron slots


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


# --------------------------------------------------------------------------
# Static-shape (padded-capacity) width machinery: parameters are allocated at
# a fixed neuron capacity F; ``n_active`` counts the live slots (always the
# first n_active, sorted by bias). Every operation below is a jnp.where /
# gather at static shapes, so the whole growth step jits once and the train
# step never retraces — the TPU-native form of adaptWidth
# (Main_width_ref.py:225-312), preserving every trained weight in place.
# --------------------------------------------------------------------------


def sort_neurons_padded(params_l: dict, n_active: jnp.ndarray) -> dict:
    """Re-establish the sorted-by-bias invariant for one layer's padded
    parameters {'bias': (F,d), 'weights1': (F,d), 'weights2': (d,F)}:
    active slots first, ascending bias (training can unsort them — the
    reference argsorts on every adaptWidth call, Main_width_ref.py:230-233).
    """
    f = params_l["bias"].shape[0]
    active = jnp.arange(f) < n_active
    key = jnp.where(active, params_l["bias"][:, 0], _BIG)
    order = jnp.argsort(key)
    return {
        "bias": params_l["bias"][order],
        "weights1": params_l["weights1"][order],
        "weights2": params_l["weights2"][:, order],
    }


def layer_knot_losses(u_samples: jnp.ndarray, bias: jnp.ndarray, n_active):
    """Masked ``layerLoss`` (Main_width_ref.py:146-150): per sample, the
    squared distance to the nearest *active* bias knot. ``bias`` is the 1-d
    knot vector (F,). Returns (B,) — the hidden-layer refinement signal."""
    f = bias.shape[0]
    active = jnp.arange(f) < n_active
    d = jnp.square(u_samples[:, None] - bias[None, :])
    d = jnp.where(active[None, :], d, _BIG)
    return jnp.min(d, axis=1)


def bin_losses_padded(
    u_samples: jnp.ndarray,
    losses: jnp.ndarray,
    bias: jnp.ndarray,
    n_active,
):
    """Static-shape ``fillBins`` (Main_width_ref.py:214-222) over F+1 bin
    slots; bins beyond ``n_active + 1`` are dead (count 0, loss −BIG so
    argmax never picks them). ``bias`` must be sorted with actives first."""
    f = bias.shape[0]
    active = jnp.arange(f) < n_active
    d = jnp.square(u_samples[:, None] - bias[None, :])
    d = jnp.where(active[None, :], d, _BIG)
    i = jnp.argmin(d, axis=1)
    sgn = jnp.sign(u_samples - bias[i])  # bias is the 1-d knot vector (F,)
    k = i + jnp.where(sgn > 0, 0, -1) + 1
    n_bins = f + 1
    counts = jax.ops.segment_sum(jnp.ones_like(u_samples), k, n_bins)
    u_sum = jax.ops.segment_sum(u_samples, k, n_bins)
    l_sum = jax.ops.segment_sum(losses, k, n_bins)
    safe = jnp.where(counts > 0, counts, 1.0)
    valid = jnp.arange(n_bins) <= n_active
    l_mean = jnp.where(valid, l_sum / safe, -_BIG)
    return counts, u_sum / safe, l_mean


def insert_neuron_padded(
    params_l: dict,
    n_active: jnp.ndarray,
    k: jnp.ndarray,
    new_bias: jnp.ndarray,
    new_weight: float = 1e-5,
    do_insert=True,
) -> tuple[dict, jnp.ndarray]:
    """Static-shape neuron insertion at sorted position ``k``: slots ≥ k
    shift right by one (the last padding slot falls off), slot k gets
    (bias ← new_bias, W1 row ← new_weight, W2 column ← new_weight), and
    ``n_active`` bumps — Main_width_ref.py:283-300 without the reshape.
    ``do_insert=False`` makes the whole thing an exact identity (so the
    growth decision can be a traced bool)."""
    do = jnp.asarray(do_insert) & (n_active < params_l["bias"].shape[0])

    f = params_l["bias"].shape[0]
    pos = jnp.arange(f)

    def shift_rows(leaf, new_row):
        new_row = jnp.asarray(new_row).astype(leaf.dtype)  # keep param dtype
        shifted = leaf[jnp.maximum(pos - 1, 0)]
        out = jnp.where((pos < k)[:, None], leaf, shifted)
        out = jnp.where((pos == k)[:, None], new_row, out)
        return jnp.where(do, out, leaf)

    d = params_l["bias"].shape[1]
    bias = shift_rows(params_l["bias"], jnp.broadcast_to(new_bias, (d,)))
    w1 = shift_rows(params_l["weights1"], jnp.full((d,), new_weight))
    w2t = shift_rows(
        params_l["weights2"].T, jnp.full((d,), new_weight)
    )
    return (
        {"bias": bias, "weights1": w1, "weights2": w2t.T},
        n_active + do.astype(n_active.dtype),
    )


def grow_width_padded(
    params_l: dict,
    n_active: jnp.ndarray,
    u_samples: jnp.ndarray,
    losses: jnp.ndarray,
    *,
    tol: float = 5e-5,
    new_weight: float = 1e-5,
):
    """One layer's full adaptWidth step at static shapes, jittable: sort by
    bias, bin the samples, and insert a neuron at the worst bin (bias ← bin
    mean u) iff its mean loss exceeds ``tol`` and capacity remains.

    Returns (params_l, n_active, inserted) — ``inserted`` is a traced bool.
    """
    srt = sort_neurons_padded(params_l, n_active)
    _, u_bins, l_bins = bin_losses_padded(
        u_samples, losses, srt["bias"][:, 0], n_active
    )
    k = jnp.argmax(l_bins)
    do = l_bins[k] > tol
    params_new, n_new = insert_neuron_padded(
        srt, n_active, k, u_bins[k], new_weight, do_insert=do
    )
    inserted = n_new > n_active
    # no growth ⇒ bit-identical parameters (not even re-sorted), so other
    # layers' trained weights and optimizer moments stay aligned exactly
    params_out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(inserted, a, b), params_new, params_l
    )
    return params_out, n_new, inserted


def grow_width_all_steps(
    params_stacked: dict,
    n_active: jnp.ndarray,
    u_states: jnp.ndarray,
    trues: jnp.ndarray,
    *,
    tol: float = 5e-5,
    new_weight: float = 1e-5,
):
    """Reference-faithful adaptWidth over *every* step's parameters in place
    (Main_width_ref.py:225-312): hidden layers bin the per-layer knot losses
    ``min_j (u_l − b_j)²`` of the state entering the layer
    (``layerLoss`` :146-150); the last layer bins the terminal prediction
    error by the state entering it (``lastLayerLoss`` :153-157). Each layer
    grows independently; all trained weights of every step are preserved.

    ``params_stacked``: stacked layer pytree with leading axis L;
    ``n_active``: (L,) int; ``u_states``: (B, L+1) trajectory states;
    ``trues``: (B,) terminal truth. Returns (params, n_active, inserted(L,)).
    One vmapped, jittable scatter — no retraces, no shape changes.
    """
    l_steps = params_stacked["bias"].shape[0]
    u_in = jnp.swapaxes(u_states[:, :-1], 0, 1)  # (L, B) states entering layer l
    u_last = u_states[:, -1]
    pred_losses = jnp.square(u_last - trues)  # (B,)
    is_last = jnp.arange(l_steps) == l_steps - 1

    def per_step(params_l, n_a, u_l, last):
        # knot losses are permutation-invariant over the active slots, so
        # the unsorted bias works; grow_width_padded sorts internally
        knot = layer_knot_losses(u_l, params_l["bias"][:, 0], n_a)
        losses = jnp.where(last, pred_losses, knot)
        return grow_width_padded(
            params_l, n_a, u_l, losses, tol=tol, new_weight=new_weight
        )

    return jax.vmap(per_step)(params_stacked, n_active, u_in, is_last)


def zero_step_moments(opt_state: Any, inserted: jnp.ndarray) -> Any:
    """Fresh optimizer moments for the steps that grew: the reference
    re-inits the grown layer's optimizer state (Main_width_ref.py:302-303,
    266-267); with one stacked optimizer, that is zeroing the grown steps'
    moment slices (adam moments init to zero). Leaves without the stacked
    leading axis (e.g. the shared adam ``count`` — a documented deviation:
    the reference keeps per-layer counts) pass through."""
    l_steps = inserted.shape[0]

    def z(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == l_steps:
            sel = inserted.reshape((l_steps,) + (1,) * (leaf.ndim - 1))
            return jnp.where(sel, jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree_util.tree_map(z, opt_state)
