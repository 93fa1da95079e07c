"""Adaptivity policies: argmax bisection of the time grid, plateau
detection, and the width-vs-depth choice.

Reference parity:
- bisection insert (python/Main_finite_difference.py:336-343,
  factory.py:329-334, Main_no_matrix_detect_complex.py:369-377): insert the
  midpoint of the step with the largest error contribution.
- plateau ("detect") trigger (Main_no_matrix_detect_complex.py:271-282):
  quadratic fit to log-loss history; refine when the degree-1,2 coefficients
  are below tolerance and a new loss floor is reached.
- width-vs-depth policy (Main_width_ref.py:487-500): refine depth only when
  the relative loss improvement over a window falls below 10%.

TPU-first: the bisection operates on *padded* grids — ``times`` has a static
maximum length, active nodes ``0..n_active−1``, and padding repeats the final
time so that ``dt = diff(times)`` is zero there. Zero-dt Euler steps are
identity maps, zero-dt quadrature contributes nothing, so every downstream
kernel (march/adjoint/estimate) runs unmodified at a fixed compiled shape: a
refinement changes data, never shapes — no recompilation across the adaptive
loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "pad_times",
    "bisect_refine",
    "bisect_refine_padded",
    "bisect_refine_masked",
    "bisect_refine_padded_masked",
    "coarsen_merge",
    "coarsen_merge_padded",
    "plateau_detect",
    "should_refine_depth",
]


def pad_times(times: jnp.ndarray, max_nodes: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pad a node-time vector to ``max_nodes`` by repeating the final time.

    Returns (times_padded, n_active) where ``n_active`` counts real *steps*
    (= real nodes − 1).
    """
    n_nodes = times.shape[0]
    if n_nodes > max_nodes:
        raise ValueError(f"times has {n_nodes} nodes > max_nodes={max_nodes}")
    pad = jnp.full((max_nodes - n_nodes,), times[-1], dtype=times.dtype)
    return jnp.concatenate([times, pad]), jnp.asarray(n_nodes - 1, dtype=jnp.int32)


def bisect_refine(times: jnp.ndarray, err_steps: jnp.ndarray) -> jnp.ndarray:
    """Dynamic-shape bisection (host-side, shape grows by one).

    ref_idx = argmax(err) + 1; the midpoint of (times[ref_idx−1],
    times[ref_idx]) is inserted — exactly Main_finite_difference.py:336-341.
    """
    ref_idx = jnp.argmax(err_steps) + 1
    mid = (times[ref_idx - 1] + times[ref_idx]) / 2.0
    return jnp.concatenate([times[:ref_idx], mid[None], times[ref_idx:]])


def bisect_refine_padded(
    times: jnp.ndarray, n_active: jnp.ndarray, err_steps: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape bisection on a padded grid (jit-compiled scatter).

    ``times``: (max_nodes,) padded; ``err_steps``: (max_nodes−1,) with zeros
    in the padding (zero-dt steps have zero residual, so no masking needed —
    padding can never win the argmax unless all active errors are exactly 0).

    The insert shifts ``times[ref_idx:]`` right by one and writes the
    midpoint, all via index arithmetic at fixed shape. The final active node
    overwrites the first padding slot; remaining padding still repeats the
    final time, preserving the padding invariant. A full grid
    (``n_active + 2 > max_nodes`` after insert) is a guarded no-op — the
    shift would otherwise push the final-time node off the array.
    """
    max_nodes = times.shape[0]
    ref_idx = jnp.argmax(err_steps) + 1
    mid = (times[ref_idx - 1] + times[ref_idx]) / 2.0
    idx = jnp.arange(max_nodes)
    shifted = times[jnp.maximum(idx - 1, 0)]
    times_new = jnp.where(idx < ref_idx, times, jnp.where(idx == ref_idx, mid, shifted))
    do = n_active + 2 <= max_nodes
    times_new = jnp.where(do, times_new, times)
    return times_new, n_active + do.astype(n_active.dtype)


def bisect_refine_masked(
    times: jnp.ndarray, err_steps: jnp.ndarray, blocked_mask: jnp.ndarray
) -> tuple[jnp.ndarray, int]:
    """Bisection with intervals masked out (backtrack schedules): the
    argmax runs over unblocked intervals only. Returns (new_times, ref_idx)
    with ref_idx the *interval* index that was bisected."""
    masked = jnp.where(blocked_mask, -jnp.inf, err_steps)
    interval = int(jnp.argmax(masked))
    ref_idx = interval + 1
    mid = (times[ref_idx - 1] + times[ref_idx]) / 2.0
    return (
        jnp.concatenate([times[:ref_idx], mid[None], times[ref_idx:]]),
        interval,
    )


def bisect_refine_padded_masked(
    times: jnp.ndarray,
    n_active: jnp.ndarray,
    err_steps: jnp.ndarray,
    blocked: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-shape masked bisection for backtrack schedules: argmax over
    active, unblocked intervals; the blocked mask shifts with the insert
    (both children of the bisected interval start unblocked).

    Returns (times_new, n_active_new, blocked_new, interval). A full grid
    (insert would exceed ``max_nodes``) is a guarded no-op, like
    :func:`bisect_refine_padded`.
    """
    max_nodes = times.shape[0]
    step_idx = jnp.arange(max_nodes - 1)
    valid = (step_idx < n_active) & ~blocked
    masked = jnp.where(valid, err_steps, -jnp.inf)
    interval = jnp.argmax(masked)
    ref_idx = interval + 1
    mid = (times[ref_idx - 1] + times[ref_idx]) / 2.0
    idx = jnp.arange(max_nodes)
    shifted_t = times[jnp.maximum(idx - 1, 0)]
    times_new = jnp.where(
        idx < ref_idx, times, jnp.where(idx == ref_idx, mid, shifted_t)
    )
    shifted_b = blocked[jnp.maximum(step_idx - 1, 0)]
    blocked_new = jnp.where(step_idx <= interval, blocked, shifted_b)
    blocked_new = jnp.where(step_idx == interval + 1, False, blocked_new)
    do = n_active + 2 <= max_nodes
    times_new = jnp.where(do, times_new, times)
    blocked_new = jnp.where(do, blocked_new, blocked)
    return times_new, n_active + do.astype(n_active.dtype), blocked_new, interval


@jax.jit
def coarsen_merge_padded(
    times: jnp.ndarray,
    n_active: jnp.ndarray,
    err_steps: jnp.ndarray,
    blocked: jnp.ndarray,
    coarsen_tol: float,
):
    """Static-shape coarsening: merge the adjacent active step pair with the
    smallest combined contribution when it is below ``coarsen_tol`` (shift-
    everything after the dropped node left by one; padding still repeats the
    final time). The positional blocked-mask output is kept for API
    compatibility but the padded backtrack loop now rebuilds its mask from
    (t_l, t_r) keys on the host (run_adaptive_fd_backtrack_padded) — the
    keyed semantics decide the merged interval's blocked status, exactly
    like the dynamic loop. Jitted: one dispatch per host-loop call.

    Returns (times_new, n_active_new, blocked_new, merged?).
    """
    max_nodes = times.shape[0]
    step_idx = jnp.arange(max_nodes - 1)
    pair_valid = step_idx + 1 < n_active
    pair_sums = err_steps + jnp.where(
        pair_valid, err_steps[jnp.minimum(step_idx + 1, max_nodes - 2)], jnp.inf
    )
    pair_sums = jnp.where(pair_valid, pair_sums, jnp.inf)
    k = jnp.argmin(pair_sums)
    do = (pair_sums[k] < coarsen_tol) & (n_active >= 2)

    idx = jnp.arange(max_nodes)
    shifted_t = times[jnp.minimum(idx + 1, max_nodes - 1)]
    times_new = jnp.where(idx <= k, times, shifted_t)
    times_new = jnp.where(do, times_new, times)
    shifted_b = blocked[jnp.minimum(step_idx + 1, max_nodes - 2)]
    blocked_new = jnp.where(step_idx < k, blocked, shifted_b)
    blocked_new = jnp.where(step_idx == k, False, blocked_new)
    blocked_new = jnp.where(do, blocked_new, blocked)
    return times_new, n_active - do.astype(n_active.dtype), blocked_new, do


def coarsen_merge(
    times: jnp.ndarray, err_steps: jnp.ndarray, coarsen_tol: float
) -> jnp.ndarray:
    """Remove the interior node between the two adjacent steps with the
    smallest combined error contribution, when that sum is below
    ``coarsen_tol`` (the inverse of bisection — the reference never
    coarsens, so over-refined regions stay refined forever).

    Returns the (possibly shortened) node vector.
    """
    if err_steps.shape[0] < 2:
        return times
    pair_sums = err_steps[:-1] + err_steps[1:]
    k = int(jnp.argmin(pair_sums))
    if float(pair_sums[k]) >= coarsen_tol:
        return times
    # drop the shared node between steps k and k+1 (node index k+1)
    return jnp.concatenate([times[: k + 1], times[k + 2 :]])


def plateau_detect(
    loss_hist: jnp.ndarray, min_loss: jnp.ndarray, ref_tol: float = 5e-5
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quadratic-fit plateau detection on the log-loss window.

    Returns (refine?, new_min_loss). Refine when |c2| and |c1| of the
    degree-2 polyfit of log(loss) are below ``ref_tol`` *and* the window mean
    is a new floor (Main_no_matrix_detect_complex.py:274-282).
    """
    n = loss_hist.shape[0]
    x = jnp.arange(n, dtype=loss_hist.dtype)
    y = jnp.log(loss_hist)
    coeffs = jnp.polyfit(x, y, 2)
    flat = (jnp.abs(coeffs[0]) < ref_tol) & (jnp.abs(coeffs[1]) < ref_tol)
    mean_loss = jnp.mean(loss_hist)
    refine = flat & (min_loss > mean_loss)
    new_min = jnp.where(refine, mean_loss, min_loss)
    return refine, new_min


def should_refine_depth(loss_hist: jnp.ndarray, rel_tol: float = 0.1) -> jnp.ndarray:
    """Depth (vs width) refinement trigger: loss has plateaued when the
    relative improvement over the window is below ``rel_tol``
    (Main_width_ref.py:487-500)."""
    return (loss_hist[0] - loss_hist[-1]) / loss_hist[0] < rel_tol
