"""Data-parallel IC/seed ensembles over the device mesh.

The reference vmaps forward/adjoint/error over up to 100,000 initial
conditions on one GPU (Main_variable_params.py:330-341) and farms seeds to
independent SLURM processes. Here the same ensemble axis is sharded across
ICI with ``shard_map``: each device vmaps its shard, means/argmaxes reduce
with ``psum`` — the refinement signal is computed globally without any host
gather.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

__all__ = [
    "ensemble_vmap",
    "ensemble_mean",
    "ensemble_refinement_signal",
    "ensemble_batched",
]


def ensemble_vmap(fn: Callable, mesh: Mesh, axis: str = "data") -> Callable:
    """vmap ``fn`` over a leading ensemble axis sharded across ``axis``.

    ``fn`` maps one IC (and any replicated extras) to a pytree. The wrapped
    function takes (u0s, *extras) with u0s sharded and extras replicated,
    returning per-IC outputs (sharded on the same axis).
    """

    def sharded(u0s, *extras):
        return jax.vmap(lambda u0: fn(u0, *extras))(u0s)

    def wrapper(u0s, *extras):
        in_specs = (P(axis),) + tuple(P() for _ in extras)
        return shard_map(
            sharded, mesh=mesh, in_specs=in_specs, out_specs=P(axis)
        )(u0s, *extras)

    return wrapper


def ensemble_batched(
    batched_fn: Callable, mesh: Mesh, axis: str = "data",
    shard_extras: frozenset | set = frozenset(),
) -> Callable:
    """Shard a NATIVELY-batched ensemble function over the member axis.

    ``ensemble_vmap`` wraps a one-member fn in vmap; this composes a fn
    that is already written over a leading batch axis — e.g. the fused
    Pallas DG-slab pipeline (``ops.pallas.dg_slab``) or the batched XLA
    Newton march (``march.dg_batched``) — under ``shard_map``: each device
    runs its member shard through ``batched_fn`` unchanged. Members are
    independent (the dp axis of Main_variable_params.py:330-341's ensemble
    study), so no collectives are needed; outputs stay member-sharded.

    The wrapped function takes ``(u0s, *extras)`` with ``u0s`` sharded on
    its leading axis and extras replicated — except extras whose position
    is listed in ``shard_extras``, which shard on THEIR leading axis too
    (per-member data riding alongside the members, e.g. the (B, K+1)
    per-member partitions of the per-member adaptive loop). Per-shard
    constraints of ``batched_fn`` apply shard-wise (the Pallas slab
    kernel needs the LOCAL batch — ``B / n_devices`` — to be a multiple
    of 8).
    """

    def wrapper(u0s, *extras):
        in_specs = (P(axis),) + tuple(
            P(axis) if i in shard_extras else P()
            for i in range(len(extras))
        )
        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, and the batched fns this composes are pure dp
        return shard_map(
            batched_fn, mesh=mesh, in_specs=in_specs, out_specs=P(axis),
            check_vma=False,
        )(u0s, *extras)

    return wrapper


def ensemble_mean(fn: Callable, mesh: Mesh, axis: str = "data") -> Callable:
    """Like ensemble_vmap but returns the ensemble mean of fn's outputs,
    reduced across devices with psum (no host gather)."""

    def sharded(u0s, *extras):
        local = jax.vmap(lambda u0: fn(u0, *extras))(u0s)
        local_sum = jax.tree_util.tree_map(lambda x: jnp.sum(x, axis=0), local)
        total = jax.lax.psum(local_sum, axis)
        # global count = local shard size × axis size (both static)
        n = u0s.shape[0] * jax.lax.axis_size(axis)
        return jax.tree_util.tree_map(lambda x: x / n, total)

    def wrapper(u0s, *extras):
        in_specs = (P(axis),) + tuple(P() for _ in extras)
        return shard_map(
            sharded, mesh=mesh, in_specs=in_specs, out_specs=P()
        )(u0s, *extras)

    return wrapper


def ensemble_refinement_signal(
    solve_err: Callable, mesh: Mesh, axis: str = "data"
) -> Callable:
    """Ensemble-averaged refinement signal: mean over all ICs of the
    per-step error indicator, then argmax — the device-side equivalent of
    Main_variable_params.py:330-341. Returns (mean_err_steps, argmax_idx)."""
    mean_fn = ensemble_mean(solve_err, mesh, axis)

    def wrapper(u0s, *extras):
        mean_err = mean_fn(u0s, *extras)
        return mean_err, jnp.argmax(mean_err)

    return wrapper
