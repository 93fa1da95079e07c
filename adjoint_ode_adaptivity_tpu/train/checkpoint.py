"""Orbax checkpointing of training + adaptivity state.

The reference never saves anything — a 10,000-epoch run that dies restarts
from scratch (SURVEY.md §5). Here the full (params, opt_state, times,
n_active, step) pytree round-trips through orbax; restore is shape-checked
against an abstract template.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "restore_checkpoint_raw",
    "latest_step",
]


def _manager(directory: str | Path, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        Path(directory).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str | Path, step: int, state: Any) -> None:
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str | Path) -> int | None:
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint_raw(directory: str | Path, step: int | None = None) -> Any:
    """Restore a checkpoint WITHOUT a shape template — returns the pytree
    as saved (dicts/lists of arrays). Used by the adaptive-loop resume
    path, whose history length (and, in dynamic modes, array shapes) vary
    per iteration and therefore cannot be templated from a fresh state."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            mgr.close()
            raise FileNotFoundError(f"no checkpoint under {directory}")
    state = mgr.restore(step, args=ocp.args.StandardRestore())
    mgr.close()
    return state


def restore_checkpoint(directory: str | Path, template: Any, step: int | None = None) -> Any:
    """Restore into the shape/dtype structure of ``template`` (an example
    pytree, e.g. the freshly initialised state)."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            mgr.close()
            raise FileNotFoundError(f"no checkpoint under {directory}")
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return state
