"""Device-mesh construction and sharding helpers.

The reference's only scale-out is a SLURM job farm of independent processes
(SURVEY.md §2.7) — zero inter-process communication. The TPU-native
replacement: a ``jax.sharding.Mesh`` over ICI-connected chips with
- ``data``  : the IC/seed ensemble axis (pure data parallel, the axis the
              reference vmapped up to 100k wide),
- ``model`` : hidden-width sharding of the network blocks (tensor parallel),
- ``space`` : DG element axis with ppermute halo exchange (spatial/sequence
              parallel) — see parallel/dg_shard.py.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_along", "replicate", "P", "Mesh", "NamedSharding"]


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh from {axis: size}; one size may be −1 (inferred).

    Default: all devices on a single ``data`` axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axes is None:
        axes = {"data": n}
    names = tuple(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total > n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} devices, have {n}")
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, names)


def shard_along(x, mesh: Mesh, axis_name: str, dim: int = 0):
    """Place ``x`` sharded along mesh axis ``axis_name`` on array dim ``dim``."""
    spec = [None] * x.ndim
    spec[dim] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(x, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), x
    )
