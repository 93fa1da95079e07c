"""Discretization export/import — the ``Save_to_1D_global_data.m`` bridge.

The reference dumps all DG globals (Dr, LIFT, vmaps, rk4 coefficients, …)
to text files as a MATLAB→Python data bridge (utils/Save_to_1D_global_data.m).
Here the full :class:`Discretization1D` pytree round-trips through one
``.npz`` (plus optional per-field ``.txt`` for eyeballing/diffing against
the MATLAB dumps).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from adjoint_ode_adaptivity_tpu.march.lsrk import RK4A, RK4B, RK4C
from adjoint_ode_adaptivity_tpu.ops.mesh import Discretization1D

__all__ = ["save_discretization", "load_discretization"]

_SCALARS = ("n", "np_", "k", "map_i", "map_o", "vmap_i", "vmap_o")


def save_discretization(
    disc: Discretization1D, path: str | Path, text: bool = False
) -> Path:
    """Write the discretization (+ LSRK coefficients) to ``path`` (.npz)."""
    path = Path(path)
    data = disc._asdict()
    data.update(rk4a=RK4A, rk4b=RK4B, rk4c=RK4C)
    np.savez(path, **data)
    if text:
        txt_dir = path.with_suffix("")
        txt_dir.mkdir(exist_ok=True)
        for name, val in data.items():
            np.savetxt(txt_dir / f"{name}.txt", np.atleast_2d(val))
    return path if path.suffix == ".npz" else path.with_suffix(path.suffix + ".npz")


def load_discretization(path: str | Path) -> Discretization1D:
    with np.load(Path(path)) as data:
        fields = {}
        for name in Discretization1D._fields:
            val = data[name]
            fields[name] = int(val) if name in _SCALARS else val
    return Discretization1D(**fields)
