"""Adjoint solvers and error estimation (L2/L3)."""

from adjoint_ode_adaptivity_tpu.adjoint.discrete import (
    adjoint_dense_oracle,
    adjoint_march,
    adjoint_march_per_step,
)
from adjoint_ode_adaptivity_tpu.adjoint.estimate import (
    coarse_indicator,
    error_estimate,
    interp_to_fine,
    refine_all,
    residual,
)

__all__ = [
    "adjoint_march",
    "adjoint_march_per_step",
    "adjoint_dense_oracle",
    "refine_all",
    "interp_to_fine",
    "residual",
    "error_estimate",
    "coarse_indicator",
]
