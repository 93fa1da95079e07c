"""Adjoint solvers and error estimation (L2/L3)."""

from adjoint_ode_adaptivity_tpu.adjoint.discrete import (
    adjoint_march_linearized,
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
from adjoint_ode_adaptivity_tpu.adjoint.dg_time import (
    continuous_err_contribution,
    dg_adjoint_march,
    dg_adjoint_reconstruct,
    dg_awr_from_adjoint,
    dg_element_functional,
)
from adjoint_ode_adaptivity_tpu.adjoint.dg_mixed import (
    MixedAdjointInterp,
    MixedRadauInterp,
    dg_adjoint_interp_mixed,
    dg_adjoint_march_mixed,
    dg_adjoint_reconstruct_mixed,
    dg_adjoint_solve_low_mixed,
    dg_awr_from_adjoint_mixed,
    dg_element_functional_mixed,
    dg_radau_interp_mixed,
)
from adjoint_ode_adaptivity_tpu.adjoint.advec import (
    advec_adjoint_march,
    advec_fwd_adj_estimate,
    terminal_integral_cotangent,
)
from adjoint_ode_adaptivity_tpu.adjoint.revolve_vjp import (
    checkpointed_advec_march,
    checkpointed_march,
    execute_revolve,
)

__all__ = [
    "dg_adjoint_march",
    "dg_adjoint_reconstruct",
    "dg_awr_from_adjoint",
    "dg_element_functional",
    "continuous_err_contribution",
    "MixedAdjointInterp",
    "MixedRadauInterp",
    "dg_adjoint_interp_mixed",
    "dg_adjoint_march_mixed",
    "dg_adjoint_reconstruct_mixed",
    "dg_adjoint_solve_low_mixed",
    "dg_awr_from_adjoint_mixed",
    "dg_element_functional_mixed",
    "dg_radau_interp_mixed",
    "advec_adjoint_march",
    "advec_fwd_adj_estimate",
    "terminal_integral_cotangent",
    "adjoint_march",
    "checkpointed_march",
    "checkpointed_advec_march",
    "execute_revolve",
    "adjoint_march_linearized",
    "adjoint_march_per_step",
    "adjoint_dense_oracle",
    "refine_all",
    "interp_to_fine",
    "residual",
    "error_estimate",
    "coarse_indicator",
]
