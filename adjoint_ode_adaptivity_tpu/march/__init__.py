"""Forward solvers (L1): scan-based time marching."""

from adjoint_ode_adaptivity_tpu.march.fd import (
    euler_step,
    forward_march,
    forward_march_per_step,
    heun_step,
    rk4_step,
    times_from_dt,
)
from adjoint_ode_adaptivity_tpu.march.dg_time import (
    DGMarchResult,
    DGTimeOperators,
    dg_march,
    dg_march_differentiable,
    dg_time_operators,
    make_dg_slab_solver,
)
from adjoint_ode_adaptivity_tpu.march.dg_mixed import (
    MixedDGTimeOperators,
    dg_march_mixed,
    dg_march_mixed_differentiable,
    dg_time_operators_mixed,
    make_dg_slab_solver_mixed,
)
from adjoint_ode_adaptivity_tpu.march.dg_batched import (
    DGBatchedAdjointResult,
    DGBatchedResult,
    dg_adjoint_march_batched,
    dg_element_functional_batched,
    dg_estimate_batched,
    dg_march_batched,
    dg_march_batched_differentiable,
    make_dg_slab_solver_batched,
    solve_small,
)
from adjoint_ode_adaptivity_tpu.march.burgers import (
    BurgersOperators,
    burgers_march,
    burgers_operators,
    burgers_rhs,
)
from adjoint_ode_adaptivity_tpu.march.advec import (
    AdvecOperators,
    advec_march,
    advec_operators,
    advec_rhs,
    cfl_dt,
)

__all__ = [
    "euler_step",
    "heun_step",
    "rk4_step",
    "forward_march",
    "forward_march_per_step",
    "times_from_dt",
    "DGTimeOperators",
    "DGMarchResult",
    "dg_time_operators",
    "dg_march",
    "dg_march_differentiable",
    "make_dg_slab_solver",
    "MixedDGTimeOperators",
    "dg_time_operators_mixed",
    "dg_march_mixed",
    "dg_march_mixed_differentiable",
    "make_dg_slab_solver_mixed",
    "DGBatchedResult",
    "DGBatchedAdjointResult",
    "dg_march_batched",
    "dg_adjoint_march_batched",
    "dg_element_functional_batched",
    "dg_estimate_batched",
    "dg_march_batched_differentiable",
    "make_dg_slab_solver_batched",
    "solve_small",
    "AdvecOperators",
    "advec_operators",
    "advec_rhs",
    "advec_march",
    "cfl_dt",
    "BurgersOperators",
    "burgers_operators",
    "burgers_rhs",
    "burgers_march",
]
