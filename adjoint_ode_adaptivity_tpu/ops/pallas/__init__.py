"""Pallas TPU kernels for the DG hot loops."""

from adjoint_ode_adaptivity_tpu.ops.pallas.burgers import (
    make_pallas_burgers_march,
)

from adjoint_ode_adaptivity_tpu.ops.pallas.fd_ensemble import (
    make_pallas_fd_ensemble,
)
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
    PallasAdvecConfig,
    make_pallas_advec_adjoint,
    make_pallas_advec_march,
    make_pallas_fwd_adj_estimate,
    make_pallas_fwd_adj_estimate_grid,
    make_pallas_fwd_adj_estimate_grid_batched,
)

__all__ = [
    "PallasAdvecConfig",
    "make_pallas_advec_march",
    "make_pallas_advec_adjoint",
    "make_pallas_fwd_adj_estimate",
    "make_pallas_fwd_adj_estimate_grid",
    "make_pallas_fwd_adj_estimate_grid_batched",
    "make_pallas_fd_ensemble",
    "make_pallas_burgers_march",
]
