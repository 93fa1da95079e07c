"""Spectral-element primitives (L0 layer): Jacobi polynomials, quadrature,
Vandermonde/differentiation/lift operators, 1D mesh + connectivity, limiters,
and Pallas TPU kernels for the fused DG right-hand side."""

from adjoint_ode_adaptivity_tpu.ops.jacobi import (
    grad_jacobi_p,
    jacobi_gl,
    jacobi_gq,
    jacobi_p,
    radau_points,
)
from adjoint_ode_adaptivity_tpu.ops.limiters import (
    minmod,
    minmod_tvb,
    slope_limit_1,
    slope_limit_lin,
    slope_limit_n,
)
from adjoint_ode_adaptivity_tpu.ops.mesh import (
    Discretization1D,
    build_maps_1d,
    connect_1d,
    mesh_gen_1d,
    startup_1d,
)
from adjoint_ode_adaptivity_tpu.ops.operators import (
    dmatrix_1d,
    element_operators,
    grad_vandermonde_1d,
    interp_matrix_1d,
    lift_1d,
    mass_matrix,
    stiffness_matrix,
    vandermonde_1d,
)

__all__ = [
    "jacobi_p",
    "grad_jacobi_p",
    "jacobi_gq",
    "jacobi_gl",
    "radau_points",
    "vandermonde_1d",
    "grad_vandermonde_1d",
    "dmatrix_1d",
    "lift_1d",
    "mass_matrix",
    "stiffness_matrix",
    "interp_matrix_1d",
    "element_operators",
    "mesh_gen_1d",
    "connect_1d",
    "build_maps_1d",
    "Discretization1D",
    "startup_1d",
    "minmod",
    "minmod_tvb",
    "slope_limit_lin",
    "slope_limit_1",
    "slope_limit_n",
]
