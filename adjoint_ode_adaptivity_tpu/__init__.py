"""adjoint_ode_adaptivity_tpu — a TPU-native JAX framework for goal-oriented
(adjoint-weighted-residual) a-posteriori error estimation and adaptive time
refinement of ODE solvers, including neural-network update rules whose depth
(time steps) and width (neurons) grow adaptively.

Re-designed TPU-first from the capabilities of the reference research code
wglao/Adjoint-ODE-Adaptivity (NumPy/MATLAB/flax scripts):

- ``ops``      — nodal spectral-element primitives (Jacobi polynomials,
                 Gauss/Gauss-Lobatto/Radau quadrature, Vandermonde,
                 differentiation/lift operators, 1D mesh + connectivity,
                 slope limiters) built in float64 and staged as static
                 pytrees; Pallas TPU kernels for the fused DG RHS.
- ``march``    — forward time marching as ``lax.scan``: forward-Euler over
                 nonuniform steps, 5-stage low-storage RK4 DG advection,
                 Newton-iterated DG-in-time slab march.
- ``adjoint``  — discrete adjoints as O(N) reverse scans of per-step VJPs
                 (the bidiagonal back-substitution the reference solved
                 densely), adjoint-weighted-residual error estimators,
                 DG-in-time adjoint march and Radau reconstruction.
- ``adapt``    — argmax-bisection time refinement on padded (static-shape)
                 grids, plateau detection, width-vs-depth policies.
- ``models``   — flax ResNet-as-integrator blocks plus depth/width surgery.
- ``train``    — training loops through the differentiable solver, losses,
                 metrics, orbax checkpointing.
- ``parallel`` — ``shard_map`` data-parallel ensembles over a device mesh,
                 element-sharded DG with ``ppermute`` halo exchange.

Nothing here is a port: the reference tells us *what* to compute; every
compute path is designed for XLA/TPU (static shapes, scans, fused kernels).
"""

__version__ = "0.1.0"

from adjoint_ode_adaptivity_tpu import ops  # noqa: F401
