"""Forward solvers (L1): scan-based time marching."""

from adjoint_ode_adaptivity_tpu.march.fd import (
    euler_step,
    forward_march,
    forward_march_per_step,
    times_from_dt,
)

__all__ = ["euler_step", "forward_march", "forward_march_per_step", "times_from_dt"]
