"""Complex-step Jacobian verification — the matlab/test_jacobian.m check.

The reference validates its hand-assembled DG Newton Jacobian against
imaginary-step directional derivatives (30 random draws × 13 step sizes).
Here: the framework's AD-assembled slab Jacobian must match the complex-step
derivative of the slab residual to near machine precision for small h, and
the error curve must be flat in h (the hallmark of the complex step — no
subtractive cancellation).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adjoint_ode_adaptivity_tpu.march.dg_time import (
    _slab_jacobian,
    _slab_residual,
    dg_time_operators,
)

F_SIN = lambda u, t: jnp.sin(u)


class TestComplexStepJacobian:
    @pytest.mark.parametrize("h", [1e-8, 1e-12, 1e-20])
    def test_imaginary_step_matches_assembled_jacobian(self, h):
        ops = dg_time_operators(2, 8)
        rng = np.random.default_rng(42)
        dtype = jnp.float64
        errs = []
        for _ in range(10):
            u = rng.uniform(size=ops.np_)
            d = rng.uniform(size=ops.np_)
            d = d / np.linalg.norm(d)
            jac = np.asarray(_slab_jacobian(ops, F_SIN, jnp.asarray(u), 0.3, 0.1, dtype))
            # imaginary-step directional derivative of the residual
            u_c = jnp.asarray(u + 1j * h * d, jnp.complex128)
            r_c = _slab_residual(ops, F_SIN, u_c, 1.0, 0.3, 0.1, jnp.complex128)
            dr_imstep = np.imag(np.asarray(r_c)) / h
            ref = jac @ d
            errs.append(np.linalg.norm(dr_imstep - ref) / np.linalg.norm(ref))
        # complex step has no cancellation: error at machine epsilon for all h
        assert max(errs) < 1e-12, (h, errs)
