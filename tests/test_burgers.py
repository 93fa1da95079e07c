"""Nonlinear conservation law (Burgers) with minmod limiting."""
import numpy as np
import jax.numpy as jnp
import pytest

from adjoint_ode_adaptivity_tpu.march.burgers import (
    burgers_march,
    burgers_operators,
    burgers_rhs,
)
from adjoint_ode_adaptivity_tpu.ops import startup_1d


class TestBurgers:
    def test_conservation(self):
        """Periodic Burgers conserves the cell-average integral exactly."""
        disc = startup_1d(2, 0.0, 2 * np.pi, 32)
        ops = burgers_operators(disc)
        u0 = jnp.asarray(0.5 + np.sin(disc.x))
        from adjoint_ode_adaptivity_tpu.ops.operators import mass_matrix

        m = jnp.asarray(mass_matrix(disc.v))
        w = jnp.sum(m, axis=0)[:, None] * jnp.asarray(disc.jac)

        def total(u):
            return float(jnp.sum(w * u))

        dt = 5e-4
        u = burgers_march(ops, u0, dt, 400, limiter="n")
        assert abs(total(u) - total(u0)) < 1e-8 * abs(total(u0)) + 1e-10

    def test_smooth_solution_matches_characteristics(self):
        """Pre-shock, Burgers follows characteristics: u(x,t) = u0(x − u t)
        (implicit). Check via a fine-resolution self-consistency."""
        disc = startup_1d(3, 0.0, 2 * np.pi, 48)
        ops = burgers_operators(disc)
        u0 = jnp.asarray(0.5 + 0.2 * np.sin(disc.x))
        dt, t_end = 2e-4, 0.5
        n = int(t_end / dt)
        u = burgers_march(ops, u0, dt, n, limiter="none")
        # exact smooth solution via the characteristic fixed point u = u0(x − u t)
        x = np.asarray(disc.x)
        ue = np.full_like(x, 0.5)
        for _ in range(500):
            ue = 0.5 + 0.2 * np.sin(x - ue * t_end)
        assert np.max(np.abs(np.asarray(u) - ue)) < 2e-4

    def test_shock_stays_bounded_with_limiter(self):
        """Post-shock: the limited solution stays within the initial bounds
        (maximum principle); the unlimited one oscillates beyond them."""
        disc = startup_1d(4, 0.0, 2 * np.pi, 48)
        ops = burgers_operators(disc)
        u0 = jnp.asarray(0.5 + np.sin(disc.x))
        dt = 2e-4
        n = int(2.0 / dt)  # well past shock formation (t_s ≈ 1)
        u_lim = burgers_march(ops, u0, dt, n, limiter="n")
        assert np.isfinite(np.asarray(u_lim)).all()
        overshoot_lim = float(jnp.max(u_lim)) - float(jnp.max(u0))
        undershoot_lim = float(jnp.min(u0)) - float(jnp.min(u_lim))
        assert overshoot_lim < 5e-2 and undershoot_lim < 5e-2

    def test_unlimited_blows_up_limited_survives(self):
        """Past shock formation the unlimited high-order DG march is
        unstable (goes non-finite) while the ΠN-limited march stays bounded
        — the reason the limiter toolkit exists."""
        disc = startup_1d(4, 0.0, 2 * np.pi, 48)
        ops = burgers_operators(disc)
        u0 = jnp.asarray(0.5 + np.sin(disc.x))
        dt = 2e-4
        n = int(1.5 / dt)
        u_lim = burgers_march(ops, u0, dt, n, limiter="n")
        u_raw = burgers_march(ops, u0, dt, n, limiter="none")
        assert np.isfinite(np.asarray(u_lim)).all()
        assert not np.isfinite(np.asarray(u_raw)).all()
