"""Revolve-composed advection estimate vs the monolithic stored pipeline.

The beyond-HBM path (adjoint/revolve_vjp.revolve_advec_estimate) chains
the fused blocked-single Pallas kernels through the binomial schedule:
forward-only advances + per-unit stored reverses with λ carried across
unit boundaries. Interpret mode on CPU; the same composition runs on the
TPU in bench.py's revolve row. λ composition is exact (identical op
sequence), η differs only by f32 association at unit boundaries.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from adjoint_ode_adaptivity_tpu.adjoint.advec import (
    terminal_integral_cotangent,
)
from adjoint_ode_adaptivity_tpu.adjoint.revolve_vjp import (
    revolve_advec_estimate,
)
from adjoint_ode_adaptivity_tpu.march.advec import advec_march, advec_operators
from adjoint_ode_adaptivity_tpu.ops import startup_1d
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
    make_pallas_advec_march_single_blocked,
    make_pallas_fwd_adj_estimate_grid_single_blocked,
)

A = 2 * np.pi


@pytest.fixture(scope="module")
def setup():
    disc = startup_1d(2, 0.0, 2 * np.pi, 64)
    ops = advec_operators(disc, a=A, dtype=jnp.float32)
    u0 = jnp.asarray(np.sin(disc.x), jnp.float32)
    dt = 2e-4
    return disc, ops, u0, dt


class TestForwardOnlyBlockedMarch:
    def test_matches_xla_march(self, setup):
        disc, ops, u0, dt = setup
        march = make_pallas_advec_march_single_blocked(
            disc, A, dt, segment=8, n_segments=4, interpret=True
        )
        got = march(u0, jnp.float32(0.0))
        want = advec_march(ops, u0, dt, 32)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)

    def test_traced_t0_composes(self, setup):
        # march(march(u, 0), t=16·dt) == march_32(u): the traced start
        # time drives the inflow BC exactly as a fresh kernel would
        disc, ops, u0, dt = setup
        march16 = make_pallas_advec_march_single_blocked(
            disc, A, dt, segment=8, n_segments=2, interpret=True
        )
        got = march16(march16(u0, jnp.float32(0.0)), jnp.float32(16 * dt))
        want = advec_march(ops, u0, dt, 32)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


class TestRevolveEstimate:
    @pytest.mark.parametrize("snaps", [2, 3])
    def test_matches_monolithic_pipeline(self, setup, snaps):
        disc, ops, u0, dt = setup
        n_steps, unit = 32, 8
        mono = make_pallas_fwd_adj_estimate_grid_single_blocked(
            disc, A, dt, segment=8, n_segments=n_steps // 8, interpret=True
        )
        lam = terminal_integral_cotangent(disc, jnp.float32)
        uf_m, lam0_m, eta_m = mono(u0, jnp.float32(0.0), lam)

        rev = revolve_advec_estimate(
            disc, A, dt, n_steps, unit_steps=unit, snaps=snaps, segment=8,
            interpret=True,
        )
        uf_r, lam0_r, eta_r = rev(u0, jnp.float32(0.0), lam)

        np.testing.assert_allclose(uf_r, uf_m, rtol=1e-6, atol=1e-7)
        # λ rides the identical transpose sequence — exact
        np.testing.assert_allclose(lam0_r, lam0_m, rtol=1e-6, atol=1e-8)
        # η: same per-step sums, f32 association differs at unit boundaries
        np.testing.assert_allclose(eta_r, eta_m, rtol=1e-4, atol=1e-9)

    def test_revolve_stats_bounds(self, setup):
        disc, _, _, dt = setup
        rev = revolve_advec_estimate(
            disc, A, dt, 64, unit_steps=8, snaps=3, segment=8,
            interpret=True,
        )
        st = rev.revolve_stats
        assert st["n_units"] == 8
        assert st["max_slots"] <= 3
        # recompute factor bounded by the repetition count t
        assert st["forward_units"] <= st["repetitions"] * st["n_units"]
        assert st["forward_units"] >= st["n_units"] - 1
