"""Tests for the 1D DG advection march and its adjoint.

Oracle: a direct-gather RHS built from the general connectivity maps
(vmapM/vmapP, exactly the AdvecRHS1D.m formula) must match the shift-based
TPU implementation; the march must reproduce the exact solution
u(x,t) = sin(x − a·t); the adjoint step must be the exact transpose.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adjoint_ode_adaptivity_tpu.adjoint.advec import (
    advec_adjoint_march,
    advec_fwd_adj_estimate,
    lsrk_step,
    lsrk_step_homogeneous,
    terminal_integral_cotangent,
)
from adjoint_ode_adaptivity_tpu.march.advec import (
    advec_march,
    advec_operators,
    advec_rhs,
    cfl_dt,
)
from adjoint_ode_adaptivity_tpu.ops import startup_1d


def gather_rhs_oracle(disc, u, t, a=2 * np.pi, alpha=1.0):
    """AdvecRHS1D.m transliterated with the general vmapM/vmapP gathers."""
    u_flat = np.asarray(u).T.ravel()  # volume nodes in (element-major) order
    nx = np.asarray(disc.nx).T.ravel()  # face-major-within-element order
    du = (u_flat[disc.vmap_m] - u_flat[disc.vmap_p]) * (
        a * nx - (1 - alpha) * np.abs(a * nx)
    ) / 2
    uin = -np.sin(a * t)
    du[disc.map_i] = (u_flat[disc.vmap_i] - uin) * (
        a * nx[disc.map_i] - (1 - alpha) * np.abs(a * nx[disc.map_i])
    ) / 2
    du[disc.map_o] = 0.0
    du = du.reshape(disc.k, 2).T  # back to (2, K)
    rhs = -a * np.asarray(disc.rx) * (np.asarray(disc.dr) @ np.asarray(u)) + np.asarray(
        disc.lift
    ) @ (np.asarray(disc.fscale) * du)
    return rhs


class TestAdvecRHS:
    def test_shift_rhs_matches_gather_oracle(self):
        disc = startup_1d(2, 0.0, 2 * np.pi, 10)
        ops = advec_operators(disc, dtype=jnp.float64)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.normal(size=(disc.np_, disc.k)))
        t = 0.37
        ours = advec_rhs(ops, u, jnp.asarray(t))
        oracle = gather_rhs_oracle(disc, u, t)
        np.testing.assert_allclose(ours, oracle, rtol=1e-12, atol=1e-12)

    def test_march_matches_exact_solution(self):
        # u0 = sin(x), inflow BC -sin(a t) at x=0 => u(x,t) = sin(x - a t)
        a = 2 * np.pi
        disc = startup_1d(4, 0.0, 2 * np.pi, 24)
        ops = advec_operators(disc, a=a, dtype=jnp.float64)
        u0 = jnp.asarray(np.sin(disc.x))
        dt, n_steps = cfl_dt(disc, a, final_time=2.0)
        u = advec_march(ops, u0, dt, n_steps)
        exact = np.sin(np.asarray(disc.x) - a * 2.0)
        assert float(jnp.max(jnp.abs(u - exact))) < 2e-5

    def test_spatial_convergence(self):
        a = 2 * np.pi
        errs = []
        for k in (8, 16, 32):
            disc = startup_1d(2, 0.0, 2 * np.pi, k)
            ops = advec_operators(disc, a=a, dtype=jnp.float64)
            u0 = jnp.asarray(np.sin(disc.x))
            dt, n_steps = cfl_dt(disc, a, final_time=0.5)
            u = advec_march(ops, u0, dt, n_steps)
            exact = np.sin(np.asarray(disc.x) - a * 0.5)
            errs.append(float(jnp.max(jnp.abs(u - exact))))
        # order-2 elements: ~3rd order convergence; accept >= 2.5
        rate = np.log2(errs[0] / errs[1])
        assert rate > 2.5, (errs, rate)


class TestAdvecAdjoint:
    def test_homogeneous_step_is_linear(self):
        disc = startup_1d(2, 0.0, 2 * np.pi, 12)
        ops = advec_operators(disc, dtype=jnp.float64)
        rng = np.random.default_rng(1)
        u1 = jnp.asarray(rng.normal(size=(disc.np_, disc.k)))
        u2 = jnp.asarray(rng.normal(size=(disc.np_, disc.k)))
        dt = 1e-3
        s = lambda u: lsrk_step_homogeneous(ops, u, dt)
        np.testing.assert_allclose(
            s(2.5 * u1 - 0.3 * u2), 2.5 * s(u1) - 0.3 * s(u2), rtol=1e-11, atol=1e-12
        )

    def test_adjoint_step_is_exact_transpose(self):
        disc = startup_1d(3, 0.0, 2 * np.pi, 9)
        ops = advec_operators(disc, dtype=jnp.float64)
        rng = np.random.default_rng(2)
        u = jnp.asarray(rng.normal(size=(disc.np_, disc.k)))
        lam = jnp.asarray(rng.normal(size=(disc.np_, disc.k)))
        dt = 1e-3
        fwd = lambda v: lsrk_step_homogeneous(ops, v, dt)
        step_t = jax.linear_transpose(fwd, u)
        lhs = float(jnp.sum(fwd(u) * lam))
        rhs = float(jnp.sum(u * step_t(lam)[0]))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-12)

    def test_adjoint_march_equals_grad(self):
        # lam0 from the adjoint march == dJ/du0 of the forward march
        disc = startup_1d(2, 0.0, 2 * np.pi, 8)
        ops = advec_operators(disc, dtype=jnp.float64)
        n_steps = 20
        dt = 1e-3
        lam_end = terminal_integral_cotangent(disc, jnp.float64)

        def j_of_u0(u0):
            u = advec_march(ops, u0, dt, n_steps)
            return jnp.sum(lam_end * u)

        rng = np.random.default_rng(3)
        u0 = jnp.asarray(rng.normal(size=(disc.np_, disc.k)))
        g = jax.grad(j_of_u0)(u0)
        lam0 = advec_adjoint_march(ops, lam_end, dt, n_steps)
        np.testing.assert_allclose(lam0, g, rtol=1e-10, atol=1e-12)

    def test_fwd_adj_estimate_runs_and_estimates_j_error(self):
        a = 2 * np.pi
        disc = startup_1d(2, 0.0, 2 * np.pi, 16)
        ops = advec_operators(disc, a=a, dtype=jnp.float64)
        u0 = jnp.asarray(np.sin(disc.x))
        dt_cfl, _ = cfl_dt(disc, a, final_time=0.25)
        # stay within the LSRK stability region (cfl_dt already halves the
        # CFL-limited step); outside it the march diverges and no estimate
        # is meaningful
        n_steps = int(np.ceil(0.25 / dt_cfl / 8)) * 8
        dt = 0.25 / n_steps
        res = advec_fwd_adj_estimate(ops, disc, u0, dt, n_steps, segment=n_steps // 4)
        # J error vs a half-step march
        u_half = advec_march(ops, u0, dt / 2, 2 * n_steps)
        lam_end = terminal_integral_cotangent(disc, jnp.float64)
        j_half = float(jnp.sum(lam_end * u_half))
        est = float(jnp.sum(res.eta))
        true_gap = float(res.j_value) - j_half
        assert abs(true_gap) > 0
        # fine-adjoint weights make Ση == J(u_dt) − J(u_dt/2) EXACT for this
        # affine march (see adjoint/advec.py docstring): parity to roundoff
        # relative to the O(1) J scale — far inside the north-star 1e-10
        # (matlab/MAIN.m:64-76 prints matching digits at %.10e on J-scale
        # numbers, not relative to the tiny gap)
        assert abs(est - true_gap) < 1e-12, (est, true_gap)
        assert abs(est - true_gap) < 1e-8 * abs(true_gap), (est, true_gap)
        # the coarse-transpose variant is only a first-order estimate
        res_c = advec_fwd_adj_estimate(
            ops, disc, u0, dt, n_steps, segment=n_steps // 4, fine_adjoint=False
        )
        est_c = float(jnp.sum(res_c.eta))
        assert 0.5 < est_c / true_gap < 1.5, (est_c, true_gap)


class TestNonUniformMeshAndAdaptivity:
    def test_non_uniform_mesh_march_accuracy(self):
        # graded mesh: march still converges to the exact solution
        from adjoint_ode_adaptivity_tpu.ops.mesh import startup_1d

        a = 2 * np.pi
        vx = np.concatenate([np.linspace(0, np.pi, 17), np.linspace(np.pi, 2 * np.pi, 9)[1:]])
        disc = startup_1d(3, 0.0, 2 * np.pi, 0, vx=vx)
        assert disc.k == 24
        ops = advec_operators(disc, a=a, dtype=jnp.float64)
        u0 = jnp.asarray(np.sin(disc.x))
        from adjoint_ode_adaptivity_tpu.march.advec import cfl_dt

        dt, n_steps = cfl_dt(disc, a, final_time=0.25)
        u = advec_march(ops, u0, dt, n_steps)
        exact = np.sin(np.asarray(disc.x) - a * 0.25)
        assert float(jnp.max(jnp.abs(u - exact))) < 5e-4

    def test_adaptive_element_loop_reduces_estimate(self):
        from adjoint_ode_adaptivity_tpu.adapt.advec_loop import run_adaptive_advec

        h = run_adaptive_advec(
            lambda x: np.sin(x), n_order=2, k0=8, final_time=0.1, maxit=3,
            tol=1e-10,
        )
        assert len(h) >= 2
        assert abs(h[-1].est_total) < abs(h[0].est_total) / 10
        # mesh grew by bisection
        assert len(h[-1].vx) > len(h[0].vx)


class TestAdaptiveAdvecPallasEngine:
    def test_pallas_engine_matches_xla_refinement_path(self):
        """engine='pallas' (fused batched kernel, f32, interpret off-TPU)
        follows the same refinement path as the f32 XLA engine and shrinks
        the estimate; per-iteration eta agrees to f32 tolerance."""
        from adjoint_ode_adaptivity_tpu.adapt.advec_loop import run_adaptive_advec

        # marginally-resolved IC (3 wavelengths over 8 elements) so the
        # indicator sits far above f32 roundoff
        kw = dict(n_order=2, k0=8, final_time=0.05, maxit=2, tol=1e-12)
        u0 = lambda x: np.sin(3 * x)
        h_x = run_adaptive_advec(u0, dtype=jnp.float32, **kw)
        h_p = run_adaptive_advec(u0, engine="pallas", **kw)
        assert len(h_p) == len(h_x)
        for rx, rp in zip(h_x, h_p):
            np.testing.assert_array_equal(rp.vx, rx.vx)  # same bisections
            # the CFL-small LSRK time error is ~1e-7 here, so the two f32
            # engines agree only to accumulation-order noise in eta; the
            # refinement decisions (above) are the meaningful parity
            np.testing.assert_allclose(rp.eta, rx.eta, rtol=5e-3, atol=2e-7)
        assert abs(h_p[-1].est_total) < abs(h_p[0].est_total)

    def test_bad_engine_raises(self):
        from adjoint_ode_adaptivity_tpu.adapt.advec_loop import run_adaptive_advec

        with pytest.raises(ValueError):
            run_adaptive_advec(lambda x: np.sin(x), engine="cuda")
