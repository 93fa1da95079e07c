"""Tests for the DG-in-time slab march, adjoint march, reconstruction, and
error contributions — the MATLAB strand's capabilities."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adjoint_ode_adaptivity_tpu.adjoint.dg_time import (
    continuous_err_contribution,
    dg_adjoint_march,
    dg_adjoint_reconstruct,
    dg_element_functional,
)
from adjoint_ode_adaptivity_tpu.march.dg_time import (
    _slab_jacobian,
    _slab_residual,
    dg_march,
    dg_time_operators,
)


F_LIN = lambda u, t: u
F_SIN = lambda u, t: jnp.sin(u)


class TestDGMarch:
    def test_linear_newton_two_iterations(self):
        ops = dg_time_operators(2)
        times = jnp.linspace(0.0, 1.0, 5)
        res = dg_march(ops, F_LIN, times, 1.0)
        assert np.all(np.asarray(res.newton_iters) <= 2)
        assert float(jnp.max(res.newton_resnorm)) < 1e-12

    def test_linear_accuracy_and_convergence(self):
        errs = []
        for k in (2, 4, 8):
            ops = dg_time_operators(1)
            times = jnp.linspace(0.0, 1.0, k + 1)
            res = dg_march(ops, F_LIN, times, 1.0)
            errs.append(abs(float(res.u[-1, -1]) - np.e))
        # DG(1) endpoint superconvergence: order 3
        rate = np.log2(errs[0] / errs[1])
        assert rate > 2.5, (errs, rate)

    def test_nonlinear_sin_accuracy(self):
        ops = dg_time_operators(2, 9)
        times = jnp.linspace(0.0, 2.0, 5)
        res = dg_march(ops, F_SIN, times, 1.0)
        exact = 2 * np.arctan2(np.sin(0.5) * np.exp(2.0), np.cos(0.5))
        assert abs(float(res.u[-1, -1]) - exact) < 1e-6
        assert np.all(np.asarray(res.newton_iters) < 10)

    def test_newton_jacobian_matches_ad_of_residual(self):
        """The reference validates its hand-assembled Jacobian by complex
        step (matlab/test_jacobian.m); here: AD of the residual function."""
        ops = dg_time_operators(2, 8)
        rng = np.random.default_rng(0)
        dtype = jnp.float64
        for _ in range(5):
            u = jnp.asarray(rng.uniform(size=ops.np_))
            jac_assembled = _slab_jacobian(ops, F_SIN, u, 0.3, 0.1, dtype)
            jac_ad = jax.jacfwd(
                lambda uu: _slab_residual(ops, F_SIN, uu, 1.0, 0.3, 0.1, dtype)
            )(u)
            np.testing.assert_allclose(jac_assembled, jac_ad, rtol=1e-12, atol=1e-13)

    def test_march_is_vmappable_over_ics(self):
        ops = dg_time_operators(1)
        times = jnp.linspace(0.0, 1.0, 4)
        y0s = jnp.array([0.5, 1.0, 1.5])
        res = jax.vmap(lambda y0: dg_march(ops, F_SIN, times, y0).u)(y0s)
        assert res.shape == (3, 3, 2)


class TestDGAdjoint:
    def test_exact_effectivity_identity_linear(self):
        """Σ err_k == J(u_h at order n+1) − J(u_H) to machine precision for
        linear ODE + linear functional — the %.10e parity of MAIN.m:55-76."""
        for n, k in [(1, 2), (1, 4), (2, 4), (2, 8)]:
            times = jnp.linspace(0.0, 1.0, k + 1)
            ops_p = dg_time_operators(n)
            ops_a = dg_time_operators(n + 1)
            res_p = dg_march(ops_p, F_LIN, times, 1.0)
            res_a = dg_march(ops_a, F_LIN, times, 1.0)
            adj = dg_adjoint_march(ops_a, F_LIN, res_p.u, times, 1.0)
            j_h = dg_element_functional(ops_p, res_p.u, times)
            j_h1 = dg_element_functional(ops_a, res_a.u, times)
            est = float(jnp.sum(adj.err))
            gap = float(j_h1 - j_h)
            assert abs(est - gap) < 1e-10 * max(1.0, abs(gap)), (n, k, est, gap)

    def test_effectivity_vs_fine_solve_nonlinear(self):
        """Against the (n+3)-order 'truth' solve, effectivity ≈ 1 (within a
        few %), mirroring MAIN.m's JuH−Juh vs Σ adj-weighted residual."""
        times = jnp.linspace(0.0, 2.0, 5)
        ops_p = dg_time_operators(1, 6)
        ops_a = dg_time_operators(2, 9)
        ops_f = dg_time_operators(4, 12)
        res_p = dg_march(ops_p, F_SIN, times, 1.0)
        res_f = dg_march(ops_f, F_SIN, times, 1.0)
        adj = dg_adjoint_march(ops_a, F_SIN, res_p.u, times, 1.0)
        j_gap = float(
            dg_element_functional(ops_f, res_f.u, times)
            - dg_element_functional(ops_p, res_p.u, times)
        )
        eff = float(jnp.sum(adj.err)) / j_gap
        assert 0.9 < eff < 1.1, eff

    def test_adjoint_approximates_continuous_adjoint(self):
        # J=int u over [0,1] for u'=u: a(t) = e^{1-t} - 1
        times = jnp.linspace(0.0, 1.0, 9)
        ops_p = dg_time_operators(1)
        ops_a = dg_time_operators(2)
        res_p = dg_march(ops_p, F_LIN, times, 1.0)
        adj = dg_adjoint_march(ops_a, F_LIN, res_p.u, times, 1.0)
        a_exact = np.exp(1.0 - np.asarray(adj.t)) - 1.0
        assert float(jnp.max(jnp.abs(adj.v - a_exact))) < 2e-3

    def test_reconstruction_close_to_direct_higher_order_adjoint(self):
        times = jnp.linspace(0.0, 1.0, 5)
        ops_p = dg_time_operators(1)
        ops_a = dg_time_operators(2)
        res_p = dg_march(ops_p, F_LIN, times, 1.0)
        adj_low = dg_adjoint_march(ops_p, F_LIN, res_p.u[:, :1] * 0 + res_p.u, times, 1.0)
        # reconstruct low-order adjoint to order 2
        v_rec = dg_adjoint_reconstruct(ops_p, adj_low.v, times)
        adj_hi = dg_adjoint_march(ops_a, F_LIN, res_p.u, times, 1.0)
        # agreement to the discretisation error scale of the low solve
        assert float(jnp.max(jnp.abs(v_rec - adj_hi.v))) < 5e-2

    def test_continuous_err_contribution(self):
        # u'=u, J=int u over [0,1], exact adjoint a(t)=e^{1-t}-1
        times = jnp.linspace(0.0, 1.0, 5)
        ops_p = dg_time_operators(1, 8)
        res_p = dg_march(ops_p, F_LIN, times, 1.0)
        adj_fn = lambda t: jnp.exp(1.0 - t) - 1.0
        err = continuous_err_contribution(ops_p, res_p.u, times, adj_fn, F_LIN, 1.0)
        j_h = dg_element_functional(ops_p, res_p.u, times)
        j_exact = np.e - 1.0
        total = float(jnp.sum(err))
        # continuous-adjoint estimate matches the true error closely
        assert abs(total - (j_exact - j_h)) < 0.05 * abs(j_exact - j_h)


class TestDifferentiableDGMarch:
    """IFT-vjp through the Newton slab solve (SURVEY §7 hard part 3):
    jax.grad works through the implicit DG march without unrolling Newton."""

    def _setup(self):
        from adjoint_ode_adaptivity_tpu.march.dg_time import dg_time_operators

        ops = dg_time_operators(2)
        times = jnp.asarray([0.0, 0.4, 0.9, 1.3, 2.0])
        return ops, times

    def test_values_match_plain_march(self):
        from adjoint_ode_adaptivity_tpu.march.dg_time import (
            dg_march,
            dg_march_differentiable,
        )

        ops, times = self._setup()
        f_p = lambda u, t, p: jnp.sin(u)
        f = lambda u, t: jnp.sin(u)
        u_diff = dg_march_differentiable(ops, f_p, times, 1.0)
        u_ref = dg_march(ops, f, times, 1.0).u
        np.testing.assert_allclose(u_diff, u_ref, rtol=1e-9)

    def test_grad_y0_matches_fd(self):
        from adjoint_ode_adaptivity_tpu.march.dg_time import dg_march_differentiable

        ops, times = self._setup()
        f_p = lambda u, t, p: jnp.sin(u)

        def j_of_y0(y0):
            u = dg_march_differentiable(ops, f_p, times, y0)
            return u[-1, -1]  # terminal value

        g = jax.grad(j_of_y0)(1.0)
        eps = 1e-6
        fd = (j_of_y0(1.0 + eps) - j_of_y0(1.0 - eps)) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-6)

    def test_grad_params_matches_fd(self):
        # parameterized RHS f = p0*sin(u) + p1*cos(t): train-through-solver
        from adjoint_ode_adaptivity_tpu.march.dg_time import dg_march_differentiable

        ops, times = self._setup()
        f_p = lambda u, t, p: p["a"] * jnp.sin(u) + p["b"] * jnp.cos(t)
        params = {"a": jnp.asarray(1.0), "b": jnp.asarray(0.3)}

        def j_of_p(p):
            u = dg_march_differentiable(ops, f_p, times, 1.0, p)
            return jnp.sum(u[-1] ** 2)

        g = jax.grad(j_of_p)(params)
        eps = 1e-6
        for key in params:
            pp = dict(params)
            pp[key] = params[key] + eps
            jp = float(j_of_p(pp))
            pp[key] = params[key] - eps
            jm = float(j_of_p(pp))
            np.testing.assert_allclose(g[key], (jp - jm) / (2 * eps), rtol=1e-5)

    def test_grad_times_matches_fd(self):
        from adjoint_ode_adaptivity_tpu.march.dg_time import dg_march_differentiable

        ops, times = self._setup()
        f_p = lambda u, t, p: jnp.sin(u) * (1 + 0.2 * t)

        def j_of_times(ts):
            u = dg_march_differentiable(ops, f_p, ts, 1.0)
            return u[-1, -1]

        g = jax.grad(j_of_times)(times)
        eps = 1e-6
        for i in (1, 2, 3):  # interior nodes
            tp = times.at[i].add(eps)
            tm = times.at[i].add(-eps)
            fd = (float(j_of_times(tp)) - float(j_of_times(tm))) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=1e-4, atol=1e-10)
