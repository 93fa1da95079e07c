"""Mixed per-element-order DG-in-time solvers and the hp-adaptive loop.

Reference: ``matlab/dg_march.m:1`` takes a per-element order vector Ns
(``fem_setup(Ns(k), ...)`` per element) — a latent capability MAIN.m never
exercises (uniform ``Ns = n*ones``).  These tests pin the mixed-order
solvers to the uniform solvers where ns is uniform, and to an
element-by-element chained oracle where it is not.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adjoint_ode_adaptivity_tpu.adapt.hp_loop import run_adaptive_dg_hp
from adjoint_ode_adaptivity_tpu.adjoint.dg_mixed import (
    dg_adjoint_interp_mixed,
    dg_adjoint_march_mixed,
    dg_element_functional_mixed,
)
from adjoint_ode_adaptivity_tpu.adjoint.dg_time import (
    dg_adjoint_march,
    dg_element_functional,
)
from adjoint_ode_adaptivity_tpu.march.dg_mixed import (
    dg_march_mixed,
    dg_time_operators_mixed,
)
from adjoint_ode_adaptivity_tpu.march.dg_time import dg_march, dg_time_operators

F_SIN = lambda u, t: jnp.sin(u)  # noqa: E731
N_MAX = 4
NGQ = 3 * N_MAX + 6
TIMES = jnp.asarray(np.linspace(0.0, 2.0, 9), jnp.float64)
Y0 = 1.0


@pytest.fixture(scope="module")
def mops():
    return dg_time_operators_mixed(N_MAX)


@pytest.fixture(scope="module")
def interp(mops):
    return dg_adjoint_interp_mixed(mops)


class TestMixedMarch:
    @pytest.mark.parametrize("n", [1, 2, 3])
    def test_uniform_matches_uniform_solver(self, mops, n):
        ops = dg_time_operators(n, n_gq=NGQ)
        ref = dg_march(ops, F_SIN, TIMES, Y0)
        ns = jnp.full((8,), n, jnp.int32)
        mix = dg_march_mixed(mops, F_SIN, TIMES, ns, Y0)
        np.testing.assert_allclose(
            np.asarray(mix.u[:, : n + 1]), np.asarray(ref.u), atol=1e-13
        )
        # padded node values are exactly zero; Newton telemetry matches
        assert np.abs(np.asarray(mix.u[:, n + 1 :])).max() == 0.0
        np.testing.assert_array_equal(
            np.asarray(mix.newton_iters), np.asarray(ref.newton_iters)
        )

    def test_gauss_solve_matches_pivoted(self, mops):
        # the strand-wide tiny-system solver: unpivoted unrolled Gauss
        # vs jnp.linalg.solve on actual Newton Jacobians across orders
        from adjoint_ode_adaptivity_tpu.march.dg_mixed import gauss_solve

        rng = np.random.default_rng(3)
        for n_k in range(1, N_MAX + 1):
            for h in (2.0, 1e-3, 0.0):
                i = n_k - 1
                s_k = jnp.asarray(mops.stiff_pad[i])
                phi_k = jnp.asarray(mops.phi_pad[i])
                eye_k = jnp.asarray(mops.pad_eye[i])
                wq = jnp.asarray(mops.wq)
                np_m = mops.np_max
                e_end = jnp.zeros(np_m).at[n_k].set(1.0)
                u = jnp.asarray(rng.uniform(-2, 2, np_m))
                df = jnp.cos(phi_k @ u)
                a = (s_k.T - jnp.outer(e_end, e_end) + eye_k
                     + h / 2.0 * (phi_k.T @ (wq[:, None] * df[:, None]
                                             * phi_k)))
                b = jnp.asarray(rng.uniform(-1, 1, np_m))
                np.testing.assert_allclose(
                    np.asarray(gauss_solve(a, b)),
                    np.asarray(jnp.linalg.solve(a, b)),
                    atol=1e-13, rtol=1e-12,
                )
        # batched leading axes ride through unchanged
        ab = jnp.asarray(rng.uniform(0.5, 2.0, (5, 4, 4)))
        ab = ab + 4.0 * jnp.eye(4)  # well-conditioned batch
        bb = jnp.asarray(rng.uniform(-1, 1, (5, 4)))
        np.testing.assert_allclose(
            np.asarray(gauss_solve(ab, bb)),
            np.linalg.solve(
                np.asarray(ab), np.asarray(bb)[..., None]
            )[..., 0],
            atol=1e-13,
        )

    def test_fixed_count_newton_matches_tol(self, mops):
        # the vmapped-ensemble TPU fast path: a fixed Newton count
        # reproduces the tolerance while_loop to roundoff (quadratic
        # convergence), mixed orders included
        ns = jnp.asarray([1, 3, 2, 4, 1, 2, 3, 1], jnp.int32)
        ref = dg_march_mixed(mops, F_SIN, TIMES, ns, Y0)
        fix = dg_march_mixed(
            mops, F_SIN, TIMES, ns, Y0, newton_iters=8
        )
        np.testing.assert_allclose(
            np.asarray(fix.u), np.asarray(ref.u), atol=1e-13
        )
        assert int(np.asarray(fix.newton_iters).max()) == 8

    def test_mixed_matches_chained_oracle(self, mops):
        ns = jnp.asarray([1, 3, 2, 4, 1, 2, 3, 1], jnp.int32)
        mix = dg_march_mixed(mops, F_SIN, TIMES, ns, Y0)
        u_prev = Y0
        for k in range(8):
            n = int(ns[k])
            ops = dg_time_operators(n, n_gq=NGQ)
            r1 = dg_march(ops, F_SIN, TIMES[k : k + 2], u_prev)
            np.testing.assert_allclose(
                np.asarray(mix.u[k, : n + 1]), np.asarray(r1.u[0]), atol=1e-13
            )
            u_prev = float(r1.u[0, -1])

    def test_zero_width_slab_is_identity(self, mops):
        # padded partitions: zero-width slabs leave the carry untouched at
        # EVERY order (the repo-wide padding contract)
        times = jnp.asarray([0.0, 1.0, 2.0, 2.0, 2.0], jnp.float64)
        ns = jnp.asarray([2, 3, 1, 4], jnp.int32)
        mix = dg_march_mixed(mops, F_SIN, times, ns, Y0)
        live = dg_march_mixed(
            mops, F_SIN, times[:3], ns[:2], Y0
        )
        np.testing.assert_allclose(
            np.asarray(mix.u[:2]), np.asarray(live.u), atol=0
        )
        # zero-width slabs carry the constant inflow value
        end_live = float(live.u[1, int(ns[1])])
        assert np.allclose(np.asarray(mix.u[2, :2]), end_live)
        assert np.allclose(np.asarray(mix.u[3, :5]), end_live)

    def test_vmaps_over_initial_conditions(self, mops):
        ns = jnp.asarray([1, 2, 3, 1, 2, 3, 1, 2], jnp.int32)
        y0s = jnp.asarray([0.5, 1.0, 1.5], jnp.float64)
        batch = jax.vmap(
            lambda y: dg_march_mixed(mops, F_SIN, TIMES, ns, y).u
        )(y0s)
        solo = dg_march_mixed(mops, F_SIN, TIMES, ns, y0s[1]).u
        np.testing.assert_allclose(
            np.asarray(batch[1]), np.asarray(solo), atol=1e-12
        )


class TestMixedAdjoint:
    @pytest.mark.parametrize("n", [1, 2, 3])
    def test_uniform_matches_uniform_adjoint(self, mops, interp, n):
        ops = dg_time_operators(n, n_gq=NGQ)
        ops_a = dg_time_operators(n + 1, n_gq=NGQ)
        ref = dg_march(ops, F_SIN, TIMES, Y0)
        adj_ref = dg_adjoint_march(ops_a, F_SIN, ref.u, TIMES, Y0)
        ns = jnp.full((8,), n, jnp.int32)
        mix = dg_march_mixed(mops, F_SIN, TIMES, ns, Y0)
        adj_mix = dg_adjoint_march_mixed(
            mops, interp, F_SIN, mix.u, TIMES, ns, Y0
        )
        np.testing.assert_allclose(
            np.asarray(adj_mix.v[:, : n + 2]), np.asarray(adj_ref.v), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(adj_mix.err), np.asarray(adj_ref.err), atol=1e-14
        )

    @pytest.mark.parametrize("n", [1, 2])
    def test_functional_matches_uniform(self, mops, n):
        ops = dg_time_operators(n, n_gq=NGQ)
        ref = dg_march(ops, F_SIN, TIMES, Y0)
        ns = jnp.full((8,), n, jnp.int32)
        mix = dg_march_mixed(mops, F_SIN, TIMES, ns, Y0)
        j_ref = float(dg_element_functional(ops, ref.u, TIMES))
        j_mix = float(dg_element_functional_mixed(mops, mix.u, TIMES, ns))
        assert abs(j_ref - j_mix) < 1e-13

    def test_mixed_effectivity_near_one(self, mops):
        """Σ err estimates J(fine) − J(coarse) on a genuinely mixed-order
        partition (effectivity within ~10% on this coarse nonlinear run)."""
        mops6 = dg_time_operators_mixed(N_MAX + 2)
        interp6 = dg_adjoint_interp_mixed(mops6)
        ns = jnp.asarray([1, 3, 2, 4, 1, 2, 3, 1], jnp.int32)
        mixc = dg_march_mixed(mops6, F_SIN, TIMES, ns, Y0)
        mixf = dg_march_mixed(
            mops6, F_SIN, TIMES, ns + 2, Y0, newton_tol=1e-12
        )
        adj = dg_adjoint_march_mixed(
            mops6, interp6, F_SIN, mixc.u, TIMES, ns, Y0
        )
        j_c = float(dg_element_functional_mixed(mops6, mixc.u, TIMES, ns))
        j_f = float(
            dg_element_functional_mixed(mops6, mixf.u, TIMES, ns + 2)
        )
        gap = j_f - j_c
        est = float(jnp.sum(adj.err))
        assert abs(est - gap) < 0.1 * abs(gap)


class TestHPLoop:
    def test_p_mode_converges_fast(self):
        hist = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), k0=4, n0=1, n_max=4, mode="p",
            tol=1e-12, maxit=8,
        )
        # order refinement on a smooth solution: >10^5 error reduction in 8
        # refinements at FIXED element count (h-mode reaches ~1e-6)
        assert len(hist[-1].ns) == 4
        assert abs(hist[-1].est_total) < 1e-8 * max(1.0, abs(hist[0].est_total) / 5.5e-4)
        assert hist[-1].ns.max() <= 4

    def test_h_mode_grows_elements_at_base_order(self):
        hist = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), k0=4, n0=1, n_max=4, mode="h",
            tol=0.0, maxit=3,
        )
        assert len(hist[-1].ns) == 7
        assert hist[-1].ns.max() == 1
        # bisection keeps the partition nested and sorted
        assert np.all(np.diff(hist[-1].times) > 0)

    def test_hp_mode_saturates_then_bisects(self):
        hist = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), k0=2, n0=1, n_max=2, mode="hp",
            tol=0.0, maxit=6,
        )
        # with n_max=2 the argmax element saturates quickly and the loop
        # starts bisecting: element count must have grown
        assert len(hist[-1].ns) > 2
        assert hist[-1].ns.max() == 2

    def test_first_iteration_effectivity(self):
        hist = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), k0=8, n0=2, n_max=4, mode="p",
            tol=0.0, maxit=0,
        )
        h = hist[0]
        gap = h.j_fine - h.j_coarse
        assert abs(h.est_total - gap) < 0.05 * abs(gap)

    def test_invalid_mode_raises(self):
        with pytest.raises(ValueError, match="mode"):
            run_adaptive_dg_hp(F_SIN, 1.0, (0.0, 2.0), mode="x")


class TestReviewRegressions:
    """Fixes from the round-3 code review of the mixed-order strand."""

    def test_out_of_range_orders_raise(self, mops, interp):
        with pytest.raises(ValueError, match="must lie in"):
            dg_march_mixed(
                mops, F_SIN, TIMES, jnp.full((8,), 7, jnp.int32), Y0
            )
        with pytest.raises(ValueError, match="must lie in"):
            dg_march_mixed(
                mops, F_SIN, TIMES, jnp.zeros((8,), jnp.int32), Y0
            )
        with pytest.raises(ValueError, match="adjoint solves at ns"):
            # ns+1 would exceed the stack
            u = dg_march_mixed(
                mops, F_SIN, TIMES, jnp.full((8,), 4, jnp.int32), Y0
            ).u
            dg_adjoint_march_mixed(
                mops, interp, F_SIN, u, TIMES, jnp.full((8,), 4, jnp.int32),
                Y0,
            )

    def test_n0_out_of_range_raises(self):
        with pytest.raises(ValueError, match="n0"):
            run_adaptive_dg_hp(F_SIN, 1.0, (0.0, 2.0), n0=5, n_max=4)

    def test_singular_g_u_survives_padding(self, mops, interp):
        """g_u = 1/u is singular at the fabricated zero padding nodes; the
        live mask must keep the adjoint finite (the uniform solver has no
        padding and handles this fine)."""
        ns = jnp.asarray([1, 2, 3, 1, 2, 3, 1, 2], jnp.int32)
        mix = dg_march_mixed(mops, F_SIN, TIMES, ns, Y0)
        adj = dg_adjoint_march_mixed(
            mops, interp, F_SIN, mix.u, TIMES, ns, Y0,
            g_u=lambda u, t: 1.0 / u,
        )
        assert np.all(np.isfinite(np.asarray(adj.v)))
        assert np.all(np.isfinite(np.asarray(adj.err)))

    def test_p_mode_stops_when_saturated(self):
        """All live elements at n_max: no further no-op iterations."""
        hist = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), k0=2, n0=1, n_max=2, mode="p",
            tol=0.0, maxit=10,
        )
        # 2 elements x 1 order step each = saturated after 2 refinements;
        # one more iteration observes saturation and stops
        assert len(hist) <= 4
        assert hist[-1].ns.tolist() == [2, 2]

    def test_resume_with_larger_maxit_matches_uninterrupted(self, tmp_path):
        kw = dict(k0=2, n0=1, n_max=3, mode="hp", tol=0.0)
        ck = str(tmp_path / "hp_ext")
        run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), maxit=2, checkpoint_dir=ck, **kw
        )
        ext = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), maxit=4, checkpoint_dir=ck, **kw
        )
        ref = run_adaptive_dg_hp(F_SIN, 1.0, (0.0, 2.0), maxit=4, **kw)
        assert len(ext) == len(ref)
        for a, b in zip(ext, ref):
            np.testing.assert_array_equal(a.ns, b.ns)
            np.testing.assert_array_equal(a.times, b.times)
            assert float(a.est_total) == float(b.est_total)


class TestMixedDifferentiable:
    """IFT-differentiable mixed-order march: jax.grad through the Newton
    solve at per-element orders (the hp counterpart of
    dg_march_differentiable)."""

    F3 = staticmethod(lambda u, t, p: jnp.sin(u) * p)

    def test_value_parity_with_nondifferentiable(self, mops):
        from adjoint_ode_adaptivity_tpu.march.dg_mixed import (
            dg_march_mixed_differentiable,
        )

        times = jnp.asarray(np.linspace(0.0, 2.0, 7), jnp.float64)
        ns = jnp.asarray([1, 3, 2, 4, 1, 2], jnp.int32)
        u_nd = dg_march_mixed(
            mops, lambda u, t: jnp.sin(u) * 1.3, times, ns, 1.0
        ).u
        u_d = dg_march_mixed_differentiable(mops, self.F3, times, ns, 1.0, 1.3)
        np.testing.assert_allclose(
            np.asarray(u_d), np.asarray(u_nd), atol=1e-12
        )

    def test_gradients_match_uniform_ift_solver(self, mops):
        from adjoint_ode_adaptivity_tpu.march.dg_mixed import (
            dg_march_mixed_differentiable,
        )
        from adjoint_ode_adaptivity_tpu.march.dg_time import (
            dg_march_differentiable,
        )

        times = jnp.asarray(np.linspace(0.0, 2.0, 7), jnp.float64)
        ns = jnp.full((6,), 2, jnp.int32)
        ops2 = dg_time_operators(2, n_gq=NGQ)

        def j_uni(y0, p, t):
            u = dg_march_differentiable(
                ops2, self.F3, t, y0, p, newton_tol=1e-13
            )
            return jnp.sum(u[-1])

        def j_mix(y0, p, t):
            u = dg_march_mixed_differentiable(
                mops, self.F3, t, ns, y0, p, newton_tol=1e-13
            )
            return jnp.sum(u[-1, :3])

        g_u = jax.grad(j_uni, argnums=(0, 1, 2))(1.0, 1.3, times)
        g_m = jax.grad(j_mix, argnums=(0, 1, 2))(1.0, 1.3, times)
        for a, b in zip(g_u, g_m):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-12
            )

    def test_mixed_param_gradient_matches_finite_difference(self, mops):
        from adjoint_ode_adaptivity_tpu.march.dg_mixed import (
            dg_march_mixed_differentiable,
        )

        times = jnp.asarray(np.linspace(0.0, 2.0, 7), jnp.float64)
        ns = jnp.asarray([1, 3, 2, 4, 1, 2], jnp.int32)

        def j(p):
            u = dg_march_mixed_differentiable(
                mops, self.F3, times, ns, 1.0, p, newton_tol=1e-13
            )
            return jnp.sum(u[:, 0])

        g = float(jax.grad(j)(1.3))
        eps = 1e-6
        fd = (float(j(1.3 + eps)) - float(j(1.3 - eps))) / (2 * eps)
        assert abs(g - fd) < 1e-7 * abs(fd)


class TestHPDeviceLoop:
    """device_loop=True: the whole hp study as one lax.while_loop dispatch,
    bit-identical history to the host loop."""

    @pytest.mark.parametrize("mode", ["p", "h", "hp"])
    def test_matches_host_loop(self, mode):
        kw = dict(k0=3, n0=1, n_max=3, mode=mode, tol=0.0, maxit=4)
        ref = run_adaptive_dg_hp(F_SIN, 1.0, (0.0, 2.0), **kw)
        dev = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), device_loop=True, **kw
        )
        assert len(dev) == len(ref)
        for a, b in zip(dev, ref):
            np.testing.assert_array_equal(a.times, b.times)
            np.testing.assert_array_equal(a.ns, b.ns)
            np.testing.assert_array_equal(
                np.asarray(a.err), np.asarray(b.err)
            )
            assert float(a.est_total) == float(b.est_total)
            assert float(a.j_coarse) == float(b.j_coarse)

    def test_saturated_p_stop_matches_host(self):
        kw = dict(k0=2, n0=1, n_max=2, mode="p", tol=0.0, maxit=10)
        ref = run_adaptive_dg_hp(F_SIN, 1.0, (0.0, 2.0), **kw)
        dev = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), device_loop=True, **kw
        )
        assert len(dev) == len(ref)
        np.testing.assert_array_equal(dev[-1].ns, ref[-1].ns)


class TestMixedReconstruct:
    """Mixed-order Radau reconstruction (adj_rec.m's per-element-order
    signature): low-order solve -> Radau lift -> AWR weighting, pinned to
    the uniform reconstruction path where ns is uniform."""

    @pytest.mark.parametrize("n", [1, 2, 3])
    def test_uniform_parity(self, n):
        from adjoint_ode_adaptivity_tpu.adjoint.dg_mixed import (
            dg_adjoint_reconstruct_mixed,
            dg_adjoint_solve_low_mixed,
            dg_awr_from_adjoint_mixed,
            dg_radau_interp_mixed,
        )
        from adjoint_ode_adaptivity_tpu.adjoint.dg_time import (
            dg_adjoint_reconstruct,
            dg_awr_from_adjoint,
        )

        mops6 = dg_time_operators_mixed(N_MAX + 2)
        interp6 = dg_adjoint_interp_mixed(mops6)
        rad6 = dg_radau_interp_mixed(mops6)
        ngq6 = 3 * (N_MAX + 2) + 6
        ops = dg_time_operators(n, n_gq=ngq6)
        ops_a = dg_time_operators(n + 1, n_gq=ngq6)
        ref = dg_march(ops, F_SIN, TIMES, Y0)
        adj_low_ref = dg_adjoint_march(ops, F_SIN, ref.u, TIMES, Y0)
        v_rec_ref = dg_adjoint_reconstruct(ops, adj_low_ref.v, TIMES)
        err_ref = dg_awr_from_adjoint(
            ops_a, F_SIN, ref.u, TIMES, Y0, v_rec_ref
        )
        ns = jnp.full((8,), n, jnp.int32)
        mix = dg_march_mixed(mops6, F_SIN, TIMES, ns, Y0)
        v_low = dg_adjoint_solve_low_mixed(mops6, F_SIN, mix.u, TIMES, ns, Y0)
        v_rec = dg_adjoint_reconstruct_mixed(mops6, rad6, v_low, ns)
        err = dg_awr_from_adjoint_mixed(
            mops6, interp6, F_SIN, mix.u, TIMES, ns, Y0, v_rec
        )
        np.testing.assert_allclose(
            np.asarray(v_rec[:, : n + 2]), np.asarray(v_rec_ref), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(err), np.asarray(err_ref), atol=1e-13
        )

    def test_hp_loop_reconstruct_mode(self):
        hist = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), k0=4, n0=1, n_max=3, mode="p",
            tol=1e-10, maxit=6, adjoint_mode="reconstruct",
        )
        # the reconstructed-adjoint estimate drives the same convergence
        assert abs(hist[-1].est_total) < 1e-2 * abs(hist[0].est_total)
        gap = hist[0].j_fine - hist[0].j_coarse
        assert abs(hist[0].est_total - gap) < 0.1 * abs(gap)

    def test_invalid_adjoint_mode_raises(self):
        with pytest.raises(ValueError, match="adjoint_mode"):
            run_adaptive_dg_hp(F_SIN, 1.0, (0.0, 2.0), adjoint_mode="x")


class TestHPEnsemble:
    """Ensemble-signal hp: shared partition+orders, vmapped members,
    ensemble-mean |AWR| signal (Main_variable_params.py:330-341 applied to
    the hp strand)."""

    def test_single_member_ensemble_matches_scalar(self):
        kw = dict(k0=3, n0=1, n_max=3, mode="hp", tol=0.0, maxit=3)
        ref = run_adaptive_dg_hp(F_SIN, 1.0, (0.0, 2.0), **kw)
        ens = run_adaptive_dg_hp(F_SIN, np.asarray([1.0]), (0.0, 2.0), **kw)
        assert len(ens) == len(ref)
        for a, b in zip(ens, ref):
            np.testing.assert_array_equal(a.ns, b.ns)
            np.testing.assert_array_equal(a.times, b.times)
            np.testing.assert_allclose(
                np.asarray(a.err), np.asarray(b.err), atol=1e-14
            )
            assert a.u.shape == (1,) + b.u.shape

    def test_ensemble_signal_converges(self):
        y0s = np.asarray([0.6, 1.0, 1.5, 1.9])
        hist = run_adaptive_dg_hp(
            F_SIN, y0s, (0.0, 2.0), k0=4, n0=1, n_max=4, mode="p",
            tol=0.0, maxit=6,
        )
        assert hist[0].u.shape[0] == 4
        assert abs(hist[-1].est_total) < 1e-2 * abs(hist[0].est_total)

    def test_ensemble_device_loop_matches_host(self):
        y0s = np.asarray([0.7, 1.2, 1.8])
        kw = dict(k0=3, n0=1, n_max=3, mode="hp", tol=0.0, maxit=3)
        ref = run_adaptive_dg_hp(F_SIN, y0s, (0.0, 2.0), **kw)
        dev = run_adaptive_dg_hp(
            F_SIN, y0s, (0.0, 2.0), device_loop=True, **kw
        )
        assert len(dev) == len(ref)
        for a, b in zip(dev, ref):
            np.testing.assert_array_equal(a.ns, b.ns)
            np.testing.assert_array_equal(
                np.asarray(a.err), np.asarray(b.err)
            )
            assert float(a.est_total) == float(b.est_total)


class TestHPEnsembleMesh:
    def test_dp_mesh_matches_single_device(self):
        from jax.sharding import Mesh

        y0s = np.linspace(0.6, 1.9, 8)
        kw = dict(k0=3, n0=1, n_max=3, mode="hp", tol=0.0, maxit=3)
        ref = run_adaptive_dg_hp(F_SIN, y0s, (0.0, 2.0), **kw)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        dp = run_adaptive_dg_hp(F_SIN, y0s, (0.0, 2.0), mesh=mesh, **kw)
        assert len(dp) == len(ref)
        for a, b in zip(dp, ref):
            np.testing.assert_array_equal(a.ns, b.ns)
            np.testing.assert_array_equal(a.times, b.times)
            np.testing.assert_allclose(
                np.asarray(a.err), np.asarray(b.err), atol=1e-13
            )

    def test_mesh_requires_ensemble(self):
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
        with pytest.raises(ValueError, match="requires"):
            run_adaptive_dg_hp(F_SIN, 1.0, (0.0, 2.0), mesh=mesh)


class TestHPPerMember:
    """Per-member hp: every member its own partition AND order vector,
    freezing at tol independently (the one-job-per-IC farm on the hp
    axis)."""

    def test_members_match_independent_solo_runs(self):
        from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
            run_adaptive_dg_hp_per_member,
        )

        y0s = np.asarray([0.6, 1.1, 1.8])
        kw = dict(k0=3, n0=1, n_max=3, mode="hp", tol=1e-6, maxit=5)
        hist = run_adaptive_dg_hp_per_member(F_SIN, y0s, (0.0, 2.0), **kw)
        last = hist[-1]
        for m, y0m in enumerate(y0s):
            solo = run_adaptive_dg_hp(F_SIN, float(y0m), (0.0, 2.0), **kw)
            na = int(last.n_active[m])
            assert na == len(solo[-1].ns)
            np.testing.assert_allclose(
                last.times[m][: na + 1], solo[-1].times, atol=1e-14
            )
            np.testing.assert_array_equal(last.ns[m][:na], solo[-1].ns)

    def test_members_diverge(self):
        from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
            run_adaptive_dg_hp_per_member,
        )

        # far-apart ICs concentrate error differently: h-bisections land
        # in different places (a symmetric budget like maxit = 2*k0 p-steps
        # would saturate every member identically — use h mode)
        y0s = np.asarray([0.2, 3.0])
        hist = run_adaptive_dg_hp_per_member(
            F_SIN, y0s, (0.0, 2.0), k0=3, n0=1, n_max=3, mode="h",
            tol=0.0, maxit=4,
        )
        last = hist[-1]
        assert not np.array_equal(last.times[0], last.times[1])

    def test_device_loop_matches_host(self):
        from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
            run_adaptive_dg_hp_per_member,
        )

        y0s = np.asarray([0.7, 1.3, 1.9])
        kw = dict(k0=3, n0=1, n_max=3, mode="hp", tol=1e-7, maxit=4)
        ref = run_adaptive_dg_hp_per_member(F_SIN, y0s, (0.0, 2.0), **kw)
        dev = run_adaptive_dg_hp_per_member(
            F_SIN, y0s, (0.0, 2.0), device_loop=True, **kw
        )
        assert len(dev) == len(ref)
        for a, b in zip(dev, ref):
            np.testing.assert_array_equal(a.times, b.times)
            np.testing.assert_array_equal(a.ns, b.ns)
            np.testing.assert_array_equal(
                np.asarray(a.est_total), np.asarray(b.est_total)
            )
            assert a.n_refining == b.n_refining


class TestHPPerMemberMesh:
    def test_dp_mesh_matches_single_device(self):
        from jax.sharding import Mesh

        from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
            run_adaptive_dg_hp_per_member,
        )

        y0s = np.linspace(0.3, 2.8, 8)
        kw = dict(k0=3, n0=1, n_max=3, mode="h", tol=0.0, maxit=3,
                  device_loop=True)
        ref = run_adaptive_dg_hp_per_member(F_SIN, y0s, (0.0, 2.0), **kw)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        dp = run_adaptive_dg_hp_per_member(
            F_SIN, y0s, (0.0, 2.0), mesh=mesh, **kw
        )
        assert len(dp) == len(ref)
        np.testing.assert_array_equal(dp[-1].times, ref[-1].times)
        np.testing.assert_array_equal(dp[-1].ns, ref[-1].ns)
        np.testing.assert_array_equal(dp[-1].n_active, ref[-1].n_active)


class TestTrainThroughHPSolver:
    """A neural right-hand side trains THROUGH the mixed-order implicit
    solver on an hp-adapted partition (the reference's Main_kk1d intent
    composed with the hp axis: IFT custom_vjp at per-element orders)."""

    def test_neural_rhs_trains_on_mixed_partition(self):
        import optax

        from adjoint_ode_adaptivity_tpu.march.dg_mixed import (
            dg_march_mixed_differentiable,
        )

        mops = dg_time_operators_mixed(5)
        # an hp-style mixed partition/order assignment (as the hp loop
        # would produce): higher order where the dynamics are fastest
        times = jnp.asarray([0.0, 0.25, 0.5, 1.0, 2.0], jnp.float64)
        ns = jnp.asarray([3, 3, 2, 1], jnp.int32)

        def f_net(u, t, p):
            # tiny tanh network, elementwise over quadrature points
            h = jnp.tanh(jnp.outer(jnp.atleast_1d(u), p["w1"]) + p["b1"])
            out = h @ p["w2"]
            return jnp.reshape(out, jnp.shape(u))

        key = jax.random.PRNGKey(3)
        k1, k2 = jax.random.split(key)
        params = {
            "w1": 0.5 * jax.random.normal(k1, (8,), jnp.float64),
            "b1": jnp.zeros((8,), jnp.float64),
            "w2": 0.1 * jax.random.normal(k2, (8,), jnp.float64),
        }
        # truth: the sin(u) flow's terminal value from y0=1
        from adjoint_ode_adaptivity_tpu import odes as odes_mod

        exact = odes_mod.get_ode("du/dt=sin(u)").exact_fwd
        target = jnp.asarray(float(exact(2.0, 1.0)), jnp.float64)

        def loss_fn(p):
            u = dg_march_mixed_differentiable(
                mops, f_net, times, ns, 1.0, p, newton_tol=1e-11
            )
            return (jnp.dot((jnp.arange(6) == 1).astype(u.dtype), u[-1])
                    - target) ** 2

        tx = optax.adam(5e-2)
        opt = tx.init(params)
        loss0 = float(loss_fn(params))

        @jax.jit
        def step(p, o):
            l, g = jax.value_and_grad(loss_fn)(p)
            upd, o = tx.update(g, o)
            return optax.apply_updates(p, upd), o, l

        for _ in range(60):
            params, opt, l = step(params, opt)
        assert float(l) < 1e-3 * max(loss0, 1e-9), (loss0, float(l))


class TestHPResumeDeviceLoop:
    def test_resume_into_device_loop(self, tmp_path):
        """A host-loop checkpoint resumed into device_loop=True (and with a
        DIFFERENT maxit) continues exactly where an uninterrupted run would
        be — the fused buffers size from the restored arrays."""
        kw = dict(k0=2, n0=1, n_max=3, mode="hp", tol=0.0)
        ck = str(tmp_path / "hp_dl")
        calls = []

        def killer(result):
            calls.append(1)
            if len(calls) == 2:
                raise KeyboardInterrupt

        try:
            run_adaptive_dg_hp(
                F_SIN, 1.0, (0.0, 2.0), maxit=4, checkpoint_dir=ck,
                callback=killer, **kw
            )
        except KeyboardInterrupt:
            pass
        # resume with MORE iterations, fused
        ext = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), maxit=6, checkpoint_dir=ck,
            device_loop=True, **kw
        )
        ref = run_adaptive_dg_hp(F_SIN, 1.0, (0.0, 2.0), maxit=6, **kw)
        assert len(ext) == len(ref)
        for a, b in zip(ext, ref):
            np.testing.assert_array_equal(a.ns, b.ns)
            np.testing.assert_array_equal(a.times, b.times)

        # resume with FEWER iterations than already done: returns the
        # restored history unchanged (nothing left to run)
        short = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), maxit=1, checkpoint_dir=ck,
            device_loop=True, **kw
        )
        assert len(short) >= 2
