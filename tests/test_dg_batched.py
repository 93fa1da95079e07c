"""Batched (ensemble) DG-in-time march: parity vs the unbatched oracle,
closed-form small solves, padding contracts, the ensemble-adaptive loop,
and the NumPy reference-style baseline (matlab/dg_march.m + adj_march.m
transliteration used by bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adjoint_ode_adaptivity_tpu.adjoint.dg_time import (
    dg_adjoint_march,
    dg_element_functional,
)
from adjoint_ode_adaptivity_tpu.march.dg_batched import (
    dg_adjoint_march_batched,
    dg_element_functional_batched,
    dg_estimate_batched,
    dg_march_batched,
    solve_small,
)
from adjoint_ode_adaptivity_tpu.march.dg_time import dg_march, dg_time_operators

F_SIN = lambda u, t: jnp.sin(u)  # noqa: E731
Y0S = np.array([1.0, 0.5, 2.0, -1.0])
TIMES = np.linspace(0.0, 2.0, 9)


class TestSolveSmall:
    # n <= 4: Cramer; 5 <= n <= 8: branch-free pivoted GE; n = 9: XLA
    @pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6, 7, 8, 9])
    def test_matches_linalg(self, n):
        rng = np.random.default_rng(n)
        a = rng.normal(size=(n, n, 7)) + 3 * np.eye(n)[:, :, None]
        b = rng.normal(size=(n, 7))
        x = solve_small(jnp.asarray(a), jnp.asarray(b))
        ref = np.stack(
            [np.linalg.solve(a[:, :, i], b[:, i]) for i in range(7)], axis=-1
        )
        np.testing.assert_allclose(np.asarray(x), ref, atol=1e-10)

    def test_ge_pivoting(self):
        # zero / tiny leading diagonal entries force the per-member
        # where-swap pivoting; unpivoted GE would divide by ~0
        rng = np.random.default_rng(42)
        a = rng.normal(size=(6, 6, 5))
        a[0, 0] = 0.0
        a[1, 1, :2] = 1e-300
        b = rng.normal(size=(6, 5))
        x = solve_small(jnp.asarray(a), jnp.asarray(b))
        ref = np.stack(
            [np.linalg.solve(a[:, :, i], b[:, i]) for i in range(5)], axis=-1
        )
        np.testing.assert_allclose(np.asarray(x), ref, atol=1e-9)

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            solve_small(jnp.zeros((2, 3, 4)), jnp.zeros((2, 4)))


class TestBatchedForward:
    def test_matches_unbatched_and_iteration_counts(self):
        ops = dg_time_operators(1)
        res_b = dg_march_batched(ops, F_SIN, TIMES, Y0S)
        for i, y0 in enumerate(Y0S):
            r1 = dg_march(ops, F_SIN, TIMES, y0)
            np.testing.assert_allclose(
                np.asarray(res_b.u[i]), np.asarray(r1.u), atol=1e-13
            )
            # per-member Newton update counts match the sequential solver
            np.testing.assert_array_equal(
                np.asarray(res_b.newton_iters[i]), np.asarray(r1.newton_iters)
            )

    @pytest.mark.parametrize("n_order", [2, 3])  # Np = 3, 4: Cramer paths
    def test_higher_order_cramer(self, n_order):
        ops = dg_time_operators(n_order)
        res_b = dg_march_batched(ops, F_SIN, TIMES, Y0S[:2])
        for i, y0 in enumerate(Y0S[:2]):
            r1 = dg_march(ops, F_SIN, TIMES, y0)
            np.testing.assert_allclose(
                np.asarray(res_b.u[i]), np.asarray(r1.u), atol=1e-12
            )

    def test_np5_ge(self):
        # Np = 5 exercises the pivoted-GE solve inside the Newton loop
        ops = dg_time_operators(4)
        res_b = dg_march_batched(ops, F_SIN, TIMES[:5], Y0S[:2])
        r1 = dg_march(ops, F_SIN, TIMES[:5], Y0S[0])
        np.testing.assert_allclose(
            np.asarray(res_b.u[0]), np.asarray(r1.u), atol=1e-12
        )

    def test_fixed_iteration_count_matches_tolerance_loop(self):
        ops = dg_time_operators(1)
        res_tol = dg_march_batched(ops, F_SIN, TIMES, Y0S)
        res_fix = dg_march_batched(ops, F_SIN, TIMES, Y0S, newton_iters=8)
        np.testing.assert_allclose(
            np.asarray(res_fix.u), np.asarray(res_tol.u), atol=1e-10
        )

    def test_per_member_partitions(self):
        ops = dg_time_operators(1)
        times_b = np.stack(
            [TIMES, np.linspace(0.0, 2.0, 9) ** 1.2 / 2**0.2]
        )
        res = dg_march_batched(ops, F_SIN, times_b, Y0S[:2])
        for i in range(2):
            r1 = dg_march(ops, F_SIN, times_b[i], Y0S[i])
            np.testing.assert_allclose(
                np.asarray(res.u[i]), np.asarray(r1.u), atol=1e-13
            )

    def test_batch_mismatch_raises(self):
        ops = dg_time_operators(1)
        with pytest.raises(ValueError):
            dg_march_batched(ops, F_SIN, np.stack([TIMES] * 3), Y0S)


class TestBatchedAdjoint:
    def test_matches_unbatched(self):
        ops = dg_time_operators(1)
        ops_a = dg_time_operators(2)
        res_b = dg_march_batched(ops, F_SIN, TIMES, Y0S)
        adj_b = dg_adjoint_march_batched(ops_a, F_SIN, res_b.u, TIMES, Y0S)
        for i, y0 in enumerate(Y0S):
            a1 = dg_adjoint_march(
                ops_a, F_SIN, dg_march(ops, F_SIN, TIMES, y0).u, TIMES, y0
            )
            np.testing.assert_allclose(
                np.asarray(adj_b.v[i]), np.asarray(a1.v), atol=1e-11
            )
            np.testing.assert_allclose(
                np.asarray(adj_b.err[i]), np.asarray(a1.err), atol=1e-12
            )

    def test_functional_matches(self):
        ops = dg_time_operators(1)
        res_b = dg_march_batched(ops, F_SIN, TIMES, Y0S)
        j_b = dg_element_functional_batched(ops, res_b.u, TIMES)
        for i, y0 in enumerate(Y0S):
            j1 = dg_element_functional(
                ops, dg_march(ops, F_SIN, TIMES, y0).u, jnp.asarray(TIMES)
            )
            assert abs(float(j_b[i]) - float(j1)) < 1e-12

    def test_estimate_pipeline_effectivity(self):
        # Σ err ≈ J(fine) − J(coarse) — MAIN.m:55-76's consistency check,
        # through the fully batched pipeline
        ops = dg_time_operators(1)
        ops_a = dg_time_operators(2)
        ops_f = dg_time_operators(3)
        u, v, err = dg_estimate_batched(ops, ops_a, F_SIN, TIMES, Y0S)
        for i, y0 in enumerate(Y0S):
            j_c = float(dg_element_functional(ops, u[i], jnp.asarray(TIMES)))
            rf = dg_march(ops_f, F_SIN, TIMES, y0)
            j_f = float(dg_element_functional(ops_f, rf.u, jnp.asarray(TIMES)))
            est = float(jnp.sum(err[i]))
            gap = j_f - j_c
            # n+1-order adjoint weighting estimates the gap up to
            # higher-order terms: ~1% at this coarse K=8 partition (small
            # gaps, e.g. y0=2 at 1.4e-5, carry a few-µ absolute floor)
            assert abs(est - gap) <= 0.05 * abs(gap) + 2e-6, (est, gap)


class TestBatchedPadding:
    """Zero-width slabs must be exact identities — the repo-wide padding
    contract, now for the Cramer-solve batched kernels."""

    def test_zero_width_slab_is_identity(self):
        ops = dg_time_operators(1)
        ops_a = dg_time_operators(2)
        t_pad = np.concatenate([TIMES, [TIMES[-1]] * 3])  # 3 zero-width slabs
        res = dg_march_batched(ops, F_SIN, t_pad, Y0S)
        adj = dg_adjoint_march_batched(ops_a, F_SIN, res.u, t_pad, Y0S)
        res_ref = dg_march_batched(ops, F_SIN, TIMES, Y0S)
        adj_ref = dg_adjoint_march_batched(ops_a, F_SIN, res_ref.u, TIMES, Y0S)
        k = len(TIMES) - 1
        # active prefix identical
        np.testing.assert_allclose(
            np.asarray(res.u[:, :k]), np.asarray(res_ref.u), atol=1e-13
        )
        np.testing.assert_allclose(
            np.asarray(adj.v[:, :k]), np.asarray(adj_ref.v), atol=1e-11
        )
        # padding slabs: constant-state forward, inert adjoint, zero error
        end = res.u[:, k - 1, -1]
        for kp in range(k, k + 3):
            np.testing.assert_allclose(
                np.asarray(res.u[:, kp]),
                np.asarray(end)[:, None] * np.ones(ops.np_),
                atol=1e-13,
            )
            np.testing.assert_allclose(np.asarray(adj.err[:, kp]), 0.0, atol=1e-13)
        # functional unchanged by padding
        np.testing.assert_allclose(
            np.asarray(dg_element_functional_batched(ops, res.u, t_pad)),
            np.asarray(dg_element_functional_batched(ops, res_ref.u, TIMES)),
            atol=1e-13,
        )


class TestNumpyBaselineParity:
    def test_baseline_matches_jax_pipeline(self):
        from adjoint_ode_adaptivity_tpu.utils.benchmarks import (
            numpy_dg_pipeline_baseline,
        )

        result, u_np, err_np = numpy_dg_pipeline_baseline(
            1, TIMES, np.array([0.7]), return_outputs=True
        )
        assert result.slabs_measured == 2 * (len(TIMES) - 1)
        ops = dg_time_operators(1)
        ops_a = dg_time_operators(2)
        r = dg_march(ops, F_SIN, TIMES, 0.7)
        a = dg_adjoint_march(ops_a, F_SIN, r.u, TIMES, 0.7)
        np.testing.assert_allclose(u_np, np.asarray(r.u), atol=1e-12)
        np.testing.assert_allclose(err_np, np.asarray(a.err), atol=1e-13)

    def test_faithful_baseline_matches_jax_pipeline(self):
        """The fem_setup-per-element FAITHFUL baseline (the hp strand's
        pinned denominator) must compute the same forward solution AND
        the same per-element AWR error contributions as the real
        solvers — its cost model is only honest if its math is."""
        from adjoint_ode_adaptivity_tpu.utils.benchmarks import (
            numpy_dg_hp_faithful_baseline,
        )

        k = len(TIMES) - 1
        result, u_np, err_np = numpy_dg_hp_faithful_baseline(
            np.ones(k, int), TIMES, np.array([0.7]), return_outputs=True
        )
        assert result.slabs_measured == 2 * k
        ops = dg_time_operators(1)
        ops_a = dg_time_operators(2)
        r = dg_march(ops, F_SIN, TIMES, 0.7)
        a = dg_adjoint_march(ops_a, F_SIN, r.u, TIMES, 0.7)
        np.testing.assert_allclose(
            np.stack(u_np), np.asarray(r.u), atol=1e-12
        )
        np.testing.assert_allclose(err_np, np.asarray(a.err), atol=1e-12)


class TestEnsembleAdaptiveLoop:
    def test_matches_single_member_padded_loop(self):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg,
            run_adaptive_dg_ensemble,
        )

        hist_e = run_adaptive_dg_ensemble(
            F_SIN, np.array([1.0]), (0.0, 2.0), k0=2, maxit=4, tol=0.0
        )
        hist_1 = run_adaptive_dg(
            F_SIN, 1.0, (0.0, 2.0), k0=2, maxit=4, tol=0.0, padded=True
        )
        # same bisection decisions -> identical partition sequences
        for re_, r1 in zip(hist_e, hist_1):
            np.testing.assert_allclose(re_.times, r1.times, atol=1e-13)
            np.testing.assert_allclose(
                re_.err_mean, np.abs(r1.err), atol=1e-12
            )

    def test_ensemble_mean_signal_converges(self):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_ensemble,
        )

        rng = np.random.default_rng(0)
        y0s = rng.uniform(0.5, 2.0, size=8)
        hist = run_adaptive_dg_ensemble(
            F_SIN, y0s, (0.0, 2.0), k0=2, maxit=6, tol=0.0, newton_iters=8
        )
        assert len(hist) == 7
        assert abs(hist[-1].est_total_mean) < abs(hist[0].est_total_mean)
        # partitions grow by exactly one node per iteration
        assert len(hist[-1].times) == len(hist[0].times) + 6


class TestPerMemberAdaptiveLoop:
    """Per-member partitions: the reference's one-adaptive-run-per-IC job
    farm (Submit_schedule_frontera/main_serial.sh) in one compile-once jit."""

    def test_matches_independent_runs(self):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_ensemble,
            run_adaptive_dg_per_member,
        )

        y0s = np.array([0.7, 1.3, 2.1])
        kw = dict(k0=3, maxit=3, tol=0.0, newton_iters=8)
        hp = run_adaptive_dg_per_member(F_SIN, y0s, (0.0, 2.0), **kw)
        assert len(hp) == 4
        # oracle: each member as an independent B=1 ensemble-loop run
        # (identical batched pipeline, so identical to roundoff)
        for b in range(3):
            h1 = run_adaptive_dg_ensemble(F_SIN, y0s[b : b + 1], (0.0, 2.0), **kw)
            for it in range(len(hp)):
                na = hp[it].n_active[b]
                np.testing.assert_allclose(
                    hp[it].times[b, : na + 1], h1[it].times, atol=1e-13
                )
                np.testing.assert_allclose(
                    hp[it].est_total[b], h1[it].est_total_mean, rtol=1e-10
                )

    def test_tol_freezes_members_independently(self):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_per_member,
        )

        y0s = np.array([0.7, 1.3, 2.1])
        h = run_adaptive_dg_per_member(
            F_SIN, y0s, (0.0, 2.0), k0=3, maxit=8, tol=3e-5, newton_iters=8
        )
        last = h[-1]
        # members converge at different iterations -> different K
        assert len(set(last.n_active.tolist())) > 1
        for b in range(3):
            na = last.n_active[b]
            # live slabs strictly increasing, padded tail exactly frozen
            assert np.all(np.diff(last.times[b, : na + 1]) > 0)
            np.testing.assert_array_equal(
                last.times[b, na:], np.full(last.times.shape[1] - na, 2.0)
            )
        # a frozen member's estimate stops changing across iterations
        frozen_b = int(np.argmin(last.n_active))
        est_seq = [r.est_total[frozen_b] for r in h]
        assert est_seq[-1] == est_seq[-2]

    def test_all_members_converged_stops_early(self):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_per_member,
        )

        h = run_adaptive_dg_per_member(
            F_SIN, np.array([1.0, 1.5]), (0.0, 2.0), k0=3, maxit=20,
            tol=1e-4, newton_iters=8,
        )
        assert h[-1].n_refining == 0
        assert len(h) < 21


class TestPerMemberDeviceLoop:
    """device_loop=True: the whole adaptive loop as ONE lax.while_loop
    dispatch with on-device early exit; history must be bit-identical to
    the per-iteration host loop."""

    def test_matches_host_loop(self):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_per_member,
        )

        y0s = np.random.default_rng(4).uniform(0.5, 2.0, 8)
        kw = dict(k0=3, maxit=5, tol=3e-5, newton_iters=8)
        h_host = run_adaptive_dg_per_member(F_SIN, y0s, (0.0, 2.0), **kw)
        h_dev = run_adaptive_dg_per_member(
            F_SIN, y0s, (0.0, 2.0), device_loop=True, **kw
        )
        assert len(h_dev) == len(h_host)
        for rd, rh in zip(h_dev, h_host):
            np.testing.assert_array_equal(rd.times, rh.times)
            np.testing.assert_array_equal(rd.n_active, rh.n_active)
            np.testing.assert_array_equal(rd.err, rh.err)
            np.testing.assert_array_equal(rd.est_total, rh.est_total)
            assert rd.n_refining == rh.n_refining

    def test_early_exit_on_device(self):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_per_member,
        )

        h = run_adaptive_dg_per_member(
            F_SIN, np.array([1.0, 1.5]), (0.0, 2.0), k0=3, maxit=25,
            tol=1e-4, newton_iters=8, device_loop=True,
        )
        assert h[-1].n_refining == 0
        assert len(h) < 26

    def test_checkpoint_resume_fused(self, tmp_path):
        # a fused run saves ONE end-of-run checkpoint; a second fused run
        # with larger maxit resumes from it and matches the uninterrupted
        # history
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_per_member,
        )

        y0s = np.random.default_rng(6).uniform(0.5, 2.0, 4)
        kw = dict(k0=3, tol=3e-5, newton_iters=8, device_loop=True)
        ref = run_adaptive_dg_per_member(F_SIN, y0s, (0.0, 2.0), maxit=6, **kw)
        ck = str(tmp_path / "dgpm_fused")
        run_adaptive_dg_per_member(
            F_SIN, y0s, (0.0, 2.0), maxit=2, checkpoint_dir=ck, **kw
        )
        full = run_adaptive_dg_per_member(
            F_SIN, y0s, (0.0, 2.0), maxit=6, checkpoint_dir=ck, **kw
        )
        assert len(full) == len(ref)
        for r_res, r_ref in zip(full, ref):
            n_pad = min(r_res.times.shape[1], r_ref.times.shape[1])
            np.testing.assert_allclose(
                r_res.times[:, :n_pad], r_ref.times[:, :n_pad], atol=1e-12
            )
            np.testing.assert_array_equal(r_res.n_active, r_ref.n_active)
            assert r_res.n_refining == r_ref.n_refining


class TestBatchedIFT:
    """Batched implicit-function-theorem slab solver: jax.grad through the
    ensemble Newton march (the batched form of make_dg_slab_solver)."""

    def test_forward_and_grads_match_unbatched(self):
        from adjoint_ode_adaptivity_tpu.march.dg_batched import (
            dg_march_batched_differentiable,
        )
        from adjoint_ode_adaptivity_tpu.march.dg_time import (
            dg_march_differentiable,
        )

        ops = dg_time_operators(1)
        f_p = lambda u, t, p: jnp.sin(p * u)  # noqa: E731
        theta = 1.3
        y0s = Y0S[:3]
        u_b = dg_march_batched_differentiable(ops, f_p, TIMES, y0s, theta)
        for i, y0 in enumerate(y0s):
            u1 = dg_march_differentiable(ops, f_p, TIMES, y0, theta)
            np.testing.assert_allclose(
                np.asarray(u_b[i]), np.asarray(u1), atol=1e-13
            )
        # parameter gradient == sum of per-member unbatched gradients
        g_b = jax.grad(
            lambda p: jnp.sum(
                dg_march_batched_differentiable(ops, f_p, TIMES, y0s, p)[
                    :, -1, -1
                ]
            )
        )(theta)
        g_1 = sum(
            float(
                jax.grad(
                    lambda p, y0=y0: dg_march_differentiable(
                        ops, f_p, TIMES, y0, p
                    )[-1, -1]
                )(theta)
            )
            for y0 in y0s
        )
        assert abs(float(g_b) - g_1) < 1e-12
        # initial-condition gradients, member-wise
        gy = jax.grad(
            lambda y: jnp.sum(
                dg_march_batched_differentiable(ops, f_p, TIMES, y, theta)[
                    :, -1, -1
                ]
            )
        )(jnp.asarray(y0s))
        for i, y0 in enumerate(y0s):
            g1 = float(
                jax.grad(
                    lambda y: dg_march_differentiable(
                        ops, f_p, TIMES, y, theta
                    )[-1, -1]
                )(y0)
            )
            assert abs(float(gy[i]) - g1) < 1e-12

    def test_train_nn_rhs_through_implicit_solver(self):
        # neural right-hand side trained through the batched IFT solver
        # over the whole IC ensemble (the reference's Main_kk1d intent at
        # ensemble scale)
        from adjoint_ode_adaptivity_tpu.march.dg_batched import (
            dg_march_batched_differentiable,
        )

        ops = dg_time_operators(1)
        rng = np.random.default_rng(0)
        params = {
            "w1": jnp.asarray(rng.normal(size=(1, 8)) * 0.5),
            "b1": jnp.zeros((8,)),
            "w2": jnp.asarray(rng.normal(size=(8, 1)) * 0.5),
        }

        def f_net(u, t, p):
            # elementwise MLP: u (..., ) -> tanh((u-b)@w1)@w2
            h = jnp.tanh(u[..., None] * p["w1"][0] + p["b1"])
            return (h @ p["w2"])[..., 0]

        times = np.linspace(0.0, 1.0, 5)
        y0s = jnp.asarray(rng.uniform(0.5, 1.5, 16))
        # target: u' = sin(u) terminal values
        target = dg_march_batched_differentiable(
            ops, lambda u, t, p: jnp.sin(u), times, y0s, None
        )[:, -1, -1]

        def loss(p):
            u = dg_march_batched_differentiable(ops, f_net, times, y0s, p)
            return jnp.mean((u[:, -1, -1] - target) ** 2)

        l0 = float(loss(params))
        lr = 0.5
        for _ in range(25):
            g = jax.grad(loss)(params)
            params = jax.tree_util.tree_map(lambda a, b: a - lr * b, params, g)
        l1 = float(loss(params))
        assert np.isfinite(l1) and l1 < l0 / 5, (l0, l1)
