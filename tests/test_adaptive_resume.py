"""Checkpoint/resume for the adaptive loops: a killed run resumed from the
latest orbax checkpoint reproduces the uninterrupted run's history exactly
(SURVEY.md §5 dings the reference for restart-from-scratch)."""
import jax.numpy as jnp
import numpy as np


F_SIN = lambda u, t: jnp.sin(u)  # noqa: E731


class TestFDResume:
    def test_kill_and_resume_matches_uninterrupted(self, tmp_path):
        from adjoint_ode_adaptivity_tpu import odes
        from adjoint_ode_adaptivity_tpu.adapt import run_adaptive_fd
        from adjoint_ode_adaptivity_tpu.march import euler_step

        step = euler_step(odes.get_ode("du/dt=sin(u)").f)
        kw = dict(
            n_steps0=2, functional_name="J=int(u^2)", ref_factor=4, tol=0.0
        )
        ref = run_adaptive_fd(step, 1.0, (0.0, 2.0), maxit=5, **kw)

        ck = str(tmp_path / "fd")
        # simulate a kill: the process dies mid-loop after 3 iterations
        # (same maxit -> same padded shapes as the uninterrupted run)
        calls = []

        def killer(result):
            calls.append(1)
            if len(calls) == 3:
                raise KeyboardInterrupt

        try:
            run_adaptive_fd(
                step, 1.0, (0.0, 2.0), maxit=5, checkpoint_dir=ck,
                callback=killer, **kw
            )
            raise AssertionError("killer did not fire")
        except KeyboardInterrupt:
            pass
        full = run_adaptive_fd(
            step, 1.0, (0.0, 2.0), maxit=5, checkpoint_dir=ck, **kw
        )
        assert len(full) == len(ref) == 6
        for r_res, r_ref in zip(full, ref):
            np.testing.assert_array_equal(
                np.asarray(r_res.times_used), np.asarray(r_ref.times_used)
            )
            np.testing.assert_array_equal(
                np.asarray(r_res.err_steps), np.asarray(r_ref.err_steps)
            )
            assert float(r_res.err_total) == float(r_ref.err_total)
            assert float(r_res.j_coarse) == float(r_ref.j_coarse)


class TestDGResume:
    def test_kill_and_resume_matches_uninterrupted(self, tmp_path):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import run_adaptive_dg

        kw = dict(n_order=1, k0=2, tol=0.0, padded=True)
        ref = run_adaptive_dg(F_SIN, 1.0, (0.0, 2.0), maxit=4, **kw)

        ck = str(tmp_path / "dg")
        # simulate a kill after 2 iterations (same maxit -> same padded
        # shapes as the uninterrupted run)
        calls = []

        def killer(result):
            calls.append(1)
            if len(calls) == 2:
                raise KeyboardInterrupt

        try:
            run_adaptive_dg(
                F_SIN, 1.0, (0.0, 2.0), maxit=4, checkpoint_dir=ck,
                callback=killer, **kw
            )
            raise AssertionError("killer did not fire")
        except KeyboardInterrupt:
            pass
        full = run_adaptive_dg(
            F_SIN, 1.0, (0.0, 2.0), maxit=4, checkpoint_dir=ck, **kw
        )
        assert len(full) == len(ref) == 5
        for r_res, r_ref in zip(full, ref):
            np.testing.assert_array_equal(r_res.times, r_ref.times)
            np.testing.assert_array_equal(r_res.err, r_ref.err)
            assert r_res.est_total == r_ref.est_total
            assert r_res.j_coarse == r_ref.j_coarse

    def test_finished_run_resumes_to_noop(self, tmp_path):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import run_adaptive_dg

        ck = str(tmp_path / "dg2")
        kw = dict(n_order=1, k0=2, tol=1e-3, maxit=6, checkpoint_dir=ck)
        first = run_adaptive_dg(F_SIN, 1.0, (0.0, 2.0), **kw)
        assert abs(first[-1].est_total) < 1e-3
        again = run_adaptive_dg(F_SIN, 1.0, (0.0, 2.0), **kw)
        assert len(again) == len(first)
        assert again[-1].est_total == first[-1].est_total


class TestAdvecResume:
    def test_kill_and_resume_matches_uninterrupted(self, tmp_path):
        from adjoint_ode_adaptivity_tpu.adapt.advec_loop import (
            run_adaptive_advec,
        )

        kw = dict(n_order=2, k0=10, final_time=0.05, tol=0.0)
        ref = run_adaptive_advec(lambda x: np.sin(x), maxit=3, **kw)

        ck = str(tmp_path / "advec")
        part = run_adaptive_advec(
            lambda x: np.sin(x), maxit=1, checkpoint_dir=ck, **kw
        )
        assert len(part) == 2
        full = run_adaptive_advec(
            lambda x: np.sin(x), maxit=3, checkpoint_dir=ck, **kw
        )
        assert len(full) == len(ref) == 4
        for r_res, r_ref in zip(full, ref):
            np.testing.assert_array_equal(r_res.vx, r_ref.vx)
            np.testing.assert_array_equal(r_res.eta, r_ref.eta)
            assert r_res.j_value == r_ref.j_value


class TestDGEnsembleResume:
    def test_kill_and_resume_matches_uninterrupted(self, tmp_path):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_ensemble,
        )

        y0s = np.random.default_rng(7).uniform(0.5, 2.0, 16)
        kw = dict(k0=2, tol=0.0, newton_iters=8)
        ref = run_adaptive_dg_ensemble(F_SIN, y0s, (0.0, 2.0), maxit=4, **kw)

        ck = str(tmp_path / "dge")
        # "kill" after 2 iterations via a smaller maxit BUT the padded
        # shape depends on maxit — resume re-pads, and the batched
        # pipeline's padding slabs are exact identities, so results match
        part = run_adaptive_dg_ensemble(
            F_SIN, y0s, (0.0, 2.0), maxit=1, checkpoint_dir=ck, **kw
        )
        assert len(part) == 2
        full = run_adaptive_dg_ensemble(
            F_SIN, y0s, (0.0, 2.0), maxit=4, checkpoint_dir=ck, **kw
        )
        assert len(full) == len(ref) == 5
        for r_res, r_ref in zip(full, ref):
            np.testing.assert_allclose(r_res.times, r_ref.times, atol=1e-12)
            np.testing.assert_allclose(
                r_res.err_mean, r_ref.err_mean, atol=1e-12
            )
            assert abs(r_res.est_total_mean - r_ref.est_total_mean) < 1e-12

    def test_resume_with_smaller_maxit_re_pads_correctly(self, tmp_path):
        # review finding (round 3): a checkpoint whose padded partition is
        # LONGER than the resumed run's would misalign the packed-diag
        # unpack; the loop now sizes max_k = max(new, restored)
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_ensemble,
        )

        y0s = np.random.default_rng(11).uniform(0.5, 2.0, 16)
        ck = str(tmp_path / "dge2")
        # stops after the FIRST iteration (est < huge tol) but pads to
        # maxit=6 size; the checkpoint holds the longer partition
        first = run_adaptive_dg_ensemble(
            F_SIN, y0s, (0.0, 2.0), k0=2, maxit=6, tol=1e10,
            newton_iters=8, checkpoint_dir=ck,
        )
        assert len(first) == 1
        resumed = run_adaptive_dg_ensemble(
            F_SIN, y0s, (0.0, 2.0), k0=2, maxit=3, tol=0.0,
            newton_iters=8, checkpoint_dir=ck,
        )
        ref = run_adaptive_dg_ensemble(
            F_SIN, y0s, (0.0, 2.0), k0=2, maxit=3, tol=0.0, newton_iters=8
        )
        # the tol-stopped checkpoint holds the UNREFINED partition, so the
        # resumed run re-solves it once (entry 1 == entry 0's grid) and is
        # thereafter one refinement behind the uninterrupted run — entry i
        # of the resume matches entry i−1 of the reference, at the longer
        # padding (exact identity). Garbage from a misaligned diag unpack
        # would break every one of these equalities.
        assert len(resumed) == 4
        np.testing.assert_allclose(
            resumed[1].times, resumed[0].times, atol=1e-12
        )
        for i in range(1, 4):
            np.testing.assert_allclose(
                resumed[i].times, ref[i - 1].times, atol=1e-12
            )
            assert (
                abs(resumed[i].est_total_mean - ref[i - 1].est_total_mean)
                < 1e-12
            )


class TestDGPerMemberResume:
    def test_kill_and_resume_matches_uninterrupted(self, tmp_path):
        # per-member loop: the checkpoint carries each member's partition
        # AND its refining mask; a resumed run (with re-padding for the
        # larger maxit) must reproduce the uninterrupted history exactly
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_per_member,
        )

        y0s = np.random.default_rng(13).uniform(0.5, 2.0, 8)
        kw = dict(k0=3, tol=3e-5, newton_iters=8)
        ref = run_adaptive_dg_per_member(F_SIN, y0s, (0.0, 2.0), maxit=6, **kw)

        ck = str(tmp_path / "dgpm")
        part = run_adaptive_dg_per_member(
            F_SIN, y0s, (0.0, 2.0), maxit=2, checkpoint_dir=ck, **kw
        )
        assert len(part) == 3
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
            np.testing.assert_allclose(
                r_res.est_total, r_ref.est_total, atol=1e-12
            )
            assert r_res.n_refining == r_ref.n_refining


class TestResumeHardening:
    """Review findings (round 3): resumes that come from a run with a
    LARGER maxit, saturation stops, and zero-iteration resumes."""

    def test_fd_resume_smaller_maxit_device_loop(self, tmp_path):
        # the restored grid is WIDER than this run's max_nodes; the
        # device-loop buffers must size to the restored width (previously a
        # dynamic_update_slice trace error)
        from adjoint_ode_adaptivity_tpu import odes
        from adjoint_ode_adaptivity_tpu.adapt import run_adaptive_fd
        from adjoint_ode_adaptivity_tpu.march import euler_step

        step = euler_step(odes.get_ode("du/dt=sin(u)").f)
        kw = dict(n_steps0=2, functional_name="J=int(u^2)", ref_factor=4,
                  tol=0.0)
        ck = str(tmp_path / "fd_small")
        first = run_adaptive_fd(
            step, 1.0, (0.0, 2.0), maxit=8, checkpoint_dir=ck, **kw
        )
        assert len(first) == 9
        resumed = run_adaptive_fd(
            step, 1.0, (0.0, 2.0), maxit=3, checkpoint_dir=ck,
            device_loop=True, **kw
        )
        # it0 > maxit: nothing new to do, the restored history returns
        assert len(resumed) == len(first)
        assert float(resumed[-1].err_total) == float(first[-1].err_total)

    def test_hp_saturation_resume_is_noop(self, tmp_path):
        # p-mode saturates every live element at n_max with tol=0; the
        # saturation stop is persisted, so re-invoking with the same
        # checkpoint must NOT append a duplicate iteration
        from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
            run_adaptive_dg_hp,
        )

        kw = dict(k0=2, n0=1, n_max=2, mode="p", tol=0.0, maxit=8)
        ck = str(tmp_path / "hp_sat")
        first = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), checkpoint_dir=ck, **kw
        )
        assert len(first) < 9  # saturated before maxit
        again = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), checkpoint_dir=ck, **kw
        )
        assert len(again) == len(first)
        # same through the fused device loop
        ck2 = str(tmp_path / "hp_sat_dev")
        first_d = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), checkpoint_dir=ck2, device_loop=True,
            **kw
        )
        assert len(first_d) == len(first)
        again_d = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), checkpoint_dir=ck2, device_loop=True,
            **kw
        )
        assert len(again_d) == len(first_d)

    def test_hp_resume_smaller_maxit(self, tmp_path):
        # the hp loop sizes max_k (and bakes kernels) from the WIDER of
        # this run's maxit and the restored partition
        from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
            run_adaptive_dg_hp,
        )

        kw = dict(k0=2, n0=1, n_max=3, mode="hp", tol=0.0)
        ck = str(tmp_path / "hp_small")
        first = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), maxit=6, checkpoint_dir=ck, **kw
        )
        assert len(first) == 7
        resumed = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), maxit=2, checkpoint_dir=ck, **kw
        )
        assert len(resumed) == len(first)
        assert float(resumed[-1].est_total) == float(first[-1].est_total)

    def test_hp_pm_zero_iteration_resume_no_resave(self, tmp_path):
        # a resume whose checkpoint already holds maxit+1 iterations runs
        # ZERO new iterations; the device loop must not re-save at an
        # existing orbax step (previously unguarded)
        from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
            run_adaptive_dg_hp_per_member,
        )

        y0s = np.linspace(0.6, 1.4, 8)
        kw = dict(k0=3, n0=1, n_max=3, mode="hp", tol=0.0, maxit=2,
                  newton_iters=8)
        ck = str(tmp_path / "hppm0")
        first = run_adaptive_dg_hp_per_member(
            F_SIN, y0s, (0.0, 2.0), checkpoint_dir=ck, **kw
        )
        assert len(first) == 3 and first[-1].n_refining > 0
        again = run_adaptive_dg_hp_per_member(
            F_SIN, y0s, (0.0, 2.0), checkpoint_dir=ck, device_loop=True,
            **kw
        )
        assert len(again) == len(first)


class TestHPResume:
    def test_kill_and_resume_matches_uninterrupted(self, tmp_path):
        from adjoint_ode_adaptivity_tpu.adapt.hp_loop import run_adaptive_dg_hp

        kw = dict(k0=2, n0=1, n_max=3, mode="hp", tol=0.0, maxit=5)
        ref = run_adaptive_dg_hp(F_SIN, 1.0, (0.0, 2.0), **kw)

        ck = str(tmp_path / "hp")
        calls = []

        def killer(result):
            calls.append(1)
            if len(calls) == 3:
                raise KeyboardInterrupt

        try:
            run_adaptive_dg_hp(
                F_SIN, 1.0, (0.0, 2.0), checkpoint_dir=ck, callback=killer,
                **kw
            )
            raise AssertionError("killer did not fire")
        except KeyboardInterrupt:
            pass
        full = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), checkpoint_dir=ck, **kw
        )
        assert len(full) == len(ref) == 6
        for r_res, r_ref in zip(full, ref):
            np.testing.assert_array_equal(r_res.times, r_ref.times)
            np.testing.assert_array_equal(r_res.ns, r_ref.ns)
            np.testing.assert_array_equal(
                np.asarray(r_res.err), np.asarray(r_ref.err)
            )
            assert float(r_res.est_total) == float(r_ref.est_total)


class TestHPPerMemberResume:
    def test_kill_and_resume_matches_uninterrupted(self, tmp_path):
        # per-member hp loop: the checkpoint carries each member's
        # partition, ORDER VECTOR and refining mask; a resumed run (with
        # re-padding for the larger maxit) reproduces the uninterrupted
        # history on the live slots
        from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
            run_adaptive_dg_hp_per_member,
        )

        y0s = np.random.default_rng(17).uniform(0.5, 2.0, 8)
        kw = dict(k0=3, n0=1, n_max=3, mode="hp", tol=1e-6, newton_iters=8)
        ref = run_adaptive_dg_hp_per_member(
            F_SIN, y0s, (0.0, 2.0), maxit=5, **kw
        )

        ck = str(tmp_path / "hppm")
        part = run_adaptive_dg_hp_per_member(
            F_SIN, y0s, (0.0, 2.0), maxit=1, checkpoint_dir=ck, **kw
        )
        assert len(part) == 2
        full = run_adaptive_dg_hp_per_member(
            F_SIN, y0s, (0.0, 2.0), maxit=5, checkpoint_dir=ck, **kw
        )
        assert len(full) == len(ref)
        for r_res, r_ref in zip(full, ref):
            k_pad = min(r_res.ns.shape[1], r_ref.ns.shape[1])
            np.testing.assert_allclose(
                r_res.times[:, : k_pad + 1], r_ref.times[:, : k_pad + 1],
                atol=1e-12,
            )
            np.testing.assert_array_equal(
                r_res.ns[:, :k_pad], r_ref.ns[:, :k_pad]
            )
            np.testing.assert_array_equal(r_res.n_active, r_ref.n_active)
            np.testing.assert_allclose(
                r_res.est_total, r_ref.est_total, atol=1e-12
            )
            assert r_res.n_refining == r_ref.n_refining
        # resume into the fused device loop: continues to the same end
        fused = run_adaptive_dg_hp_per_member(
            F_SIN, y0s, (0.0, 2.0), maxit=5, checkpoint_dir=ck,
            device_loop=True, **kw
        )
        assert len(fused) == len(ref)  # checkpoint at maxit=5 is complete:
        # no new work, restored history returned as-is
