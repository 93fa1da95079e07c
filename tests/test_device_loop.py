"""Fully on-device adaptive loops (device_loop=True): the whole
study — solve, estimate, refine, stopping test — as ONE lax.while_loop
dispatch with preallocated history buffers and on-device early exit.
History must be bit-identical to the per-iteration host-loop mode.

(The per-member DG ensemble variant is covered in test_dg_batched.py /
test_pallas_dg_slab.py.)"""
import jax.numpy as jnp
import numpy as np
import pytest

F_SIN = lambda u, t: jnp.sin(u)  # noqa: E731


class TestFDDeviceLoop:
    def _kw(self, **over):
        kw = dict(
            n_steps0=2, functional_name="J=int(u^2)", ref_factor=4,
            tol=1e-4, maxit=8,
        )
        kw.update(over)
        return kw

    def test_matches_host_loop(self):
        from adjoint_ode_adaptivity_tpu import odes
        from adjoint_ode_adaptivity_tpu.adapt import run_adaptive_fd
        from adjoint_ode_adaptivity_tpu.march import euler_step

        step = euler_step(odes.get_ode("du/dt=sin(u)").f)
        h_host = run_adaptive_fd(step, 1.0, (0.0, 2.0), **self._kw())
        h_dev = run_adaptive_fd(
            step, 1.0, (0.0, 2.0), device_loop=True, **self._kw()
        )
        assert len(h_dev) == len(h_host)
        for rd, rh in zip(h_dev, h_host):
            np.testing.assert_array_equal(
                np.asarray(rd.times_used), np.asarray(rh.times_used)
            )
            np.testing.assert_array_equal(
                np.asarray(rd.u), np.asarray(rh.u)
            )
            np.testing.assert_array_equal(
                np.asarray(rd.v), np.asarray(rh.v)
            )
            np.testing.assert_array_equal(
                np.asarray(rd.err_steps), np.asarray(rh.err_steps)
            )
            assert float(rd.err_total) == float(rh.err_total)
            assert float(rd.j_coarse) == float(rh.j_coarse)
            assert int(rd.state.n_active) == int(rh.state.n_active)
            np.testing.assert_array_equal(
                np.asarray(rd.state.times), np.asarray(rh.state.times)
            )

    def test_early_exit_on_device(self):
        from adjoint_ode_adaptivity_tpu import odes
        from adjoint_ode_adaptivity_tpu.adapt import run_adaptive_fd
        from adjoint_ode_adaptivity_tpu.march import euler_step

        step = euler_step(odes.get_ode("du/dt=sin(u)").f)
        h = run_adaptive_fd(
            step, 1.0, (0.0, 2.0), device_loop=True,
            **self._kw(tol=0.2, maxit=30),
        )
        assert float(h[-1].err_total) <= 0.2
        assert len(h) < 31  # stopped on device before maxit

    def test_callback_fires_in_order(self):
        from adjoint_ode_adaptivity_tpu import odes
        from adjoint_ode_adaptivity_tpu.adapt import run_adaptive_fd
        from adjoint_ode_adaptivity_tpu.march import euler_step

        step = euler_step(odes.get_ode("du/dt=sin(u)").f)
        seen = []
        h = run_adaptive_fd(
            step, 1.0, (0.0, 2.0), device_loop=True,
            callback=lambda r: seen.append(int(r.n_steps_used)),
            **self._kw(maxit=4, tol=0.0),
        )
        assert seen == [int(r.n_steps_used) for r in h]
        assert seen == sorted(seen)  # refinement grows the grid

    def test_checkpoint_resume_fused(self, tmp_path):
        from adjoint_ode_adaptivity_tpu import odes
        from adjoint_ode_adaptivity_tpu.adapt import run_adaptive_fd
        from adjoint_ode_adaptivity_tpu.march import euler_step

        step = euler_step(odes.get_ode("du/dt=sin(u)").f)
        kw = self._kw(tol=0.0)
        ref = run_adaptive_fd(step, 1.0, (0.0, 2.0), device_loop=True,
                              maxit=5, **{k: v for k, v in kw.items()
                                          if k != "maxit"})
        ck = str(tmp_path / "fd_fused")
        kw2 = {k: v for k, v in kw.items() if k != "maxit"}
        run_adaptive_fd(step, 1.0, (0.0, 2.0), device_loop=True, maxit=2,
                        checkpoint_dir=ck, max_nodes=2 + 5 + 2, **kw2)
        full = run_adaptive_fd(step, 1.0, (0.0, 2.0), device_loop=True,
                               maxit=5, checkpoint_dir=ck, **kw2)
        assert len(full) == len(ref) == 6
        for r_res, r_ref in zip(full, ref):
            np.testing.assert_array_equal(
                np.asarray(r_res.times_used), np.asarray(r_ref.times_used)
            )
            assert float(r_res.err_total) == float(r_ref.err_total)


class TestFDPerMember:
    """Per-member FD adaptive: B independent Main_finite_difference.py
    studies (one per IC — the reference's one-job-per-config farm) in one
    vmapped compile-once jit."""

    def _step(self):
        from adjoint_ode_adaptivity_tpu import odes
        from adjoint_ode_adaptivity_tpu.march import euler_step

        return euler_step(odes.get_ode("du/dt=sin(u)").f)

    def test_matches_independent_runs(self):
        from adjoint_ode_adaptivity_tpu.adapt.fd_loop import (
            run_adaptive_fd,
            run_adaptive_fd_per_member,
        )

        step = self._step()
        u0s = np.array([0.7, 1.0, 1.6])
        kw = dict(
            n_steps0=2, functional_name="J=int(u^2)", ref_factor=4,
            tol=0.15, maxit=8,
        )
        hp = run_adaptive_fd_per_member(step, u0s, (0.0, 2.0), **kw)
        for bm in range(3):
            h1 = run_adaptive_fd(step, float(u0s[bm]), (0.0, 2.0), **kw)
            # until member bm freezes, its rows equal the solo study
            for it in range(len(h1)):
                r1, rp = h1[it], hp[it]
                np.testing.assert_array_equal(
                    np.asarray(r1.times_used), rp.times[bm]
                )
                np.testing.assert_array_equal(
                    np.asarray(r1.err_steps), rp.err_steps[bm]
                )
                assert float(r1.err_total) == rp.err_total[bm]
                assert float(r1.j_coarse) == rp.j_coarse[bm]
                assert int(r1.n_steps_used) == rp.n_active[bm]
            # after it freezes, its grid stops changing
            for it in range(len(h1), len(hp)):
                np.testing.assert_array_equal(
                    hp[it].times[bm], hp[len(h1) - 1].times[bm]
                )

    def test_members_freeze_independently(self):
        from adjoint_ode_adaptivity_tpu.adapt.fd_loop import (
            run_adaptive_fd_per_member,
        )

        hp = run_adaptive_fd_per_member(
            self._step(), np.array([0.4, 1.0, 1.6, 2.2]), (0.0, 2.0),
            n_steps0=2, tol=0.15, maxit=12,
        )
        last = hp[-1]
        assert last.n_refining == 0
        assert len(set(last.n_active.tolist())) > 1
        assert len(hp) < 13

    def test_device_loop_matches_host(self):
        from adjoint_ode_adaptivity_tpu.adapt.fd_loop import (
            run_adaptive_fd_per_member,
        )

        u0s = np.array([0.7, 1.0, 1.6])
        kw = dict(n_steps0=2, tol=0.15, maxit=8)
        h_host = run_adaptive_fd_per_member(
            self._step(), u0s, (0.0, 2.0), **kw
        )
        h_dev = run_adaptive_fd_per_member(
            self._step(), u0s, (0.0, 2.0), device_loop=True, **kw
        )
        assert len(h_dev) == len(h_host)
        for rd, rh in zip(h_dev, h_host):
            np.testing.assert_array_equal(rd.times, rh.times)
            np.testing.assert_array_equal(rd.n_active, rh.n_active)
            np.testing.assert_array_equal(rd.err_total, rh.err_total)
            assert rd.n_refining == rh.n_refining

    def test_checkpoint_resume(self, tmp_path):
        from adjoint_ode_adaptivity_tpu.adapt.fd_loop import (
            run_adaptive_fd_per_member,
        )

        u0s = np.array([0.7, 1.0, 1.6, 2.2])
        kw = dict(n_steps0=2, tol=0.15)
        step = self._step()
        ref = run_adaptive_fd_per_member(step, u0s, (0.0, 2.0), maxit=8, **kw)
        ck = str(tmp_path / "fd_pm")
        run_adaptive_fd_per_member(
            step, u0s, (0.0, 2.0), maxit=2, checkpoint_dir=ck, **kw
        )
        full = run_adaptive_fd_per_member(
            step, u0s, (0.0, 2.0), maxit=8, checkpoint_dir=ck, **kw
        )
        assert len(full) == len(ref)
        for r_res, r_ref in zip(full, ref):
            np.testing.assert_array_equal(r_res.times, r_ref.times)
            np.testing.assert_array_equal(r_res.n_active, r_ref.n_active)
            assert r_res.n_refining == r_ref.n_refining

    def test_mesh_dp_matches_single_device(self):
        import jax
        from jax.sharding import Mesh

        from adjoint_ode_adaptivity_tpu.adapt.fd_loop import (
            run_adaptive_fd_per_member,
        )

        u0s = np.random.default_rng(3).uniform(0.5, 2.0, 16)
        kw = dict(n_steps0=2, tol=0.15, maxit=4, device_loop=True)
        h_1 = run_adaptive_fd_per_member(self._step(), u0s, (0.0, 2.0), **kw)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        h_m = run_adaptive_fd_per_member(
            self._step(), u0s, (0.0, 2.0), mesh=mesh, **kw
        )
        assert len(h_m) == len(h_1)
        np.testing.assert_allclose(
            h_m[-1].times, h_1[-1].times, atol=1e-12
        )
        np.testing.assert_array_equal(h_m[-1].n_active, h_1[-1].n_active)

    def test_pallas_engine_matches_xla(self):
        # the fused per-member FD estimate kernel (per-member dt as
        # traced VMEM operands) must reproduce the vmapped XLA
        # iteration's decisions exactly
        import jax.numpy as jnp

        from adjoint_ode_adaptivity_tpu import odes
        from adjoint_ode_adaptivity_tpu.adapt.fd_loop import (
            run_adaptive_fd_per_member,
        )

        ode = odes.get_ode("du/dt=sin(u)")
        u0s = np.random.default_rng(7).uniform(0.5, 2.0, 8)
        kw = dict(n_steps0=2, tol=0.15, maxit=6)
        h_x = run_adaptive_fd_per_member(self._step(), u0s, (0.0, 2.0), **kw)
        h_p = run_adaptive_fd_per_member(
            self._step(), u0s, (0.0, 2.0), engine="pallas", ode_f=ode.f, **kw
        )
        assert len(h_p) == len(h_x)
        for rp, rx in zip(h_p, h_x):
            np.testing.assert_allclose(rp.times, rx.times, atol=1e-12)
            np.testing.assert_array_equal(rp.n_active, rx.n_active)
            np.testing.assert_allclose(rp.err_total, rx.err_total,
                                       atol=1e-12)
            np.testing.assert_allclose(rp.j_coarse, rx.j_coarse, atol=1e-12)

    def test_pallas_engine_device_loop_and_dp(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from adjoint_ode_adaptivity_tpu import odes
        from adjoint_ode_adaptivity_tpu.adapt.fd_loop import (
            run_adaptive_fd_per_member,
        )

        ode = odes.get_ode("du/dt=sin(u)")
        u0s = np.random.default_rng(9).uniform(0.5, 2.0, 64)
        kw = dict(n_steps0=2, tol=0.15, maxit=4, engine="pallas",
                  ode_f=ode.f)
        h_1 = run_adaptive_fd_per_member(self._step(), u0s, (0.0, 2.0), **kw)
        h_f = run_adaptive_fd_per_member(
            self._step(), u0s, (0.0, 2.0), device_loop=True, **kw
        )
        assert len(h_f) == len(h_1)
        np.testing.assert_array_equal(h_f[-1].times, h_1[-1].times)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        h_m = run_adaptive_fd_per_member(
            self._step(), u0s, (0.0, 2.0), mesh=mesh, device_loop=True, **kw
        )
        assert len(h_m) == len(h_1)
        np.testing.assert_allclose(h_m[-1].times, h_1[-1].times, atol=1e-12)
        np.testing.assert_array_equal(h_m[-1].n_active, h_1[-1].n_active)


class TestDGEnsembleDeviceLoop:
    def test_matches_host_loop(self):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_ensemble,
        )

        y0s = np.random.default_rng(2).uniform(0.5, 2.0, 8)
        kw = dict(k0=3, maxit=4, tol=0.0, newton_iters=8)
        h_host = run_adaptive_dg_ensemble(F_SIN, y0s, (0.0, 2.0), **kw)
        h_dev = run_adaptive_dg_ensemble(
            F_SIN, y0s, (0.0, 2.0), device_loop=True, **kw
        )
        assert len(h_dev) == len(h_host) == 5
        for rd, rh in zip(h_dev, h_host):
            np.testing.assert_array_equal(rd.times, rh.times)
            np.testing.assert_array_equal(rd.err_mean, rh.err_mean)
            assert rd.j_mean == rh.j_mean
            assert rd.est_total_mean == rh.est_total_mean

    def test_early_exit_and_resume(self, tmp_path):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_ensemble,
        )

        y0s = np.random.default_rng(5).uniform(0.5, 2.0, 4)
        kw = dict(k0=3, tol=2e-5, newton_iters=8, device_loop=True)
        h = run_adaptive_dg_ensemble(F_SIN, y0s, (0.0, 2.0), maxit=20, **kw)
        assert abs(h[-1].est_total_mean) < 2e-5
        assert len(h) < 21
        ref = run_adaptive_dg_ensemble(F_SIN, y0s, (0.0, 2.0), maxit=8, **kw)
        ck = str(tmp_path / "dge_fused")
        run_adaptive_dg_ensemble(
            F_SIN, y0s, (0.0, 2.0), maxit=3, checkpoint_dir=ck, **kw
        )
        full = run_adaptive_dg_ensemble(
            F_SIN, y0s, (0.0, 2.0), maxit=8, checkpoint_dir=ck, **kw
        )
        assert len(full) == len(ref)
        for r_res, r_ref in zip(full, ref):
            np.testing.assert_allclose(r_res.times, r_ref.times, atol=1e-12)
            assert abs(r_res.est_total_mean - r_ref.est_total_mean) < 1e-12


class TestDGDeviceLoop:
    def test_requires_padded(self):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import run_adaptive_dg

        with pytest.raises(ValueError, match="padded"):
            run_adaptive_dg(F_SIN, 1.0, (0.0, 2.0), device_loop=True)

    def test_matches_host_loop(self):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import run_adaptive_dg

        kw = dict(n_order=1, k0=2, tol=0.0, maxit=4, padded=True)
        h_host = run_adaptive_dg(F_SIN, 1.0, (0.0, 2.0), **kw)
        h_dev = run_adaptive_dg(
            F_SIN, 1.0, (0.0, 2.0), device_loop=True, **kw
        )
        assert len(h_dev) == len(h_host) == 5
        for rd, rh in zip(h_dev, h_host):
            np.testing.assert_array_equal(rd.times, rh.times)
            np.testing.assert_array_equal(rd.u, rh.u)
            np.testing.assert_array_equal(rd.v, rh.v)
            np.testing.assert_array_equal(rd.err, rh.err)
            assert rd.j_coarse == rh.j_coarse
            assert rd.j_fine == rh.j_fine
            assert rd.est_total == rh.est_total

    def test_early_exit_and_resume(self, tmp_path):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import run_adaptive_dg

        kw = dict(n_order=1, k0=2, tol=1e-3, padded=True, device_loop=True)
        h = run_adaptive_dg(F_SIN, 1.0, (0.0, 2.0), maxit=10, **kw)
        assert abs(h[-1].est_total) < 1e-3
        assert len(h) < 11
        # fused checkpoint: a partial run resumes into the full history
        ref = run_adaptive_dg(F_SIN, 1.0, (0.0, 2.0), maxit=6, **kw)
        ck = str(tmp_path / "dg_fused")
        run_adaptive_dg(F_SIN, 1.0, (0.0, 2.0), maxit=2,
                        checkpoint_dir=ck, **kw)
        full = run_adaptive_dg(F_SIN, 1.0, (0.0, 2.0), maxit=6,
                               checkpoint_dir=ck, **kw)
        assert len(full) == len(ref)
        for r_res, r_ref in zip(full, ref):
            np.testing.assert_allclose(r_res.times, r_ref.times, atol=1e-12)
            assert abs(r_res.est_total - r_ref.est_total) < 1e-12
