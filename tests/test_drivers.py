"""Smoke tests for the experiment drivers (tiny configs, CPU)."""
import sys

import numpy as np
import pytest


class TestFDDriver:
    def test_runs_and_reports(self, capsys, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.fd_adaptive import main

        history = main(["--maxit", "3", "--tol", "0"])
        assert len(history) == 4
        out = capsys.readouterr().out
        assert "sum(err)" in out

    def test_device_loop_cli_matches(self, capsys, tmp_path, monkeypatch):
        # --device-loop fuses the whole study into one dispatch; history
        # must match the host-loop run
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.fd_adaptive import main

        h_host = main(["--maxit", "3", "--tol", "0"])
        h_dev = main(["--maxit", "3", "--tol", "0", "--device-loop"])
        assert len(h_dev) == len(h_host) == 4
        assert float(h_dev[-1].err_total) == float(h_host[-1].err_total)

    def test_per_member_ensemble_cli(self, capsys, tmp_path, monkeypatch):
        # --ensemble B: B independent adaptive studies, one vmapped jit;
        # members freeze independently at --tol
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.fd_adaptive import main

        h = main(["--ensemble", "8", "--tol", "0.15", "--maxit", "10"])
        out = capsys.readouterr().out
        assert "per-member" in out and "refining=" in out
        assert h[-1].n_refining == 0
        assert len(set(h[-1].n_active.tolist())) > 1

    def test_plot_frames_written(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.fd_adaptive import main

        main(["--maxit", "1", "--tol", "0", "--plot", "--case", "smoke"])
        frames = list((tmp_path / "smoke").glob("*.png"))
        assert len(frames) == 2


class TestDGDriver:
    def test_effectivity_telemetry(self, capsys, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.dg_adaptive import main

        history = main(["--maxit", "2"])
        out = capsys.readouterr().out
        assert "JuH-Juh" in out and "Adj-W Res" in out
        assert len(history) == 3
        # element count grows by one per iteration
        assert len(history[-1].times) == len(history[0].times) + 2

    def test_device_loop_cli_matches(self, capsys, tmp_path, monkeypatch):
        # --device-loop implies padded; fused history == padded host run
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.dg_adaptive import main

        h_host = main(["--maxit", "2", "--padded"])
        h_dev = main(["--maxit", "2", "--device-loop"])
        assert len(h_dev) == len(h_host)
        np.testing.assert_array_equal(h_dev[-1].times, h_host[-1].times)
        assert h_dev[-1].est_total == h_host[-1].est_total


class TestAdvecDriver:
    def test_march_accuracy(self, capsys):
        from adjoint_ode_adaptivity_tpu.drivers.advec_dg import main

        err = main(["--k", "16", "--order", "3", "--final-time", "0.25", "--x64"])
        assert err < 1e-3

    def test_limiter_path(self):
        from adjoint_ode_adaptivity_tpu.drivers.advec_dg import main

        err = main(["--k", "12", "--order", "2", "--final-time", "0.1",
                    "--limiter", "n", "--x64"])
        assert np.isfinite(err)

    def test_pallas_kernel_path(self, capsys):
        """--kernel pallas (interpret mode off-TPU) reproduces the XLA
        march error and prints the fused-pipeline estimate."""
        from adjoint_ode_adaptivity_tpu.drivers.advec_dg import main

        common = ["--k", "16", "--order", "2", "--final-time", "0.1",
                  "--estimate"]
        err_p = main(common + ["--kernel", "pallas"])
        out = capsys.readouterr().out
        assert "Σeta" in out
        err_x = main(common)
        assert abs(err_p - err_x) < 1e-5

    def test_adapt_mode(self, capsys):
        """--adapt runs the goal-oriented element h-adaptivity loop and
        actually bisects (K grows)."""
        from adjoint_ode_adaptivity_tpu.drivers.advec_dg import main

        est = main(["--k", "8", "--order", "2", "--final-time", "0.05",
                    "--adapt", "--maxit", "2", "--x64"])
        out = capsys.readouterr().out
        assert "K=   10" in out and np.isfinite(est)

    def test_pallas_rejects_limiter(self):
        from adjoint_ode_adaptivity_tpu.drivers.advec_dg import main

        with pytest.raises(SystemExit):
            main(["--k", "16", "--kernel", "pallas", "--limiter", "n"])


class TestBurgersDriverKernel:
    def test_pallas_kernel_matches_xla_f32(self, capsys):
        from adjoint_ode_adaptivity_tpu.drivers.burgers_dg import main

        # parity on the unlimited march (the ΠN troubled-cell threshold is
        # below f32 epsilon, so f32-vs-f64 limited marches diverge by
        # design — the kernel itself is pinned at f64 in test_pallas.py)
        common = ["--k", "16", "--order", "2", "--final-time", "0.01",
                  "--dt", "1e-3", "--limiter", "none"]
        u_p = main(common + ["--kernel", "pallas"])
        u_x = main(common)
        np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x),
                                   rtol=1e-5, atol=1e-6)

    def test_pallas_limited_path_finite(self, capsys):
        from adjoint_ode_adaptivity_tpu.drivers.burgers_dg import main

        main(["--k", "16", "--order", "2", "--final-time", "0.01",
              "--dt", "1e-3", "--limiter", "n", "--kernel", "pallas"])
        assert "finite=True" in capsys.readouterr().out


class TestTrainDriver:
    @pytest.mark.parametrize("method", ["variable_params", "recurrent"])
    def test_method_smoke(self, method, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.train_resnet_ode import main

        state, t = main([
            "--method", method, "--epochs", "3", "--maxit", "0",
            "--n-train", "16", "--n-test", "4", "--width", "4", "--quiet",
        ])
        assert np.all(np.isfinite(np.asarray(t)))
        out = capsys.readouterr().out
        assert "outer it 0" in out

    def test_fused_engine_matches_xla(self, tmp_path, monkeypatch, capsys):
        """--train-engine pallas (the fused epoch kernel, interpret mode
        on CPU) reproduces the XLA engine's losses and refinement,
        including the rebuild after a depth insertion."""
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.train_resnet_ode import main

        outs = {}
        for eng in ("xla", "pallas"):
            _, t = main([
                "--method", "variable_params", "--epochs", "3",
                "--maxit", "1", "--n-train", "128", "--n-test", "4",
                "--width", "4", "--quiet", "--seed", "2",
                "--train-engine", eng,
            ])
            outs[eng] = (np.asarray(t), capsys.readouterr().out)
        np.testing.assert_allclose(
            outs["pallas"][0], outs["xla"][0], atol=1e-6
        )
        assert "outer it 1" in outs["pallas"][1]

    def test_recurrent_fused_engine_matches_xla(self, tmp_path, monkeypatch,
                                                capsys):
        """--method recurrent --train-engine pallas (the fused shared-net
        Dense-chain epoch kernel, interpret mode on CPU) reproduces the
        XLA engine's refined grid, including the rebuild for the new dt
        after a depth insertion."""
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.train_resnet_ode import main

        outs = {}
        for eng in ("xla", "pallas"):
            _, t = main([
                "--method", "recurrent", "--epochs", "3", "--maxit", "1",
                "--n-train", "128", "--n-test", "4", "--width", "4",
                "--hidden", "3,5", "--quiet", "--seed", "2",
                "--train-engine", eng,
            ])
            outs[eng] = (np.asarray(t), capsys.readouterr().out)
        np.testing.assert_allclose(
            outs["pallas"][0], outs["xla"][0], atol=1e-6
        )
        assert "outer it 1" in outs["pallas"][1]

    def test_width_method_fused_matches_xla(self, tmp_path, monkeypatch,
                                            capsys):
        """--method width (padded-capacity masked net) through the fused
        masked kernel: identical width-growth decisions and grids."""
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.train_resnet_ode import main

        outs = {}
        for eng in ("xla", "pallas"):
            _, t = main([
                "--method", "width", "--epochs", "2", "--maxit", "1",
                "--n-train", "128", "--n-test", "4", "--width", "4",
                "--width-capacity", "12", "--quiet", "--seed", "5",
                "--depth-rel-tol", "0.0", "--train-engine", eng,
            ])
            outs[eng] = (np.asarray(t), capsys.readouterr().out)
        np.testing.assert_allclose(outs["pallas"][0], outs["xla"][0],
                                   atol=1e-6)
        assert "width grow" in outs["pallas"][1]
        # same growth decisions, not just the same grid
        assert (
            [l for l in outs["pallas"][1].splitlines() if "outer it" in l]
            == [l for l in outs["xla"][1].splitlines() if "outer it" in l]
        )

    def test_dp_flag_matches_single_device(self, tmp_path, monkeypatch,
                                           capsys):
        """--dp (members sharded over the 8-device CPU mesh, psum-reduced
        grads) reproduces the unsharded fused run's refined grid."""
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.train_resnet_ode import main

        grids = {}
        for extra in ([], ["--dp"]):
            _, t = main([
                "--method", "variable_params", "--epochs", "2",
                "--maxit", "1", "--n-train", "1024", "--n-test", "4",
                "--width", "4", "--quiet", "--seed", "3",
                "--train-engine", "pallas", *extra,
            ])
            capsys.readouterr()
            grids[bool(extra)] = np.asarray(t)
        np.testing.assert_allclose(grids[True], grids[False], atol=1e-6)


class TestDGEnsembleDriverMode:
    def test_ensemble_mode_smoke(self, capsys):
        from adjoint_ode_adaptivity_tpu.drivers.dg_adaptive import main

        history = main([
            "--ensemble", "16", "--maxit", "3", "--tol", "0",
            "--engine", "xla",
        ])
        out = capsys.readouterr().out
        assert len(history) == 4
        assert "B=16, engine=xla" in out
        assert abs(history[-1].est_total_mean) <= abs(
            history[0].est_total_mean
        )

    def test_per_member_cli(self, capsys):
        # --per-member: each IC adapts its own partition; with a loose
        # tol all members must freeze before maxit
        from adjoint_ode_adaptivity_tpu.drivers.dg_adaptive import main

        history = main(
            ["--ensemble", "8", "--per-member", "--k0", "3", "--maxit",
             "12", "--tol", "1e-4", "--engine", "xla"]
        )
        out = capsys.readouterr().out
        assert "per-member" in out
        assert "refining=" in out
        assert history[-1].n_refining == 0
        assert history[-1].times.shape[0] == 8

    def test_per_member_device_loop_cli(self, capsys):
        # --device-loop: whole loop as one while_loop dispatch; same
        # history as the host-loop CLI run
        from adjoint_ode_adaptivity_tpu.drivers.dg_adaptive import main

        argv = ["--ensemble", "8", "--per-member", "--k0", "3", "--maxit",
                "12", "--tol", "1e-4", "--engine", "xla"]
        h_host = main(argv)
        h_dev = main(argv + ["--device-loop"])
        out = capsys.readouterr().out
        assert "device-loop" in out
        assert len(h_dev) == len(h_host)
        np.testing.assert_array_equal(h_dev[-1].times, h_host[-1].times)

    def test_ensemble_dp_matches_unsharded(self, capsys):
        # --dp shards the members over all 8 virtual devices; the refined
        # partitions and estimates must match the unsharded run
        from adjoint_ode_adaptivity_tpu.drivers.dg_adaptive import main

        base = ["--ensemble", "16", "--maxit", "2", "--tol", "0",
                "--engine", "xla"]
        h1 = main(base)
        hdp = main(base + ["--dp"])
        out = capsys.readouterr().out
        assert "dp over 8 devices" in out
        assert len(hdp) == len(h1)
        np.testing.assert_allclose(
            np.asarray(hdp[-1].times), np.asarray(h1[-1].times), atol=1e-12
        )
        np.testing.assert_allclose(
            hdp[-1].est_total_mean, h1[-1].est_total_mean, atol=1e-12
        )


class TestSweep:
    def test_generate_commands(self, tmp_path):
        from adjoint_ode_adaptivity_tpu.drivers.sweep import main

        cmds = main(["--seeds", "1", "2", "--extra=--quiet",
                     "--out", str(tmp_path / "cmds.txt")])
        assert len(cmds) == 2
        assert "--seed 1" in cmds[0]
        assert (tmp_path / "cmds.txt").exists()

    def test_run_commands_parallel(self, tmp_path):
        # the reference farm runs 4 concurrent jobs/node
        # (Submit_schedule_frontera/main_serial.sh:38-44) — check the slot
        # scheduler overlaps runs and pins SWEEP_SLOT per process
        import sys
        import time

        from adjoint_ode_adaptivity_tpu.drivers.sweep import run_commands

        script = (
            "import os,time,sys; time.sleep(0.6); "
            f"open(r'{tmp_path}'+'/slot_'+os.environ['SWEEP_SLOT']+'_'"
            "+sys.argv[1],'w').close()"
        )
        # -S skips this container's sitecustomize (which imports jax, ~2 s
        # per interpreter on the 1-core host) — the scheduler is under test
        cmds = [f'{sys.executable} -S -c "{script}" {i}' for i in range(4)]
        t0 = time.monotonic()
        codes = run_commands(cmds, parallel=4)
        elapsed = time.monotonic() - t0
        assert codes == [0, 0, 0, 0]
        # 4 × 0.6 s sequential would be ≥ 2.4 s; overlapped should be well
        # under that even with interpreter startup on the 1-core host
        assert elapsed < 2.3, elapsed
        made = sorted(p.name for p in tmp_path.glob("slot_*"))
        assert len(made) == 4
        slots = {name.split("_")[1] for name in made}
        assert slots == {"0", "1", "2", "3"}

    def test_run_commands_failure_raises(self):
        import subprocess
        import sys

        from adjoint_ode_adaptivity_tpu.drivers.sweep import run_commands

        cmds = [f"{sys.executable} -S -c \"raise SystemExit(3)\""]
        with pytest.raises(subprocess.CalledProcessError):
            run_commands(cmds, parallel=2)
        assert run_commands(cmds, parallel=1, check=False) == [3]

    def test_run_commands_retry_recovers(self, tmp_path):
        # failure recovery the reference farm lacks (scancel.sh is manual):
        # a run that dies is requeued with SWEEP_ATTEMPT exported — here the
        # first attempt leaves a marker and exits 1, the retry sees the
        # marker (and SWEEP_ATTEMPT=1) and succeeds
        import sys

        from adjoint_ode_adaptivity_tpu.drivers.sweep import run_commands

        marker = tmp_path / "attempted"
        script = (
            "import os,sys; p=r'%s'; "
            "sys.exit(0) if os.path.exists(p) and "
            "os.environ['SWEEP_ATTEMPT']=='1' else "
            "(open(p,'w').close(), sys.exit(1))" % marker
        )
        cmds = [f'{sys.executable} -S -c "{script}"']
        assert run_commands(cmds, parallel=1, retries=2) == [0]
        assert marker.exists()

    def test_run_commands_retry_exhausted(self):
        import subprocess
        import sys

        from adjoint_ode_adaptivity_tpu.drivers.sweep import run_commands

        cmds = [f"{sys.executable} -S -c \"raise SystemExit(7)\""]
        with pytest.raises(subprocess.CalledProcessError):
            run_commands(cmds, parallel=1, retries=1)
        assert run_commands(cmds, parallel=1, retries=1, check=False) == [7]

    def test_run_commands_launch_failure_recorded(self):
        # a missing binary must not abort the drain (orphaning live
        # children) — it records rc=127 through the same path as a
        # nonzero exit, and healthy commands still complete
        import sys

        from adjoint_ode_adaptivity_tpu.drivers.sweep import run_commands

        cmds = [
            "definitely-not-a-binary-xyz --flag",
            f"{sys.executable} -S -c \"raise SystemExit(0)\"",
        ]
        assert run_commands(cmds, parallel=2, retries=1, check=False) == [127, 0]

    def test_generate_commands_checkpoint_root(self, tmp_path):
        from adjoint_ode_adaptivity_tpu.drivers.sweep import generate_commands

        cmds = generate_commands(
            "fd_adaptive", [5, 6], "--quiet",
            checkpoint_root=str(tmp_path / "ck"),
        )
        assert len(cmds) == 2
        assert cmds[0].endswith(f"--checkpoint-dir {tmp_path / 'ck' / 'seed_5'}")
        assert cmds[1].endswith(f"--checkpoint-dir {tmp_path / 'ck' / 'seed_6'}")
        # per-seed dirs differ (concurrent seeds must not share a checkpoint)
        assert cmds[0].split()[-1] != cmds[1].split()[-1]


class TestNewLossMethod:
    def test_new_loss_smoke(self, tmp_path, monkeypatch, capsys):
        # Main_new_loss.py end-to-end: trajectory/trapezoid loss with the
        # ramped terminal mix, one refinement iteration
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.train_resnet_ode import main

        state, t = main([
            "--method", "new_loss", "--epochs", "3", "--maxit", "1",
            "--n-train", "16", "--n-test", "4", "--width", "4", "--quiet",
        ])
        out = capsys.readouterr().out
        assert "outer it 0" in out and "outer it 1" in out
        assert np.all(np.isfinite(np.asarray(t)))
        # the mixed ramp engages: weight is finite and follows the schedule
        from adjoint_ode_adaptivity_tpu.train import mixed_ramp_weight

        assert float(mixed_ramp_weight(0)) > 0

    def test_new_loss_fused_engine_matches_xla(self, tmp_path, monkeypatch,
                                               capsys):
        """--method new_loss --train-engine pallas (the mixed-loss fused
        epoch kernel, interpret mode on CPU) reproduces the XLA engine's
        refined grid, including the rebuild after a depth insertion and
        the per-node trajectory-target refresh."""
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.train_resnet_ode import main

        outs = {}
        for eng in ("xla", "pallas"):
            _, t = main([
                "--method", "new_loss", "--epochs", "3", "--maxit", "1",
                "--n-train", "128", "--n-test", "4", "--width", "4",
                "--quiet", "--seed", "2", "--train-engine", eng,
            ])
            outs[eng] = (np.asarray(t), capsys.readouterr().out)
        np.testing.assert_allclose(
            outs["pallas"][0], outs["xla"][0], atol=1e-6
        )
        assert "outer it 1" in outs["pallas"][1]

    def test_ramp_schedule_values(self):
        # 10**((it+1)//10 - 4), Main_new_loss.py:163-165
        from adjoint_ode_adaptivity_tpu.train import mixed_ramp_weight

        assert float(mixed_ramp_weight(0)) == pytest.approx(1e-4)
        assert float(mixed_ramp_weight(9)) == pytest.approx(1e-3)
        assert float(mixed_ramp_weight(19)) == pytest.approx(1e-2)


class TestWidthMethod:
    def test_width_grows_and_resumes(self, tmp_path, monkeypatch, capsys):
        """Main_width_ref.py end-to-end: the padded-capacity width path
        actually inserts neurons (in place, all steps' trained weights
        preserved), and a post-growth checkpoint resumes with the grown
        n_active instead of falling back to fresh."""
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.train_resnet_ode import main

        ckpt = str(tmp_path / "ckpt")
        args = [
            "--method", "width", "--epochs", "6", "--maxit", "0",
            "--n-train", "16", "--n-test", "4", "--width", "4",
            "--width-tol", "0", "--depth-rel-tol", "0",  # pin policy: width
            "--lr", "1e-2", "--seed", "1", "--quiet",
            "--checkpoint-dir", ckpt,
        ]
        main(args)
        out = capsys.readouterr().out
        assert "width grow at steps" in out  # a neuron was inserted

        # resume: must pick up the checkpoint (not 'starting fresh') and
        # continue growing FROM the grown widths
        args_resume = list(args)
        args_resume[args_resume.index("--maxit") + 1] = "1"
        main(args_resume + ["--resume"])
        out = capsys.readouterr().out
        assert "resumed from checkpoint" in out
        assert "starting fresh" not in out
        assert "n_active=[6, 6]" in out  # grew 4->5 in run 1, 5->6 here


class TestDetectMethod:
    def test_detect_smoke(self, tmp_path, monkeypatch, capsys):
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.train_resnet_ode import main

        main([
            "--method", "detect", "--epochs", "4", "--maxit", "0",
            "--n-train", "16", "--n-test", "4", "--width", "4",
            "--ref-tol", "1e6", "--quiet",  # huge tol => plateau fires fast
        ])
        out = capsys.readouterr().out
        assert "outer it 0" in out


class TestFDBacktrackSchedule:
    def test_backtrack_schedule_cli(self, capsys, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from adjoint_ode_adaptivity_tpu.drivers.fd_adaptive import main

        history = main(["--schedule", "backtrack", "--maxit", "6", "--tol", "0",
                        "--coarsen-tol", "1e-10"])
        out = capsys.readouterr().out
        assert "accept" in out
        assert history[-1]["total"] < history[0]["total"]
