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


class TestSweep:
    def test_generate_commands(self, tmp_path):
        from adjoint_ode_adaptivity_tpu.drivers.sweep import main

        cmds = main(["--seeds", "1", "2", "--extra=--quiet",
                     "--out", str(tmp_path / "cmds.txt")])
        assert len(cmds) == 2
        assert "--seed 1" in cmds[0]
        assert (tmp_path / "cmds.txt").exists()


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
