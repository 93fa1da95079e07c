"""Infrastructure tests: checkpointing schedules, orbax round-trip, config
facade, discretization IO, metrics logger."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adjoint_ode_adaptivity_tpu import config as cfg
from adjoint_ode_adaptivity_tpu.adjoint import checkpointing as ck
from adjoint_ode_adaptivity_tpu.ops import startup_1d
from adjoint_ode_adaptivity_tpu.ops.io import load_discretization, save_discretization
from adjoint_ode_adaptivity_tpu.train.metrics import MetricsLogger, StepTimer


class TestRevolve:
    @pytest.mark.parametrize("steps,snaps", [(2, 1), (7, 1), (10, 3), (100, 7), (1000, 10), (5, 4)])
    def test_schedule_valid_and_bounded(self, steps, snaps):
        stats = ck.simulate_schedule(steps, snaps)
        assert stats["max_slots"] <= snaps
        t = ck.min_repetitions(steps, snaps)
        # near-optimal binomial: recompute within 2x of the t·steps bound
        assert stats["forward_steps"] <= max(2 * t, t + 2) * steps

    def test_native_matches_python(self):
        if not ck.native_available():
            pytest.skip("librevolve.so not built")
        for steps, snaps in [(10, 3), (100, 7), (1000, 10), (4096, 12)]:
            assert ck.plan_schedule(steps, snaps) == ck._plan_py(steps, snaps)

    def test_max_steps_binomial(self):
        assert ck.max_steps(3, 2) == 10
        assert ck.max_steps(10, 4) == 1001

    def test_optimal_snaps(self):
        assert ck.optimal_snaps(4096) >= 2
        assert ck.optimal_snaps(4096, budget_states=4) == 4


class TestOrbaxCheckpoint:
    def test_round_trip(self, tmp_path):
        from adjoint_ode_adaptivity_tpu.train.checkpoint import (
            latest_step,
            restore_checkpoint,
            save_checkpoint,
        )

        state = {
            "params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "times": jnp.linspace(0, 1, 5),
            "it": jnp.asarray(3),
        }
        save_checkpoint(tmp_path / "ckpt", 3, state)
        assert latest_step(tmp_path / "ckpt") == 3
        template = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored = restore_checkpoint(tmp_path / "ckpt", template)
        for a, b in zip(jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(state)):
            np.testing.assert_allclose(a, b)

    def test_restore_missing_raises(self, tmp_path):
        from adjoint_ode_adaptivity_tpu.train.checkpoint import restore_checkpoint

        with pytest.raises(FileNotFoundError):
            restore_checkpoint(tmp_path / "nope", {"x": jnp.zeros(2)})


class TestConfigFacade:
    def test_problem_functions_consistent(self):
        problem = cfg.Problem(
            case="t", ode="du/dt=sin(u)", out_functional="J=int(u^2)",
            ref_factor=4, t_span=(0.0, 2.0), u0=1.0,
        )
        funs = cfg.get_problem_functions(problem)
        dt = jnp.full((8,), 0.25)
        u = funs.forward_solve(dt)
        # getF at the solution equals the shifted trajectory (fixed point)
        f_map = funs.get_f(u, dt)
        np.testing.assert_allclose(f_map, u, rtol=1e-12)
        # Jacobian diagonal matches the closed form 1 + cos(u)·dt
        jf = funs.get_jf_diag(u, dt)
        np.testing.assert_allclose(jf, 1 + jnp.cos(u[:-1]) * dt, rtol=1e-12)
        # adjoint/estimate pipeline runs and the indicator is positive somewhere
        v = funs.adjoint_solve(dt, u)
        err = funs.error_estimate(dt, u, v)
        assert err.shape == (8,)
        assert float(jnp.max(err)) > 0
        # adapt inserts one node
        times = jnp.pad(jnp.cumsum(dt), (1, 0))
        new_times = funs.adapt(times, err)
        assert new_times.shape[0] == times.shape[0] + 1
        # exact adjoint oracle evaluates
        a = funs.exact_adj(jnp.linspace(0.0, 2.0, 5))
        assert a.shape == (5,)


class TestDiscretizationIO:
    def test_save_load_round_trip(self, tmp_path):
        disc = startup_1d(3, 0.0, 2 * np.pi, 6)
        path = tmp_path / "disc.npz"
        save_discretization(disc, path)
        loaded = load_discretization(path)
        assert loaded.n == disc.n and loaded.k == disc.k
        np.testing.assert_allclose(loaded.dr, disc.dr)
        np.testing.assert_allclose(loaded.vmap_p, disc.vmap_p)


class TestMetrics:
    def test_logger_history_and_jsonl(self, tmp_path):
        log = MetricsLogger("t", jsonl_path=tmp_path / "m.jsonl", verbose=False)
        log.log({"Epoch": 0, "Loss": jnp.asarray(0.5)})
        log.log({"Epoch": 1, "Loss": jnp.asarray(0.25)})
        assert len(log.history) == 2
        assert log.history[1]["Loss"] == 0.25
        lines = (tmp_path / "m.jsonl").read_text().strip().split("\n")
        assert len(lines) == 2

    def test_step_timer(self):
        t = StepTimer()
        t.lap()
        assert t.mean >= 0


class TestEnsureScopedVmem:
    """ensure_scoped_vmem must install the 48 MB scoped-VMEM flag and
    UPGRADE a stale smaller value (e.g. round-2's 32768) — the _vmem.py
    capacity guards assume the 48 MB limit."""

    def _with_env(self, value):
        import os

        from adjoint_ode_adaptivity_tpu.ops.pallas import ensure_scoped_vmem

        old = os.environ.get("LIBTPU_INIT_ARGS")
        try:
            if value is None:
                os.environ.pop("LIBTPU_INIT_ARGS", None)
            else:
                os.environ["LIBTPU_INIT_ARGS"] = value
            ensure_scoped_vmem()
            return os.environ["LIBTPU_INIT_ARGS"]
        finally:
            if old is None:
                os.environ.pop("LIBTPU_INIT_ARGS", None)
            else:
                os.environ["LIBTPU_INIT_ARGS"] = old

    def test_sets_when_absent(self):
        assert "--xla_tpu_scoped_vmem_limit_kib=49152" in self._with_env(None)

    def test_upgrades_stale_smaller_limit(self):
        got = self._with_env("--foo=1 --xla_tpu_scoped_vmem_limit_kib=32768")
        assert "--xla_tpu_scoped_vmem_limit_kib=49152" in got
        assert "32768" not in got and "--foo=1" in got

    def test_keeps_larger_limit(self):
        got = self._with_env("--xla_tpu_scoped_vmem_limit_kib=65536")
        assert got == "--xla_tpu_scoped_vmem_limit_kib=65536"


def test_native_lib_search_includes_package_dir():
    """pip installs place the compiled planner inside the package
    (setup.py -> _native/librevolve*.so); the ctypes loader must search
    there after the repo checkout's native/ build."""
    from pathlib import Path

    cands = ck._lib_candidates()
    assert cands, "no candidates"
    assert cands[0].name == "librevolve.so" and cands[0].parent.name == "native"
    pkg_native = Path(ck.__file__).resolve().parents[1] / "_native"
    assert all(
        c.parent == pkg_native and c.name.startswith("librevolve")
        for c in cands[1:]
    )
