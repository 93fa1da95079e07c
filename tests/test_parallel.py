"""Multi-device tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jrand
import pytest

from adjoint_ode_adaptivity_tpu import odes
from adjoint_ode_adaptivity_tpu.march import euler_step, forward_march
from adjoint_ode_adaptivity_tpu.march.advec import advec_march, advec_operators
from adjoint_ode_adaptivity_tpu.ops import startup_1d
from adjoint_ode_adaptivity_tpu.parallel import (
    advec_march_sharded,
    ensemble_mean,
    ensemble_vmap,
    make_mesh,
    shard_along,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


class TestMesh:
    def test_make_mesh_infer(self):
        mesh = make_mesh({"data": -1})
        assert mesh.devices.size == jax.device_count()

    def test_make_mesh_2d(self):
        mesh = make_mesh({"data": 4, "model": 2})
        assert mesh.shape == {"data": 4, "model": 2}

    def test_oversized_mesh_raises(self):
        with pytest.raises(ValueError):
            make_mesh({"data": 1024})


class TestEnsemble:
    def test_ensemble_vmap_matches_vmap(self):
        ode = odes.get_ode("du/dt=sin(u)")
        step = euler_step(ode.f)
        dt = jnp.full((16,), 0.1)
        mesh = make_mesh({"data": 8})
        u0s = jrand.uniform(jrand.PRNGKey(0), (64,), minval=-2, maxval=2)

        fn = lambda u0: forward_march(step, u0, dt)[-1]
        sharded = ensemble_vmap(fn, mesh)(shard_along(u0s, mesh, "data"))
        dense = jax.vmap(fn)(u0s)
        np.testing.assert_allclose(sharded, dense, rtol=1e-12)

    def test_ensemble_mean_matches_mean(self):
        ode = odes.get_ode("du/dt=sin(u)")
        step = euler_step(ode.f)
        dt = jnp.full((16,), 0.1)
        mesh = make_mesh({"data": 8})
        u0s = jrand.uniform(jrand.PRNGKey(1), (64,), minval=-2, maxval=2)

        fn = lambda u0: forward_march(step, u0, dt)  # whole trajectory
        got = ensemble_mean(fn, mesh)(shard_along(u0s, mesh, "data"))
        want = jnp.mean(jax.vmap(fn)(u0s), axis=0)
        np.testing.assert_allclose(got, want, rtol=1e-12)


class TestElementSharding:
    def test_sharded_march_matches_single_device(self):
        a = 2 * np.pi
        disc = startup_1d(2, 0.0, 2 * np.pi, 64)
        ops = advec_operators(disc, a=a, dtype=jnp.float64)
        u0 = jnp.asarray(np.sin(disc.x))
        dt = 5e-4
        n_steps = 50
        dense = advec_march(ops, u0, dt, n_steps)
        mesh = make_mesh({"space": 8})
        sharded = advec_march_sharded(ops, mesh, u0, dt, n_steps, axis="space")
        np.testing.assert_allclose(sharded, dense, rtol=1e-10, atol=1e-12)
