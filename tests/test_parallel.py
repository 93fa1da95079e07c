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


class TestShardedTraining:
    def test_dp_tp_train_step_matches_single_device(self):
        """One per-step train step with the batch sharded over 'data' and
        the hidden width sharded over 'model' must produce the same loss and
        parameters as the unsharded step (XLA inserts the psums)."""
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from adjoint_ode_adaptivity_tpu import models
        from adjoint_ode_adaptivity_tpu.parallel import make_mesh
        from adjoint_ode_adaptivity_tpu.train import (
            create_train_state,
            make_per_step_train_step,
            rk4_truth,
        )

        n_steps, width, batch = 3, 8, 16
        dt = jnp.full((n_steps,), 1.0 / n_steps)
        net = models.ResBlockSimple(width)
        p1 = net.init(jax.random.PRNGKey(0), jnp.ones(1), 0.0, 0.1)["params"]
        stacked = jax.tree_util.tree_map(lambda l: jnp.stack([l] * n_steps), p1)
        tx = optax.adam(1e-3)
        u0s = jax.random.uniform(jax.random.PRNGKey(1), (batch,), minval=-2, maxval=2)
        trues = rk4_truth(lambda u, t: jnp.sin(u), u0s, (0.0, 1.0), n_sub=32)
        step = make_per_step_train_step(net, tx)

        # single device
        s0 = create_train_state(stacked, tx)
        s0, loss0 = step(s0, dt, u0s, trues)

        # dp + tp sharded
        mesh = make_mesh({"data": 4, "model": 2})
        shardings = {
            "bias": NamedSharding(mesh, P(None, "model", None)),
            "weights1": NamedSharding(mesh, P(None, "model", None)),
            "weights2": NamedSharding(mesh, P(None, None, "model")),
        }
        sharded_params = {k: jax.device_put(v, shardings[k]) for k, v in stacked.items()}
        s1 = create_train_state(sharded_params, tx)
        u0s_s = jax.device_put(u0s, NamedSharding(mesh, P("data")))
        trues_s = jax.device_put(trues, NamedSharding(mesh, P("data")))
        with mesh:
            s1, loss1 = step(s1, dt, u0s_s, trues_s)

        np.testing.assert_allclose(float(loss1), float(loss0), rtol=1e-12)
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s0.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


class TestShardedEstimate:
    def test_sharded_pipeline_equals_single_device(self):
        import jax.numpy as jnp
        import numpy as np

        from adjoint_ode_adaptivity_tpu.adjoint.advec import (
            advec_fwd_adj_estimate,
            terminal_integral_cotangent,
        )
        from adjoint_ode_adaptivity_tpu.march.advec import advec_operators
        from adjoint_ode_adaptivity_tpu.ops import startup_1d
        from adjoint_ode_adaptivity_tpu.parallel import (
            advec_fwd_adj_estimate_sharded,
            make_mesh,
        )

        mesh = make_mesh({"space": 8})
        disc = startup_1d(2, 0.0, 2 * np.pi, 64)
        ops = advec_operators(disc, a=2 * np.pi, dtype=jnp.float64)
        u0 = jnp.asarray(np.sin(disc.x))
        lam = terminal_integral_cotangent(disc, jnp.float64)
        dt, n_steps, segment = 5e-4, 16, 4

        uf, lam0, eta, j = advec_fwd_adj_estimate_sharded(
            ops, mesh, u0, lam, dt, n_steps, segment=segment
        )
        ref = advec_fwd_adj_estimate(ops, disc, u0, dt, n_steps, segment=segment)
        np.testing.assert_allclose(uf, ref.u_final, rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(lam0, ref.lam0, rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(eta, ref.eta, rtol=1e-10, atol=1e-16)
        # j is a tiny near-cancelling integral; psum changes summation order
        np.testing.assert_allclose(float(j), float(ref.j_value), atol=1e-13)


class TestPipelineParallel:
    def test_pipeline_march_matches_sequential(self):
        """GPipe-style march over a 4-device 'pipe' axis: microbatches flow
        through ppermute; finals equal the single-device per-step march."""
        from adjoint_ode_adaptivity_tpu.march.fd import forward_march_per_step
        from adjoint_ode_adaptivity_tpu.parallel import make_mesh, pipeline_march

        def step(u, t, dt, p):
            return u + dt * (jnp.sin(p["w"] * u) + 0.1 * t + p["b"])

        s, m, mb = 8, 4, 5
        rng = np.random.default_rng(0)
        params = {
            "w": jnp.asarray(rng.uniform(0.5, 1.5, s)),
            "b": jnp.asarray(rng.uniform(-0.1, 0.1, s)),
        }
        dt = jnp.asarray(rng.uniform(0.05, 0.15, s))
        u0s = jnp.asarray(rng.uniform(-2, 2, (m, mb)))

        mesh = make_mesh({"pipe": 4})
        fn = jax.jit(pipeline_march(step, mesh, axis="pipe"))
        finals = fn(params, dt, u0s, t0=0.25)

        step_mb = jax.vmap(step, in_axes=(0, None, None, None))
        for j in range(m):
            want = forward_march_per_step(step_mb, u0s[j], dt, params, t0=0.25)[-1]
            np.testing.assert_allclose(np.asarray(finals[j]), np.asarray(want),
                                       rtol=1e-12, atol=1e-14)

    def test_pipeline_march_gradients_match(self):
        """jax.grad through the pipeline (transposed ppermutes = the reverse
        schedule) equals the single-device march's parameter gradients."""
        from adjoint_ode_adaptivity_tpu.march.fd import forward_march_per_step
        from adjoint_ode_adaptivity_tpu.parallel import make_mesh, pipeline_march

        def step(u, t, dt, p):
            return u + dt * jnp.tanh(p["w"] * u + p["b"])

        s, m, mb = 8, 3, 4
        rng = np.random.default_rng(1)
        params = {
            "w": jnp.asarray(rng.uniform(0.5, 1.5, s)),
            "b": jnp.asarray(rng.uniform(-0.3, 0.3, s)),
        }
        dt = jnp.full((s,), 0.1)
        u0s = jnp.asarray(rng.uniform(-1, 1, (m, mb)))

        mesh = make_mesh({"pipe": 4})
        pipe = pipeline_march(step, mesh, axis="pipe")

        def loss_pipe(p):
            return jnp.sum(pipe(p, dt, u0s) ** 2)

        step_mb = jax.vmap(step, in_axes=(0, None, None, None))

        def loss_seq(p):
            finals = jnp.stack(
                [forward_march_per_step(step_mb, u0s[j], dt, p)[-1]
                 for j in range(m)]
            )
            return jnp.sum(finals ** 2)

        g_pipe = jax.jit(jax.grad(loss_pipe))(params)
        g_seq = jax.grad(loss_seq)(params)
        np.testing.assert_allclose(float(loss_pipe(params)),
                                   float(loss_seq(params)), rtol=1e-12)
        for k in params:
            np.testing.assert_allclose(np.asarray(g_pipe[k]),
                                       np.asarray(g_seq[k]),
                                       rtol=1e-10, atol=1e-12)

    def test_pipeline_march_resnet_ode(self):
        """The per-step-params ResBlockSimple net marches identically through
        the pipeline and the single-device scan."""
        from adjoint_ode_adaptivity_tpu import models
        from adjoint_ode_adaptivity_tpu.march.fd import forward_march_per_step
        from adjoint_ode_adaptivity_tpu.parallel import make_mesh, pipeline_march

        n_steps, width, m, mb = 8, 6, 3, 4
        net = models.ResBlockSimple(width)
        p1 = net.init(jrand.PRNGKey(0), jnp.ones(1), 0.0, 0.1)["params"]
        keys = jrand.split(jrand.PRNGKey(2), n_steps)
        stacked = jax.tree_util.tree_map(
            lambda l: jnp.stack(
                [l * (1 + 0.01 * i) for i in range(n_steps)]
            ),
            p1,
        )
        del keys

        def step(u, t, dt, p):
            return net.apply({"params": p}, u, t, dt)

        step_mb = jax.vmap(step, in_axes=(0, None, None, None))
        dt = jnp.full((n_steps,), 1.0 / n_steps)
        u0s = jrand.uniform(jrand.PRNGKey(3), (m, mb), minval=-2, maxval=2)

        mesh = make_mesh({"pipe": 4})
        finals = jax.jit(pipeline_march(step_mb, mesh, axis="pipe"))(
            stacked, dt, u0s
        )
        for j in range(m):
            want = forward_march_per_step(step_mb, u0s[j], dt, stacked)[-1]
            np.testing.assert_allclose(np.asarray(finals[j]), np.asarray(want),
                                       rtol=1e-12, atol=1e-14)

    def test_pipeline_step_count_mismatch_raises(self):
        from adjoint_ode_adaptivity_tpu.parallel import make_mesh, pipeline_march

        mesh = make_mesh({"pipe": 4})
        fn = pipeline_march(lambda u, t, dt, p: u, mesh, axis="pipe")
        with pytest.raises(ValueError):
            fn({"w": jnp.zeros(6)}, jnp.ones(6), jnp.zeros((2, 3)))

    def test_pipeline_composes_with_data_axis(self):
        """2-D data×pipe mesh: microbatch members sharded over 'data' while
        stages pipeline over 'pipe' — the ppermute rides only the pipe axis,
        so the same pipeline_march works unchanged on the bigger mesh."""
        from adjoint_ode_adaptivity_tpu.march.fd import forward_march_per_step
        from adjoint_ode_adaptivity_tpu.parallel import (
            make_mesh,
            pipeline_march,
            shard_along,
        )

        def step(u, t, dt, p):
            return u + dt * jnp.tanh(p["w"] * u)

        s, m, mb = 4, 3, 6
        rng = np.random.default_rng(2)
        params = {"w": jnp.asarray(rng.uniform(0.5, 1.5, s))}
        dt = jnp.full((s,), 0.1)
        u0s = jnp.asarray(rng.uniform(-1, 1, (m, mb)))

        mesh = make_mesh({"data": 2, "pipe": 4})
        fn = jax.jit(pipeline_march(step, mesh, axis="pipe", data_axis="data"))
        finals = fn(params, dt, shard_along(u0s, mesh, "data", dim=1))

        step_mb = jax.vmap(step, in_axes=(0, None, None, None))
        for j in range(m):
            want = forward_march_per_step(step_mb, u0s[j], dt, params)[-1]
            np.testing.assert_allclose(np.asarray(finals[j]), np.asarray(want),
                                       rtol=1e-12, atol=1e-14)
