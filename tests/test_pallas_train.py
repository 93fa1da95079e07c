"""Fused training-epoch kernel (ops/pallas/train_fused.py) vs the XLA
value_and_grad path (interpret mode on CPU; the smoke gate runs the same
kernel on hardware)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from adjoint_ode_adaptivity_tpu.models.blocks import ResBlockSimple
from adjoint_ode_adaptivity_tpu.ops.pallas.train_fused import (
    make_pallas_resblock_epoch_grad,
    pack_params,
    unpack_grads,
)
from adjoint_ode_adaptivity_tpu.train.loop import (
    create_train_state,
    make_per_step_train_step,
    make_per_step_train_step_fused,
)

S, F, B = 6, 37, 256  # odd F exercises the zero-padded neuron chunks


def _setup(seed=0, f=F):
    net = ResBlockSimple(features=f)
    key = jax.random.PRNGKey(seed)
    p1 = net.init(key, jnp.ones(1), 0.0, 0.1)["params"]
    params = jax.tree_util.tree_map(
        lambda l: jnp.stack([l] * S).astype(jnp.float32), p1
    )
    # perturb per-step so steps are distinguishable
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), len(leaves))
    leaves = [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    dt = jnp.asarray(
        np.random.default_rng(seed).uniform(0.05, 0.15, S), jnp.float32
    )
    u0s = jnp.asarray(
        np.random.default_rng(seed + 2).uniform(-2, 2, B), jnp.float32
    )
    trues = jnp.sin(u0s) + 0.3
    return net, params, dt, u0s, trues


def _xla_value_and_grad(net, params, dt, u0s, trues):
    from adjoint_ode_adaptivity_tpu.march.fd import forward_march_per_step
    from adjoint_ode_adaptivity_tpu.train.losses import terminal_mse

    def step(u, t, d, p):
        return net.apply({"params": p}, u, t, d)

    def batch_loss(p):
        def one(u0, true):
            u = forward_march_per_step(step, jnp.atleast_1d(u0), dt, p)
            return terminal_mse(u, true)

        return jnp.mean(jax.vmap(one)(u0s, trues))

    return jax.value_and_grad(batch_loss)(params)


class TestFusedEpochGrad:
    def test_matches_xla_value_and_grad(self):
        net, params, dt, u0s, trues = _setup()
        want_loss, want_grads = _xla_value_and_grad(
            net, params, dt, u0s, trues
        )
        run = make_pallas_resblock_epoch_grad(S, F, interpret=True)
        loss, grads = run(params, dt, u0s, trues)
        np.testing.assert_allclose(loss, want_loss, rtol=2e-6)
        for k in ("bias", "weights1", "weights2"):
            np.testing.assert_allclose(
                grads[k], want_grads[k], rtol=2e-5, atol=1e-7, err_msg=k
            )

    def test_multi_program_grid_accumulation(self):
        # max_lanes=128 forces 2 member-block programs at B=256; grads
        # must equal the single-pass XLA result (the sequential grid
        # accumulates into the shared output block)
        net, params, dt, u0s, trues = _setup(seed=3)
        _, want_grads = _xla_value_and_grad(net, params, dt, u0s, trues)
        run = make_pallas_resblock_epoch_grad(
            S, F, interpret=True, max_lanes=128
        )
        _, grads = run(params, dt, u0s, trues)
        np.testing.assert_allclose(
            grads["weights2"], want_grads["weights2"], rtol=2e-5, atol=1e-7
        )

    def test_member_weights_exclude_padding(self):
        # a zero-weight member must contribute nothing: weighted run over
        # B members with the tail masked == plain run over the live head
        net, params, dt, u0s, trues = _setup(seed=5)
        n_live = 128
        w = jnp.asarray(np.arange(B) < n_live, jnp.float32)
        run = make_pallas_resblock_epoch_grad(S, F, interpret=True)
        loss_w, grads_w = run(params, dt, u0s, trues, weights=w)
        loss_h, grads_h = run(params, dt, u0s[:n_live], trues[:n_live])
        np.testing.assert_allclose(loss_w, loss_h, rtol=1e-6)
        np.testing.assert_allclose(
            grads_w["bias"], grads_h["bias"], rtol=1e-5, atol=1e-8
        )

    def test_pack_unpack_round_trip(self):
        _, params, _, _, _ = _setup(seed=7)
        packed = pack_params(params, S, F)
        assert packed.shape == (3, S * (-(-F // 8)), 8, 1)
        back = unpack_grads(packed, S, F)
        for k in ("bias", "weights1", "weights2"):
            np.testing.assert_array_equal(back[k], params[k])

    def test_grouped_unroll_matches_xla(self):
        # unroll=8 forces the grouped chunk loop at F=37 (C pads 5 → 8:
        # three whole padding chunks of zero neurons must stay exactly
        # inert in both passes) — the production path for F > ~200
        net, params, dt, u0s, trues = _setup(seed=13)
        want_loss, want_grads = _xla_value_and_grad(
            net, params, dt, u0s, trues
        )
        run = make_pallas_resblock_epoch_grad(S, F, interpret=True,
                                              unroll=8)
        loss, grads = run(params, dt, u0s, trues)
        np.testing.assert_allclose(loss, want_loss, rtol=2e-6)
        for k in ("bias", "weights1", "weights2"):
            np.testing.assert_allclose(
                grads[k], want_grads[k], rtol=2e-5, atol=1e-7, err_msg=k
            )

    def test_grouped_unroll_masked_mixed_match_unroll1(self):
        # the masked and mixed variants produce bit-comparable results
        # under the grouped loop (same math, different emission order)
        net, params, dt, u0s, trues = _setup(seed=17)
        n_active = jnp.asarray(
            np.random.default_rng(17).integers(1, F + 1, S), jnp.float32
        )
        for kwargs, extra in (
            (dict(masked=True), dict(n_active=n_active)),
            (dict(mixed=True), dict(ramp_weight=jnp.float32(0.7))),
        ):
            if kwargs.get("mixed"):
                tt = jnp.tile(trues[None], (S + 1, 1))
                args = (params, dt, u0s, tt)
            else:
                args = (params, dt, u0s, trues)
            r1 = make_pallas_resblock_epoch_grad(
                S, F, interpret=True, unroll=1, **kwargs
            )
            r8 = make_pallas_resblock_epoch_grad(
                S, F, interpret=True, unroll=8, **kwargs
            )
            l1, g1 = r1(*args, **extra)
            l8, g8 = r8(*args, **extra)
            np.testing.assert_allclose(l8, l1, rtol=1e-6)
            for k in ("bias", "weights1", "weights2"):
                np.testing.assert_allclose(
                    g8[k], g1[k], rtol=1e-6, atol=1e-9, err_msg=k
                )

    def test_b_not_multiple_of_lanes_raises(self):
        _, params, dt, u0s, trues = _setup()
        run = make_pallas_resblock_epoch_grad(S, F, interpret=True)
        with pytest.raises(ValueError, match="multiple of 128"):
            run(params, dt, u0s[:100], trues[:100])


class TestFusedTrainStep:
    def test_adam_trajectory_matches_xla_step(self):
        net, params, dt, u0s, trues = _setup(seed=9)
        tx = optax.adam(1e-3)
        st_x = create_train_state(params, tx)
        st_p = create_train_state(params, tx)
        step_x = make_per_step_train_step(net, tx)
        step_p = make_per_step_train_step_fused(tx, S, F, interpret=True)
        for _ in range(3):
            st_x, loss_x = step_x(st_x, dt, u0s, trues)
            st_p, loss_p = step_p(st_p, dt, u0s, trues)
            np.testing.assert_allclose(loss_p, loss_x, rtol=2e-6)
        for lx, lp in zip(
            jax.tree_util.tree_leaves(st_x.params),
            jax.tree_util.tree_leaves(st_p.params),
        ):
            np.testing.assert_allclose(lp, lx, rtol=2e-4, atol=1e-6)


class TestFusedCompositions:
    def test_dp_mesh_matches_unsharded(self):
        # members shard over the 8-device CPU mesh; loss and the adam
        # trajectory must match the unsharded fused step
        from jax.sharding import Mesh

        net, params, dt, u0s, trues = _setup(seed=11)
        u0b = jnp.tile(u0s, 4)  # B=1024 -> 128 members/device
        trueb = jnp.tile(trues, 4)
        tx = optax.adam(1e-3)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        step_1 = make_per_step_train_step_fused(tx, S, F, interpret=True)
        step_d = make_per_step_train_step_fused(
            tx, S, F, interpret=True, mesh=mesh
        )
        st_1 = create_train_state(params, tx)
        st_d = create_train_state(params, tx)
        for _ in range(2):
            st_1, loss_1 = step_1(st_1, dt, u0b, trueb)
            st_d, loss_d = step_d(st_d, dt, u0b, trueb)
            np.testing.assert_allclose(loss_d, loss_1, rtol=1e-6)
        for l1, ld in zip(
            jax.tree_util.tree_leaves(st_1.params),
            jax.tree_util.tree_leaves(st_d.params),
        ):
            np.testing.assert_allclose(ld, l1, rtol=1e-4, atol=1e-7)

    def test_padded_adaptive_trainer_pallas_engine(self):
        # the padded adaptive trainer with the fused kernel: padded
        # zero-dt steps stay inert, refinement decisions and losses
        # match the XLA engine
        from adjoint_ode_adaptivity_tpu.train.adaptive import (
            make_padded_adaptive_trainer,
        )

        net = ResBlockSimple(features=16)
        p1 = net.init(jax.random.PRNGKey(2), jnp.ones(1), 0.0, 0.1)["params"]
        tx = optax.adam(1e-3)
        u0s = jnp.asarray(
            np.random.default_rng(4).uniform(-2, 2, 128), jnp.float32
        )
        trues = jnp.sin(u0s) + 0.3
        times0 = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float32)
        results = {}
        for eng in ("xla", "pallas"):
            init, tstep, refine = make_padded_adaptive_trainer(
                net, tx, max_depth=8, train_engine=eng, interpret=True
            )
            st = init(p1, times0)
            losses = []
            for _ in range(3):
                st, loss = tstep(st, u0s, trues)
                losses.append(float(loss))
            st, err_steps, err_total = refine(st, u0s[:32], trues[:32])
            results[eng] = (losses, np.asarray(st.times),
                            int(st.n_active), float(err_total))
        np.testing.assert_allclose(
            results["pallas"][0], results["xla"][0], rtol=2e-5
        )
        np.testing.assert_allclose(
            results["pallas"][1], results["xla"][1], atol=1e-6
        )
        assert results["pallas"][2] == results["xla"][2]
        np.testing.assert_allclose(
            results["pallas"][3], results["xla"][3], rtol=2e-4
        )


class TestFusedDense:
    """Fused SHARED-params Dense-chain epoch kernel
    (ops/pallas/train_dense_fused.py) vs jax.grad of the XLA shared
    step's loss — the Main_FD_with_net strand."""

    def _setup(self, seed=41, sizes=(3, 5), s=S):
        from adjoint_ode_adaptivity_tpu.models.blocks import ResNetBlock

        net = ResNetBlock(sizes)
        params = net.init(jax.random.PRNGKey(seed), jnp.ones(1), 0.0, 0.1)[
            "params"
        ]
        dt = jnp.asarray(
            np.random.default_rng(seed).uniform(0.05, 0.15, s), jnp.float32
        )
        u0s = jnp.asarray(
            np.random.default_rng(seed + 2).uniform(-2, 2, B), jnp.float32
        )
        trues = jnp.sin(u0s) + 0.3
        return net, params, dt, u0s, trues

    def _xla_value_and_grad(self, net, params, dt, u0s, trues):
        from adjoint_ode_adaptivity_tpu.march.fd import forward_march
        from adjoint_ode_adaptivity_tpu.train.losses import terminal_mse

        def batch_loss(p):
            def one(u0, true):
                u = forward_march(
                    lambda u_, t, d: net.apply({"params": p}, u_, t, d),
                    jnp.atleast_1d(u0), dt,
                )
                return terminal_mse(u, true)

            return jnp.mean(jax.vmap(one)(u0s, trues))

        return jax.value_and_grad(batch_loss)(params)

    @pytest.mark.parametrize("sizes", [(3, 5), (4,), (3, 6, 5)])
    def test_matches_xla_value_and_grad(self, sizes):
        from adjoint_ode_adaptivity_tpu.ops.pallas.train_dense_fused import (
            make_pallas_dense_epoch_grad,
        )

        net, params, dt, u0s, trues = self._setup(sizes=sizes)
        want_loss, want_grads = self._xla_value_and_grad(
            net, params, dt, u0s, trues
        )
        run = make_pallas_dense_epoch_grad(S, sizes, interpret=True)
        loss, grads = run(params, dt, u0s, trues)
        np.testing.assert_allclose(loss, want_loss, rtol=2e-6)
        for i in range(len(sizes) + 1):
            for leaf in ("kernel", "bias"):
                np.testing.assert_allclose(
                    grads[f"Dense_{i}"][leaf],
                    want_grads[f"Dense_{i}"][leaf],
                    rtol=2e-5, atol=1e-7, err_msg=f"Dense_{i}/{leaf}",
                )

    def test_zero_dt_steps_are_inert(self):
        from adjoint_ode_adaptivity_tpu.ops.pallas.train_dense_fused import (
            make_pallas_dense_epoch_grad,
        )

        net, params, dt, u0s, trues = self._setup(seed=43)
        dt_pad = jnp.concatenate([dt, jnp.zeros((3,))])
        run = make_pallas_dense_epoch_grad(S, (3, 5), interpret=True)
        run_p = make_pallas_dense_epoch_grad(S + 3, (3, 5), interpret=True)
        loss, grads = run(params, dt, u0s, trues)
        loss_p, grads_p = run_p(params, dt_pad, u0s, trues)
        np.testing.assert_allclose(loss_p, loss, rtol=1e-6)
        for lx, lp in zip(
            jax.tree_util.tree_leaves(grads),
            jax.tree_util.tree_leaves(grads_p),
        ):
            np.testing.assert_allclose(lp, lx, rtol=1e-5, atol=1e-8)

    def test_bf16_mxu_mode_matches_xla_loosely(self):
        """mxu_dtype=bfloat16 rounds only the hidden-chain matmul INPUTS
        (accumulation/params/march/grad buffers stay f32), so values and
        grads track jax.grad of the f32 XLA loss at bf16 matmul
        tolerance — the opt-in fast mode's numerics contract."""
        from adjoint_ode_adaptivity_tpu.ops.pallas.train_dense_fused import (
            make_pallas_dense_epoch_grad,
        )

        sizes = (3, 6, 5)  # two hidden matmul layers actually hit bf16
        net, params, dt, u0s, trues = self._setup(seed=49, sizes=sizes)
        want_loss, want_grads = self._xla_value_and_grad(
            net, params, dt, u0s, trues
        )
        run = make_pallas_dense_epoch_grad(
            S, sizes, interpret=True, mxu_dtype=jnp.bfloat16
        )
        loss, grads = run(params, dt, u0s, trues)
        np.testing.assert_allclose(loss, want_loss, rtol=3e-2)
        for i in range(len(sizes) + 1):
            for leaf in ("kernel", "bias"):
                want = want_grads[f"Dense_{i}"][leaf]
                scale = float(jnp.max(jnp.abs(want)))
                np.testing.assert_allclose(
                    grads[f"Dense_{i}"][leaf], want,
                    rtol=5e-2, atol=5e-2 * scale,
                    err_msg=f"Dense_{i}/{leaf}",
                )

    def test_multi_block_grid_accumulation(self):
        from adjoint_ode_adaptivity_tpu.ops.pallas.train_dense_fused import (
            make_pallas_dense_epoch_grad,
        )

        net, params, dt, u0s, trues = self._setup(seed=45)
        want_loss, want_grads = self._xla_value_and_grad(
            net, params, dt, u0s, trues
        )
        run = make_pallas_dense_epoch_grad(
            S, (3, 5), interpret=True, block_members=128
        )
        loss, grads = run(params, dt, u0s, trues)
        # the loss blocks are per-program (own col_spec block each) while
        # the grad blocks are shared — BOTH must survive n_blocks > 1
        # (regression: the loss was once zero-initialized only for
        # program 0 and came back NaN for every later block)
        np.testing.assert_allclose(loss, want_loss, rtol=2e-6)
        np.testing.assert_allclose(
            grads["Dense_1"]["kernel"], want_grads["Dense_1"]["kernel"],
            rtol=2e-5, atol=1e-7,
        )

    def test_shared_train_step_matches_xla(self):
        from adjoint_ode_adaptivity_tpu.train.loop import (
            make_shared_train_step,
            make_shared_train_step_fused,
        )

        net, params, dt, u0s, trues = self._setup(seed=47)
        tx = optax.adam(1e-3)
        st_x = create_train_state(params, tx)
        st_p = create_train_state(params, tx)
        step_x = make_shared_train_step(net, tx, dt)
        step_p = make_shared_train_step_fused(tx, dt, (3, 5), interpret=True)
        for _ in range(3):
            st_x, loss_x = step_x(st_x, u0s, trues)
            st_p, loss_p = step_p(st_p, u0s, trues)
            np.testing.assert_allclose(loss_p, loss_x, rtol=2e-6)
        for lx, lp in zip(
            jax.tree_util.tree_leaves(st_x.params),
            jax.tree_util.tree_leaves(st_p.params),
        ):
            np.testing.assert_allclose(lp, lx, rtol=2e-4, atol=1e-6)

    def test_dp_mesh_matches_unsharded(self):
        from jax.sharding import Mesh

        from adjoint_ode_adaptivity_tpu.train.loop import (
            make_shared_train_step_fused,
        )

        net, params, dt, u0s, trues = self._setup(seed=49)
        u0b = jnp.tile(u0s, 4)
        trueb = jnp.tile(trues, 4)
        tx = optax.adam(1e-3)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        step_1 = make_shared_train_step_fused(tx, dt, (3, 5), interpret=True)
        step_d = make_shared_train_step_fused(
            tx, dt, (3, 5), interpret=True, mesh=mesh
        )
        st_1 = create_train_state(params, tx)
        st_d = create_train_state(params, tx)
        for _ in range(2):
            st_1, loss_1 = step_1(st_1, u0b, trueb)
            st_d, loss_d = step_d(st_d, u0b, trueb)
            np.testing.assert_allclose(loss_d, loss_1, rtol=1e-6)
        for l1, ld in zip(
            jax.tree_util.tree_leaves(st_1.params),
            jax.tree_util.tree_leaves(st_d.params),
        ):
            np.testing.assert_allclose(ld, l1, rtol=1e-4, atol=1e-7)


class TestFusedMixed:
    """mixed=True: the trajectory ("new") + ramped-terminal loss of
    Main_new_loss.py:145-168, pinned to jax.grad of the XLA mixed loss."""

    def _traj_targets(self, u0s, dt):
        # smooth per-node targets with the same (B, S+1) orientation as
        # rk4_truth(..., save_times=nodes)
        nodes = jnp.pad(jnp.cumsum(dt), (1, 0))
        return jnp.sin(u0s[:, None] + nodes[None, :]) + 0.3

    def _xla_mixed_value_and_grad(self, net, params, dt, u0s, traj_b, w):
        from adjoint_ode_adaptivity_tpu.march.fd import forward_march_per_step
        from adjoint_ode_adaptivity_tpu.train.losses import (
            terminal_mse,
            trajectory_trapezoid,
        )

        def step(u, t, d, p):
            return net.apply({"params": p}, u, t, d)

        def batch_loss(p):
            def one(u0, true_traj):
                u = forward_march_per_step(step, jnp.atleast_1d(u0), dt, p)
                return (
                    trajectory_trapezoid(u, true_traj, dt)
                    + w * terminal_mse(u, true_traj[..., -1])
                )

            return jnp.mean(jax.vmap(one)(u0s, traj_b))

        return jax.value_and_grad(batch_loss)(params)

    def test_matches_xla_mixed_value_and_grad(self):
        net, params, dt, u0s, _ = _setup(seed=31)
        traj_b = self._traj_targets(u0s, dt)
        for w in (0.0, 0.37):  # w=0 isolates the pure trapezoid reverse
            want_loss, want_grads = self._xla_mixed_value_and_grad(
                net, params, dt, u0s, traj_b, w
            )
            run = make_pallas_resblock_epoch_grad(
                S, F, interpret=True, mixed=True
            )
            loss, grads = run(params, dt, u0s, traj_b.T, ramp_weight=w)
            np.testing.assert_allclose(loss, want_loss, rtol=2e-6)
            for k in ("bias", "weights1", "weights2"):
                np.testing.assert_allclose(
                    grads[k], want_grads[k], rtol=2e-5, atol=1e-7,
                    err_msg=f"{k} w={w}",
                )

    def test_mixed_requires_full_trajectory_and_ramp(self):
        _, params, dt, u0s, trues = _setup()
        run = make_pallas_resblock_epoch_grad(S, F, interpret=True,
                                              mixed=True)
        with pytest.raises(ValueError, match="ramp_weight"):
            run(params, dt, u0s, jnp.zeros((S + 1, B)))
        with pytest.raises(ValueError, match="full"):
            run(params, dt, u0s, trues, ramp_weight=0.1)

    def test_mixed_train_step_matches_xla(self):
        from adjoint_ode_adaptivity_tpu.train.loop import (
            make_mixed_loss_train_step,
            make_mixed_loss_train_step_fused,
        )

        net, params, dt, u0s, _ = _setup(seed=33)
        traj_b = self._traj_targets(u0s, dt)
        tx = optax.adam(1e-3)
        st_x = create_train_state(params, tx)
        st_p = create_train_state(params, tx)
        step_x = make_mixed_loss_train_step(net, tx)
        step_p = make_mixed_loss_train_step_fused(tx, S, F, interpret=True)
        # it=9→10 crosses a ramp decade (10**((it+1)//10 − 4) jumps 10×)
        for it in (9, 10, 11):
            st_x, loss_x = step_x(st_x, dt, u0s, traj_b, jnp.asarray(it))
            st_p, loss_p = step_p(st_p, dt, u0s, traj_b, jnp.asarray(it))
            np.testing.assert_allclose(loss_p, loss_x, rtol=2e-6)
        for lx, lp in zip(
            jax.tree_util.tree_leaves(st_x.params),
            jax.tree_util.tree_leaves(st_p.params),
        ):
            np.testing.assert_allclose(lp, lx, rtol=2e-4, atol=1e-6)

    def test_mixed_dp_mesh_matches_unsharded(self):
        from jax.sharding import Mesh

        from adjoint_ode_adaptivity_tpu.train.loop import (
            make_mixed_loss_train_step_fused,
        )

        net, params, dt, u0s, _ = _setup(seed=35)
        u0b = jnp.tile(u0s, 4)  # B=1024 -> 128 members/device
        traj_b = self._traj_targets(u0b, dt)
        tx = optax.adam(1e-3)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        step_1 = make_mixed_loss_train_step_fused(tx, S, F, interpret=True)
        step_d = make_mixed_loss_train_step_fused(
            tx, S, F, interpret=True, mesh=mesh
        )
        st_1 = create_train_state(params, tx)
        st_d = create_train_state(params, tx)
        for it in (0, 1):
            st_1, loss_1 = step_1(st_1, dt, u0b, traj_b, jnp.asarray(it))
            st_d, loss_d = step_d(st_d, dt, u0b, traj_b, jnp.asarray(it))
            np.testing.assert_allclose(loss_d, loss_1, rtol=1e-6)
        for l1, ld in zip(
            jax.tree_util.tree_leaves(st_1.params),
            jax.tree_util.tree_leaves(st_d.params),
        ):
            np.testing.assert_allclose(ld, l1, rtol=1e-4, atol=1e-7)


class TestFusedMasked:
    def _masked_setup(self, seed=21, cap=24, width=9):
        from adjoint_ode_adaptivity_tpu.models.blocks import (
            ResBlockSimpleMasked,
            masked_params_from_simple,
        )

        net_s = ResBlockSimple(features=width)
        p_s = net_s.init(jax.random.PRNGKey(seed), jnp.ones(1), 0.0, 0.1)[
            "params"
        ]
        p1 = masked_params_from_simple(p_s, cap)
        params = jax.tree_util.tree_map(
            lambda l: jnp.stack([l] * S).astype(jnp.float32), p1
        )
        net_m = ResBlockSimpleMasked(cap)
        # ragged per-step widths exercise the in-kernel gate per step
        n_active = jnp.asarray([width, width + 3, width, cap, 1, width],
                               jnp.int32)
        dt = jnp.asarray(
            np.random.default_rng(seed).uniform(0.05, 0.15, S), jnp.float32
        )
        u0s = jnp.asarray(
            np.random.default_rng(seed + 2).uniform(-2, 2, B), jnp.float32
        )
        trues = jnp.sin(u0s) + 0.3
        return net_m, params, n_active, dt, u0s, trues

    def test_masked_matches_xla_value_and_grad(self):
        from adjoint_ode_adaptivity_tpu.march.fd import forward_march_per_step
        from adjoint_ode_adaptivity_tpu.train.loop import (
            _masked_net_step_fn,
        )
        from adjoint_ode_adaptivity_tpu.train.losses import terminal_mse

        net_m, params, n_active, dt, u0s, trues = self._masked_setup()
        cap = 24
        step = _masked_net_step_fn(net_m)

        def batch_loss(p):
            def one(u0, true):
                u = forward_march_per_step(
                    step, jnp.atleast_1d(u0), dt, (p, n_active)
                )
                return terminal_mse(u, true)

            return jnp.mean(jax.vmap(one)(u0s, trues))

        want_loss, want_grads = jax.value_and_grad(batch_loss)(params)
        run = make_pallas_resblock_epoch_grad(S, cap, interpret=True,
                                              masked=True)
        loss, grads = run(params, dt, u0s, trues, n_active=n_active)
        np.testing.assert_allclose(loss, want_loss, rtol=2e-6)
        for k in ("bias", "weights1", "weights2"):
            np.testing.assert_allclose(
                grads[k], want_grads[k], rtol=2e-5, atol=1e-7, err_msg=k
            )

    def test_inactive_slots_get_exactly_zero_grads(self):
        net_m, params, n_active, dt, u0s, trues = self._masked_setup()
        cap = 24
        run = make_pallas_resblock_epoch_grad(S, cap, interpret=True,
                                              masked=True)
        _, grads = run(params, dt, u0s, trues, n_active=n_active)
        na = np.asarray(n_active)
        for k in ("bias", "weights1", "weights2"):
            g = np.asarray(grads[k]).reshape(S, cap)
            for n in range(S):
                assert np.all(g[n, na[n]:] == 0.0), (k, n)

    def test_masked_train_step_matches_xla(self):
        from adjoint_ode_adaptivity_tpu.train.loop import (
            make_per_step_masked_train_step,
            make_per_step_masked_train_step_fused,
        )

        net_m, params, n_active, dt, u0s, trues = self._masked_setup(seed=23)
        tx = optax.adam(1e-3)
        st_x = create_train_state(params, tx)
        st_p = create_train_state(params, tx)
        step_x = make_per_step_masked_train_step(net_m, tx)
        step_p = make_per_step_masked_train_step_fused(
            tx, S, 24, interpret=True
        )
        for _ in range(3):
            st_x, loss_x = step_x(st_x, dt, n_active, u0s, trues)
            st_p, loss_p = step_p(st_p, dt, n_active, u0s, trues)
            np.testing.assert_allclose(loss_p, loss_x, rtol=2e-6)
        for lx, lp in zip(
            jax.tree_util.tree_leaves(st_x.params),
            jax.tree_util.tree_leaves(st_p.params),
        ):
            np.testing.assert_allclose(lp, lx, rtol=2e-4, atol=1e-6)
