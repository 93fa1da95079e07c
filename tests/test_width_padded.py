"""Padded-capacity (static-shape) width growth: parity with the dynamic
surgery, reference-faithful in-place growth of every step, masked-block
equivalence, and compile-once behaviour."""
import jax
import jax.numpy as jnp
import numpy as np

from adjoint_ode_adaptivity_tpu import models
from adjoint_ode_adaptivity_tpu.models.surgery import (
    bin_losses,
    grow_width,
    grow_width_all_steps,
    grow_width_padded,
    insert_neuron_padded,
    sort_neurons_padded,
    zero_step_moments,
)


def _params(rng, f, d=1, cap=None):
    """Random layer params at width f, optionally padded to capacity cap."""
    cap = cap or f
    b = np.sort(rng.normal(size=(cap, d)), axis=0)
    w1 = rng.normal(size=(cap, d))
    w2 = rng.normal(size=(d, cap))
    return {
        "bias": jnp.asarray(b),
        "weights1": jnp.asarray(w1),
        "weights2": jnp.asarray(w2),
    }


class TestPaddedSurgery:
    def test_insert_matches_dynamic(self):
        rng = np.random.default_rng(0)
        f, cap = 5, 8
        p = _params(rng, f, cap=cap)
        k, nb = jnp.asarray(2), jnp.asarray(0.123)
        grown, n_new = insert_neuron_padded(p, jnp.asarray(f), k, nb, 1e-5)
        assert int(n_new) == f + 1
        # dynamic oracle on the active prefix
        from adjoint_ode_adaptivity_tpu.models.surgery import insert_neuron

        b_d, w1_d, w2_d = insert_neuron(
            p["bias"][:f, 0], p["weights1"][:f], p["weights2"][:, :f], k, nb, 1e-5
        )
        np.testing.assert_array_equal(grown["bias"][: f + 1, 0], b_d)
        np.testing.assert_array_equal(grown["weights1"][: f + 1], w1_d)
        np.testing.assert_array_equal(grown["weights2"][:, : f + 1], w2_d)

    def test_grow_padded_matches_dynamic(self):
        rng = np.random.default_rng(1)
        f, cap = 6, 10
        p = _params(rng, f, cap=cap)
        u = jnp.asarray(rng.uniform(-2, 2, size=64))
        losses = jnp.asarray(rng.uniform(0, 1, size=64))
        active = jax.tree_util.tree_map(
            lambda l: l[:f] if l.shape[0] == cap else l[:, :f], p
        )
        grown_d, ins_d = grow_width(active, u, losses, tol=1e-3)
        grown_p, n_new, ins_p = grow_width_padded(
            p, jnp.asarray(f), u, losses, tol=1e-3
        )
        assert bool(ins_p) == ins_d is True
        assert int(n_new) == f + 1
        np.testing.assert_allclose(
            grown_p["bias"][: f + 1], grown_d["bias"], rtol=0, atol=0
        )
        np.testing.assert_allclose(
            grown_p["weights1"][: f + 1], grown_d["weights1"], rtol=0, atol=0
        )
        np.testing.assert_allclose(
            grown_p["weights2"][:, : f + 1], grown_d["weights2"], rtol=0, atol=0
        )

    def test_no_growth_is_bit_identity(self):
        rng = np.random.default_rng(2)
        p = _params(rng, 4, cap=6)
        # shuffle bias so the layer is UNSORTED — identity must still hold
        p["bias"] = p["bias"][::-1]
        u = jnp.asarray(rng.uniform(-1, 1, size=32))
        losses = jnp.zeros(32)
        out, n_new, ins = grow_width_padded(p, jnp.asarray(4), u, losses, tol=1e-3)
        assert not bool(ins) and int(n_new) == 4
        for k in p:
            np.testing.assert_array_equal(out[k], p[k])

    def test_grow_all_steps_preserves_other_steps(self):
        rng = np.random.default_rng(3)
        l_steps, f, cap = 3, 4, 8
        stacked = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *[_params(rng, f, cap=cap) for _ in range(l_steps)]
        )
        n_active = jnp.full((l_steps,), f, jnp.int32)
        b = 64
        # states well inside the knot range -> tiny knot losses for hidden
        # layers; terminal predictions far from truth -> last layer grows
        u_states = jnp.asarray(rng.uniform(-0.05, 0.05, size=(b, l_steps + 1)))
        trues = 10.0 + jnp.zeros((b,))
        grown, n_new, inserted = grow_width_all_steps(
            stacked, n_active, u_states, trues, tol=1e-4
        )
        assert bool(inserted[-1])  # last layer grew on prediction error
        assert int(n_new[-1]) == f + 1
        for l in range(l_steps):
            if bool(inserted[l]):
                continue
            for k in stacked:
                np.testing.assert_array_equal(grown[k][l], stacked[k][l])

    def test_zero_step_moments(self):
        import optax

        l_steps = 3
        params = {"w": jnp.ones((l_steps, 4))}
        tx = optax.adam(1e-3)
        opt = tx.init(params)
        # fake nonzero moments
        opt = jax.tree_util.tree_map(
            lambda l: l + 1.0 if hasattr(l, "shape") and l.shape[:1] == (l_steps,) else l,
            opt,
        )
        inserted = jnp.asarray([False, True, False])
        out = zero_step_moments(opt, inserted)
        mu = out[0].mu["w"]
        np.testing.assert_array_equal(mu[1], jnp.zeros(4))
        np.testing.assert_array_equal(mu[0], jnp.ones(4))


class TestMaskedBlock:
    def test_masked_equals_unmasked_at_full_width(self):
        f = 5
        net_m = models.ResBlockSimpleMasked(f)
        net_u = models.ResBlockSimple(f)
        rng = jax.random.PRNGKey(0)
        p = net_u.init(rng, jnp.ones(1), 0.0, 0.1)["params"]
        out_m = net_m.apply({"params": p}, jnp.asarray(0.7), 0.0, 0.1, jnp.asarray(f))
        out_u = net_u.apply({"params": p}, jnp.asarray(0.7), 0.0, 0.1)
        # params are f32, conftest inputs f64 — compare at single precision
        np.testing.assert_allclose(out_m, out_u, rtol=1e-6)

    def test_masked_init_helper_matches_simple_at_capacity_gt_width(self):
        """masked_params_from_simple: the active prefix of a capacity>width
        masked net is the width-w ResBlockSimple init bit-for-bit (direct
        masked init would sort knots across the full capacity, handing the
        active prefix only the lowest tail)."""
        w, cap = 6, 11
        simple = models.ResBlockSimple(w)
        p = simple.init(jax.random.PRNGKey(3), jnp.ones(1), 0.0, 0.1)["params"]
        pm = models.masked_params_from_simple(p, cap)
        masked = models.ResBlockSimpleMasked(cap)
        for u in (-1.7, 0.3, 2.2):
            a = simple.apply({"params": p}, jnp.asarray(u), 0.0, 0.05)
            b = masked.apply(
                {"params": pm}, jnp.asarray(u), 0.0, 0.05, jnp.asarray(w)
            )
            # params are f32; the capacity-length contraction rounds
            # differently than the width-length one — single precision
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        # the active knot range spans the simple init's full range, not a tail
        np.testing.assert_array_equal(pm["bias"][:w], p["bias"])
        # padding is inert fill
        np.testing.assert_array_equal(pm["bias"][w:], 0.0)

    def test_inactive_slots_inert_and_zero_grad(self):
        cap, f = 8, 3
        net = models.ResBlockSimpleMasked(cap)
        rng = jax.random.PRNGKey(1)
        p = net.init(rng, jnp.ones(1), 0.0, 0.1, jnp.asarray(f))["params"]

        def out(p):
            return net.apply({"params": p}, jnp.asarray(0.4), 0.0, 0.1, jnp.asarray(f))

        # garbage in padding must not change the output
        p_dirty = jax.tree_util.tree_map(lambda l: l, p)
        p_dirty["weights2"] = p["weights2"].at[:, f:].set(99.0)
        p_dirty["weights1"] = p["weights1"].at[f:].set(-7.0)
        np.testing.assert_allclose(out(p), out(p_dirty), rtol=1e-12)
        # gradient of inactive slots is exactly zero
        g = jax.grad(lambda pp: out(pp) ** 2)(p)
        np.testing.assert_array_equal(g["weights2"][:, f:], 0.0)
        np.testing.assert_array_equal(g["weights1"][f:], 0.0)
        np.testing.assert_array_equal(g["bias"][f:], 0.0)

    def test_train_grow_resume_no_retrace(self):
        """Train → widen (in place) → keep training: one compiled step, other
        steps' params bit-equal through surgery."""
        import optax

        from adjoint_ode_adaptivity_tpu.train import (
            create_train_state,
            make_per_step_masked_train_step,
        )

        cap, f, l_steps = 8, 3, 3
        net = models.ResBlockSimpleMasked(cap)
        rng = jax.random.PRNGKey(2)
        p1 = net.init(rng, jnp.ones(1), 0.0, 0.1, jnp.asarray(f))["params"]
        stacked = jax.tree_util.tree_map(lambda l: jnp.stack([l] * l_steps), p1)
        n_active = jnp.full((l_steps,), f, jnp.int32)
        tx = optax.adam(1e-2)
        state = create_train_state(stacked, tx)
        train_step = make_per_step_masked_train_step(net, tx)

        dt = jnp.full((l_steps,), 1.0 / l_steps)
        u0s = jnp.linspace(-1, 1, 16)
        trues = jnp.sin(u0s)
        for _ in range(3):
            state, loss = train_step(state, dt, n_active, u0s, trues)
        assert train_step._cache_size() == 1

        # grow the last step in place
        from adjoint_ode_adaptivity_tpu.march.fd import forward_march_per_step
        from adjoint_ode_adaptivity_tpu.train.loop import _masked_net_step_fn

        step_fn = _masked_net_step_fn(net)
        u_states = jax.vmap(
            lambda u0: forward_march_per_step(
                step_fn, jnp.atleast_1d(u0), dt, (state.params, n_active)
            )
        )(u0s)[..., 0]
        before = state.params
        grown, n_new, inserted = grow_width_all_steps(
            state.params, n_active, u_states, trues + 10.0, tol=1e-6
        )
        assert bool(inserted[-1])
        # other steps bit-equal
        for l in range(l_steps - 1):
            if not bool(inserted[l]):
                for k in before:
                    np.testing.assert_array_equal(grown[k][l], before[k][l])
        opt_state = zero_step_moments(state.opt_state, inserted)
        state = state._replace(params=grown, opt_state=opt_state)
        n_active = n_new

        # continue training at the new widths — NO retrace
        state, loss2 = train_step(state, dt, n_active, u0s, trues)
        assert train_step._cache_size() == 1
        assert np.isfinite(float(loss2))
