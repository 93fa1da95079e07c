"""DG-in-time applied to a NEURAL right-hand side — the working version of
the reference's abandoned Main_kk1d.py ("Karin Kraft Adaptive FEM for ODEs
applied to NNs", python/Main_kk1d.py:37-47, which crashes at net.init()).

Everything composes for free in this framework: dg_march's Newton assembles
its Jacobian by AD of f, so f can be a flax MLP; the adjoint march
linearises through the same network; the adaptive loop runs unchanged.
"""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jrand
import pytest

from adjoint_ode_adaptivity_tpu import models, odes
from adjoint_ode_adaptivity_tpu.adapt.dg_loop import run_adaptive_dg
from adjoint_ode_adaptivity_tpu.adjoint.dg_time import (
    dg_adjoint_march,
    dg_element_functional,
)
from adjoint_ode_adaptivity_tpu.march.dg_time import dg_march, dg_time_operators
from adjoint_ode_adaptivity_tpu.train import rk4_truth


@pytest.fixture(scope="module")
def neural_rhs():
    """A tiny MLP trained to approximate f(u) = sin(u) on u in [-1, 3]."""
    import optax

    net = models.ResNetBlock(32)
    params = net.init(jrand.PRNGKey(0), jnp.ones(1), 0.0, 0.1)["params"]
    # train the block's internal MLP output f = (block(u,t,1) - u) to sin(u)
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    us = jnp.linspace(-1.0, 3.0, 256)

    def f_of(params, u):
        return net.apply({"params": params}, jnp.atleast_1d(u), 0.0, 1.0) - jnp.atleast_1d(u)

    def loss_fn(params):
        preds = jax.vmap(lambda u: f_of(params, u)[0])(us)
        return jnp.mean((preds - jnp.sin(us)) ** 2)

    @jax.jit
    def step(params, opt):
        l, g = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(g, opt)
        return optax.apply_updates(params, updates), opt, l

    for _ in range(2000):
        params, opt, l = step(params, opt)
    assert float(l) < 1e-4, float(l)

    def f(u, t):
        # elementwise over quadrature points: the scalar network maps one u
        # at a time (dg_march evaluates f on the whole quadrature vector,
        # and its Newton Jacobian takes grad at scalar u)
        if jnp.ndim(u) == 0:
            return f_of(params, u)[0]
        return jax.vmap(lambda x: f_of(params, x)[0])(jnp.reshape(u, (-1,))).reshape(jnp.shape(u))

    return f


class TestNeuralDG:
    def test_newton_through_network(self, neural_rhs):
        """dg_march Newton converges with an MLP right-hand side (Jacobian
        assembled by AD through the network)."""
        ops = dg_time_operators(2, 8)
        times = jnp.linspace(0.0, 2.0, 5)
        res = dg_march(ops, neural_rhs, times, 1.0)
        assert np.all(np.asarray(res.newton_iters) < 20)
        assert float(jnp.max(res.newton_resnorm)) < 1e-6
        # the neural ODE tracks the true sin(u) flow
        exact = 2 * np.arctan2(np.sin(0.5) * np.exp(2.0), np.cos(0.5))
        assert abs(float(res.u[-1, -1]) - exact) < 5e-2

    def test_adjoint_and_adaptive_loop_through_network(self, neural_rhs):
        history = run_adaptive_dg(
            neural_rhs, 1.0, (0.0, 2.0), n_order=1, k0=2, maxit=4, tol=0.0,
        )
        est = [abs(r.est_total) for r in history]
        # the adjoint-weighted estimate tracks the gap to the fine solve
        gaps = [abs(r.effectivity_gap) for r in history]
        assert est[-1] < est[0]
        assert gaps[-1] < gaps[0]


class TestTrainThroughImplicitSolver:
    def test_neural_rhs_trains_through_newton(self):
        """The completion of Main_kk1d.py's intent: the network IS the ODE
        right-hand side and its weights train through the implicit DG-in-time
        solver — gradients via the IFT custom_vjp (march.dg_time.
        dg_march_differentiable), never by unrolling Newton."""
        import optax

        from adjoint_ode_adaptivity_tpu.march.dg_time import (
            dg_march_differentiable,
            dg_time_operators,
        )

        ops = dg_time_operators(2)
        times = jnp.linspace(0.0, 1.0, 5)
        y0 = 1.0
        # truth: terminal value of du/dt = sin(u)
        truth = rk4_truth(lambda u, t: jnp.sin(u), jnp.asarray([y0]), (0.0, 1.0),
                          n_sub=256)[0]

        def f(u, t, p):
            h = jnp.tanh(p["w1"] * u + p["b1"])  # (q,) broadcast over quad pts
            return p["w2"] * h + p["b2"]

        params = {
            "w1": jnp.asarray(0.5), "b1": jnp.asarray(0.1),
            "w2": jnp.asarray(0.5), "b2": jnp.asarray(0.0),
        }

        def loss_fn(p):
            u = dg_march_differentiable(ops, f, times, y0, p)
            return (u[-1, -1] - truth) ** 2

        tx = optax.adam(5e-2)
        opt = tx.init(params)
        l0 = float(loss_fn(params))
        for _ in range(40):
            l, g = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(g, opt)
            params = optax.apply_updates(params, upd)
        l1 = float(loss_fn(params))
        assert np.isfinite(l1)
        assert l1 < l0 / 100, (l0, l1)
