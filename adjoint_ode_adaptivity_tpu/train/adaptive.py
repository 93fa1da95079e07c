"""Compile-once adaptive training: per-step nets with PADDED depth.

The reference's NN drivers re-init/retrace everything each time a layer is
inserted (python lists of params/opt states). Here the stacked parameter
pytree and the time grid are allocated at a static ``max_depth`` up front:
- padded ``dt`` entries are zero ⇒ their steps are exact identities, their
  parameters receive exactly zero gradient, and adam leaves them untouched;
- depth insertion is the static-shape shift/scatter of
  ``models.surgery.insert_step_params_padded`` on params AND optimizer
  moments (new slot: params copy-left, moments zeroed = fresh state);
- the training step, evaluation, and the ensemble refinement signal keep one
  jit for the whole adaptive run — refinement changes data, never shapes.

This is the TPU-first replacement for Main_variable_params.py's outer loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from adjoint_ode_adaptivity_tpu.adapt.policy import bisect_refine_padded, pad_times
from adjoint_ode_adaptivity_tpu.adjoint.discrete import adjoint_march_per_step
from adjoint_ode_adaptivity_tpu.adjoint.estimate import (
    coarse_indicator,
    interp_to_fine,
    refine_all,
    residual,
)
from adjoint_ode_adaptivity_tpu.functionals import terminal_abs_error
from adjoint_ode_adaptivity_tpu.march.fd import forward_march_per_step
from adjoint_ode_adaptivity_tpu.models.surgery import insert_step_params_padded
from adjoint_ode_adaptivity_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_per_step_train_step,
)

__all__ = ["PaddedAdaptiveState", "make_padded_adaptive_trainer"]


class PaddedAdaptiveState(NamedTuple):
    train: TrainState
    times: jnp.ndarray  # (max_depth+1,) padded node times
    n_active: jnp.ndarray  # scalar int32 active steps


def make_padded_adaptive_trainer(
    net,
    tx: optax.GradientTransformation,
    *,
    max_depth: int,
    ref_factor: int = 4,
    train_engine: str = "xla",
    interpret: bool = False,
):
    """Returns (init, train_step, refine) — all shape-static over the run.

    init(params_one_step, times0) -> PaddedAdaptiveState
    train_step(state, u0_batch, true_batch) -> (state, loss)
    refine(state, u0_sig, true_sig) -> (state, err_steps, err_total)

    ``train_engine="pallas"`` (ResBlockSimple nets, B a multiple of 128)
    runs every epoch through the fused training kernel
    (ops.pallas.train_fused); padded zero-``dt`` steps are exact
    identities with exactly-zero gradients in the kernel too, so depth
    growth composes unchanged (tested equal to the XLA engine).
    """
    if train_engine == "pallas":
        from adjoint_ode_adaptivity_tpu.train.loop import (
            make_per_step_train_step_fused,
        )

        base_step = make_per_step_train_step_fused(
            tx, max_depth, net.features, interpret=interpret
        )
    elif train_engine == "xla":
        base_step = make_per_step_train_step(net, tx)
    else:
        raise ValueError(f"unknown train_engine {train_engine!r}")

    def net_step(u, t, d, p):
        return net.apply({"params": p}, u, t, d)

    def init(params_one_step, times0) -> PaddedAdaptiveState:
        times, n_active = pad_times(jnp.asarray(times0), max_depth + 1)
        stacked = jax.tree_util.tree_map(
            lambda l: jnp.stack([l] * max_depth), params_one_step
        )
        return PaddedAdaptiveState(
            train=create_train_state(stacked, tx), times=times, n_active=n_active
        )

    def train_step(state: PaddedAdaptiveState, u0_batch, true_batch):
        dt = jnp.diff(state.times)
        tr, loss = base_step(state.train, dt, u0_batch, true_batch)
        return state._replace(train=tr), loss

    @jax.jit
    def _signal(params_stacked, times, u0s, trues):
        dt = jnp.diff(times)
        dt_f = refine_all(dt, ref_factor)
        fine_params = jax.tree_util.tree_map(
            lambda l: jnp.repeat(l, ref_factor, axis=0), params_stacked
        )

        def one(u0, true):
            u = forward_march_per_step(net_step, jnp.atleast_1d(u0), dt, params_stacked)
            u_f = interp_to_fine(jnp.squeeze(u), dt, dt_f)[:, None]
            k_vec = jax.grad(lambda uu: terminal_abs_error(uu, true))(u_f)
            v = adjoint_march_per_step(net_step, u_f, dt_f, jnp.squeeze(k_vec), fine_params)
            res = residual(net_step, u_f, dt_f, params_stacked=fine_params)
            return coarse_indicator(jnp.squeeze(res * v), ref_factor, "block")

        return jnp.mean(jax.vmap(one)(u0s, trues), axis=0)

    @jax.jit
    def _refine(state: PaddedAdaptiveState, err_steps):
        times_new, n_active_new = bisect_refine_padded(
            state.times, state.n_active, err_steps
        )
        idx = jnp.argmax(err_steps) + 1
        params = insert_step_params_padded(
            state.train.params, state.n_active, idx, depth=max_depth
        )
        opt_state = insert_step_params_padded(
            state.train.opt_state, state.n_active, idx, depth=max_depth, fill="zero"
        )
        return PaddedAdaptiveState(
            train=TrainState(params, opt_state, state.train.step),
            times=times_new,
            n_active=n_active_new,
        )

    def refine(state: PaddedAdaptiveState, u0_sig, true_sig):
        err_steps = _signal(state.train.params, state.times, u0_sig, true_sig)
        new_state = _refine(state, err_steps)
        return new_state, err_steps, jnp.sum(err_steps)

    return init, train_step, refine
