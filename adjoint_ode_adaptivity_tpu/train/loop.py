"""Training steps and states for nets trained through the differentiable
solver.

Reference parity:
- shared-params trainStep (Main_no_matrix_detect_complex.py:164-173,
  Main_FD_with_net.py:92-103): vmapped value_and_grad over the IC batch,
  tree-mean of grads, one adam update.
- per-step-params trainStep (Main_variable_params.py:143-153): same, but
  parameters are per time step. Here they are a *stacked* pytree — one
  optimizer update handles all steps at once (the reference loops a Python
  list of optimizers; stacked adam state is equivalent because adam is
  elementwise).
- mixed-loss trainStep (Main_new_loss.py:153-168): trajectory loss + ramped
  terminal loss.

All steps are pure (state in, state out) and jit once; the IC-ensemble axis
is the data-parallel axis that parallel.ensemble shards over the device mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from adjoint_ode_adaptivity_tpu.march.fd import forward_march, forward_march_per_step
from adjoint_ode_adaptivity_tpu.train.losses import (
    mixed_ramp_weight,
    terminal_mse,
    trajectory_trapezoid,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_shared_train_step",
    "make_per_step_train_step",
    "make_per_step_train_step_fused",
    "make_per_step_masked_train_step",
    "make_per_step_masked_train_step_fused",
    "make_mixed_loss_train_step",
    "make_mixed_loss_train_step_fused",
    "evaluate",
    "evaluate_masked",
]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def _net_step_fn(net) -> Callable:
    def step(u, t, dt, p):
        return net.apply({"params": p}, u, t, dt)

    return step


def make_shared_train_step(net, tx: optax.GradientTransformation, dt: jnp.ndarray):
    """Terminal-MSE step with one parameter set shared across time steps."""
    step_fn = _net_step_fn(net)

    def loss_one(params, u0, true):
        u = forward_march(lambda u, t, d: step_fn(u, t, d, params), u0, dt)
        return terminal_mse(u, true)

    @jax.jit
    def train_step(state: TrainState, u0_batch, true_batch):
        def batch_loss(params):
            losses = jax.vmap(loss_one, in_axes=(None, 0, 0))(params, u0_batch, true_batch)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(batch_loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def make_per_step_train_step(net, tx: optax.GradientTransformation):
    """Terminal-MSE step with per-time-step stacked parameters; ``dt`` is an
    argument so depth refinement needs no retrace when padded."""
    step_fn = _net_step_fn(net)

    def loss_one(params_stacked, dt, u0, true):
        u = forward_march_per_step(step_fn, u0, dt, params_stacked)
        return terminal_mse(u, true)

    @jax.jit
    def train_step(state: TrainState, dt, u0_batch, true_batch):
        def batch_loss(params):
            losses = jax.vmap(loss_one, in_axes=(None, None, 0, 0))(
                params, dt, u0_batch, true_batch
            )
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(batch_loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def make_shared_train_step_fused(
    tx: optax.GradientTransformation,
    dt: jnp.ndarray,
    sizes,
    interpret: bool = False,
    mesh=None,
    mesh_axis: str = "data",
    block_members: int = 8192,
    mxu_dtype=jnp.float32,
):
    """:func:`make_shared_train_step` (shared-params ResNetBlock Dense
    chain — the reference's largest training config,
    Main_FD_with_net.py:52-57) with the epoch's value_and_grad fused
    into ONE Pallas launch (ops.pallas.train_dense_fused): activations
    stay VMEM-resident, hidden-layer matmuls ride the MXU, only the
    (S+1, B) scalar trajectory is stored and the backward recomputes
    the chain per step. Same ``(state, u0_batch, true_batch) → (state,
    loss)`` contract and the same gradients as the XLA step at matmul
    precision (tests/test_pallas_train.py). ``mesh`` dp-shards the
    members as in :func:`make_per_step_train_step_fused`.
    ``mxu_dtype=jnp.bfloat16`` selects the opt-in mixed-precision mode
    (bf16 matmul inputs, f32 everything else — see
    ops.pallas.train_dense_fused)."""
    from adjoint_ode_adaptivity_tpu.ops.pallas.train_dense_fused import (
        make_pallas_dense_epoch_grad,
    )

    dt = jnp.asarray(dt, jnp.float32)
    grad_fn = make_pallas_dense_epoch_grad(
        dt.shape[0], sizes, interpret=interpret,
        block_members=block_members, mxu_dtype=mxu_dtype,
    )

    if mesh is None:
        def value_and_grad(params, u0b, trueb):
            return grad_fn(params, dt, u0b, trueb)
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        d = mesh.shape[mesh_axis]

        def local(params, u0l, truel):
            loss, grads = grad_fn(params, dt, u0l, truel)
            loss = jax.lax.psum(loss, mesh_axis) / d
            grads = jax.lax.psum(grads, mesh_axis)
            return loss, jax.tree_util.tree_map(lambda x: x / d, grads)

        def value_and_grad(params, u0b, trueb):
            return shard_map(
                local, mesh=mesh,
                in_specs=(P(), P(mesh_axis), P(mesh_axis)),
                out_specs=(P(), P()),
                check_vma=False,
            )(params, u0b, trueb)

    @jax.jit
    def train_step(state: TrainState, u0_batch, true_batch):
        loss, grads = value_and_grad(state.params, u0_batch, true_batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def make_per_step_train_step_fused(
    tx: optax.GradientTransformation,
    n_steps: int,
    features: int,
    interpret: bool = False,
    mesh=None,
    mesh_axis: str = "data",
):
    """``make_per_step_train_step`` for ResBlockSimple with the epoch's
    value_and_grad fused into ONE Pallas launch
    (ops.pallas.train_fused — forward march, terminal MSE, and the
    hand-derived reverse sweep all in VMEM; the (F × B) activation
    sheets never touch HBM). Same (state, dt, u0_batch, true_batch) →
    (state, loss) contract and the same gradients as the XLA step at f32
    roundoff (tests/test_pallas_train.py); adam stays in optax. B must
    be a multiple of 128 (per shard, under ``mesh``). Zero-``dt``
    (padding) steps are exact identities with exactly-zero gradients, so
    the padded adaptive trainer composes unchanged.

    With ``mesh``, members shard over ``mesh_axis`` (dp): each device
    runs the fused kernel on its member shard, loss and gradients reduce
    with ``psum`` (shards are equal-sized, so the global batch mean is
    the mean of shard means), and the adam update is computed
    replicated — no host gather.
    """
    from adjoint_ode_adaptivity_tpu.ops.pallas.train_fused import (
        make_pallas_resblock_epoch_grad,
    )

    grad_fn = make_pallas_resblock_epoch_grad(
        n_steps, features, interpret=interpret
    )

    if mesh is None:
        value_and_grad = grad_fn
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        d = mesh.shape[mesh_axis]

        def local(params, dt, u0l, truel):
            loss, grads = grad_fn(params, dt, u0l, truel)
            loss = jax.lax.psum(loss, mesh_axis) / d
            grads = jax.lax.psum(grads, mesh_axis)
            grads = jax.tree_util.tree_map(lambda x: x / d, grads)
            return loss, grads

        def value_and_grad(params, dt, u0b, trueb):
            return shard_map(
                local, mesh=mesh,
                in_specs=(P(), P(), P(mesh_axis), P(mesh_axis)),
                out_specs=(P(), P()),
                check_vma=False,
            )(params, dt, u0b, trueb)

    @jax.jit
    def train_step(state: TrainState, dt, u0_batch, true_batch):
        loss, grads = value_and_grad(state.params, dt, u0_batch, true_batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def make_per_step_masked_train_step_fused(
    tx: optax.GradientTransformation,
    n_steps: int,
    capacity: int,
    interpret: bool = False,
    mesh=None,
    mesh_axis: str = "data",
):
    """``make_per_step_masked_train_step`` (padded-width-capacity
    ResBlockSimpleMasked nets) through the fused epoch kernel: the
    per-step ``n_active`` gates neurons IN-KERNEL, so width surgery
    (surgery.grow_width_padded) never retraces and inactive slots get
    exactly-zero gradients (adam leaves them frozen, same contract as
    the XLA step). Same (state, dt, n_active, u0_batch, true_batch) →
    (state, loss) signature; ``mesh`` dp-shards the members as in
    :func:`make_per_step_train_step_fused`."""
    from adjoint_ode_adaptivity_tpu.ops.pallas.train_fused import (
        make_pallas_resblock_epoch_grad,
    )

    grad_fn = make_pallas_resblock_epoch_grad(
        n_steps, capacity, interpret=interpret, masked=True
    )

    if mesh is None:
        def value_and_grad(params, dt, n_active, u0b, trueb):
            return grad_fn(params, dt, u0b, trueb, n_active=n_active)
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        d = mesh.shape[mesh_axis]

        def local(params, dt, n_active, u0l, truel):
            loss, grads = grad_fn(params, dt, u0l, truel, n_active=n_active)
            loss = jax.lax.psum(loss, mesh_axis) / d
            grads = jax.lax.psum(grads, mesh_axis)
            return loss, jax.tree_util.tree_map(lambda x: x / d, grads)

        def value_and_grad(params, dt, n_active, u0b, trueb):
            return shard_map(
                local, mesh=mesh,
                in_specs=(P(), P(), P(), P(mesh_axis), P(mesh_axis)),
                out_specs=(P(), P()),
                check_vma=False,
            )(params, dt, n_active, u0b, trueb)

    @jax.jit
    def train_step(state: TrainState, dt, n_active, u0_batch, true_batch):
        loss, grads = value_and_grad(
            state.params, dt, n_active, u0_batch, true_batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def _masked_net_step_fn(net) -> Callable:
    """Per-step fn for ResBlockSimpleMasked: the scanned pytree is
    (params_n, n_active_n)."""

    def step(u, t, dt, pm):
        p, n_a = pm
        return net.apply({"params": p}, u, t, dt, n_a)

    return step


def make_per_step_masked_train_step(net, tx: optax.GradientTransformation):
    """Per-step train step for padded-capacity masked nets
    (models.ResBlockSimpleMasked): ``n_active`` (L,) is a traced argument, so
    one compiled step serves every width the capacity admits — width surgery
    (surgery.grow_width_padded) never retraces. Gradients flow to parameters
    only; inactive slots get exactly zero gradient through the mask."""
    step_fn = _masked_net_step_fn(net)

    def loss_one(params_stacked, n_active, dt, u0, true):
        u = forward_march_per_step(step_fn, u0, dt, (params_stacked, n_active))
        return terminal_mse(u, true)

    @jax.jit
    def train_step(state: TrainState, dt, n_active, u0_batch, true_batch):
        def batch_loss(params):
            losses = jax.vmap(loss_one, in_axes=(None, None, None, 0, 0))(
                params, n_active, dt, u0_batch, true_batch
            )
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(batch_loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


@partial(jax.jit, static_argnames=("net",))
def evaluate_masked(net, params, n_active, dt, u0s, trues):
    """``evaluate`` for padded-capacity masked nets."""
    step_fn = _masked_net_step_fn(net)

    def one(u0, true):
        u = forward_march_per_step(step_fn, u0, dt, (params, n_active))
        return terminal_mse(u, true)

    return jnp.mean(jax.vmap(one)(u0s, trues))


def make_mixed_loss_train_step(net, tx: optax.GradientTransformation):
    """Trajectory (trapezoid) loss + ramped terminal loss
    (Main_new_loss.py:153-168). ``true_batch`` holds full trajectories."""
    step_fn = _net_step_fn(net)

    def losses_one(params_stacked, dt, u0, true_traj):
        u = forward_march_per_step(step_fn, u0, dt, params_stacked)
        return (
            trajectory_trapezoid(u, true_traj, dt),
            terminal_mse(u, true_traj[..., -1]),
        )

    @jax.jit
    def train_step(state: TrainState, dt, u0_batch, true_traj_batch, it):
        w = mixed_ramp_weight(it)

        def batch_loss(params):
            new_l, old_l = jax.vmap(losses_one, in_axes=(None, None, 0, 0))(
                params, dt, u0_batch, true_traj_batch
            )
            return jnp.mean(new_l) + w * jnp.mean(old_l)

        loss, grads = jax.value_and_grad(batch_loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def make_mixed_loss_train_step_fused(
    tx: optax.GradientTransformation,
    n_steps: int,
    features: int,
    interpret: bool = False,
    mesh=None,
    mesh_axis: str = "data",
):
    """:func:`make_mixed_loss_train_step` (trajectory trapezoid + ramped
    terminal loss, Main_new_loss.py:153-168) with the epoch's
    value_and_grad fused into ONE Pallas launch — the fused kernel
    already stores the full trajectory in VMEM scratch for its reverse
    sweep, so the trapezoid nodes read it for free instead of
    re-materializing (S+1) × (F, B) intermediates through HBM like the
    XLA path. Same ``(state, dt, u0_batch, true_traj_batch, it) →
    (state, loss)`` contract as the XLA step (``true_traj_batch`` is
    (B, S+1); the ramp weight ``10**((it+1)//10 − 4)`` is a traced SMEM
    scalar so the per-10-iteration ramp never retraces) and the same
    gradients at f32 roundoff (tests/test_pallas_train.py). B must be a
    multiple of 128 per shard; ``mesh`` dp-shards the members as in
    :func:`make_per_step_train_step_fused`."""
    from adjoint_ode_adaptivity_tpu.ops.pallas.train_fused import (
        make_pallas_resblock_epoch_grad,
    )

    grad_fn = make_pallas_resblock_epoch_grad(
        n_steps, features, interpret=interpret, mixed=True
    )

    if mesh is None:
        def value_and_grad(params, dt, u0b, traj_b, w):
            return grad_fn(params, dt, u0b, traj_b.T, ramp_weight=w)
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        d = mesh.shape[mesh_axis]

        def local(params, dt, u0l, trajl, w):
            loss, grads = grad_fn(params, dt, u0l, trajl.T, ramp_weight=w)
            loss = jax.lax.psum(loss, mesh_axis) / d
            grads = jax.lax.psum(grads, mesh_axis)
            return loss, jax.tree_util.tree_map(lambda x: x / d, grads)

        def value_and_grad(params, dt, u0b, traj_b, w):
            return shard_map(
                local, mesh=mesh,
                in_specs=(P(), P(), P(mesh_axis), P(mesh_axis), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )(params, dt, u0b, traj_b, w)

    @jax.jit
    def train_step(state: TrainState, dt, u0_batch, true_traj_batch, it):
        w = mixed_ramp_weight(it)
        loss, grads = value_and_grad(
            state.params, dt, u0_batch, true_traj_batch, w
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


@partial(jax.jit, static_argnames=("net", "per_step"))
def evaluate(net, params, dt, u0s, trues, per_step: bool = True):
    """Mean terminal MSE over an IC set — the reference's 'Error' metric
    (``metricCalc``, Main_no_matrix_detect_complex.py:176-182)."""
    step_fn = _net_step_fn(net)

    def one(u0, true):
        if per_step:
            u = forward_march_per_step(step_fn, u0, dt, params)
        else:
            u = forward_march(lambda u_, t, d: step_fn(u_, t, d, params), u0, dt)
        return terminal_mse(u, true)

    return jnp.mean(jax.vmap(one)(u0s, trues))
