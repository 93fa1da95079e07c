"""Fused training-epoch kernel for per-step ResBlockSimple nets.

The L4 (train-through-the-solver) axis in one Pallas launch: the S-step
forward-Euler march ``u_{n+1} = u_n + dt_n · Σ_i w2_i · relu(w1_i·(u_n −
b_i))`` (models/blocks.py ResBlockSimple, scalar state d=1 — the
reference's trained configuration, python/models.py:38-65), the terminal
mean-squared error against targets, AND the hand-derived reverse sweep
producing the full parameter gradient — all inside the kernel, so the
(F × B) activation sheets never touch HBM. The XLA path
(train/loop.make_per_step_train_step: vmap ∘ value_and_grad ∘ scan)
re-materializes each step's (F, B) intermediates through HBM; at the
bench configuration (S=10, F=500, B=8192) that is ~40 MB of traffic per
direction per step, which is exactly what this kernel deletes. The adam
update stays outside in optax — the kernel returns (loss, grads) with the
same semantics as value_and_grad of the XLA loss (pinned in
tests/test_pallas_train.py).

Layout (Mosaic-friendly by construction):
- members ride the LANES: each grid program owns a (1, L) member block
  of ``u0``/``true``/``weight`` (L = the largest 128-multiple <= 8192
  dividing B — at the bench size one program owns the whole batch); the
  trajectory it stores for the reverse sweep is (S+1, 1, L) — a few
  hundred KB of VMEM at most.
- neurons ride 8-SUBLANE chunks: each parameter is packed host-side as
  (S·C, 8, 1) with C = ceil(F/8) (zero-padded — a zero neuron is exactly
  inert through relu in both passes), so every per-(step, chunk) access
  is a LEADING-dim dynamic index — the one fully unconstrained dynamic
  index in Mosaic (last-two-dims tiling untouched); the (8, 1) column
  broadcasts over the member lanes and the outer product (neuron ×
  member) is a single (8, 128) vreg op.
- gradients accumulate in the (S·C, 8, 1) packing across the SEQUENTIAL
  member-block grid (every program maps to the same output block;
  program 0 initializes), then unpack to the flax pytree in XLA.

Backward (relu': 1[s > 0], matching jax.grad's relu(0) → 0 convention):
with ``g = dL/du_{n+1}``, ``s_i = w1_i (u_n − b_i)``, ``a_i = relu(s_i)``:
  dL/dw2_i += Σ_m g·dt·a_i
  dL/dw1_i += Σ_m g·dt·w2_i·1[s_i>0]·(u_n − b_i)
  dL/db_i  −= Σ_m g·dt·w2_i·1[s_i>0]·w1_i
  dL/du_n   = g·(1 + dt·Σ_i w2_i·w1_i·1[s_i>0])
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_pallas_resblock_epoch_grad", "pack_params", "unpack_grads"]


def _pick_lanes(b: int, cap: int = 8192) -> int:
    """Member-block lane width: the largest 128-multiple <= cap dividing
    B. Wider blocks amortize the per-chunk loop and param-load overhead —
    measured on the v5e at S=10/F=500/B=8192: 128 lanes 11.1 ms/epoch,
    1024 → 1.44 ms, 8192 (one program) → 0.47 ms; the (8, L) working set
    stays a few hundred KB of VMEM even at the 8192 cap."""
    return next(d for d in range(cap, 127, -128) if b % d == 0)


def _chunk_count(features: int, unroll: int) -> int:
    """Neuron chunks C = ceil(F/8), rounded up to a multiple of the
    chunk-loop unroll factor. The padding chunks carry zero parameters —
    exactly inert through relu in both passes and exactly-zero in the
    gradient buffers (same contract as the partial-chunk zero padding)."""
    c = -(-features // 8)
    return -(-c // unroll) * unroll


def pack_params(params: Any, n_steps: int, features: int,
                unroll: int = 1) -> jnp.ndarray:
    """Flax ResBlockSimple stacked params → one (3, S·C, 8, 1) f32 array
    (order: bias, weights1, weights2), C = _chunk_count(F, unroll),
    zero-padded. Pure XLA reshapes — runs per epoch between adam updates
    at negligible cost.
    """
    c = _chunk_count(features, unroll)
    pad = c * 8 - features

    def one(x):  # (S, F) -> (S*C, 8, 1)
        x = jnp.pad(x, ((0, 0), (0, pad)))
        return x.reshape(n_steps * c, 8, 1)

    b = params["bias"].reshape(n_steps, features)
    w1 = params["weights1"].reshape(n_steps, features)
    w2 = params["weights2"].reshape(n_steps, features)
    return jnp.stack([one(b), one(w1), one(w2)])


def unpack_grads(packed: jnp.ndarray, n_steps: int, features: int,
                 unroll: int = 1) -> dict:
    """(3, S·C, 8, 1) gradient accumulators → the flax param-dict pytree
    (bias/weights1 as (S, F, 1), weights2 as (S, 1, F))."""
    c = _chunk_count(features, unroll)
    flat = packed.reshape(3, n_steps, c * 8)[:, :, :features]
    return {
        "bias": flat[0][:, :, None],
        "weights1": flat[1][:, :, None],
        "weights2": flat[2][:, None, :],
    }


def _epoch_kernel(n_steps, c, unroll, b_total, masked, mixed, *refs):
    """One member-block program: forward march (trajectory to scratch),
    loss contribution, reverse sweep accumulating packed grads.
    ``masked`` (static): a per-step active-neuron count rides as an extra
    SMEM operand and gates each neuron exactly like ResBlockSimpleMasked
    (inactive slots contribute nothing AND receive exactly-zero grads).
    ``mixed`` (static): the trajectory ("new") loss of Main_new_loss.py:
    145-168 — Σ_n dtₙ(e²ₙ+e²ₙ₊₁)/2 + ramp_w·e²_S. Targets are the FULL
    (S+1, 1, B) trajectory; the trapezoid term is accumulated per node
    during the reverse sweep (the trajectory is already in VMEM scratch),
    and each node injects its direct cotangent 2·cₙ·eₙ (node weight
    cₙ = (dtₙ₋₁+dtₙ)/2, edges halved) into the running dL/du before the
    next backward step — the hand-derived reverse of the trapezoid sum.
    The ramp weight rides as a traced SMEM scalar so the per-10-iteration
    ramp (mixed_ramp_weight) never retraces."""
    refs = list(refs)
    dt_ref = refs.pop(0)
    p_ref = refs.pop(0)
    u0_ref = refs.pop(0)
    if mixed:
        tt_ref = refs.pop(0)  # (S+1, 1, LANES) trajectory targets
        true_ref = None
    else:
        true_ref = refs.pop(0)
        tt_ref = None
    w_ref = refs.pop(0)
    na_ref = refs.pop(0) if masked else None
    wt_ref = refs.pop(0) if mixed else None
    loss_ref, gp_ref, traj = refs
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        loss_ref[:] = jnp.zeros_like(loss_ref)
        gp_ref[:] = jnp.zeros_like(gp_ref)

    u = u0_ref[:]  # (1, LANES)
    traj[0] = u
    # Mosaic's tpu.iota only produces integers — build int32, then cast
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(jnp.float32)

    def neuron_mask(n, cc):
        # active = global neuron index (within step n) < n_active[n]
        return (iota8 + 8.0 * cc.astype(jnp.float32)
                < na_ref[n]).astype(jnp.float32)

    def fwd_step(n, u):
        # (8, L) partial accumulator: ONE sublane reduction per step
        # instead of one per chunk. The chunk loop runs GROUPS of
        # ``unroll`` statically-offset chunks per fori iteration: Mosaic
        # keeps small-trip-count loop carries in vector registers but
        # spills the (8, L) carry to VMEM past ~24 iterations — measured
        # cliff 228 → 603 ns/chunk-iteration between C=24 and C=32 at
        # L=8192; grouping divides that spill cost by ``unroll``.
        def chunk(cc, acc8):
            for uu in range(unroll):
                col = n * c + cc * unroll + uu
                b_col = p_ref[0, col]  # (8, 1)
                w1_col = p_ref[1, col]
                w2_col = p_ref[2, col]
                if masked:
                    w2_col = w2_col * neuron_mask(n, cc * unroll + uu)
                s = w1_col * (u - b_col)  # (8, LANES) outer product
                acc8 = acc8 + w2_col * jnp.maximum(s, 0.0)
            return acc8

        acc8 = jax.lax.fori_loop(
            0, c // unroll, chunk, jnp.zeros((8, u.shape[1]), u.dtype)
        )
        u_next = u + dt_ref[n] * jnp.sum(acc8, axis=0, keepdims=True)
        traj[n + 1] = u_next
        return u_next

    u_fin = jax.lax.fori_loop(0, n_steps, fwd_step, u)

    w = w_ref[:]
    if mixed:
        # terminal node: trapezoid weight dt_{S-1}/2 plus the ramp weight
        c_term = dt_ref[n_steps - 1] * 0.5 + wt_ref[0]
        e = (u_fin - tt_ref[n_steps]) * w
        loss_ref[:] += c_term * e * e / b_total
        g = 2.0 * c_term * e / b_total
    else:
        e = (u_fin - true_ref[:]) * w
        loss_ref[:] += e * e / b_total  # (1, LANES) partial, summed in XLA
        g = 2.0 * e / b_total  # dL/du_N (weight is 0/1 so e carries it)

    def bwd_step(i, g):
        n = n_steps - 1 - i
        u_n = traj[n]
        dt_n = dt_ref[n]
        gdt = g * dt_n  # (1, LANES)

        def chunk(cc, du8):
            for uu in range(unroll):  # grouped like the forward loop
                col = n * c + cc * unroll + uu
                b_col = p_ref[0, col]
                w1_col = p_ref[1, col]
                w2_col = p_ref[2, col]
                nm = neuron_mask(n, cc * unroll + uu) if masked else None
                s = w1_col * (u_n - b_col)
                mask = (s > 0.0).astype(s.dtype)
                a = s * mask  # == relu(s)
                w2_eff = w2_col * nm if masked else w2_col
                ds = gdt * (w2_eff * mask)  # (8, LANES): dL/ds per member
                # w1/b are lane-constant per chunk, so the gw1/gb
                # reductions reuse Σds: gw1 = Σ(ds·u) − b·Σds,
                # gb = −w1·Σds; the neuron mask rides ds (and gates gw2
                # directly), so inactive slots get exactly zero in all
                # three
                s_ds = jnp.sum(ds, axis=1, keepdims=True)
                g_w2 = jnp.sum(gdt * a, axis=1, keepdims=True)
                gp_ref[2, col] += g_w2 * nm if masked else g_w2
                gp_ref[1, col] += (
                    jnp.sum(ds * u_n, axis=1, keepdims=True) - b_col * s_ds
                )
                gp_ref[0, col] += -w1_col * s_ds
                du8 = du8 + ds * w1_col
            return du8

        du8 = jax.lax.fori_loop(
            0, c // unroll, chunk, jnp.zeros((8, g.shape[1]), g.dtype)
        )
        g_n = g + jnp.sum(du8, axis=0, keepdims=True)
        if mixed:
            # direct trajectory-loss contribution at node n:
            # c_n = (dt_{n-1} + dt_n)/2, with dt_{-1} = 0 at the left edge
            c_n = 0.5 * (
                jnp.where(n > 0, dt_ref[jnp.maximum(n - 1, 0)], 0.0)
                + dt_ref[n]
            )
            e_n = (traj[n] - tt_ref[n]) * w
            loss_ref[:] += c_n * e_n * e_n / b_total
            # the node-0 inject lands on the returned (unused) g — u0 is
            # data, nothing upstream consumes it
            g_n = g_n + 2.0 * c_n * e_n / b_total
        return g_n

    jax.lax.fori_loop(0, n_steps, bwd_step, g)


def make_pallas_resblock_epoch_grad(
    n_steps: int,
    features: int,
    interpret: bool = False,
    max_lanes: int = 8192,
    masked: bool = False,
    mixed: bool = False,
    unroll: int | None = None,
):
    """Returns ``run(params, dt, u0s, trues, weights=None,
    n_active=None, ramp_weight=None) -> (loss, grads)`` — value_and_grad
    of the epoch loss for a per-step ResBlockSimple net, as ONE kernel
    launch.

    ``unroll``: chunk-loop group size (the chunk count pads up to a
    multiple of it with exactly-inert zero neurons). Default: 8 when the
    chunk count exceeds 24, else 1 — Mosaic keeps small-trip-count loop
    carries in vector registers but spills the (8, L) accumulator to
    VMEM past ~24 iterations (measured cliff: 228 → 603 ns per chunk
    iteration between C=24 and C=32 at L=8192, tools round-5
    attribution); grouping divides the spill cost by the group size.

    ``params``: the stacked flax pytree ({'bias': (S, F, 1), 'weights1':
    (S, F, 1), 'weights2': (S, 1, F)}). ``u0s``/``trues``: (B,) member
    ICs and terminal targets, B a multiple of 128 (pad with
    ``weights=0`` members otherwise). ``weights``: optional (B,) 0/1
    member mask; the loss is Σ w·e² / Σ w (mean over live members).
    ``masked=True`` is the ResBlockSimpleMasked (padded-width-capacity)
    net: ``features`` is the CAPACITY and ``n_active`` (S,) gates each
    step's neurons in-kernel — inactive slots contribute nothing and
    receive exactly-zero gradients, so width surgery
    (surgery.grow_width_padded) composes without retracing the kernel.
    ``mixed=True`` is the trajectory ("new") + ramped-terminal loss of
    Main_new_loss.py:145-168: ``trues`` becomes the FULL (S+1, B)
    trajectory targets and ``ramp_weight`` (traced scalar, from
    losses.mixed_ramp_weight) weights the terminal node on top of its
    trapezoid weight — semantics pinned to jax.grad of
    train/loop.make_mixed_loss_train_step's batch loss.
    Gradients match ``jax.grad`` of the XLA loss (relu'(0) = 0
    convention included) at f32 roundoff — tests/test_pallas_train.py.
    """
    if unroll is None:
        unroll = 8 if -(-features // 8) > 24 else 1
    c = _chunk_count(features, unroll)

    def run(params, dt, u0s, trues, weights=None, n_active=None,
            ramp_weight=None):
        (b,) = u0s.shape
        if b % 128:
            raise ValueError(f"B={b} must be a multiple of 128")
        lanes = _pick_lanes(b, max_lanes)
        n_blocks = b // lanes
        if weights is None:
            weights = jnp.ones((b,), jnp.float32)
            b_live = float(b)
            b_live_arr = None
        else:
            b_live_arr = jnp.sum(weights)
            b_live = 1.0  # divide by Σw after the kernel
        if masked and n_active is None:
            raise ValueError("masked=True requires n_active (S,)")
        if mixed and ramp_weight is None:
            raise ValueError("mixed=True requires ramp_weight (scalar)")
        packed = pack_params(params, n_steps, features, unroll)
        dt = jnp.asarray(dt, jnp.float32)
        kern = functools.partial(
            _epoch_kernel, n_steps, c, unroll,
            b_live if b_live_arr is None else 1.0, masked, mixed,
        )
        member_spec = pl.BlockSpec((1, lanes), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
        if mixed:
            if trues.shape != (n_steps + 1, b):
                raise ValueError(
                    f"mixed=True targets must be the full (S+1, B) "
                    f"trajectory, got {trues.shape}"
                )
            target_spec = pl.BlockSpec(
                (n_steps + 1, 1, lanes), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            )
            target = jnp.reshape(
                trues.astype(jnp.float32), (n_steps + 1, 1, b)
            )
        else:
            target_spec = member_spec
            target = jnp.reshape(trues.astype(jnp.float32), (1, b))
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, n_steps * c, 8, 1), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            member_spec,
            target_spec,
            member_spec,
        ]
        operands = [
            dt,
            packed,
            jnp.reshape(u0s.astype(jnp.float32), (1, b)),
            target,
            jnp.reshape(weights.astype(jnp.float32), (1, b)),
        ]
        if masked:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            operands.append(jnp.asarray(n_active, jnp.float32))
        if mixed:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            operands.append(
                jnp.reshape(jnp.asarray(ramp_weight, jnp.float32), (1,))
            )
        loss_rows, gp = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            out_shape=(
                jax.ShapeDtypeStruct((1, lanes), jnp.float32),
                jax.ShapeDtypeStruct((3, n_steps * c, 8, 1), jnp.float32),
            ),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, lanes), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, n_steps * c, 8, 1),
                             lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((n_steps + 1, 1, lanes), jnp.float32)
            ],
            interpret=interpret,
        )(*operands)
        loss = jnp.sum(loss_rows)
        grads = unpack_grads(gp, n_steps, features, unroll)
        if b_live_arr is not None:
            loss = loss / b_live_arr
            grads = jax.tree_util.tree_map(
                lambda x: x / b_live_arr, grads
            )
        return loss, grads

    return run
