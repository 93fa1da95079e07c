"""Fused training-epoch kernel for the SHARED-params Dense-chain net.

The reference's LARGEST training config is the shared-net strand:
``Main_FD_with_net.py:52-57`` trains ``ResNetBlock([100, 500])`` (a
Dense→relu→Dense→relu→Dense residual Euler step, models/blocks.py
ResNetBlock) for 10,000 epochs × 99 batches inside a 5–12 h RTX SLURM
job. The XLA step (`train/loop.make_shared_train_step`) is HBM-bound:
value_and_grad materializes every step's (B, H1) and (B, H2) activation
sheets through HBM (measured 17.9 TFLOP/s of matmul ≈ 9% of the MXU —
~700 GB/s of activation traffic at S=100 sits at the bandwidth
roofline). This kernel runs the whole epoch in ONE launch with every
activation VMEM-resident: only the (S+1, Bc) scalar state trajectory is
stored (a few hundred KB); the backward sweep recomputes the layer
activations from it (4/3 of the XLA FLOPs for ~zero HBM traffic), and
the hidden-layer matmuls ride the MXU via ``lax.dot_general``.

Layout (Mosaic-friendly by construction):
- members on SUBLANES: each grid program owns a (Bc, 1) member column;
  activations are (Bc, H_l) tiles with hidden widths padded to 128
  lanes. Padded columns carry zero weights AND zero biases, so
  relu(0) = 0 keeps them exactly inert in both passes (and relu'(0) = 0
  gives them exactly-zero gradients — jax's convention).
- the first/last layers have scalar width: z1 = u·w1 + b1 is a
  broadcast outer product and f = Σ a_L·w_out a lane reduction — VPU
  work; the hidden chain (Bc, H_l) @ (H_l, H_{l+1}) and both of its
  transposed backward products are MXU ``dot_general`` calls
  (contraction over members for dW, over lanes for da).
- gradients accumulate in loop-carried register/VMEM tiles across the
  S steps, then += into the shared output block across the sequential
  member-block grid (program 0 initializes) — same contract as
  ``train_fused.py``.

Backward (relu' = 1[z > 0]):
  df      = dt_n · g                     (g = dL/du_{n+1})
  dW_out += a_Lᵀ df,  db_out += Σ df
  da_L    = df ⊗ w_outᵀ
  dz_l    = da_l · 1[z_l > 0]
  dW_l   += a_{l−1}ᵀ dz_l,  db_l += Σ dz_l
  da_{l−1}= dz_l W_lᵀ
  dL/du_n = g + Σ_i dz1_i · w1_i

Reference parity: python/models.py:88-103 (the list-sized module there
passes the whole list to ONE flax Dense and does not construct; the
hidden-layer CHAIN is the working interpretation — see
tests/test_models_train.py::test_resnet_block_dense_chain_parity),
python/Main_FD_with_net.py:92-103 (trainStep semantics).
"""
from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "make_pallas_dense_epoch_grad",
    "pack_dense_params",
    "unpack_dense_grads",
]


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def pack_dense_params(params: Any, sizes: Sequence[int]):
    """Flax ResNetBlock({sizes}) param dict → a list of lane-padded f32
    operands: [w1 (1, P1), b1 (1, P1), W_l (P_{l-1}, P_l), b_l (1, P_l)
    ..., w_out (1, P_L), b_out (1, 1)] with P_l = pad128(H_l). Padded
    rows/columns are exactly zero (inert through relu in both passes)."""
    l = len(sizes)
    out = []
    for i in range(l + 1):
        k = jnp.asarray(params[f"Dense_{i}"]["kernel"], jnp.float32)
        b = jnp.asarray(params[f"Dense_{i}"]["bias"], jnp.float32)
        if i == 0:
            p = _pad128(sizes[0])
            out.append(jnp.pad(k, ((0, 0), (0, p - sizes[0]))))
            out.append(jnp.pad(b, (0, p - sizes[0]))[None])
        elif i < l:
            pi, po = _pad128(sizes[i - 1]), _pad128(sizes[i])
            out.append(jnp.pad(
                k, ((0, pi - sizes[i - 1]), (0, po - sizes[i]))
            ))
            out.append(jnp.pad(b, (0, po - sizes[i]))[None])
        else:
            p = _pad128(sizes[-1])
            # (H_L, 1) output kernel rides transposed as a (1, P_L) row
            out.append(jnp.pad(k[:, 0], (0, p - sizes[-1]))[None])
            out.append(b[None])  # (1, 1)
    return out


def unpack_dense_grads(flat: Sequence[jnp.ndarray], sizes: Sequence[int]):
    """Inverse of :func:`pack_dense_params` for the gradient buffers
    (dW1 and dW_out arrive as (1, P) rows)."""
    l = len(sizes)
    out = {}
    for i in range(l + 1):
        gk, gb = flat[2 * i], flat[2 * i + 1]
        if i == 0:
            out[f"Dense_{i}"] = {
                "kernel": gk[:, : sizes[0]],
                "bias": gb[0, : sizes[0]],
            }
        elif i < l:
            out[f"Dense_{i}"] = {
                "kernel": gk[: sizes[i - 1], : sizes[i]],
                "bias": gb[0, : sizes[i]],
            }
        else:
            out[f"Dense_{i}"] = {
                "kernel": gk[0, : sizes[-1]][:, None],
                "bias": gb[0],
            }
    return out


def _dot(a, b, contract, mxu_dtype=jnp.float32):
    """2D MXU contraction with f32 accumulate: contract = (lhs_dim,
    rhs_dim). ``mxu_dtype=bfloat16`` feeds the MXU its native input
    format (one systolic pass instead of the f32 multi-pass) — the
    opt-in fast mode; accumulation stays f32 either way."""
    return lax.dot_general(
        a.astype(mxu_dtype), b.astype(mxu_dtype),
        (((contract[0],), (contract[1],)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _epoch_kernel(n_steps, n_layers, mxu_dtype, b_total, *refs):
    """One member-block program: S-step forward march (scalar trajectory
    to VMEM scratch), terminal MSE, backward sweep with per-step
    activation recompute, grads accumulated in loop carries."""
    dt_ref = refs[0]
    p_refs = refs[1 : 1 + 2 * (n_layers + 1)]
    u0_ref, true_ref = refs[1 + 2 * (n_layers + 1) : 3 + 2 * (n_layers + 1)]
    louts = refs[3 + 2 * (n_layers + 1) :]  # loss, 2(L+1) grads, scratch
    loss_ref, g_refs, traj = louts[0], louts[1:-1], louts[-1]
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        for r in g_refs:
            r[:] = jnp.zeros_like(r)

    # The scalar state trajectory packs 128 STEPS PER LANE: a naive
    # (S+1, Bc, 1) scratch would pad its lane dim 1 → 128 and cost 128×
    # the memory (53 MB at S=100/Bc=1024 — over the scoped-VMEM limit).
    # Step n lives at traj[n // 128][:, n % 128]; writes are one-hot
    # multiply-adds, reads one-hot lane reductions — both trivial next
    # to the layer matmuls.
    lane_iota = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for c in range(traj.shape[0]):
        traj[c] = jnp.zeros_like(traj[c])

    def traj_write(n, u):
        oh = (lane_iota == n % 128).astype(u.dtype)
        traj[n // 128] += u * oh

    def traj_read(n):
        oh = (lane_iota == n % 128).astype(jnp.float32)
        return jnp.sum(traj[n // 128] * oh, axis=1, keepdims=True)

    w = [p_refs[2 * i][:] for i in range(n_layers + 1)]
    b = [p_refs[2 * i + 1][:] for i in range(n_layers + 1)]
    # hidden-chain weights pre-cast once for the MXU (no-op in f32 mode)
    wmx = [w[i].astype(mxu_dtype) for i in range(n_layers + 1)]

    def mlp(u):
        """u (Bc, 1) → (f (Bc, 1), activations a_1..a_L)."""
        acts = []
        a = jnp.maximum(u * w[0] + b[0], 0.0)  # (Bc, P1) outer product
        acts.append(a)
        for i in range(1, n_layers):
            a = jnp.maximum(
                _dot(a, wmx[i], (1, 0), mxu_dtype) + b[i], 0.0
            )
            acts.append(a)
        f = jnp.sum(a * w[n_layers], axis=1, keepdims=True) + b[n_layers]
        return f, acts

    u = u0_ref[:]  # (Bc, 1)
    traj_write(0, u)

    def fwd_step(n, u):
        f, _ = mlp(u)
        u_next = u + dt_ref[n] * f
        traj_write(n + 1, u_next)
        return u_next

    u_fin = lax.fori_loop(0, n_steps, fwd_step, u)

    e = u_fin - true_ref[:]
    # plain assignment: each grid program owns its own (Bc, 1) loss
    # block (col_spec maps block i to program i), unlike the SHARED
    # grad blocks above which need the program-0 init + accumulate
    loss_ref[:] = e * e / b_total  # (Bc, 1) partials, summed in XLA
    g0 = 2.0 * e / b_total

    gz = [jnp.zeros_like(x[:]) for x in g_refs]

    def bwd_step(i, carry):
        g, acc = carry
        n = n_steps - 1 - i
        u_n = traj_read(n)
        _, acts = mlp(u_n)  # recompute the activation chain
        df = dt_ref[n] * g  # (Bc, 1)
        acc = list(acc)
        # output layer: dW_out (1, P_L) row, db_out (1, 1)
        a_l = acts[-1]
        acc[2 * n_layers] += jnp.sum(a_l * df, axis=0, keepdims=True)
        acc[2 * n_layers + 1] += jnp.sum(df, axis=0, keepdims=True)
        da = df * w[n_layers]  # (Bc, P_L) broadcast outer product
        for l in range(n_layers - 1, 0, -1):
            dz = da * (acts[l] > 0.0)  # relu mask == 1[z > 0]
            acc[2 * l] += _dot(acts[l - 1], dz, (0, 0), mxu_dtype)
            acc[2 * l + 1] += jnp.sum(dz, axis=0, keepdims=True)
            da = _dot(dz, wmx[l], (1, 1), mxu_dtype)  # dz W_lᵀ
        dz1 = da * (acts[0] > 0.0)
        acc[0] += jnp.sum(u_n * dz1, axis=0, keepdims=True)
        acc[1] += jnp.sum(dz1, axis=0, keepdims=True)
        g = g + jnp.sum(dz1 * w[0], axis=1, keepdims=True)
        return g, tuple(acc)

    _, gz = lax.fori_loop(0, n_steps, bwd_step, (g0, tuple(gz)))
    for r, v in zip(g_refs, gz):
        r[:] += v


def make_pallas_dense_epoch_grad(
    n_steps: int,
    sizes: Sequence[int],
    interpret: bool = False,
    block_members: int = 8192,
    mxu_dtype=jnp.float32,
):
    """Returns ``run(params, dt, u0s, trues) -> (loss, grads)`` —
    value_and_grad of the terminal-MSE epoch loss for a SHARED-params
    ResNetBlock({sizes}) net over B member ICs, as ONE kernel launch.

    ``block_members``: members per grid program. TALLER IS FASTER — the
    matmul tiles gain MXU efficiency and the sequential grid shrinks;
    measured ladder at the bench config ((100,500), S=100, B=8192):
    2048 → 81.7, 4096 → 85.1, 8192 (one program) → 95.4 TF/s (+17%,
    round 5). The 8192 default sits just under the 48 MB scoped-VMEM
    limit for S ≤ ~250 at these widths ((Bc, 512) activation/dz tiles
    dominate); Mosaic raises a clear capacity error if a bigger S or
    width overflows — pass a smaller ``block_members`` then.

    ``params``: the flax param dict ({'Dense_i': {'kernel', 'bias'}}).
    ``dt``: (S,) step sizes (zero-dt steps are exact identities with
    exactly-zero gradient contributions). ``u0s``/``trues``: (B,) with
    B a multiple of 8 (and of ``block_members`` if larger). Gradients
    match ``jax.grad`` of the XLA loss (relu'(0) = 0 convention
    included) at matmul precision — tests/test_pallas_train.py.

    ``mxu_dtype=jnp.bfloat16`` is the opt-in MIXED-PRECISION mode: the
    hidden-chain matmul INPUTS are cast to bf16; accumulation,
    parameters, the scalar state march, elementwise ops, and the
    gradient buffers all stay f32 (the standard bf16-matmul /
    f32-master-weights recipe). MEASURED RESULT on the v5e (documented
    negative, like ops/pallas/dg_mxu.py): at the bench config
    (100,500)/B=8192 it is a wash at S=100 (255.7 vs 257.8 epochs/s)
    and +11% at S=10 (2732 vs 2459) — Mosaic's default-precision f32
    ``dot_general`` already feeds the MXU bf16-rounded operands on this
    chip (tools/microroof.py measures ~190 TF/s for "f32" matmul ≈ the
    197 bf16 spec), so the explicit cast only halves operand VMEM
    traffic. The knob matters on hardware where f32 default is a
    multi-pass; numerics contract either way: grads match XLA at bf16
    matmul tolerance (~1e-2 relative) instead of the f32-mode interpret
    tolerance (tests/test_pallas_train.py::test_bf16_mxu_mode...)."""
    sizes = tuple(int(s) for s in sizes)
    n_layers = len(sizes)
    if n_layers < 1:
        raise ValueError("need at least one hidden width")
    pads = [_pad128(s) for s in sizes]

    kern = functools.partial(_epoch_kernel, n_steps, n_layers, mxu_dtype)

    def run(params, dt, u0s, trues):
        (bm,) = u0s.shape
        bc = min(block_members, bm)
        if bm % bc or bc % 8:
            raise ValueError(
                f"B={bm} must be a multiple of 8 and of the "
                f"member block ({bc})"
            )
        n_blocks = bm // bc
        packed = pack_dense_params(params, sizes)
        dt = jnp.asarray(dt, jnp.float32)

        col = lambda x: jnp.reshape(x.astype(jnp.float32), (bm, 1))  # noqa: E731
        col_spec = pl.BlockSpec((bc, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        full = lambda a: pl.BlockSpec(  # noqa: E731
            a.shape, lambda i: tuple(0 for _ in a.shape),
            memory_space=pltpu.VMEM,
        )
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [full(p) for p in packed]
            + [col_spec, col_spec]
        )
        grad_shapes = []
        for i in range(n_layers + 1):
            if i == 0:
                grad_shapes += [(1, pads[0]), (1, pads[0])]
            elif i < n_layers:
                grad_shapes += [(pads[i - 1], pads[i]), (1, pads[i])]
            else:
                grad_shapes += [(1, pads[-1]), (1, 1)]
        outs = pl.pallas_call(
            functools.partial(kern, float(bm)),
            grid=(n_blocks,),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((bm, 1), jnp.float32)]
                + [jax.ShapeDtypeStruct(s, jnp.float32)
                   for s in grad_shapes]
            ),
            in_specs=in_specs,
            out_specs=tuple(
                [col_spec]
                + [pl.BlockSpec(s, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
                   for s in grad_shapes]
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (-(-(n_steps + 1) // 128), bc, 128), jnp.float32
                )
            ],
            interpret=interpret,
        )(dt, *packed, col(u0s), col(trues))
        loss = jnp.sum(outs[0])
        grads = unpack_dense_grads(outs[1:], sizes)
        return loss, grads

    return run
