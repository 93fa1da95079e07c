"""Fused Pallas kernel for the batched DG-in-time slab pipeline: the whole
ensemble fwd-Newton march + n+1 adjoint + per-element AWR in ONE kernel
launch.

The XLA path (``march/dg_batched.py``) runs ~10× off the VPU roofline: its
(Np, B) arrays tile as (8, 128) registers with only Np of 8 sublane rows
used (75% idle at Np=2), and each of the ~10³ tiny ops in the
scan-of-fori-of-einsum pipeline is a separate XLA op with dispatch and
layout glue. Here the ensemble axis B is reshaped to (8, B/8) — every row
is a FULL-height register tile — and each nodal row rides as one such
tile (the same tuple-of-rows trick as the advection kernels,
``dg_rhs._lsrk_step_b``). The Φ/quadrature/mass tables are tiny host
constants, so every contraction unrolls into scalar-immediate FMA chains;
the Np×Np Newton and adjoint systems are solved by unrolled Cramer
expansion (``march.dg_batched.solve_small``'s closed form, inlined) for
Np ≤ 4 and by branch-free partial-pivot Gaussian elimination
(``ge_solve_rows``) for Np 5–8 — both pure elementwise tile arithmetic.
Element slab widths ride in SMEM, elements are a rolled ``fori_loop``
(sequential by the inflow coupling), Newton is a fixed-count inner
``fori_loop``.

Reference parity: the weak form and sweep order of ``matlab/dg_march.m``
+ ``adj_march.m`` (in-element quadrature convention) — bit-compatible
with ``dg_march_batched``/``dg_adjoint_march_batched`` at f32 (tested).
The ODE right-hand side, its u-derivative, and the functional derivative
arrive as elementwise callables (like ``fd_ensemble.py``).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adjoint_ode_adaptivity_tpu.march.dg_batched import _det, ge_solve_rows
from adjoint_ode_adaptivity_tpu.march.dg_time import DGTimeOperators

__all__ = ["make_pallas_dg_estimate_ensemble", "pick_lane_block"]


def pick_lane_block(b8: int, block_members: int | None, interpret: bool) -> int:
    """Lane-block width for a member-blocked ensemble grid: the largest
    block <= block_members//8 lanes that divides ``b8``. Mosaic lane blocks
    must be 128-aligned (or the full array); interpret mode has no such
    constraint. Falls back to one program (blk = b8) when no aligned
    divisor exists. Shared by the uniform and mixed-order slab factories."""
    if block_members is None:
        return b8
    if block_members < 8 or block_members % 8:
        raise ValueError(
            f"block_members={block_members} must be a positive multiple of 8"
        )
    cap = min(b8, block_members // 8)
    if interpret:
        blk = cap
        while b8 % blk:
            blk -= 1
        return blk
    blk = (cap // 128) * 128
    while blk >= 128 and b8 % blk:
        blk -= 128
    return blk if blk >= 128 else b8


def _cramer(jac, res):
    """Solve the Np×Np system given as nested lists of (8, b8) tiles.

    Np ≤ 4: unrolled Cramer cofactor expansion (cheapest at these sizes).
    Np > 4: branch-free partial-pivot Gaussian elimination
    (``march.dg_batched.ge_solve_rows`` — pure elementwise tile ops, so it
    inlines into the kernel the same way; Cramer's O(n!·n) chain is
    already ~23k multiplies at n=6)."""
    n = len(res)
    if n > 4:
        return ge_solve_rows(jac, res)
    d = _det(jac)
    out = []
    for i in range(n):
        rows_i = [
            [res[r] if c == i else jac[r][c] for c in range(n)]
            for r in range(n)
        ]
        out.append(_det(rows_i) / d)
    return out


def _kernel(ops_p, ops_a, f, f_u, g_u, k_el, newton_iters, times_ref, y0_ref,
            u_out, v_out, err_out):
    np_p = ops_p.np_
    np_a = ops_a.np_
    phi_p = np.asarray(ops_p.phi, np.float64)
    wq_p = np.asarray(ops_p.wq, np.float64)
    rq_p = np.asarray(ops_p.rq, np.float64)
    s_p = np.asarray(ops_p.stiff, np.float64)
    a_p = s_p.T.copy()
    a_p[-1, -1] -= 1.0
    nq_p = phi_p.shape[0]
    phi_a = np.asarray(ops_a.phi, np.float64)
    wq_a = np.asarray(ops_a.wq, np.float64)
    rq_a = np.asarray(ops_a.rq, np.float64)
    s_a = np.asarray(ops_a.stiff, np.float64)
    m_a = np.asarray(ops_a.mass, np.float64)
    base_a = -s_a.T.copy()
    base_a[0, 0] -= 1.0
    nq_a = phi_a.shape[0]
    from adjoint_ode_adaptivity_tpu.ops.jacobi import jacobi_gl
    from adjoint_ode_adaptivity_tpu.ops.operators import interp_matrix_1d

    r_p = jacobi_gl(0.0, 0.0, np_p - 1)
    to_nodes = np.asarray(interp_matrix_1d(np_p - 1, r_p, np.asarray(ops_a.r)))
    to_quad = np.asarray(interp_matrix_1d(np_p - 1, r_p, np.asarray(ops_a.rq)))
    r_a = np.asarray(ops_a.r, np.float64)

    # ---------------- forward element march (dg_march.m:26-78)
    def fwd_element(ke, u_prev):
        tl = times_ref[ke]
        h = times_ref[ke + 1] - tl
        rows = tuple(u_prev for _ in range(np_p))

        def newton_body(_, rows):
            u_q = [
                sum(float(phi_p[q, i]) * rows[i] for i in range(np_p))
                for q in range(nq_p)
            ]
            t_q = [tl + float((1.0 + rq_p[q]) / 2.0) * h for q in range(nq_p)]
            # f/f_u of the SAME quadrature point emitted adjacently: the
            # VPU runs co-issued sin+cos pairs ~1.7-3x faster than the
            # separated all-sins-then-all-cos order (tools/microroof.py
            # `sincos` row; values bit-identical, only emission order)
            fdq = [(f(u_q[q], t_q[q]), f_u(u_q[q], t_q[q]))
                   for q in range(nq_p)]
            fq = [p[0] for p in fdq]
            dfq = [p[1] for p in fdq]
            res = []
            for i in range(np_p):
                acc = sum(float(a_p[i, j]) * rows[j] for j in range(np_p))
                acc = acc + (h / 2.0) * sum(
                    float(phi_p[q, i] * wq_p[q]) * fq[q] for q in range(nq_p)
                )
                if i == 0:
                    acc = acc + u_prev
                res.append(acc)
            jac = [
                [
                    float(a_p[i, j])
                    + (h / 2.0)
                    * sum(
                        float(phi_p[q, i] * wq_p[q] * phi_p[q, j]) * dfq[q]
                        for q in range(nq_p)
                    )
                    for j in range(np_p)
                ]
                for i in range(np_p)
            ]
            delta = _cramer(jac, res)
            return tuple(rows[i] - delta[i] for i in range(np_p))

        rows = lax.fori_loop(0, newton_iters, newton_body, rows)
        for i in range(np_p):
            u_out[ke, i] = rows[i]
        return rows[-1]

    y0 = y0_ref[:]
    lax.fori_loop(0, k_el, fwd_element, y0)

    # ---------------- backward adjoint sweep + AWR (adj_march.m:65-120)
    def adj_element(j, v_in):
        ke = k_el - 1 - j
        tl = times_ref[ke]
        h = times_ref[ke + 1] - tl
        u_el = [u_out[ke, i] for i in range(np_p)]
        u_q = [
            sum(float(to_quad[q, i]) * u_el[i] for i in range(np_p))
            for q in range(nq_a)
        ]
        t_q = [tl + float((1.0 + rq_a[q]) / 2.0) * h for q in range(nq_a)]
        # same pair-adjacent emission as the Newton body
        fdq = [(f(u_q[q], t_q[q]), f_u(u_q[q], t_q[q]))
               for q in range(nq_a)]
        fq = [p[0] for p in fdq]
        dfq = [p[1] for p in fdq]
        u_h = [
            sum(float(to_nodes[i, jj]) * u_el[jj] for jj in range(np_p))
            for i in range(np_a)
        ]
        t_n = [tl + float((1.0 + r_a[i]) / 2.0) * h for i in range(np_a)]
        a_mat = [
            [
                float(base_a[i, jj])
                + (h / 2.0)
                * sum(
                    float(phi_a[q, i] * wq_a[q] * phi_a[q, jj]) * dfq[q]
                    for q in range(nq_a)
                )
                for jj in range(np_a)
            ]
            for i in range(np_a)
        ]
        rhs = []
        for i in range(np_a):
            acc = (-h / 2.0) * sum(
                float(m_a[i, jj]) * g_u(u_h[jj], t_n[jj]) for jj in range(np_a)
            )
            if i == np_a - 1:
                acc = acc - v_in
            rhs.append(acc)
        v = _cramer(a_mat, rhs)
        # primal residual at the adjoint's order
        u_prev_el = jnp.where(ke == 0, y0, u_out[jnp.maximum(ke - 1, 0), np_p - 1])
        err = None
        for i in range(np_a):
            acc = sum(float(s_a.T[i, jj]) * u_h[jj] for jj in range(np_a))
            acc = acc + (h / 2.0) * sum(
                float(phi_a[q, i] * wq_a[q]) * fq[q] for q in range(nq_a)
            )
            if i == np_a - 1:
                acc = acc - u_h[np_a - 1]
            if i == 0:
                acc = acc + u_prev_el
            term = v[i] * acc
            err = term if err is None else err + term
        for i in range(np_a):
            v_out[ke, i] = v[i]
        err_out[ke] = err
        return v[0]

    zero = jnp.zeros_like(y0)
    lax.fori_loop(0, k_el, adj_element, zero)


def make_pallas_dg_estimate_ensemble(
    ops_p: DGTimeOperators,
    ops_a: DGTimeOperators,
    f: Callable,
    f_u: Callable | None = None,
    n_elements: int = 16,
    *,
    g_u: Callable = lambda u, t: jnp.ones_like(u),
    newton_iters: int = 5,
    interpret: bool = False,
    block_members: int | None = 16_384,
):
    """Build ``run(times, y0s) -> (u, v, err)`` — the complete batched
    DG-in-time estimate pipeline fused into one kernel launch
    (measured 7.5× the XLA `dg_estimate_batched` path on the v5e:
    0.38 vs 2.9 ms at B=16,384 × K=16).

    ``block_members``: members per grid program (independent members →
    an embarrassingly-parallel lane-blocked grid); the default keeps each
    program's state+outputs a few MB of VMEM so B scales to the
    reference's 100,000-IC ensembles (Main_variable_params.py:234) and
    beyond in one launch. ``None`` = single program. On hardware the
    lane-block size is rounded to the largest 128-multiple ≤ the cap
    that divides B/8 (Mosaic requires 128-aligned lane blocks), falling
    back to a single program when none exists; interpret mode accepts
    any divisor.

    ``times``: (K+1,) shared partition (traced; rides in SMEM so the
    adaptive loop can change it without recompiling) or (B, K+1)
    PER-MEMBER partitions — each member's slab geometry rides as (8, B/8)
    width/left-edge register tiles (the kernel body is identical: every
    use of ``tl``/``h`` is elementwise, so scalar-vs-tile is just the
    operand layout; dynamic element indexing of the (K+1, 8, blk) operand
    keeps 8-sublane alignment). Per-member times is what lets the
    per-member adaptive loop (``adapt.dg_loop.run_adaptive_dg_per_member``
    — the reference's one-job-per-IC farm semantics) run fused.
    ``y0s``: (B,) with B a multiple of 8 — the ensemble tiles the full
    (8, B/8) register height. Returns the `dg_estimate_batched` contract:
    ``u`` (B, K, Np), ``v`` (B, K, Np+1), ``err`` (B, K). ``f``/``f_u``/
    ``g_u`` are elementwise jnp callables; ``f_u=None`` derives ∂f/∂u by a
    forward-mode jvp with a ones tangent (valid because f is elementwise).
    """
    if f_u is None:
        def f_u(u, t):  # noqa: F811 - deliberate default
            return jax.jvp(lambda uu: f(uu, t), (u,), (jnp.ones_like(u),))[1]
    if ops_a.np_ != ops_p.np_ + 1:
        raise ValueError("ops_a must be one order above ops_p")
    np_p, np_a = ops_p.np_, ops_a.np_
    if np_p > 8 or np_a > 8:
        raise ValueError(
            "in-kernel solves support Np <= 8 (Cramer <= 4, pivoted GE 5-8)"
        )
    k_el = n_elements

    kern = functools.partial(
        _kernel, ops_p, ops_a, f, f_u, g_u, k_el, newton_iters
    )

    def run(times, y0s):
        b = y0s.shape[0]
        if b % 8:
            raise ValueError(f"B={b} must be a multiple of 8")
        b8 = b // 8
        # members are independent: grid over ensemble blocks keeps the
        # per-program working set (state + outputs) VMEM-resident at ANY
        # B — the reference's 100k-IC scale runs in one launch
        blk = pick_lane_block(b8, block_members, interpret)
        n_blocks = b8 // blk
        y0_t = jnp.asarray(y0s, jnp.float32).reshape(8, b8)
        times = jnp.asarray(times, jnp.float32)
        if times.ndim == 2:
            if times.shape != (b, k_el + 1):
                raise ValueError(
                    f"per-member times {times.shape} != (B={b}, K+1={k_el + 1})"
                )
            # (B, K+1) -> (K+1, 8, b8): same member->(sublane, lane) map
            # as y0; each program gets its lane block of the geometry
            times_op = times.T.reshape(k_el + 1, 8, b8)
            times_spec = pl.BlockSpec(
                (k_el + 1, 8, blk), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            )
        else:
            times_op = times
            times_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        u, v, err = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            out_shape=(
                jax.ShapeDtypeStruct((k_el, np_p, 8, b8), jnp.float32),
                jax.ShapeDtypeStruct((k_el, np_a, 8, b8), jnp.float32),
                jax.ShapeDtypeStruct((k_el, 8, b8), jnp.float32),
            ),
            in_specs=[
                times_spec,
                pl.BlockSpec((8, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((k_el, np_p, 8, blk), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_el, np_a, 8, blk), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_el, 8, blk), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(times_op, y0_t)
        # (K, Np, 8, b8) -> (B, K, Np)
        u = jnp.transpose(u.reshape(k_el, np_p, b), (2, 0, 1))
        v = jnp.transpose(v.reshape(k_el, np_a, b), (2, 0, 1))
        err = jnp.transpose(err.reshape(k_el, b), (1, 0))
        return u, v, err

    return run
