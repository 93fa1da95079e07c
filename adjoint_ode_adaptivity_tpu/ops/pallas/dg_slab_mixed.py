"""Fused Pallas kernel for the PER-MEMBER MIXED-ORDER (hp) DG-in-time
estimate: coarse march at per-member orders ``ns``, fine march at
``ns + fine_offset``, backward adjoint at ``ns + 1`` and the per-element
adjoint-weighted residual — the whole per-member hp pipeline
(:func:`adjoint_ode_adaptivity_tpu.adapt.hp_loop.run_adaptive_dg_hp_per_member`'s
member solver) in ONE kernel launch.

Reference parity: ``matlab/dg_march.m:1`` takes a per-element order VECTOR
``Ns`` and ``adj_march``/``MAIN.m:34`` solve the adjoint at ``Ns+1``; the
mixed-order XLA solvers (``march/dg_mixed.py``, ``adjoint/dg_mixed.py``)
realize that latent capability, and this kernel is their fused ensemble
engine (the hp analogue of ``ops/pallas/dg_slab.py``).

TPU-first design:

- Members ride the register tiles: B = 8·b8 members map to (8, b8)
  sublane×lane tiles; every nodal row is one full-height tile
  (tuple-of-rows, as in ``dg_slab.py``/``dg_rhs.py``).
- Per-member ORDERS are data: ``ns`` arrives as f32 (K, 8, blk) tiles
  (orders ≤ 8 are exact in f32; Mosaic compare/select beats int tiles).
  Each element builds order masks ``m_n = (ns_k == n)`` once and BLENDS
  the padded per-order operator tables (``march.dg_mixed
  .MixedDGTimeOperators`` — host constants, entering as scalar
  immediates): ``T_eff = Σ_n m_n · T_n``.  The blended tables are
  per-member TILES; every downstream contraction is the same unrolled
  FMA chain as the uniform kernel, with tile operands instead of scalar
  immediates.  One compiled kernel serves EVERY order assignment — a
  p-refinement changes only the ``ns`` operand.
- The padded-system contract of the mixed XLA solvers carries over
  unchanged: blended system matrices keep identity rows on each member's
  padding block (``pad_eye``), so the branch-free partial-pivot
  elimination (``march.dg_batched.ge_solve_rows``) solves all members'
  different-order systems in the same unrolled tile arithmetic (a padded
  pivot is exactly 1 and its column is zero below — never selected for a
  live row).
- Three sequential element loops (coarse fwd, fine fwd, backward
  adjoint+AWR), Newton as a fixed-count inner ``fori_loop`` — the
  branch-free ensemble fast path (``dg_march_mixed(newton_iters=...)``).

Outputs are the padded (B, K, np_max) nodal arrays of the XLA path; the
tiny per-element functionals (J_c, J_f) are cheaper in XLA outside the
kernel (``dg_element_functional_mixed`` vmapped over members).
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

from adjoint_ode_adaptivity_tpu.adjoint.dg_mixed import MixedAdjointInterp
from adjoint_ode_adaptivity_tpu.march.dg_batched import ge_solve_rows
from adjoint_ode_adaptivity_tpu.march.dg_mixed import MixedDGTimeOperators
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab import pick_lane_block

__all__ = ["make_pallas_dg_estimate_hp_per_member"]


def _blend(masks, table, rows, cols, lo):
    """Blend a stacked per-order constant table into per-member tiles:
    ``out[i][j] = Σ_n masks[n] · table[lo + n, i, j]`` with zero terms
    dropped at trace time (padded table entries are exactly 0.0)."""
    out = []
    for i in range(rows):
        row = []
        for j in range(cols):
            acc = None
            for n, m_n in enumerate(masks):
                c = float(table[lo + n, i, j])
                if c == 0.0:
                    continue
                term = m_n * c
                acc = term if acc is None else acc + term
            row.append(acc)
        out.append(row)
    return out


def _blend_vec(masks, table, rows, lo):
    """Vector variant: ``out[i] = Σ_n masks[n] · table[lo + n, i]``."""
    out = []
    for i in range(rows):
        acc = None
        for n, m_n in enumerate(masks):
            c = float(table[lo + n, i])
            if c == 0.0:
                continue
            term = m_n * c
            acc = term if acc is None else acc + term
        out.append(acc)
    return out


def _mixed_kernel(mops, interp, rad, adjoint_mode, f, f_u, g_u, k_el,
                  fine_offset, n_max_user, newton_iters,
                  times_ref, ns_ref, y0_ref,
                  uc_out, uf_out, v_out, err_out, uend_ref):
    np_m = mops.np_max
    n_stack = mops.n_max
    q = mops.rq.shape[0]
    rq = np.asarray(mops.rq, np.float64)
    wq = np.asarray(mops.wq, np.float64)
    phi = np.asarray(mops.phi_pad, np.float64)  # (L, Q, np_m)
    mass = np.asarray(mops.mass_pad, np.float64)
    # A_n = S_nᵀ − e_n e_nᵀ + pad_eye_n  (march/dg_mixed.py residual)
    a_fwd = np.asarray(mops.stiff_pad, np.float64).transpose(0, 2, 1).copy()
    for n in range(n_stack):
        a_fwd[n, n + 1, n + 1] -= 1.0
        a_fwd[n] += np.asarray(mops.pad_eye[n], np.float64)
    s_t = np.asarray(mops.stiff_pad, np.float64).transpose(0, 2, 1).copy()
    # adjoint system base: −S_aᵀ − e_l + pad_eye_a (the m_w term is traced)
    a_adj = -s_t.copy()
    for n in range(n_stack):
        a_adj[n] += np.asarray(mops.pad_eye[n], np.float64)
        a_adj[n, 0, 0] -= 1.0
    to_nodes = np.asarray(interp.to_nodes, np.float64)  # (L−1, np_m, np_m)
    to_quad = np.asarray(interp.to_quad, np.float64)  # (L−1, Q, np_m)
    r_pad = np.asarray(mops.r_pad, np.float64)
    # Radau-reconstruction tables (adjoint_mode="reconstruct" only):
    # indexed by the PRIMAL order − 1, like to_nodes/to_quad
    eval_rad = None if rad is None else np.asarray(rad.eval_rad, np.float64)
    to_hi = None if rad is None else np.asarray(rad.to_hi, np.float64)

    zeros_like = lambda t: t - t  # noqa: E731 - cheap tile zero

    def order_masks(ns_k, lo_order, n_orders):
        """masks[j] = (ns_k + shift == lo_order + j) as f32 tiles, where
        ns_k holds the PRIMAL order; callers pass lo_order in primal
        units (the table offset handles the +1/+fo shifts)."""
        return [
            (ns_k == float(lo_order + j)).astype(ns_k.dtype)
            for j in range(n_orders)
        ]

    def live_masks(ns_k, offset):
        """live[i] = (i <= ns_k + offset) — the per-member live-node mask."""
        return [
            (ns_k + float(offset) >= float(i)).astype(ns_k.dtype)
            for i in range(np_m)
        ]

    def fwd_sweep(order_offset, out_ref):
        """Coarse (offset 0) / fine (offset fine_offset) Newton march.
        Returns nothing; writes nodal rows and (coarse only) the
        right-endpoint values used by the adjoint inflow chain."""
        lo = order_offset  # table index of primal order 1 + offset

        def element(ke, u_prev):
            tl = times_ref[ke]
            h = times_ref[ke + 1] - tl
            ns_k = ns_ref[ke]
            mm = order_masks(ns_k, 1, n_max_user)
            live = live_masks(ns_k, order_offset)
            a_eff = _blend(mm, a_fwd, np_m, np_m, lo)
            phi_eff = _blend(mm, phi, q, np_m, lo)
            # hoisted once per element: Φᵀ·w tiles reused by the residual
            # and every Jacobian row of every Newton iteration
            phiw = [
                [
                    None if phi_eff[qq][i] is None
                    else phi_eff[qq][i] * float(wq[qq])
                    for i in range(np_m)
                ]
                for qq in range(q)
            ]
            rows0 = tuple(u_prev * live[i] for i in range(np_m))

            def newton_body(_, rows):
                u_qs = [
                    sum(
                        phi_eff[qq][i] * rows[i]
                        for i in range(np_m)
                        if phi_eff[qq][i] is not None
                    )
                    for qq in range(q)
                ]
                t_qs = [
                    tl + float((1.0 + rq[qq]) / 2.0) * h for qq in range(q)
                ]
                # pair-adjacent f/f_u emission (see dg_slab.py):
                # co-issued sin+cos pairs are ~1.7-3x cheaper on the VPU
                fdq = [(f(u_qs[qq], t_qs[qq]), f_u(u_qs[qq], t_qs[qq]))
                       for qq in range(q)]
                fq = [pair[0] for pair in fdq]
                dfq = [pair[1] for pair in fdq]
                # hoisted once per iteration: f′·Φ tiles shared across all
                # Jacobian rows (i) — entries factor as phiw[q][i]·dphi[q][j]
                dphi = [
                    [
                        None if phi_eff[qq][j] is None
                        else dfq[qq] * phi_eff[qq][j]
                        for j in range(np_m)
                    ]
                    for qq in range(q)
                ]
                res = []
                for i in range(np_m):
                    acc = sum(
                        a_eff[i][j] * rows[j]
                        for j in range(np_m)
                        if a_eff[i][j] is not None
                    )
                    acc = acc + (h / 2.0) * sum(
                        phiw[qq][i] * fq[qq]
                        for qq in range(q)
                        if phiw[qq][i] is not None
                    )
                    if i == 0:
                        acc = acc + u_prev
                    res.append(acc)
                jac = []
                for i in range(np_m):
                    jrow = []
                    for j in range(np_m):
                        acc = (
                            a_eff[i][j]
                            if a_eff[i][j] is not None
                            else zeros_like(u_prev)
                        )
                        terms = [
                            phiw[qq][i] * dphi[qq][j]
                            for qq in range(q)
                            if phiw[qq][i] is not None
                            and dphi[qq][j] is not None
                        ]
                        if terms:
                            acc = acc + (h / 2.0) * sum(terms)
                        jrow.append(acc)
                    jac.append(jrow)
                delta = ge_solve_rows(jac, res)
                return tuple(rows[i] - delta[i] for i in range(np_m))

            rows = lax.fori_loop(0, newton_iters, newton_body, rows0)
            for i in range(np_m):
                out_ref[ke, i] = rows[i]
            # dynamic right endpoint: u[ns_k + offset] via the order masks
            u_end = sum(
                rows[n + 1 + order_offset] * mm[n] for n in range(n_max_user)
            )
            if order_offset == 0:
                uend_ref[ke] = u_end
            return u_end

        y0 = y0_ref[:]
        lax.fori_loop(0, k_el, element, y0)

    fwd_sweep(0, uc_out)
    fwd_sweep(fine_offset, uf_out)

    # ---------------- backward adjoint sweep at ns+1 + AWR
    # (adjoint/dg_mixed.py dg_adjoint_march_mixed semantics)
    def adj_element(jj, v_in):
        ke = k_el - 1 - jj
        tl = times_ref[ke]
        h = times_ref[ke + 1] - tl
        ns_k = ns_ref[ke]
        mm = order_masks(ns_k, 1, n_max_user)
        y0 = y0_ref[:]
        u_prev = jnp.where(ke == 0, y0, uend_ref[jnp.maximum(ke - 1, 0)])
        u_el = [uc_out[ke, i] for i in range(np_m)]
        # primal → shared quadrature / adjoint nodes (stacks indexed by
        # the PRIMAL order: lo = 0 = primal order 1)
        to_q_eff = _blend(mm, to_quad, q, np_m, 0)
        to_n_eff = _blend(mm, to_nodes, np_m, np_m, 0)
        # adjoint-order (ns+1) tables for the residual: lo = 1 in stack
        # units (both adjoint modes weight the SAME order-(ns+1) residual)
        phi_eff = _blend(mm, phi, q, np_m, 1)
        s_t_eff = _blend(mm, s_t, np_m, np_m, 1)
        # e_end at index ns_k+1: e_end[i] = mm[i−2] (i = n+1 for order n)
        e_end = [
            mm[i - 2] if 2 <= i - 0 and 0 <= i - 2 < n_max_user
            else None
            for i in range(np_m)
        ]

        def dotq(col_i, vec):
            return sum(
                col_i[qq] * vec[qq]
                for qq in range(q)
                if col_i[qq] is not None
            )

        u_q = [
            sum(
                to_q_eff[qq][i] * u_el[i]
                for i in range(np_m)
                if to_q_eff[qq][i] is not None
            )
            for qq in range(q)
        ]
        t_q = [tl + float((1.0 + rq[qq]) / 2.0) * h for qq in range(q)]
        # pair-adjacent f/f_u emission (see dg_slab.py)
        fdq = [(f(u_q[qq], t_q[qq]), f_u(u_q[qq], t_q[qq]))
               for qq in range(q)]
        fq = [pair[0] for pair in fdq]
        dfq = [pair[1] for pair in fdq]
        u_h = [
            sum(
                to_n_eff[i][j] * u_el[j]
                for j in range(np_m)
                if to_n_eff[i][j] is not None
            )
            for i in range(np_m)
        ]
        # Φᵀ·w tiles at the ADJOINT order — shared by the solve-mode
        # system and (both modes) the residual's m̃ quadrature term
        phiw_a = [
            [
                None if phi_eff[qq][i] is None
                else phi_eff[qq][i] * float(wq[qq])
                for i in range(np_m)
            ]
            for qq in range(q)
        ]

        def backward_solve(lo_off, u_nodes, e_sel):
            """One blended backward DG solve at stack offset ``lo_off``
            (1 = order ns+1, the direct adjoint; 0 = order ns, the
            low-order solve feeding the Radau lift). System matrix
            a_adj_eff + m_w, rhs −(h/2)·M·g_u(u_nodes) − e_sel·v_in —
            the tile form of adjoint/dg_mixed.py's
            dg_adjoint_march_mixed / dg_adjoint_solve_low_mixed. Φᵀ·w
            and f′·Φ tiles hoisted out of the (i, j) entry loops (same
            factoring and multiply association as the forward Newton
            Jacobian)."""
            phi_o = (phi_eff if lo_off == 1
                     else _blend(mm, phi, q, np_m, 0))
            a_o = _blend(mm, a_adj, np_m, np_m, lo_off)
            m_o = _blend(mm, mass, np_m, np_m, lo_off)
            r_o = _blend_vec(mm, r_pad, np_m, lo_off)
            live_o = live_masks(ns_k, lo_off)
            # node times (r_pad pads with +1 → t_right; blended r_o[i]
            # may be None only if every order's entry is 0)
            t_n = [
                tl + (1.0 + (r_o[i] if r_o[i] is not None
                             else zeros_like(h))) * h * 0.5
                for i in range(np_m)
            ]
            phiw = phiw_a if lo_off == 1 else [
                [
                    None if phi_o[qq][i] is None
                    else phi_o[qq][i] * float(wq[qq])
                    for i in range(np_m)
                ]
                for qq in range(q)
            ]
            dphi = [
                [
                    None if phi_o[qq][j] is None
                    else dfq[qq] * phi_o[qq][j]
                    for j in range(np_m)
                ]
                for qq in range(q)
            ]
            a_mat = []
            for i in range(np_m):
                arow = []
                for j in range(np_m):
                    acc = (
                        a_o[i][j]
                        if a_o[i][j] is not None
                        else zeros_like(h)
                    )
                    terms = [
                        phiw[qq][i] * dphi[qq][j]
                        for qq in range(q)
                        if phiw[qq][i] is not None
                        and dphi[qq][j] is not None
                    ]
                    if terms:
                        acc = acc + (h / 2.0) * sum(terms)
                    arow.append(acc)
                a_mat.append(arow)
            gu = [live_o[j] * g_u(u_nodes[j], t_n[j]) for j in range(np_m)]
            rhs = []
            for i in range(np_m):
                acc = (-h / 2.0) * sum(
                    m_o[i][j] * gu[j]
                    for j in range(np_m)
                    if m_o[i][j] is not None
                )
                if e_sel[i] is not None:
                    acc = acc - e_sel[i] * v_in
                rhs.append(acc)
            return ge_solve_rows(a_mat, rhs)

        if adjoint_mode == "solve":
            v = backward_solve(1, u_h, e_end)
            carry = v[0]
        else:
            # low-order solve AT the primal orders, inflow chained on the
            # LOW solution's left endpoint (dg_adjoint_solve_low_mixed);
            # e_end at index ns_k: one_hot rows i = n (order n) → mm[i−1]
            e_end_lo = [
                mm[i - 1] if 0 <= i - 1 < n_max_user else None
                for i in range(np_m)
            ]
            v_lo = backward_solve(0, u_el, e_end_lo)
            carry = v_lo[0]
            # Radau lift to order ns+1 (dg_adjoint_reconstruct_mixed /
            # adj_rec.m:34-47): evaluate at the Radau points, append the
            # known right-endpoint inflow, refit at order ns+1
            er_eff = _blend(mm, eval_rad, np_m, np_m, 0)
            th_eff = _blend(mm, to_hi, np_m, np_m, 0)
            vals = []
            for j in range(np_m):
                terms = [
                    er_eff[j][k] * v_lo[k]
                    for k in range(np_m)
                    if er_eff[j][k] is not None
                ]
                acc = sum(terms) if terms else zeros_like(h)
                if e_end[j] is not None:
                    acc = acc + e_end[j] * v_in
                vals.append(acc)
            v = []
            for i in range(np_m):
                terms = [
                    th_eff[i][j] * vals[j]
                    for j in range(np_m)
                    if th_eff[i][j] is not None
                ]
                v.append(sum(terms) if terms else zeros_like(h))

        # AWR: res = S_aᵀ u_h − e_end (e_end·u_h) + m̃ + e_0 u_prev
        uh_end = sum(
            e_end[i] * u_h[i] for i in range(np_m) if e_end[i] is not None
        )
        err = None
        for i in range(np_m):
            acc = sum(
                s_t_eff[i][j] * u_h[j]
                for j in range(np_m)
                if s_t_eff[i][j] is not None
            )
            acc = acc + (h / 2.0) * dotq(
                [phiw_a[qq][i] for qq in range(q)], fq
            )
            if e_end[i] is not None:
                acc = acc - e_end[i] * uh_end
            if i == 0:
                acc = acc + u_prev
            term = v[i] * acc
            err = term if err is None else err + term
        for i in range(np_m):
            v_out[ke, i] = v[i]
        err_out[ke] = err
        return carry

    zero = zeros_like(y0_ref[:])
    lax.fori_loop(0, k_el, adj_element, zero)


def make_pallas_dg_estimate_hp_per_member(
    mops: MixedDGTimeOperators,
    interp: MixedAdjointInterp,
    f: Callable,
    f_u: Callable | None = None,
    n_elements: int = 16,
    *,
    n_max_user: int,
    fine_offset: int = 2,
    g_u: Callable = lambda u, t: jnp.ones_like(u),
    newton_iters: int = 8,
    interpret: bool = False,
    block_members: int | None = 16_384,
    adjoint_mode: str = "solve",
    rad=None,
):
    """Build ``run(times, ns, y0s) -> (u_c, u_f, v, err)`` — the fused
    per-member hp estimate.

    ``adjoint_mode``: 'solve' (default) solves the adjoint directly at
    ``ns + 1`` (adj_march semantics); 'reconstruct' solves it AT the
    primal orders and lifts through Radau collocation + the known
    right-endpoint inflow (adj_rec.m:34-47 —
    ``adjoint/dg_mixed.dg_adjoint_solve_low_mixed`` +
    ``dg_adjoint_reconstruct_mixed``), which replaces the (ns+2)-row
    backward solve with an (ns+1)-row solve plus two table contractions.
    'reconstruct' requires ``rad`` (``dg_radau_interp_mixed(mops)``).
    Both modes weight the SAME order-(ns+1) residual; the returned ``v``
    is the order-(ns+1) adjoint (direct or reconstructed).

    ``times`` (B, K+1) per-member partitions, ``ns`` (B, K) per-member
    PRIMAL orders in ``1..n_max_user``, ``y0s`` (B,) with B a multiple of
    8.  ``mops`` must be the ``dg_time_operators_mixed(n_max_user +
    fine_offset)`` stack (the hp loop's construction); ``interp`` its
    :func:`~adjoint_ode_adaptivity_tpu.adjoint.dg_mixed.dg_adjoint_interp_mixed`.
    Returns the XLA member-solver contract: ``u_c``/``u_f``/``v``
    (B, K, np_max) padded nodal values (coarse at ``ns``, fine at
    ``ns + fine_offset``, adjoint at ``ns + 1``) and ``err`` (B, K).
    Functionals are cheaper outside the kernel
    (``dg_element_functional_mixed``).  ``block_members``: lane-blocked
    grid over independent members, as in
    :func:`~adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab.make_pallas_dg_estimate_ensemble`.
    """
    if f_u is None:
        def f_u(u, t):  # noqa: F811 - deliberate default
            return jax.jvp(lambda uu: f(uu, t), (u,), (jnp.ones_like(u),))[1]
    if fine_offset < 1:
        raise ValueError(
            f"fine_offset={fine_offset} must be >= 1 (the adjoint runs at "
            "ns + 1 and needs its tables in the operator stack)"
        )
    if mops.n_max != n_max_user + fine_offset:
        raise ValueError(
            f"mops stack n_max={mops.n_max} must equal n_max_user + "
            f"fine_offset = {n_max_user + fine_offset}"
        )
    if mops.np_max > 8:
        raise ValueError("in-kernel solves support np_max <= 8")
    if adjoint_mode not in ("solve", "reconstruct"):
        raise ValueError(f"unknown adjoint_mode {adjoint_mode!r}")
    if adjoint_mode == "reconstruct" and rad is None:
        raise ValueError(
            "adjoint_mode='reconstruct' requires rad "
            "(adjoint.dg_mixed.dg_radau_interp_mixed(mops))"
        )
    k_el = n_elements
    np_m = mops.np_max

    kern = functools.partial(
        _mixed_kernel, mops, interp,
        rad if adjoint_mode == "reconstruct" else None, adjoint_mode,
        f, f_u, g_u, k_el, fine_offset, n_max_user, newton_iters,
    )

    def run(times, ns, y0s):
        b = y0s.shape[0]
        if b % 8:
            raise ValueError(f"B={b} must be a multiple of 8")
        b8 = b // 8
        blk = pick_lane_block(b8, block_members, interpret)
        n_blocks = b8 // blk
        y0_t = jnp.asarray(y0s, jnp.float32).reshape(8, b8)
        times = jnp.asarray(times, jnp.float32)
        if times.shape != (b, k_el + 1):
            raise ValueError(
                f"per-member times {times.shape} != (B={b}, K+1={k_el + 1})"
            )
        ns_f = jnp.asarray(ns, jnp.float32)
        if ns_f.shape != (b, k_el):
            raise ValueError(
                f"per-member ns {ns_f.shape} != (B={b}, K={k_el})"
            )
        times_op = times.T.reshape(k_el + 1, 8, b8)
        ns_op = ns_f.T.reshape(k_el, 8, b8)
        geom_spec = lambda lead: pl.BlockSpec(  # noqa: E731
            (lead, 8, blk), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        u_c, u_f, v, err, _ = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            out_shape=(
                jax.ShapeDtypeStruct((k_el, np_m, 8, b8), jnp.float32),
                jax.ShapeDtypeStruct((k_el, np_m, 8, b8), jnp.float32),
                jax.ShapeDtypeStruct((k_el, np_m, 8, b8), jnp.float32),
                jax.ShapeDtypeStruct((k_el, 8, b8), jnp.float32),
                jax.ShapeDtypeStruct((k_el, 8, b8), jnp.float32),  # uend
            ),
            in_specs=[
                geom_spec(k_el + 1),
                geom_spec(k_el),
                pl.BlockSpec((8, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((k_el, np_m, 8, blk), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_el, np_m, 8, blk), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_el, np_m, 8, blk), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_el, 8, blk), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_el, 8, blk), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(times_op, ns_op, y0_t)
        u_c = jnp.transpose(u_c.reshape(k_el, np_m, b), (2, 0, 1))
        u_f = jnp.transpose(u_f.reshape(k_el, np_m, b), (2, 0, 1))
        v = jnp.transpose(v.reshape(k_el, np_m, b), (2, 0, 1))
        err = jnp.transpose(err.reshape(k_el, b), (1, 0))
        return u_c, u_f, v, err

    return run
