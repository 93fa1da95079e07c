"""Fused Pallas kernel for the FD ensemble refinement signal.

The reference's largest compute is the refinement signal: forward march +
adjoint + indicator vmapped over up to 100,000 initial conditions
(python/Main_variable_params.py:234, 330-341). Every operation is
elementwise over the IC axis, so the TPU-native layout puts ICs on the
vector lanes — an (8, n_ics/8) tile carpet — and ONE kernel launch runs the
whole pipeline with the coarse trajectory resident in VMEM:

  coarse Euler march (n_steps) → linear interp to the rf-refined grid →
  K = ∂J/∂U for J = ∫u² (k_j = 2 u_j dt_f) → reverse adjoint scan
  v_j = k_j + (1 + f_u(u_j) dt_f) v_{j+1} → residual
  r_j = u_j − (u_{j−1} + f(u_{j−1}) dt_f) → block indicator
  |Σ_{j∈block i} r_j v_j|   (the "block" convention, Main_new_loss.py:123-135)

Semantics match utils/benchmarks.ensemble_fd_pipeline's per-IC function
exactly (tested in interpret mode). Fine-grid states are interpolated on
the fly during the reverse sweep — only the (n_steps+1) coarse states are
stored.

``f``/``f_u`` are traced as ``f(u, t)``; the time grid (uniform or the
adaptive loop's NONUNIFORM step vector) is static per compile, so every
fine node time and step width is a Python float at trace time —
time-dependent right-hand sides (e.g. the gaussian-mixture ODE's modes in
t, Main_no_matrix_detect_complex.py:37-52) and graded grids cost nothing
extra. Constants the closures capture must be Python/NumPy scalars (Pallas
kernels cannot close over array constants — unroll small mode sums to
scalars, as the gaussian mixture test does).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adjoint_ode_adaptivity_tpu.ops.pallas._vmem import (
    STORED_VMEM_LIMIT_BYTES,
    STORED_VMEM_STACK_FACTOR,
)

__all__ = [
    "make_pallas_fd_ensemble",
    "make_pallas_fd_ensemble_vec",
    "make_pallas_fd_estimate_per_member",
]


def _is_scalar(x) -> bool:
    """True for Python/NumPy scalars (not sequences/arrays of steps)."""
    try:
        len(x)
        return False
    except TypeError:
        return True


def _kernel(f, f_u, n_steps, rf, dts, u0_ref, err_out):
    # dts: tuple of n_steps Python floats (the coarse step widths); the
    # whole time grid is static at trace time
    tc = [0.0]
    for d in dts:
        tc.append(tc[-1] + d)
    # ---- coarse march, trajectory in VMEM (list of (8, L) values)
    u = u0_ref[:]
    traj = [u]
    for n in range(n_steps):
        u = u + f(u, tc[n]) * dts[n]
        traj.append(u)

    # ---- reverse sweep over the fine grid, interpolating on the fly.
    # fine node j = coarse i + q/rf, u_f[j] = traj[i] + (q/rf)(traj[i+1]-traj[i])
    def u_fine(j):
        i, q = divmod(j, rf)
        if q == 0:
            return traj[i]
        w = q / rf
        return traj[i] + w * (traj[i + 1] - traj[i])

    def t_fine(j):
        i, q = divmod(j, rf)
        return tc[i] + (q / rf) * dts[i]

    def dt_fine(j):
        """Width of the fine interval [j, j+1)."""
        return dts[j // rf] / rf

    # f(u_j) and f_u(u_j) of the SAME node are emitted ADJACENTLY: the
    # sweep's iteration j uses f_u(u_j) but f(u_j) only at iteration j+1,
    # and separated sin/cos evals serialize on the VPU — measured
    # (tools/microroof.py `sincos` stream): an adjacent sin+cos pair runs
    # ~2.4× faster than two separated evals (ILP overlap of the two
    # polynomial chains). The cache emits each node's pair once, at its
    # first use (iteration j+1's residual), so iteration j's adjoint
    # update reuses the cos that was co-issued with the residual's sin.
    # Values are bit-identical — only the emission order changes.
    _pair_cache: dict = {}

    def f_pair(j):
        if j not in _pair_cache:
            u_j, t_j = u_fine(j), t_fine(j)
            _pair_cache[j] = (f(u_j, t_j), f_u(u_j, t_j))
        return _pair_cache[j]

    n_fine = n_steps * rf
    v = jnp.zeros_like(u)  # v_{n_fine} = k_{n_fine} = 0 (J sums u[:-1])
    blocks = [None] * n_steps
    for j in range(n_fine, 0, -1):
        u_j = u_fine(j)
        u_jm1 = u_fine(j - 1)
        if j < n_fine:  # v_j = k_j + (1 + f_u dt_f) v_{j+1}
            dtf = dt_fine(j)
            v = 2.0 * u_j * dtf + (1.0 + f_pair(j)[1] * dtf) * v
        dtf_m = dt_fine(j - 1)
        r = u_j - (u_jm1 + f_pair(j - 1)[0] * dtf_m)
        err = r * v
        i = (j - 1) // rf  # block i covers fine nodes i·rf+1 .. (i+1)·rf
        blocks[i] = err if blocks[i] is None else blocks[i] + err

    for i in range(n_steps):
        err_out[i] = jnp.abs(blocks[i])


def make_pallas_fd_ensemble(
    f: Callable,
    f_u: Callable,
    n_steps: int,
    ref_factor: int,
    dt,
    interpret: bool = False,
):
    """Returns ``run(u0s) -> err_steps`` computing the per-IC block error
    indicator (n_steps, n_ics) in one kernel launch; mean over axis 1 gives
    the ensemble refinement signal. ``dt`` is a scalar (uniform grid) or a
    length-``n_steps`` sequence of step widths — the adaptive loop's
    NONUNIFORM grids compile per grid, exactly like the reference's
    per-iteration retraces. ``n_ics`` must be a multiple of
    8·lane_block = 20480 (sublanes × the per-grid-block lane width); pad
    the ensemble.

    The kernel fully unrolls the (n_steps+1)-state trajectory and n_steps
    block accumulators in VMEM; a rough live-set estimate guards against
    Mosaic's scoped-VMEM stack limit with a clear error for very deep
    configurations (use several kernel calls over sub-windows instead)."""

    lane_block = 2560  # 20 lane tiles per grid block: amortizes per-op overhead, and
    # IC blocks are independent → the grid is embarrassingly parallel
    dts = (
        (float(dt),) * n_steps
        if _is_scalar(dt)
        else tuple(float(d) for d in dt)
    )
    if len(dts) != n_steps:
        raise ValueError(f"dt vector length {len(dts)} != n_steps={n_steps}")

    def run(u0s):
        (n,) = u0s.shape
        if n % (8 * lane_block):
            raise ValueError(
                f"n_ics={n} must be a multiple of {8 * lane_block} (pad)"
            )
        width = n // 8
        n_blocks = width // lane_block
        # live set ≈ traj (n_steps+1) + blocks (n_steps) + ~8 temporaries,
        # each (8, lane_block) f32
        approx_bytes = (2 * n_steps + 9) * 8 * lane_block * 4
        if approx_bytes > 12 * 2**20:
            raise ValueError(
                f"n_steps={n_steps} would need ~{approx_bytes/2**20:.0f} MB of "
                "scoped VMEM (limit ~16 MB); split the march into windows"
            )
        u0t = u0s.reshape(8, width)
        kern = functools.partial(_kernel, f, f_u, n_steps, ref_factor, dts)
        err = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            out_shape=jax.ShapeDtypeStruct((n_steps, 8, width), u0s.dtype),
            in_specs=[
                pl.BlockSpec((8, lane_block), lambda i: (0, i), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (n_steps, 8, lane_block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(u0t)
        return err.reshape(n_steps, n)

    return run


def _zero_entry(x) -> bool:
    """True for a structurally-zero Jacobian entry (Python literal 0):
    skipped entirely so sparse Jacobians (e.g. companion forms) cost only
    their nonzero terms."""
    return isinstance(x, (int, float)) and x == 0.0


def _vec_kernel(f_comps, jac_comps, d, n_steps, rf, dts, u0_ref, err_out):
    # u0_ref: (d, 8, L) — component c rides as its own lane carpet
    # u0_ref[c] (LEADING dims of >2D refs index freely). Same pipeline as
    # the scalar _kernel with every value promoted to a d-tuple of tiles:
    # the adjoint update applies (I + dt·J)ᵀ, the indicator contracts
    # r·v over components.
    tc = [0.0]
    for dt_n in dts:
        tc.append(tc[-1] + dt_n)
    us = tuple(u0_ref[c] for c in range(d))
    traj = [us]
    for n in range(n_steps):
        fs = f_comps(us, tc[n])
        us = tuple(us[i] + fs[i] * dts[n] for i in range(d))
        traj.append(us)

    def u_fine(j):
        i, q = divmod(j, rf)
        if q == 0:
            return traj[i]
        w = q / rf
        return tuple(
            traj[i][c] + w * (traj[i + 1][c] - traj[i][c]) for c in range(d)
        )

    def t_fine(j):
        i, q = divmod(j, rf)
        return tc[i] + (q / rf) * dts[i]

    def dt_fine(j):
        return dts[j // rf] / rf

    # f/jac of the same node emitted adjacently (see _kernel's comment —
    # matters when the components' RHS carries transcendentals)
    _pair_cache: dict = {}

    def fj_pair(j):
        if j not in _pair_cache:
            u_j, t_j = u_fine(j), t_fine(j)
            _pair_cache[j] = (f_comps(u_j, t_j), jac_comps(u_j, t_j))
        return _pair_cache[j]

    n_fine = n_steps * rf
    v = tuple(jnp.zeros_like(us[0]) for _ in range(d))
    blocks = [None] * n_steps
    for j in range(n_fine, 0, -1):
        u_j = u_fine(j)
        u_jm1 = u_fine(j - 1)
        if j < n_fine:
            # v_j = k_j + (I + dt_f·J(u_j))ᵀ v_{j+1},  k_j = 2 u_j dt_f
            # (J = ∫|u|² dt on the fine grid, left rule)
            dtf = dt_fine(j)
            jac = fj_pair(j)[1]
            v_new = []
            for i in range(d):
                acc = 2.0 * u_j[i] * dtf + v[i]
                for m in range(d):
                    if not _zero_entry(jac[m][i]):
                        acc = acc + dtf * jac[m][i] * v[m]
                v_new.append(acc)
            v = tuple(v_new)
        dtf_m = dt_fine(j - 1)
        fs_m = fj_pair(j - 1)[0]
        err = None
        for i in range(d):
            r_i = u_j[i] - (u_jm1[i] + fs_m[i] * dtf_m)
            term = r_i * v[i]
            err = term if err is None else err + term
        i_blk = (j - 1) // rf
        blocks[i_blk] = err if blocks[i_blk] is None else blocks[i_blk] + err

    for i in range(n_steps):
        err_out[i] = jnp.abs(blocks[i])


def make_pallas_fd_ensemble_vec(
    f_comps: Callable,
    jac_comps: Callable,
    d: int,
    n_steps: int,
    ref_factor: int,
    dt,
    interpret: bool = False,
):
    """Vector-state (d>1) variant of :func:`make_pallas_fd_ensemble`:
    ``run(u0s) -> err_steps`` with ``u0s`` of shape ``(n_ics, d)``, the
    per-IC block indicator ``(n_steps, n_ics)`` in one launch. Each state
    component rides as its own (8, lane) carpet, so everything stays
    elementwise over ICs; the adjoint applies the transposed d×d Jacobian
    as d² unrolled multiply-adds and the indicator contracts r·v over
    components — the same pipeline the scalar kernel fuses
    (fwd Euler march → interp → k=2u·dt_f → reverse (I+dtJ)ᵀ scan →
    residual → block indicator, reference Main_variable_params.py:234,
    330-341 semantics for vector states).

    ``f_comps(us, t) -> tuple_d`` and ``jac_comps(us, t) -> d×d nested
    tuple`` (entry [m][i] = ∂f_m/∂u_i) take a d-tuple of tiles; entries
    may be Python scalars — literal-zero entries are skipped at trace
    time, so companion-form systems (e.g. the harmonic oscillator) cost
    only their nonzero Jacobian terms. ``n_ics`` must be a multiple of
    20480, as for the scalar kernel."""

    lane_block = 2560
    dts = (
        (float(dt),) * n_steps
        if _is_scalar(dt)
        else tuple(float(x) for x in dt)
    )
    if len(dts) != n_steps:
        raise ValueError(f"dt vector length {len(dts)} != n_steps={n_steps}")
    if d < 2:
        raise ValueError("use make_pallas_fd_ensemble for scalar states")

    def run(u0s):
        n, d_in = u0s.shape
        if d_in != d:
            raise ValueError(f"u0s last axis {d_in} != d={d}")
        if n % (8 * lane_block):
            raise ValueError(
                f"n_ics={n} must be a multiple of {8 * lane_block} (pad)"
            )
        width = n // 8
        n_blocks = width // lane_block
        # live set ≈ traj (n_steps+1)·d + blocks n_steps + ~8·d temporaries
        approx_bytes = (
            ((n_steps + 1) * d + n_steps + 8 * d) * 8 * lane_block * 4
        )
        if approx_bytes > 12 * 2**20:
            raise ValueError(
                f"n_steps={n_steps}, d={d} would need "
                f"~{approx_bytes/2**20:.0f} MB of scoped VMEM (limit "
                "~16 MB); split the march into windows"
            )
        u0t = u0s.T.reshape(d, 8, width)
        kern = functools.partial(
            _vec_kernel, f_comps, jac_comps, d, n_steps, ref_factor, dts
        )
        err = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            out_shape=jax.ShapeDtypeStruct((n_steps, 8, width), u0s.dtype),
            in_specs=[
                pl.BlockSpec((d, 8, lane_block), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (n_steps, 8, lane_block), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            interpret=interpret,
        )(u0t)
        return err.reshape(n_steps, n)

    return run


def _pm_kernel(f, f_u, n_steps, rf, convention, dt_ref, u0_ref, err_out,
               j_out):
    # dt_ref: (n_steps, 8, L) per-member coarse widths — TRACED (the
    # adaptive loop changes them every iteration without recompiling);
    # zero-width padding steps are exact identities and contribute
    # exactly 0 (the repo-wide padding contract, verified in tests)
    dts = [dt_ref[n] for n in range(n_steps)]
    tc = [jnp.zeros_like(dts[0])]
    for d in dts:
        tc.append(tc[-1] + d)
    u = u0_ref[:]
    traj = [u]
    j_val = jnp.zeros_like(u)
    for n in range(n_steps):
        j_val = j_val + u * u * dts[n]  # J = Σ u_n² dt_n (left rule)
        u = u + f(u, tc[n]) * dts[n]
        traj.append(u)
    j_out[:] = j_val

    def u_fine(j):
        i, q = divmod(j, rf)
        if q == 0:
            return traj[i]
        w = q / rf
        return traj[i] + w * (traj[i + 1] - traj[i])

    def t_fine(j):
        i, q = divmod(j, rf)
        return tc[i] + (q / rf) * dts[i]

    def dt_fine(j):
        return dts[j // rf] * (1.0 / rf)

    # same sin/cos pair-adjacency as _kernel (see the comment there): each
    # node's f/f_u evals are co-issued at first use — bit-identical values
    _pair_cache: dict = {}

    def f_pair(j):
        if j not in _pair_cache:
            u_j, t_j = u_fine(j), t_fine(j)
            _pair_cache[j] = (f(u_j, t_j), f_u(u_j, t_j))
        return _pair_cache[j]

    n_fine = n_steps * rf
    v = jnp.zeros_like(u)  # v_{n_fine} = k_{n_fine} = 0
    blocks = [None] * n_steps
    for j in range(n_fine, 0, -1):
        u_j = u_fine(j)
        u_jm1 = u_fine(j - 1)
        if j < n_fine:  # v_j = k_j + (1 + f_u dt_f) v_{j+1}
            dtf = dt_fine(j)
            v = 2.0 * u_j * dtf + (1.0 + f_pair(j)[1] * dtf) * v
        dtf_m = dt_fine(j - 1)
        r = u_j - (u_jm1 + f_pair(j - 1)[0] * dtf_m)
        err = r * v
        i = (j - 1) // rf
        if convention == "strided":
            # step i sums |err_fine| at fine nodes i·rf+2 .. i·rf+rf
            # (drops the first fine node of every step, incl. node 1)
            if (j - 1) % rf != 0:
                a = jnp.abs(err)
                blocks[i] = a if blocks[i] is None else blocks[i] + a
            elif blocks[i] is None:
                blocks[i] = jnp.zeros_like(err)
        else:  # block: signed sums then abs
            blocks[i] = err if blocks[i] is None else blocks[i] + err

    for i in range(n_steps):
        err_out[i] = (
            blocks[i] if convention == "strided" else jnp.abs(blocks[i])
        )


def _pick_pm_lane_block(width: int) -> int:
    """Lane-block width for the per-member grid: the largest 128-ALIGNED
    divisor of ``width`` <= 2560 (Mosaic lane blocks must be
    128-multiples); no aligned divisor -> the full array, which is always
    a legal single program."""
    if width <= 2560:
        return width
    return next((d for d in range(2560, 127, -128) if width % d == 0), width)


def _check_pm_vmem(n_steps: int, blk: int, interpret: bool) -> None:
    """Refuse hardware configs whose per-member kernel cannot fit scoped
    VMEM with an actionable error (interpret mode has no such limit).
    Live set ≈ dts (n_steps) + tc (n_steps+1) + traj (n_steps+1) + blocks
    (n_steps) + ~10 temporaries, each an (8, blk) f32 tile; limit and
    measured stack factor from _vmem (the single source of truth)."""
    if interpret:
        return
    approx = (4 * n_steps + 12) * 8 * blk * 4 * STORED_VMEM_STACK_FACTOR
    if approx > STORED_VMEM_LIMIT_BYTES:
        raise ValueError(
            f"n_steps={n_steps} at lane block {blk} would need "
            f"~{approx / 2**20:.0f} MB of scoped VMEM (limit "
            f"{STORED_VMEM_LIMIT_BYTES // 2**20} MB); split the march "
            "into windows or reduce maxit"
        )


def make_pallas_fd_estimate_per_member(
    f: Callable,
    f_u: Callable,
    n_steps: int,
    ref_factor: int,
    convention: str = "strided",
    interpret: bool = False,
):
    """Fused per-member FD estimate: ``run(dt_b, u0s) -> (err_steps, j)``
    with PER-MEMBER (B, n_steps) coarse step widths riding as traced VMEM
    operands — the engine of
    ``adapt.fd_loop.run_adaptive_fd_per_member(engine="pallas")``. One
    launch runs every member's coarse march + fine interpolation + J=∫u²
    adjoint + residual + coarse indicator (``convention`` ∈
    {"strided", "block"}, adjoint/estimate.py:88-116 semantics).
    Zero-width (padding) steps are exact identities with exactly-zero
    contributions, so the adaptive loop's frozen members and padded tails
    cost nothing and can never win an argmax. ``B`` must be a multiple of
    8; the member axis blocks into grid programs above 2560 lanes."""
    if convention not in ("strided", "block"):
        raise ValueError(convention)
    from adjoint_ode_adaptivity_tpu.ops.pallas import ensure_scoped_vmem

    ensure_scoped_vmem()  # the unrolled body needs the 48 MB scoped limit

    def run(dt_b, u0s):
        (n,) = u0s.shape
        if n % 8:
            raise ValueError(f"B={n} must be a multiple of 8")
        if dt_b.shape != (n, n_steps):
            raise ValueError(
                f"per-member dt {dt_b.shape} != (B={n}, n_steps={n_steps})"
            )
        width = n // 8
        blk = _pick_pm_lane_block(width)
        n_blocks = width // blk
        _check_pm_vmem(n_steps, blk, interpret)
        u0t = u0s.reshape(8, width)
        # (B, n_steps) -> (n_steps, 8, width): same member->(sublane,
        # lane) map as u0
        dt_t = dt_b.T.reshape(n_steps, 8, width)
        kern = functools.partial(
            _pm_kernel, f, f_u, n_steps, ref_factor, convention
        )
        err, j_val = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            out_shape=(
                jax.ShapeDtypeStruct((n_steps, 8, width), u0s.dtype),
                jax.ShapeDtypeStruct((8, width), u0s.dtype),
            ),
            in_specs=[
                pl.BlockSpec((n_steps, 8, blk), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((n_steps, 8, blk), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(dt_t, u0t)
        return (
            jnp.transpose(err.reshape(n_steps, n)),  # (B, n_steps)
            j_val.reshape(n)
        )

    return run
