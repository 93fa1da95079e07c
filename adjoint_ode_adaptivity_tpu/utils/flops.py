"""Analytic FLOP/op models for the benched kernel families — single source.

ADVICE r4: ``bench.py`` and ``tools/roofline.py`` each hardcoded the bench
problem shapes and per-node FLOP estimates separately, so a config change
in one silently misreported TFLOP/s in the other, and the d=1 / d=2 FD
ensemble rows were counted with *different* accounting. This module is the
one place both sides import:

- ``BENCH_CFG`` — the canonical shapes of every roofline-accounted bench
  row. ``bench.py`` builds its problems from these constants; the roofline
  FLOP models read the same dict, so they cannot drift apart.
- per-family ``*_flops()`` models returning ``(flops, transcendentals)``
  per unit of the family's rate key. FLOPs follow the FMA=2 convention the
  measured VPU ceiling uses (tools/microroof.py times pure FMA streams).
  Transcendental evaluations (sin/cos) are counted SEPARATELY: one sin is
  one "FLOP" in the naive count but occupies many VPU issue slots
  (measured by microroof's ``vpu_sin_ns`` / ``vpu_cos_ns`` rows), so
  kernels dominated by them look artificially far from the FMA roofline.
  ``tools/roofline.py`` reports both the naive %-of-ceiling and the
  transcendental-adjusted one.

Chip ceilings (measured on this v5e by tools/microroof.py) live here too,
so every consumer divides by the same numbers.
"""
from __future__ import annotations

__all__ = [
    "BENCH_CFG",
    "VPU_F32_TFLOPS",
    "MXU_F32_TFLOPS",
    "HBM_GBPS",
    "SIN_FMA_EQUIV",
    "fd_ensemble_flops_per_ic",
    "fd_ensemble_fastsin_flops_per_ic",
    "fd_ensemble_vec_flops_per_ic",
    "dg_slab_fastsin_flops_per_solve",
    "advec_pipeline_flops_per_element_step",
    "dg_slab_flops_per_solve",
    "train_fused_flops_per_epoch",
    "train_dense_matmul_flops_per_epoch",
]

# ---------------------------------------------------------------------------
# measured chip ceilings (tools/microroof.py + tools/vpu_peak_probe.py on
# the TPU v5e this repo benches on; re-run and update here if the chip
# changes). The VPU FMA probe WOBBLES HARD across sessions under
# tunnel/host contention — observed 3.2-5.9 TF/s (peak-probe sweep best
# 4.93; microroof's plain multi-stream kernel measured 5.855 on
# 2026-08-20 session c while the same session's peak-probe run sat at
# 4.0). A ceiling is by definition the MAX any probe achieved, so 5.86
# is published; % -of-ceiling rows computed against it are conservative
# (a contended-session kernel rate divided by the best-session ceiling).
# Architectural peak is ~7.7 (8×128 lanes × 4 ALUs × 2 × ~0.94 GHz).
#
# CAVEAT for LINEAR pipelines: kernels whose math is affine in the state
# (the d=2 harmonic-oscillator ensemble, the affine-RHS attribution twin)
# can measure ABOVE this ceiling at the static-source FLOP count, because
# the compiler folds compositions of affine ops that the count charges
# separately (e.g. interp∘residual chains collapse to one FMA of
# trajectory values). Their roofline rows are therefore upper-bound
# estimates; the plausibility gates allow such rows a folding factor.
VPU_F32_TFLOPS = 5.86   # FMA streams (FMA = 2 FLOP), best observed
MXU_F32_TFLOPS = 195.0  # default-precision 4096^3 matmul (best observed)
HBM_GBPS = 652.0        # practical 1 GiB read+write stream
# static-count inflation allowed for foldable (affine) pipelines before a
# rate is called physically impossible: measured honest linear kernels
# sit at 1.2-1.6× the ceiling on naive counts (vec2 clean run: 5.8e12
# nominal = 1.18×)
LINEAR_FOLD_ALLOWANCE = 1.7

# Measured transcendental throughput at multi-stream saturation
# (tools/microroof.py, 2026-08-20, k_hi=32 chains — STABLE across
# sessions unlike the FMA probe: 37-40 G/s every run): sin 37-40 G/s,
# cos 37-43 G/s, an ADJACENT sin+cos pair of the same argument
# 36.7-37.4 G-pairs/s — a pair costs about ONE separated eval (~2×
# cheaper than sequential sin-then-cos; an earlier short-chain run
# reported 65 G-pairs/s, which longer chains did not reproduce).
# exp is hardware-priced (one run measured 1.6-1.9 T/s). In
# FMA-displacement units consistent with the published FMA ceiling
# (VPU_F32_TFLOPS/2 = 2.93e12 FMA/s over 37 G-evals/s ≈ 79): NOTE the
# production kernels SUSTAIN 38-43 G-pairs/s — 104-118% of the
# standalone pair-stream microbench. A round-5 sweep of emission
# structures (chained accumulate, decoupled sin/cos accumulators,
# pair-feeds-FMA, march-style argument update) all land 37.0-38.3
# G-pairs/s, so the stream rate is robust and the kernels' 0-15% excess
# is bounded: quiet-session variance plus compiler CSE sharing slightly
# more evals than the static model charges. Pair-issue roofline rows
# can therefore legitimately read up to ~115%.
SIN_FMA_EQUIV = 76.0          # one separated sin/cos (2.93e12 / 38.5e9)
SINCOS_PAIR_FMA_EQUIV = 79.0  # sin+cos of one argument, emitted adjacent
SINCOS_PAIR_STREAM_GPS = 37.0  # best pure-pair stream rate (G-pairs/s)
# ops/pallas/fast_trig.py's shared-x² polynomial pair: ~13 FMAs analytic
FAST_SINCOS_PAIR_FMA = 13.0

# ---------------------------------------------------------------------------
# canonical bench-row shapes (bench.py builds its problems from these)
BENCH_CFG = {
    # FD ensemble refinement signal (Main_variable_params.py:234,330-341):
    # u' = sin(u), J = ∫u² dt, 102,400 ICs
    "fd_ensemble": dict(n_ics=102_400, n_steps=16, ref_factor=4),
    # d=2 sibling: harmonic oscillator u'' = -4u in companion form
    # (linear RHS — no transcendentals; 2 structurally-nonzero Jacobian
    # entries)
    "fd_ensemble_vec2": dict(n_ics=102_400, n_steps=16, ref_factor=4, d=2),
    # resident advection fwd+adj+estimate pipeline (headline row)
    "advec_pipeline": dict(k_elems=10_000, n_order=2, batch=8),
    # DG-in-time slab ensemble: forward order n_p=1 (Np=2), adjoint order
    # n_a=2 (Np=3), 5 fixed Newton iterations; quadrature counts follow
    # march/dg_time.dg_time_operators' default n_gq = 3n+6 → (3n+7)-point
    # Gauss rules (nq_p=10, nq_a=13)
    "dg_slab": dict(np_=2, np_a=3, newton_iters=5, nq_p=10, nq_a=13),
    # fused per-step training epoch (ResBlockSimple)
    "train_fused": dict(width=500, n_steps=10, batch=8192),
    # shared-net Dense training (ResNetBlock [100, 500])
    "train_dense": dict(f1=100, f2=500, n_steps=100, batch=8192),
}


# ---------------------------------------------------------------------------
# FD ensemble (ops/pallas/fd_ensemble.py): fused coarse march + on-the-fly
# interp + reverse adjoint + residual + block indicator, scalar state.
def fd_ensemble_flops_per_ic(n_steps: int | None = None,
                             ref_factor: int | None = None):
    """(flops, transcendentals) per IC for the d=1 fused kernel.

    Static count of the unrolled kernel body (fd_ensemble._kernel), with
    trace-time CSE assumed for repeated subexpressions (the coarse-node
    sin evals are shared between march and residual; u_fine(j) is shared
    between consecutive reverse iterations):

    - coarse march, n_steps iterations: sin(u) [1 trans] then
      u += f·dt [1 FMA = 2 FLOP]
    - reverse sweep over n_fine = n_steps·rf fine intervals:
      · u_fine interp at the rf−1 interior nodes per coarse step:
        traj[i] + w·(traj[i+1]−traj[i]) = 1 sub + 1 FMA = 3 FLOP
        (coarse nodes are free — they alias traj[i]); each interp is
        computed once thanks to CSE across iterations
      · adjoint update at n_fine−1 nodes: cos(u_j) [1 trans] +
        v = 2·u_j·dtf + (1 + f_u·dtf)·v  → 2 mul + 2 FMA = 6 FLOP
      · residual at n_fine nodes: sin(u_{j−1}) [1 trans, CSE'd with the
        march at coarse nodes → n_fine − n_steps NEW sins + the n_steps
        coarse ones already counted] + r = u_j − (u_{j−1} + f·dtf)
        [1 FMA + 1 sub = 3 FLOP] + err = r·v [1] + block acc [1]
    - final |·| per coarse step: n_steps ops
    """
    cfg = BENCH_CFG["fd_ensemble"]
    n_steps = cfg["n_steps"] if n_steps is None else n_steps
    rf = cfg["ref_factor"] if ref_factor is None else ref_factor
    n_fine = n_steps * rf
    flops = (
        2 * n_steps                      # march FMA
        + 3 * (rf - 1) * n_steps         # interior interps
        + 6 * (n_fine - 1)               # adjoint updates
        + 5 * n_fine                     # residual + err + acc
        + n_steps                        # |blocks|
    )
    # sin at every fine node 0..n_fine−1 (n_steps of them shared with the
    # march) + cos at nodes 1..n_fine−1
    trans = n_fine + (n_fine - 1)
    return flops, trans


def fd_ensemble_fastsin_flops_per_ic(n_steps: int | None = None,
                                     ref_factor: int | None = None):
    """(flops, 0) for the fast-trig d=1 kernel: the libm transcendentals
    become real polynomial FLOPs (one shared-x² pair ≈
    FAST_SINCOS_PAIR_FMA FMAs per fine node)."""
    fl, tr = fd_ensemble_flops_per_ic(n_steps, ref_factor)
    pairs = tr // 2 + 1
    return fl + pairs * int(2 * FAST_SINCOS_PAIR_FMA), 0


def dg_slab_fastsin_flops_per_solve():
    """(flops, 0) for the fast-trig slab kernel (same pair accounting)."""
    fl, tr = dg_slab_flops_per_solve()
    pairs = tr // 2 + 1
    return fl + pairs * int(2 * FAST_SINCOS_PAIR_FMA), 0


def fd_ensemble_vec_flops_per_ic(n_steps: int | None = None,
                                 ref_factor: int | None = None,
                                 d: int = 2, jac_nnz: int = 2,
                                 rhs_flops: int = 1):
    """(flops, transcendentals) per IC for the d-component fused kernel at
    a LINEAR RHS with ``jac_nnz`` structurally-nonzero Jacobian entries and
    ``rhs_flops`` FLOPs per f() eval (harmonic oscillator: one mul).

    Same static-count discipline as the scalar model (fd_ensemble
    ._vec_kernel): march d FMAs + rhs per step; reverse per fine node:
    d interps (3 FLOP each, interior nodes only), adjoint
    d·(1 mul + 1 FMA) + jac_nnz·(1 mul + 1 FMA), residual
    rhs + d·(1 FMA + 1 sub) + d mul + (d−1) add, block acc 1."""
    cfg = BENCH_CFG["fd_ensemble_vec2"]
    n_steps = cfg["n_steps"] if n_steps is None else n_steps
    rf = cfg["ref_factor"] if ref_factor is None else ref_factor
    n_fine = n_steps * rf
    march = n_steps * (rhs_flops + 2 * d)
    interp = 3 * d * (rf - 1) * n_steps
    adj = (n_fine - 1) * (3 * d + 3 * jac_nnz)
    resid = n_fine * (rhs_flops + 3 * d + d + (d - 1) + 1)
    flops = march + interp + adj + resid + n_steps  # + |blocks|
    return flops, 0


# ---------------------------------------------------------------------------
# advection fwd+adj+estimate pipeline (ops/pallas/dg_rhs.py, stored
# trajectory): 5 LSRK step-equivalents per time step (forward 5 stages +
# transpose 5 stages, minus the stored recompute), each stage per element:
# Np·(Np Dr FMAs + 1 lift FMA) + 2·Np LSRK-carry FMAs + ~2 jump ops.
def advec_pipeline_flops_per_element_step(n_order: int | None = None):
    """FLOPs per (element, time step) for the stored-trajectory pipeline;
    multiply by B·K·n_steps. 5 step-equivalents × 5 stages = 25
    stage-evaluations per time step."""
    np_ = (BENCH_CFG["advec_pipeline"]["n_order"] if n_order is None
           else n_order) + 1
    per_stage = 2 * (np_ * np_ + 3 * np_) + 2
    return 25 * per_stage, 0


# ---------------------------------------------------------------------------
# DG-in-time slab ensemble (ops/pallas/dg_slab.py). The bench rate key
# credits 2 solves per (member, element) — one forward Newton solve + one
# adjoint linear solve — so this model counts ONE ELEMENT's full kernel
# work (5 Newton iterations + the adjoint solve + AWR) and divides by 2.
# (The previous revision charged the whole per-element work to EACH
# credited solve and used Q=8 instead of the operators' real 10/13-point
# rules — a ~2× overcount that made the measured rates look >115% of the
# ceiling; caught by tools/check_claims.py's plausibility gate in round 5.)
#
# Static count of _kernel's unrolled body (mul/add = 1, FMA = 2, div = 1;
# coefficient products like phi·wq·phi are compile-time scalars):
#
# forward Newton, per iteration (np_p=2, nq_p=10):
#   u_q interp       nq_p·(np_p mul + (np_p−1) add)            = 30
#   f/f_u pairs      nq_p sin+cos PAIRS (adjacent emission)    → 10 pairs
#   residual         np_p·(np_p+1 + nq_p+(nq_p−1) + 2) + 1     = 49
#   Jacobian         np_p²·(nq_p + (nq_p−1) + 2)               = 84
#   2×2 Cramer+update det 3 + numerators 6 + 2 div + 2 sub     = 13
# adjoint, per element (np_a=3, nq_a=13):
#   u_q interp       nq_a·(np_p mul + 1 add)                   = 39
#   f/f_u pairs      nq_a pairs                                → 13 pairs
#   u_h interp       np_a·(np_p mul + 1 add)                   = 9
#   A matrix         np_a²·(nq_a + (nq_a−1) + 2)               = 243
#   rhs (g_u = 2u)   np_a·(np_a+2+1) + np_a g_u + 1            = 22
#   3×3 Cramer       ≈ 60
#   AWR              np_a·(np_a+2 + nq_a+(nq_a−1)+2 + 1 + 2)   = 105
def dg_slab_flops_per_solve():
    cfg = BENCH_CFG["dg_slab"]
    np_p, np_a = cfg["np_"], cfg["np_a"]
    it, nq_p, nq_a = cfg["newton_iters"], cfg["nq_p"], cfg["nq_a"]
    per_newton = (
        nq_p * (np_p + np_p - 1)
        + np_p * (np_p + 1 + 2 * nq_p - 1 + 2) + 1
        + np_p * np_p * (2 * nq_p - 1 + 2)
        + 13
    )
    adjoint = (
        nq_a * (np_p + 1)
        + np_a * (np_p + 1)
        + np_a * np_a * (2 * nq_a - 1 + 2)
        + np_a * (np_a + 3) + np_a + 1
        + 60
        + np_a * (np_a + 2 + 2 * nq_a - 1 + 2 + 3)
    )
    flops_per_element = it * per_newton + adjoint
    trans_per_element = it * 2 * nq_p + 2 * nq_a  # sin AND cos per point
    return flops_per_element / 2.0, trans_per_element / 2.0


# ---------------------------------------------------------------------------
# fused per-step training epoch (ops/pallas/train_fused.py,
# ResBlockSimple width F): fwd 3 FMA + relu ≈ 7 FLOP per
# (neuron, member, step); reverse ≈ 2× fwd.
def train_fused_flops_per_epoch():
    cfg = BENCH_CFG["train_fused"]
    return 21 * cfg["width"] * cfg["batch"] * cfg["n_steps"], 0


# ---------------------------------------------------------------------------
# shared-net Dense training (ops/pallas/train_dense_fused.py,
# ResNetBlock [f1, f2]): matmul MACs per epoch-forward =
# B·S·(1·f1 + f1·f2 + f2·1); value_and_grad ≈ 3× fwd (XLA) / 4× fwd
# (the fused kernel recomputes activations in the backward).
def train_dense_matmul_flops_per_epoch(backward_factor: float):
    cfg = BENCH_CFG["train_dense"]
    base = 2 * cfg["batch"] * cfg["n_steps"] * (
        cfg["f1"] + cfg["f1"] * cfg["f2"] + cfg["f2"]
    )
    return backward_factor * base, 0
