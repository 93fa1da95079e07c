#!/usr/bin/env python
"""Fail if captured bench artifacts drift from the published claims.

VERDICT r4 #7: BENCH_r04's `dg_adaptive_fused_vs_baseline` (2768) fell
just outside BASELINE.md's quoted band (2790–3070), and two other r04
values sat outside their published ranges (`dg_slab_solves_per_sec`
1.05e9 vs "1.1–1.4e9", `k1m_tiled_dof_steps_per_sec` 1.724e10 vs
"1.73–1.80e10") — single-session bands were too tight for multi-run
dispatch jitter. This checker is the fix:

- ``CLAIMS`` is the canonical registry of every numeric range BASELINE.md
  quotes for a bench key. BASELINE.md's prose quotes THESE bands; editing
  one without the other is exactly the drift this tool exists to catch,
  so any band change must touch both files in the same commit.
- Each bench value must fall inside its band; bands carry ≥ ±10% margin
  around the multi-run observations so ordinary run-to-run jitter cannot
  produce a false alarm (a genuine regression still lands far outside).
- Physical plausibility: for every rate key with an analytic FLOP model
  (utils/flops.py), achieved FLOP/s must not exceed 115% of the measured
  chip ceiling. A "rate" above the roofline is a broken measurement (a
  chained slope shorter than the RPC jitter), never a fast kernel —
  BENCH_r04's vec2_ensemble_ics_per_sec_pallas = 2.0e10 (≈10× the VPU)
  is the motivating artifact.

Usage: python tools/check_claims.py [BENCH_local.json ...]
Checks every file given (default BENCH_local.json); exit 0 iff all pass.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adjoint_ode_adaptivity_tpu.utils import flops as fm

# key -> (lo, hi): the published bands BASELINE.md quotes.
CLAIMS = {
    # headline: fwd+adjoint DoF-steps/s, K=10k/N=2 batched stored pipeline
    "value": (2.4e10, 3.1e10),
    # single-state blocked layout (round-5 runs measured up to 2.85e10
    # on a quiet chip — band widened upward, BASELINE.md round-5 note)
    "dof_steps_per_sec_single_state": (1.9e10, 3.1e10),
    # effectivity identity (north-star: ≤ 1e-10)
    "effectivity_rel_error_f64": (0.0, 1e-10),
    # FD ensemble refinement signal, fused kernel (libm sin/cos; measured
    # 4.9-5.5e8 across sessions)
    "ensemble_ics_per_sec": (3.5e8, 1.3e9),
    # fast-trig (polynomial pair) variant: the ceiling-bound maximum at
    # the ~2554-FLOP/IC model is ~2.2e9 (an early 3.6e9 attribution draw
    # was a short-chain artifact, like the row this band replaced)
    "ensemble_ics_per_sec_fastsin": (1.2e9, 2.6e9),
    # d=2 fused kernel: 2.2e9 (contended) - 3.1e9 (clean) measured
    "vec2_ensemble_ics_per_sec_pallas": (1.6e9, 4.0e9),
    # DG slab ensemble, fused kernel (B=16,384)
    "dg_slab_solves_per_sec": (0.95e9, 1.5e9),
    # fast-trig slab variant: ceiling-bound max at the corrected
    # 1511-FLOP/solve count is ~3.9e9 (5.86 TF/s FMA ceiling)
    "dg_slab_solves_per_sec_fastsin": (2.2e9, 4.0e9),
    # 100k-member slab ensemble retains the rate
    "dg_slab_100k_solves_per_sec": (0.95e9, 1.5e9),
    # ensemble-mean DG adaptive study, fused dispatch, vs pinned baseline
    "dg_adaptive_fused_vs_baseline": (2.4e3, 3.4e3),
    # per-member DG adaptive study vs pinned baseline
    "dg_adaptive_pm_vs_baseline": (0.95e4, 1.4e4),
    # hp strand vs the fem_setup-faithful order-matched baseline (B=512);
    # round-5 capture measured 8717 on a quiet chip — upper edge widened
    # from 8.6e3 (observed range across rounds: 7530-8717)
    "hp_adaptive_pm_pallas_vs_faithful_baseline": (6.5e3, 9.6e3),
    "hp_adaptive_pm_pallas4k_vs_faithful_baseline": (1.25e4, 1.7e4),
    # fused per-step training epochs/s (F=500, B=8192); the grouped
    # chunk loop (round 5) lifted 2131 → ~4400-4500 (ceiling-bound max
    # at the 860 MFLOP/epoch count is ~7800)
    "train_epochs_per_sec_w500_b8192_pallas": (3.2e3, 5.6e3),
    # shared-net Dense strand, fused epoch kernel (S=100)
    "train_shared_epochs_per_sec_w100x500_b8192_s100_pallas": (230.0, 300.0),
    # K=10⁶ grid-streamed tiled pipeline
    "k1m_tiled_dof_steps_per_sec": (1.55e10, 2.0e10),
}

# rate key -> (flops-per-unit model, ceiling TFLOP/s, allowance):
# plausibility gates. Allowance > 1.15 only for LINEAR pipelines, whose
# static-source counts the compiler folds (utils/flops.py caveat).
PLAUSIBILITY = {
    "ensemble_ics_per_sec": (
        lambda: fm.fd_ensemble_flops_per_ic()[0], fm.VPU_F32_TFLOPS, 1.15),
    "vec2_ensemble_ics_per_sec_pallas": (
        lambda: fm.fd_ensemble_vec_flops_per_ic()[0], fm.VPU_F32_TFLOPS,
        fm.LINEAR_FOLD_ALLOWANCE),
    "dg_slab_solves_per_sec": (
        lambda: fm.dg_slab_flops_per_solve()[0], fm.VPU_F32_TFLOPS, 1.15),
    "ensemble_ics_per_sec_fastsin": (
        lambda: fm.fd_ensemble_fastsin_flops_per_ic()[0],
        fm.VPU_F32_TFLOPS, 1.15),
    "dg_slab_solves_per_sec_fastsin": (
        lambda: fm.dg_slab_fastsin_flops_per_solve()[0],
        fm.VPU_F32_TFLOPS, 1.15),
    "train_epochs_per_sec_w500_b8192_pallas": (
        lambda: fm.train_fused_flops_per_epoch()[0], fm.VPU_F32_TFLOPS,
        1.15),
    "train_shared_epochs_per_sec_w100x500_b8192_s100_pallas": (
        lambda: fm.train_dense_matmul_flops_per_epoch(4.0)[0],
        fm.MXU_F32_TFLOPS, 1.15),
}


def check(path: str) -> list[str]:
    b = json.load(open(path))
    # driver round artifacts (BENCH_r{N}.json) wrap the compact JSON line
    # under "parsed" — that line carries only a key subset, so absent keys
    # are not drift there; the full BENCH_local.json must have every key.
    missing_ok = False
    if isinstance(b.get("parsed"), dict):
        b = b["parsed"]
        missing_ok = True
    errors = []
    for key, (lo, hi) in CLAIMS.items():
        v = b.get(key)
        if v is None:
            if not missing_ok:
                errors.append(f"{path}: MISSING key {key} (published claim)")
            continue
        if not (lo <= v <= hi):
            errors.append(
                f"{path}: {key} = {v:.4g} outside published band "
                f"[{lo:.4g}, {hi:.4g}] — update BASELINE.md AND this "
                "table together, or fix the regression")
    for key, (model, ceil_tf, allow) in PLAUSIBILITY.items():
        v = b.get(key)
        if v is None:
            continue
        achieved = v * model()
        if achieved > allow * ceil_tf * 1e12:
            errors.append(
                f"{path}: {key} = {v:.4g} implies {achieved / 1e12:.1f} "
                f"TFLOP/s > {allow}x ceiling {ceil_tf} — timing artifact, "
                "re-measure with a longer chain")
    return errors


def main() -> int:
    paths = sys.argv[1:] or ["BENCH_local.json"]
    errors = []
    for p in paths:
        errors += check(p)
    for e in errors:
        print(e, file=sys.stderr)
    if not errors:
        print(f"claims check green ({len(paths)} artifact(s), "
              f"{len(CLAIMS)} bands, {len(PLAUSIBILITY)} plausibility gates)")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
