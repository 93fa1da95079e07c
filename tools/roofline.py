#!/usr/bin/env python
"""Consolidated MFU/roofline table (BASELINE.md) from BENCH_local.json.

Anchors every hot kernel family against the CHIP, not a wobbling host:
achieved FLOP/s vs the v5e ceilings measured by tools/microroof.py, plus
the HBM traffic of the streaming kernels.

The FLOP models and bench-row shapes come from ONE shared module
(adjoint_ode_adaptivity_tpu/utils/flops.py) that bench.py also builds its
problems from — the accounting cannot silently drift from the benched
configuration (ADVICE r4). Kernels dominated by transcendentals (the FD
ensemble's sin/cos RHS, the DG slab's quadrature sin/cos) get a second,
issue-adjusted column: one sin occupies SIN_FMA_EQUIV FMA slots on this
VPU (measured by microroof), so the naive FMA-FLOP percentage understates
how close such a kernel sits to what the hardware can issue.

Usage: python tools/roofline.py [BENCH_local.json]
Exit code 1 if any row exceeds 115% of its naive ceiling — a physically
impossible rate means the timing methodology broke (e.g. a slope shorter
than the RPC jitter), not that the kernel got faster.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adjoint_ode_adaptivity_tpu.utils import flops as fm

VPU = fm.VPU_F32_TFLOPS * 1e12
MXU = fm.MXU_F32_TFLOPS * 1e12
HBM = fm.HBM_GBPS * 1e9


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_local.json"
    b = json.load(open(path))
    rows = []  # (name, flops/s, trans/s, peak, unit, gbps)

    # ---- advection fwd+adjoint pipeline (resident, batched). Rate source:
    # elapsed_s for n_steps steps of the B×K grid.
    el = b.get("elapsed_s")
    if el:
        cfg = fm.BENCH_CFG["advec_pipeline"]
        per_el_step, _ = fm.advec_pipeline_flops_per_element_step()
        f = cfg["batch"] * cfg["k_elems"] * b["n_steps"] * per_el_step / el
        rows.append(("advec fwd+adj pipeline (K=10⁴, B=8, resident)",
                     f, 0.0, VPU, "VPU", None))

    # same kernel family, K=10⁶ element-tiled HBM-streamed (64 steps):
    # identical FLOP/element; traffic = the stored trajectory written then
    # read back (2 × steps·Np·K·4 B) + per-segment state traffic.
    k1m = b.get("k1m_tiled_dof_steps_per_sec")
    if k1m:
        per_el_step, _ = fm.advec_pipeline_flops_per_element_step()
        el1m = 3 * 1_000_000 * 2 * 64 / k1m  # rate counts dof·(2·steps)
        f = 1_000_000 * 64 * per_el_step / el1m
        gbps = 2 * 64 * 3 * 1_000_000 * 4 / el1m
        rows.append(("advec pipeline (K=10⁶, HBM-streamed)",
                     f, 0.0, VPU, "VPU", gbps))

    # ---- DG-in-time slab ensemble
    dg = b.get("dg_slab_solves_per_sec")
    if dg:
        fl, tr = fm.dg_slab_flops_per_solve()
        rows.append(("DG slab ensemble (B=16k, K=16)",
                     dg * fl, dg * tr, VPU, "VPU", None))

    # ---- fused per-step training epoch
    tr_r = b.get("train_epochs_per_sec_w500_b8192_pallas")
    if tr_r:
        fl, _ = fm.train_fused_flops_per_epoch()
        rows.append(("fused train epoch (F=500, S=10, B=8192)",
                     tr_r * fl, 0.0, VPU, "VPU", None))

    # ---- shared-net Dense training
    cfg_d = fm.BENCH_CFG["train_dense"]
    xs = b.get("train_shared_epochs_per_sec_w100x500_b8192_s100")
    if xs:
        fl, _ = fm.train_dense_matmul_flops_per_epoch(3.0)
        # XLA materializes both activation sheets per step through HBM in
        # fwd AND reverse (+ optimizer/param traffic, not counted)
        gbps = xs * cfg_d["n_steps"] * 4 * (
            cfg_d["batch"] * (cfg_d["f1"] + cfg_d["f2"])) * 4
        rows.append(("shared Dense train, XLA (S=100)",
                     xs * fl, 0.0, MXU, "MXU", gbps))
    ps = b.get("train_shared_epochs_per_sec_w100x500_b8192_s100_pallas")
    if ps:
        fl, _ = fm.train_dense_matmul_flops_per_epoch(4.0)
        gbps = ps * cfg_d["n_steps"] * 2 * cfg_d["batch"] * 4  # scalar traj
        rows.append(("shared Dense train, fused (S=100)",
                     ps * fl, 0.0, MXU, "MXU", gbps))

    # ---- FD ensemble estimate, d=1 (sin-RHS: transcendental-heavy)
    fd = b.get("ensemble_ics_per_sec")
    if fd:
        fl, tr = fm.fd_ensemble_flops_per_ic()
        rows.append(("FD ensemble fwd+adj+err (102k ICs, sin RHS)",
                     fd * fl, fd * tr, VPU, "VPU", None))

    # ---- FD ensemble, d=2 fused (linear RHS — no transcendentals). A
    # LINEAR pipeline: the compiler folds affine chains below the static
    # count, so this row's % is an upper-bound estimate (flops.py caveat)
    fv = b.get("vec2_ensemble_ics_per_sec_pallas")
    if fv:
        fl, tr = fm.fd_ensemble_vec_flops_per_ic()
        rows.append(("FD ensemble d=2 fused (102k ICs; linear — "
                     "upper-bound count)",
                     fv * fl, fv * tr, VPU, "VPU*", None))

    # ---- fast-trig d=1 variant (round 5): polynomial pair in-kernel
    ff = b.get("ensemble_ics_per_sec_fastsin")
    if ff:
        fl, tr = fm.fd_ensemble_flops_per_ic()
        # the pair costs ~FAST_SINCOS_PAIR_FMA real FMAs — count them as
        # actual flops, not as transcendental displacement
        fl_fast = fl + (tr // 2 + 1) * int(2 * fm.FAST_SINCOS_PAIR_FMA)
        rows.append(("FD ensemble fast-trig (102k ICs)",
                     ff * fl_fast, 0.0, VPU, "VPU", None))

    # ---- fast-trig DG slab variant (round 5)
    dgf = b.get("dg_slab_solves_per_sec_fastsin")
    if dgf:
        fl_f, _ = fm.dg_slab_fastsin_flops_per_solve()
        rows.append(("DG slab fast-trig (B=16k, K=16)",
                     dgf * fl_f, 0.0, VPU, "VPU", None))

    print("| Kernel family | achieved TFLOP/s | ceiling | % of ceiling "
          "| pair-issue % | HBM GB/s (of "
          f"{fm.HBM_GBPS:.0f} measured / 819 spec) |")
    print("|---|---|---|---|---|---|")
    bad = []
    for name, f, t, peak, unit, gbps in rows:
        pct = 100 * f / peak
        # transcendental-bound kernels: report the sustained sin/cos PAIR
        # rate (the kernels emit pair-adjacent, round 5) against the best
        # measured pure-pair stream. >100% means the kernel out-issues
        # the standalone microbench — the stream rate is a LOWER BOUND on
        # the hardware's pair-issue ceiling (utils/flops.py note).
        adj = "—"
        if t:
            pairs_gps = t / 2 / 1e9
            adj = (f"{100 * pairs_gps / fm.SINCOS_PAIR_STREAM_GPS:.0f}% "
                   f"({pairs_gps:.1f} G-pairs/s)")
        hbm = ("—" if gbps is None
               else f"{gbps / 1e9:.0f} ({100 * gbps / HBM:.0f}%)")
        print(f"| {name} | {f / 1e12:.2f} | {unit} "
              f"{peak / 1e12:.0f} TF/s | {pct:.0f}% | {adj} | {hbm} |")
        # "VPU*" rows are linear pipelines whose static count the
        # compiler folds — allow the measured folding factor before
        # calling a rate impossible (utils/flops.py caveat)
        limit = 100 * fm.LINEAR_FOLD_ALLOWANCE if unit == "VPU*" else 115
        if pct > limit:
            bad.append((name, pct))
    if bad:
        for name, pct in bad:
            print(f"IMPLAUSIBLE: {name} at {pct:.0f}% of ceiling — "
                  "timing artifact, re-measure", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
