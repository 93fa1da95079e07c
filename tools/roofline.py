#!/usr/bin/env python
"""Consolidated MFU/roofline table (BASELINE.md) from BENCH_local.json.

Anchors every hot kernel family against the CHIP, not a wobbling host:
achieved FLOP/s vs the v5e ceilings measured by tools/microroof.py
(VPU f32 4.27 TFLOP/s, MXU default-precision ~190 TFLOP/s ≈ the 197
bf16 spec, HBM stream 652 GB/s practical of the 819 spec), plus the HBM
traffic of the streaming kernels. FLOP counts are ANALYTIC — the
formula for each family is right here in the source so the accounting
is auditable; they count the executed algorithm (e.g. the stored-
trajectory pipeline's 5 LSRK step-equivalents per time step, the fused
trainer's backward recompute), not a nominal minimum.

Usage: python tools/roofline.py [BENCH_local.json]
"""
from __future__ import annotations

import json
import sys

VPU = 4.27e12  # measured: tools/microroof.py FMA-stream sweep
MXU = 1.90e14  # measured: 4096^3 dot at default (single-pass bf16) precision
HBM = 652e9  # measured: barriered 1 GiB read+write stream


def fmt(x, unit="T"):
    if x is None:
        return "—"
    return f"{x / 1e12:.2f}" if unit == "T" else f"{x / 1e9:.0f}"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_local.json"
    b = json.load(open(path))
    rows = []

    # ---- advection fwd+adjoint pipeline (resident, batched B=8, Np=3,
    # K=1e4, 2048 steps). Work: 5 LSRK step-equivalents per time step
    # (stored-trajectory reverse), 5 stages each; per element-stage:
    # Np·(Np Dr FMAs + 1 lift FMA) + 2·Np LSRK-carry FMAs + ~2 jump ops
    # = 2·(Np² + 3·Np) + 2 FLOP = 38 at Np=3.
    el = b.get("elapsed_s")
    if el:
        flops = 8 * 10_000 * b["n_steps"] * 25 * 38 / el
        rows.append(("advec fwd+adj pipeline (K=10⁴, B=8, resident)",
                     flops, VPU, "VPU", None))

    # same kernel family, K=10⁶ element-tiled HBM-streamed (64 steps):
    # identical FLOP/element; traffic = the stored trajectory written
    # then read back (2 × steps·Np·K·4 B) + per-segment state traffic.
    k1m = b.get("k1m_tiled_dof_steps_per_sec")
    if k1m:
        # rate counts dof·(2·steps); elapsed = dof·2·steps / rate
        el1m = 3 * 1_000_000 * 2 * 64 / k1m
        flops = 1_000_000 * 64 * 25 * 38 / el1m
        gbps = 2 * 64 * 3 * 1_000_000 * 4 / el1m
        rows.append(("advec pipeline (K=10⁶, HBM-streamed)",
                     flops, VPU, "VPU", gbps))

    # ---- DG-in-time slab ensemble (Np=2, 5 Newton its, f32).
    # slab-solves/s counts coarse+fine+adjoint per (member, element) as
    # 1 "solve" triple... the bench counts 2·B·K slabs per launch
    # (coarse+fine) with the adjoint+AWR riding along. Per coarse/fine
    # slab: 5 Newton × (residual 2·Np² + quad 2·Q·Np·3 + Jacobian
    # 2·Q·Np² + Cramer ~14) with Q=8 ⇒ ~5×(8+96+64+14)=910; adjoint
    # ≈ one extra Newton-like solve + AWR ≈ 250. ~1060 FLOP per counted
    # slab-solve.
    dg = b.get("dg_slab_solves_per_sec")
    if dg:
        rows.append(("DG slab ensemble (B=16k, K=16)",
                     dg * 1060, VPU, "VPU", None))

    # ---- fused per-step training epoch (ResBlockSimple F=500, S=10,
    # B=8192): fwd 3 FMA + relu per (neuron, member, step) ≈ 7 FLOP;
    # reverse ≈ 2× fwd ⇒ 21 FLOP per neuron-member-step.
    tr = b.get("train_epochs_per_sec_w500_b8192_pallas")
    if tr:
        rows.append(("fused train epoch (F=500, S=10, B=8192)",
                     tr * 21 * 500 * 8192 * 10, VPU, "VPU", None))

    # ---- shared-net Dense training (ResNetBlock (100,500), S=100,
    # B=8192): matmul MACs = B·S·(1·100 + 100·500 + 500·1);
    # value_and_grad ≈ 3× fwd (XLA) / 4× fwd (fused kernel recomputes).
    base = 2 * 8192 * 100 * (100 + 50_000 + 500)
    xs = b.get("train_shared_epochs_per_sec_w100x500_b8192_s100")
    if xs:
        # XLA materializes both activation sheets per step through HBM
        # in fwd AND reverse (+ optimizer/param traffic, not counted)
        gbps = xs * 100 * 4 * (8192 * 100 + 8192 * 500) * 4
        rows.append(("shared Dense train, XLA (S=100)",
                     xs * 3 * base, MXU, "MXU", gbps))
    ps = b.get("train_shared_epochs_per_sec_w100x500_b8192_s100_pallas")
    if ps:
        gbps = ps * 100 * 2 * 8192 * 4  # scalar trajectory only
        rows.append(("shared Dense train, fused (S=100)",
                     ps * 4 * base, MXU, "MXU", gbps))

    # ---- FD ensemble estimate (102,400 ICs, 16 coarse + 64 fine steps,
    # fwd+adjoint+residual ≈ 3 passes over the fine grid, ~8 FLOP per
    # node pass for the scalar RHS chain)
    fd = b.get("ensemble_ics_per_sec")
    if fd:
        rows.append(("FD ensemble fwd+adj+err (102k ICs)",
                     fd * (16 + 3 * 64) * 8, VPU, "VPU", None))

    # ---- vector-state (d=2) fused ensemble, harmonic oscillator at
    # n_steps=16/rf=4: ~5 FLOP/coarse step (companion-form f + 2-comp
    # Euler update) + ~32 FLOP/fine node in the reverse sweep (two 2-comp
    # interps, transposed-Jacobian adjoint update with the 2 nonzero
    # entries, 2-comp residual, r·v contraction) ≈ 2130 FLOP/IC
    fv = b.get("vec2_ensemble_ics_per_sec_pallas")
    if fv:
        rows.append(("FD ensemble d=2 fused (102k ICs)",
                     fv * (16 * 5 + 64 * 32), VPU, "VPU", None))

    print("| Kernel family | achieved TFLOP/s | ceiling | % of ceiling "
          "| HBM GB/s (of 652 measured / 819 spec) |")
    print("|---|---|---|---|---|")
    for name, flops, peak, unit, gbps in rows:
        pct = 100 * flops / peak
        hbm = "—" if gbps is None else f"{gbps / 1e9:.0f} ({100 * gbps / HBM:.0f}%)"
        print(f"| {name} | {flops / 1e12:.2f} | {unit} "
              f"{peak / 1e12:.0f} TF/s | {pct:.0f}% | {hbm} |")


if __name__ == "__main__":
    main()
