#!/usr/bin/env python
"""Process-isolated full-suite test runner.

The XLA CPU compiler deterministically segfaults once ~240 compiled
executables accumulate in one process (large nested-scan /
interpret-pallas programs late in the suite). Instead of papering over
it in-process with ``jax.clear_caches()`` at every module boundary
(round 2/3's workaround — fragile, and it taxes every run with
recompiles), this runner batches the test modules into fresh pytest
processes so no process ever approaches the limit, and a crash in one
batch is reported as that batch's failure instead of killing the whole
suite.

Usage:
    python tools/run_tests.py                  # whole suite, batches of 4
    python tools/run_tests.py --quick          # ~5-min critical-path gate
    python tools/run_tests.py --batch-size 6
    python tools/run_tests.py --fail-fast      # stop at first bad batch
    python tools/run_tests.py -- -k pallas -q  # extra pytest args

Exit code: 0 iff every batch exited 0.
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Modules that compile disproportionately many executables (nested-scan
# adaptive loops, interpret-mode pallas pipelines) run in their own
# process so the batch they'd land in stays far from the limit.
HEAVY = {
    "test_device_loop.py",
    "test_drivers.py",
    "test_hp_smooth.py",
    "test_parallel.py",
}

# --quick: a curated critical-path subset — one module per subsystem
# (L0 operators, FD march+adjoint, DG-in-time Newton slabs, one Pallas
# interpret module, the training loop, one adaptive loop) — for in-round
# iteration; the full batched suite stays the round-end gate. Chosen to
# finish in ~5 min on the 1-core host (pytest fixed cost is ~30-60 s per
# process, so the subset runs as ONE process).
QUICK = [
    "test_ops.py",          # L0 spectral primitives vs closed forms
    "test_fd_adjoint.py",   # L1/L2 FD march + discrete adjoint + estimate
    "test_dg_time.py",      # DG-in-time Newton slab + IFT adjoint
    "test_pallas_dg_slab.py",  # one interpret-mode Pallas family
    "test_models_train.py",    # models + train step parity
    "test_revolve_vjp.py",  # checkpointed custom_vjp path
]


def plan_batches(files: list[Path], batch_size: int) -> list[list[Path]]:
    heavy = [f for f in files if f.name in HEAVY]
    light = [f for f in files if f.name not in HEAVY]
    batches = [[f] for f in heavy]
    for i in range(0, len(light), batch_size):
        batches.append(light[i : i + batch_size])
    return batches


def main(argv: list[str] | None = None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    extra: list[str] = []
    if "--" in args:
        cut = args.index("--")
        args, extra = args[:cut], args[cut + 1 :]
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch-size", type=int, default=4,
                    help="modules per pytest process (default 4)")
    ap.add_argument("--fail-fast", action="store_true",
                    help="stop at the first failing batch")
    ap.add_argument("--list", action="store_true",
                    help="print the batch plan and exit")
    ap.add_argument("--quick", action="store_true",
                    help="critical-path subset (~5 min) as one process")
    ns = ap.parse_args(args)

    if ns.quick:
        files = [REPO / "tests" / n for n in QUICK]
        missing = [f.name for f in files if not f.exists()]
        if missing:
            print(f"quick-gate modules missing: {missing}", file=sys.stderr)
            return 2
        batches = [files]  # one process: far below the ~240-executable limit
    else:
        files = sorted((REPO / "tests").glob("test_*.py"))
        batches = plan_batches(files, ns.batch_size)
    if ns.list:
        for i, b in enumerate(batches):
            print(f"batch {i}: {' '.join(f.name for f in b)}")
        return 0

    t0 = time.time()
    failed: list[tuple[int, list[Path], int]] = []
    for i, batch in enumerate(batches):
        names = " ".join(f.name for f in batch)
        print(f"\n=== batch {i + 1}/{len(batches)}: {names}", flush=True)
        cmd = [sys.executable, "-m", "pytest", *map(str, batch), "-q",
               *(extra or [])]
        rc = subprocess.call(cmd, cwd=REPO)
        # rc 5 = "no tests collected" — normal for a batch whose modules
        # are fully deselected by a passthrough -k/-m filter, not a failure
        if rc not in (0, 5):
            failed.append((i, batch, rc))
            if ns.fail_fast:
                break
    dt = time.time() - t0
    print(f"\n{'=' * 60}")
    if failed:
        for i, batch, rc in failed:
            print(f"FAILED batch {i}: rc={rc}  "
                  f"({' '.join(f.name for f in batch)})")
        print(f"{len(failed)}/{len(batches)} batches failed in {dt:.0f}s")
        return 1
    print(f"all {len(batches)} batches green in {dt:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
