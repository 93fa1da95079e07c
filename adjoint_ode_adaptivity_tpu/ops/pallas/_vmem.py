"""Scoped-VMEM capacity model for the stored-trajectory reverse kernels —
the ONE place the limit and the measured stack factor live (used by the
dg_rhs/dg_mxu construction guards and the adaptive advection loop's
segment-fallback logic; round 3's 1.1→1.45 recalibration had to touch
three hand-copied formulas, hence this module)."""
from __future__ import annotations

# --xla_tpu_scoped_vmem_limit_kib=49152 (set by ensure_scoped_vmem /
# bench.py / tools/tpu_smoke.py before first device use)
STORED_VMEM_LIMIT_BYTES = 48 * 2**20

# measured Mosaic stack-overhead factor over the raw buffer estimate:
# Np=8, B=8, K=10⁴, segment=2 allocates 36.77 MB against a 25.6 MB raw
# estimate (round-3 Mosaic error message). Recalibrate from the error
# message if the unrolled reverse bodies change.
STORED_VMEM_STACK_FACTOR = 1.45


def stored_vmem_bytes(segment: int, np_: int, b: int, k: int) -> float:
    """Estimated resident scoped-VMEM for the stored-trajectory reverse
    kernel: (double-buffered trajectory block + 6 state-sized buffers) ×
    the measured stack factor. ``k`` is the LANE count of the layout."""
    return 4.0 * (2 * segment + 6) * np_ * b * k * STORED_VMEM_STACK_FACTOR


def stored_vmem_fits(segment: int, np_: int, b: int, k: int) -> bool:
    return stored_vmem_bytes(segment, np_, b, k) <= STORED_VMEM_LIMIT_BYTES
