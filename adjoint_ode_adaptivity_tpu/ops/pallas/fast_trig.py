"""Bounded-domain polynomial sin/cos for VPU-bound Pallas kernels.

Mosaic lowers ``jnp.sin``/``jnp.cos`` to generic range-reduced routines
costing ~57 FMA-equivalents each on the v5e (measured,
tools/microroof.py); kernels whose state provably stays in a bounded
interval (the FD-ensemble ODEs: u' = sin u keeps u0 ∈ [−3, 3] inside
[−π−ε, π+ε]) can instead evaluate near-minimax polynomials with a SHARED
x² — ~13 FMAs for the sin+cos pair, a ~3× cut of the transcendental issue
time that dominates those kernels (90% of the d=1 ensemble kernel's time,
tools/ensemble_attrib.py).

Coefficients are Chebyshev-interpolation (near-minimax) fits computed at
import time in float64 and baked as Python floats (Pallas kernels cannot
close over array constants). Accuracy on |x| ≤ DOMAIN: max abs error
≤ ~1e-7 for both (measured in tests/test_fast_trig.py) — the same order
as f32 roundoff and as ``jnp.sin``'s own f32 ulp error, so pipeline
outputs agree with the libm path at f32 tolerance.

NOT a general sin replacement: arguments outside ±DOMAIN diverge
polynomially. The caller owns the domain proof; everything here is
opt-in (the default kernels keep jnp.sin/jnp.cos).
"""
from __future__ import annotations

import numpy as np

__all__ = ["DOMAIN", "fast_sin", "fast_cos", "fast_sincos"]

DOMAIN = 4.0  # |x| bound the fits target (≥ π + slack for the bench ODEs)


def _cheb_fit_even(fn, deg_half: int, n_terms_check=None):
    """Coefficients c_k for Σ c_k z^k, z = x², fitting the EVEN function
    fn on |x| ≤ DOMAIN by Chebyshev interpolation in z ∈ [0, DOMAIN²]."""
    n = deg_half + 1
    # Chebyshev points in z-space
    k = np.arange(n)
    z = (np.cos((2 * k + 1) * np.pi / (2 * n)) + 1) / 2 * DOMAIN**2
    x = np.sqrt(z)
    v = np.vander(z, n, increasing=True)
    return np.linalg.solve(v, fn(x))


# sin(x) = x · S(x²), S even-fit of sin(x)/x (degree 6 in z → x¹³ overall)
_SIN_C = tuple(
    float(c) for c in _cheb_fit_even(
        lambda x: np.where(x == 0, 1.0, np.sin(x) / np.where(x == 0, 1, x)),
        6,
    )
)
# cos(x) = C(x²), degree 7 in z
_COS_C = tuple(float(c) for c in _cheb_fit_even(np.cos, 7))


def _horner(z, coeffs):
    acc = coeffs[-1]
    for c in coeffs[-2::-1]:
        acc = acc * z + c
    return acc


def fast_sin(x):
    """sin(x) for |x| ≤ DOMAIN (~1e-7 abs error, ~7 FMAs)."""
    z = x * x
    return x * _horner(z, _SIN_C)


def fast_cos(x):
    """cos(x) for |x| ≤ DOMAIN (~1e-7 abs error, ~8 FMAs)."""
    return _horner(x * x, _COS_C)


def fast_sincos(x):
    """(sin x, cos x) sharing one x² — the pair the transcendental-bound
    kernels want co-issued (~13 FMAs total)."""
    z = x * x
    return x * _horner(z, _SIN_C), _horner(z, _COS_C)
