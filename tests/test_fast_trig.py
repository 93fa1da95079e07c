"""Bounded-domain polynomial sin/cos (ops/pallas/fast_trig) accuracy and
pipeline parity: the fast pair must agree with the libm path at f32
tolerance through the full fused ensemble estimate."""
import numpy as np
import jax.numpy as jnp

from adjoint_ode_adaptivity_tpu.ops.pallas import fast_trig as ft
from adjoint_ode_adaptivity_tpu.ops.pallas.fd_ensemble import (
    make_pallas_fd_ensemble,
)


def test_accuracy_f64():
    x = np.linspace(-ft.DOMAIN, ft.DOMAIN, 200_001)
    assert np.max(np.abs(ft.fast_sin(x) - np.sin(x))) < 2e-7
    assert np.max(np.abs(ft.fast_cos(x) - np.cos(x))) < 2e-8
    s, c = ft.fast_sincos(x)
    np.testing.assert_array_equal(s, ft.fast_sin(x))
    np.testing.assert_array_equal(c, ft.fast_cos(x))


def test_accuracy_f32():
    # f32 Horner roundoff peaks near |x| = DOMAIN (z = 16 cancellation):
    # ~1.1e-6 ≈ 9 ulps — the same order as the f32 pipelines' own
    # accumulation roundoff
    x = jnp.asarray(np.linspace(-ft.DOMAIN, ft.DOMAIN, 100_001), jnp.float32)
    ref = np.sin(np.asarray(x, np.float64))
    assert np.max(np.abs(np.asarray(ft.fast_sin(x), np.float64) - ref)) < 2e-6
    refc = np.cos(np.asarray(x, np.float64))
    assert np.max(np.abs(np.asarray(ft.fast_cos(x), np.float64) - refc)) < 2e-6


def test_ensemble_kernel_fast_vs_libm():
    n_steps, rf = 16, 4
    dt = 2.0 / n_steps
    n = 20480
    u0 = jnp.asarray(
        np.random.default_rng(3).uniform(-3, 3, n), jnp.float32
    )
    run_libm = make_pallas_fd_ensemble(
        lambda u, t: jnp.sin(u), lambda u, t: jnp.cos(u), n_steps, rf, dt,
        interpret=True,
    )
    run_fast = make_pallas_fd_ensemble(
        lambda u, t: ft.fast_sin(u), lambda u, t: ft.fast_cos(u),
        n_steps, rf, dt, interpret=True,
    )
    got = np.asarray(run_fast(u0))
    want = np.asarray(run_libm(u0))
    # the polynomial error (≤1e-7 per eval) stays at f32-roundoff scale
    # through the march + adjoint + indicator
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=2e-4)
    # the refinement signal (ensemble-mean argmax) is what the adaptive
    # loop consumes — it must agree exactly
    assert int(np.argmax(got.mean(1))) == int(np.argmax(want.mean(1)))
