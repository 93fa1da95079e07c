"""Warm-reuse handles on the hp-adaptive loops (bench.py methodology).

The adaptive loops rebuild their jit closures per call, so a plain second
call cannot hit the first call's compile cache; ``iteration=`` +
``.run_fused``/``.fused_args`` let a caller re-run genuinely warm (the
same contract dg_loop's ensemble/per-member loops already carry).  These
tests pin that the reused paths reproduce the fresh run's history
bit-for-bit.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
    run_adaptive_dg_hp,
    run_adaptive_dg_hp_per_member,
)


def _f(u, t):
    return jnp.sin(u)


KW = dict(k0=3, n0=1, n_max=3, tol=0.0, maxit=4, newton_maxit=40)


def _assert_hp_histories_equal(h1, h2):
    assert len(h1) == len(h2)
    for a, b in zip(h1, h2):
        np.testing.assert_array_equal(a.times, b.times)
        np.testing.assert_array_equal(a.ns, b.ns)
        np.testing.assert_array_equal(a.err, b.err)
        assert a.est_total == b.est_total
        assert a.j_coarse == b.j_coarse


@pytest.mark.parametrize("mode", ["hp", "p"])
def test_hp_iteration_reuse_host(mode):
    h1 = run_adaptive_dg_hp(_f, 1.0, (0.0, 2.0), mode=mode, **KW)
    assert h1.iteration is not None and h1.run_fused is None
    h2 = run_adaptive_dg_hp(
        _f, 1.0, (0.0, 2.0), mode=mode, iteration=h1.iteration, **KW
    )
    _assert_hp_histories_equal(h1, h2)


def test_hp_run_fused_reuse():
    h1 = run_adaptive_dg_hp(
        _f, 1.0, (0.0, 2.0), mode="hp", device_loop=True, **KW
    )
    assert h1.run_fused is not None and h1.fused_args is not None
    # re-invoking the prebuilt fused runner reproduces the run
    t_f, ns_f, bufs, n_done = h1.run_fused(*h1.fused_args)
    assert int(n_done) == len(h1)
    np.testing.assert_array_equal(
        np.asarray(bufs[7])[: len(h1)],
        np.array([r.est_total for r in h1], np.asarray(bufs[7]).dtype),
    )
    # and a fresh device_loop call with the reused iteration matches too
    h2 = run_adaptive_dg_hp(
        _f, 1.0, (0.0, 2.0), mode="hp", device_loop=True,
        iteration=h1.iteration, **KW
    )
    _assert_hp_histories_equal(h1, h2)


def test_hp_per_member_reuse():
    y0s = np.linspace(0.6, 1.8, 4)
    h1 = run_adaptive_dg_hp_per_member(_f, y0s, (0.0, 2.0), mode="hp", **KW)
    assert h1.iteration is not None
    h2 = run_adaptive_dg_hp_per_member(
        _f, y0s, (0.0, 2.0), mode="hp", iteration=h1.iteration, **KW
    )
    assert len(h1) == len(h2)
    for a, b in zip(h1, h2):
        np.testing.assert_array_equal(a.times, b.times)
        np.testing.assert_array_equal(a.ns, b.ns)
        np.testing.assert_array_equal(a.est_total, b.est_total)
        assert a.n_refining == b.n_refining
    # fused runner from a device_loop call reproduces the history buffers
    hf = run_adaptive_dg_hp_per_member(
        _f, y0s, (0.0, 2.0), mode="hp", device_loop=True, **KW
    )
    assert hf.run_fused is not None
    bufs, n_done = hf.run_fused(*hf.fused_args)
    assert int(n_done) == len(hf)
    np.testing.assert_array_equal(
        np.asarray(bufs[3])[: len(hf)],
        np.stack([r.est_total for r in hf]),
    )
