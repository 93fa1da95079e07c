"""Interpret-mode parity for the fused per-member hp (mixed-order) slab
kernel: kernel outputs vs the vmapped XLA member pipeline
(dg_march_mixed coarse/fine + dg_adjoint_march_mixed), f32, per-member
partitions AND order vectors, zero-width padding slabs included.

Real-hardware coverage: tools/tpu_smoke.py config
``dg_slab_hp_per_member`` (interpret mode cannot catch Mosaic/VMEM
regressions — CLAUDE.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adjoint_ode_adaptivity_tpu.adjoint.dg_mixed import (
    dg_adjoint_interp_mixed,
    dg_adjoint_march_mixed,
    dg_element_functional_mixed,
)
from adjoint_ode_adaptivity_tpu.march.dg_mixed import (
    dg_march_mixed,
    dg_time_operators_mixed,
)
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab_mixed import (
    make_pallas_dg_estimate_hp_per_member,
)

F_SIN = lambda u, t: jnp.sin(u)  # noqa: E731
N_MAX_USER = 3
FO = 2
K_EL = 5
B = 16
NEWTON = 8


@pytest.fixture(scope="module")
def mops():
    return dg_time_operators_mixed(N_MAX_USER + FO)


@pytest.fixture(scope="module")
def interp(mops):
    return dg_adjoint_interp_mixed(mops)


def _random_problem(seed=0):
    rng = np.random.default_rng(seed)
    # per-member partitions over [0, 2]: random interior nodes, sorted;
    # the LAST slab of half the members is zero-width (padding contract)
    times = np.zeros((B, K_EL + 1), np.float32)
    ns = np.zeros((B, K_EL), np.int32)
    for m in range(B):
        k_live = K_EL if m % 2 == 0 else K_EL - 1
        interior = np.sort(rng.uniform(0.1, 1.9, k_live - 1))
        t = np.concatenate([[0.0], interior, [2.0]])
        t = np.concatenate([t, np.full(K_EL - k_live, 2.0)])
        times[m] = t
        ns[m, :k_live] = rng.integers(1, N_MAX_USER + 1, k_live)
        ns[m, k_live:] = 1
    y0 = rng.uniform(0.5, 2.0, B).astype(np.float32)
    return jnp.asarray(times), jnp.asarray(ns), jnp.asarray(y0)


def _xla_reference(mops, interp, times, ns, y0):
    def member(t_m, n_m, y_m):
        res_c = dg_march_mixed(
            mops, F_SIN, t_m, n_m, y_m, newton_iters=NEWTON
        )
        res_f = dg_march_mixed(
            mops, F_SIN, t_m, n_m + FO, y_m, newton_iters=NEWTON
        )
        adj = dg_adjoint_march_mixed(
            mops, interp, F_SIN, res_c.u, t_m, n_m, y_m
        )
        return res_c.u, res_f.u, adj.v, adj.err

    return jax.vmap(member)(times, ns, y0)


def test_kernel_matches_xla_member_pipeline(mops, interp):
    times, ns, y0 = _random_problem()
    run = make_pallas_dg_estimate_hp_per_member(
        mops, interp, F_SIN, n_elements=K_EL, n_max_user=N_MAX_USER,
        fine_offset=FO, newton_iters=NEWTON, interpret=True,
    )
    u_c, u_f, v, err = run(times, ns, y0)
    u_c_r, u_f_r, v_r, err_r = _xla_reference(mops, interp, times, ns, y0)
    np.testing.assert_allclose(
        np.asarray(u_c), np.asarray(u_c_r), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(u_f), np.asarray(u_f_r), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(v_r), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(err), np.asarray(err_r), atol=2e-5
    )
    # padding slabs contribute exactly zero error in BOTH paths
    assert np.abs(np.asarray(err)[1::2, -1]).max() < 1e-7


def test_kernel_uniform_orders_match_scalar(mops, interp):
    # all members the same uniform order -> every member equals the
    # single-member XLA solve exactly (same newton count)
    times = jnp.asarray(
        np.broadcast_to(np.linspace(0.0, 2.0, K_EL + 1), (B, K_EL + 1))
        .astype(np.float32).copy()
    )
    ns = jnp.full((B, K_EL), 2, jnp.int32)
    y0 = jnp.full((B,), 1.0, jnp.float32)
    run = make_pallas_dg_estimate_hp_per_member(
        mops, interp, F_SIN, n_elements=K_EL, n_max_user=N_MAX_USER,
        fine_offset=FO, newton_iters=NEWTON, interpret=True,
    )
    u_c, u_f, v, err = run(times, ns, y0)
    t1 = jnp.asarray(np.linspace(0.0, 2.0, K_EL + 1), jnp.float32)
    n1 = jnp.full((K_EL,), 2, jnp.int32)
    res = dg_march_mixed(mops, F_SIN, t1, n1, 1.0, newton_iters=NEWTON)
    adj = dg_adjoint_march_mixed(
        mops, interp, F_SIN, res.u, t1, n1, 1.0
    )
    for m in range(B):
        np.testing.assert_allclose(
            np.asarray(u_c[m]), np.asarray(res.u), atol=2e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(err[m]), np.asarray(adj.err), atol=2e-5
        )
    # functionals computed from kernel outputs match the XLA ones
    j_c = jax.vmap(
        lambda u_m, t_m, n_m: dg_element_functional_mixed(
            mops, u_m, t_m, n_m
        )
    )(u_c, times, ns)
    j_ref = dg_element_functional_mixed(mops, res.u, t1, n1)
    np.testing.assert_allclose(
        np.asarray(j_c), float(j_ref), atol=1e-5, rtol=1e-5
    )


def test_effectivity_identity_through_kernel(mops, interp):
    # Σ err ≈ J(u_coarse) − J(u_fine) — the MAIN.m effectivity telemetry
    # holds for the kernel outputs at per-member mixed orders
    times, ns, y0 = _random_problem(seed=3)
    run = make_pallas_dg_estimate_hp_per_member(
        mops, interp, F_SIN, n_elements=K_EL, n_max_user=N_MAX_USER,
        fine_offset=FO, newton_iters=NEWTON, interpret=True,
    )
    u_c, u_f, v, err = run(times, ns, y0)
    j_c = jax.vmap(
        lambda u_m, t_m, n_m: dg_element_functional_mixed(
            mops, u_m, t_m, n_m
        )
    )(u_c, times, ns)
    j_f = jax.vmap(
        lambda u_m, t_m, n_m: dg_element_functional_mixed(
            mops, u_m, t_m, n_m + FO
        )
    )(u_f, times, ns)
    est = np.asarray(jnp.sum(err, axis=1))
    gap = np.asarray(j_f - j_c)  # est tracks −(JuH−Juh), MAIN.m:64/76
    # the estimate is exact only in the fine solution's error; on these
    # marginally-resolved random partitions the member effectivity sits
    # within ~15% (f32) — check it tracks the gap member-by-member
    assert np.all(np.abs(est - gap) <= 0.3 * np.abs(gap) + 5e-6), (
        est, gap
    )


def test_kernel_reconstruct_matches_xla_pipeline(mops, interp):
    # adjoint_mode="reconstruct": low-order solve at the primal orders +
    # Radau lift + AWR, pinned to the XLA reconstruct pipeline
    # (dg_adjoint_solve_low_mixed → dg_adjoint_reconstruct_mixed →
    # dg_awr_from_adjoint_mixed)
    from adjoint_ode_adaptivity_tpu.adjoint.dg_mixed import (
        dg_adjoint_reconstruct_mixed,
        dg_adjoint_solve_low_mixed,
        dg_awr_from_adjoint_mixed,
        dg_radau_interp_mixed,
    )

    rad = dg_radau_interp_mixed(mops)
    times, ns, y0 = _random_problem(seed=7)
    run = make_pallas_dg_estimate_hp_per_member(
        mops, interp, F_SIN, n_elements=K_EL, n_max_user=N_MAX_USER,
        fine_offset=FO, newton_iters=NEWTON, interpret=True,
        adjoint_mode="reconstruct", rad=rad,
    )
    u_c, u_f, v, err = run(times, ns, y0)

    def member(t_m, n_m, y_m):
        res_c = dg_march_mixed(
            mops, F_SIN, t_m, n_m, y_m, newton_iters=NEWTON
        )
        v_low = dg_adjoint_solve_low_mixed(
            mops, F_SIN, res_c.u, t_m, n_m, y_m
        )
        v_hi = dg_adjoint_reconstruct_mixed(mops, rad, v_low, n_m)
        err_m = dg_awr_from_adjoint_mixed(
            mops, interp, F_SIN, res_c.u, t_m, n_m, y_m, v_hi
        )
        return res_c.u, v_hi, err_m

    u_r, v_r, err_r = jax.vmap(member)(times, ns, y0)
    np.testing.assert_allclose(
        np.asarray(u_c), np.asarray(u_r), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(v_r), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(err), np.asarray(err_r), atol=2e-5
    )
    # padding slabs contribute exactly zero error in BOTH paths
    assert np.abs(np.asarray(err)[1::2, -1]).max() < 1e-7


def test_reconstruct_requires_rad(mops, interp):
    with pytest.raises(ValueError, match="rad"):
        make_pallas_dg_estimate_hp_per_member(
            mops, interp, F_SIN, n_elements=K_EL, n_max_user=N_MAX_USER,
            fine_offset=FO, interpret=True, adjoint_mode="reconstruct",
        )


def test_per_member_loop_reconstruct_engine_parity():
    # the reconstruct-adjoint hp study through the pallas engine pins the
    # XLA engine's decisions (VERDICT r3 next-step #6: reconstruct used
    # to fall back to XLA)
    from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
        run_adaptive_dg_hp_per_member,
    )

    y0s = np.linspace(0.6, 1.8, 8)
    kw = dict(k0=3, n0=1, n_max=3, mode="hp", tol=0.0, maxit=4,
              newton_iters=8, adjoint_mode="reconstruct")
    hx = run_adaptive_dg_hp_per_member(F_SIN, y0s, (0.0, 2.0), **kw)
    hp_ = run_adaptive_dg_hp_per_member(
        F_SIN, y0s, (0.0, 2.0), engine="pallas", **kw
    )
    assert len(hx) == len(hp_)
    for a, b in zip(hx, hp_):
        np.testing.assert_array_equal(a.ns, b.ns)
        np.testing.assert_array_equal(a.times, b.times)
        np.testing.assert_allclose(a.est_total, b.est_total, atol=5e-5)
    # device_loop composes (bit-identical history to the host pallas loop)
    hd = run_adaptive_dg_hp_per_member(
        F_SIN, y0s, (0.0, 2.0), engine="pallas", device_loop=True, **kw
    )
    assert len(hd) == len(hp_)
    for a, b in zip(hp_, hd):
        np.testing.assert_array_equal(a.times, b.times)
        np.testing.assert_array_equal(a.ns, b.ns)
        np.testing.assert_array_equal(a.est_total, b.est_total)


def test_per_member_loop_engine_parity():
    # the adaptive loop's decisions (orders, partitions) are pinned EQUAL
    # across engines; estimates agree at f32 roundoff
    from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
        run_adaptive_dg_hp_per_member,
    )

    y0s = np.linspace(0.6, 1.8, 8)
    kw = dict(k0=3, n0=1, n_max=3, mode="hp", tol=0.0, maxit=4,
              newton_iters=8)
    hx = run_adaptive_dg_hp_per_member(F_SIN, y0s, (0.0, 2.0), **kw)
    hp_ = run_adaptive_dg_hp_per_member(
        F_SIN, y0s, (0.0, 2.0), engine="pallas", **kw
    )
    assert len(hx) == len(hp_)
    for a, b in zip(hx, hp_):
        np.testing.assert_array_equal(a.ns, b.ns)
        np.testing.assert_array_equal(a.times, b.times)
        np.testing.assert_allclose(a.est_total, b.est_total, atol=5e-5)
        np.testing.assert_array_equal(a.n_active, b.n_active)
        assert a.n_refining == b.n_refining
    # device_loop composes with the pallas engine (bit-identical history)
    hd = run_adaptive_dg_hp_per_member(
        F_SIN, y0s, (0.0, 2.0), engine="pallas", device_loop=True, **kw
    )
    assert len(hd) == len(hp_)
    for a, b in zip(hp_, hd):
        np.testing.assert_array_equal(a.times, b.times)
        np.testing.assert_array_equal(a.ns, b.ns)
        np.testing.assert_array_equal(a.est_total, b.est_total)


def test_ensemble_signal_loop_engine_parity():
    # the SHARED-partition ensemble-signal hp loop: pallas engine
    # broadcasts the partition/orders over the members into the same
    # fused kernel; decisions pinned equal to the XLA engine
    from adjoint_ode_adaptivity_tpu.adapt.hp_loop import run_adaptive_dg_hp

    y0s = np.linspace(0.6, 1.8, 8)
    kw = dict(k0=3, n0=1, n_max=3, mode="hp", tol=0.0, maxit=3,
              newton_iters=8)
    hx = run_adaptive_dg_hp(F_SIN, y0s, (0.0, 2.0), **kw)
    hp_ = run_adaptive_dg_hp(F_SIN, y0s, (0.0, 2.0), engine="pallas", **kw)
    assert len(hx) == len(hp_)
    for a, b in zip(hx, hp_):
        np.testing.assert_array_equal(a.ns, b.ns)
        np.testing.assert_allclose(a.times, b.times, atol=1e-6)
        np.testing.assert_allclose(a.est_total, b.est_total, atol=5e-5)
    # device_loop composes (bit-identical history to the host pallas loop)
    hd = run_adaptive_dg_hp(
        F_SIN, y0s, (0.0, 2.0), engine="pallas", device_loop=True, **kw
    )
    assert len(hd) == len(hp_)
    for a, b in zip(hp_, hd):
        np.testing.assert_array_equal(a.ns, b.ns)
        np.testing.assert_array_equal(a.est_total, b.est_total)


def test_per_member_loop_pallas_dp_mesh():
    # pallas engine under a dp mesh: per-member decisions equal 1-device
    from jax.sharding import Mesh

    from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
        run_adaptive_dg_hp_per_member,
    )

    if jax.device_count() < 2:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    # 2-device mesh: the kernel needs 8 members per SHARD (sublane tiles)
    y0s = np.linspace(0.6, 1.8, 16)
    kw = dict(k0=3, n0=1, n_max=3, mode="hp", tol=0.0, maxit=3,
              newton_iters=8, engine="pallas")
    ref = run_adaptive_dg_hp_per_member(F_SIN, y0s, (0.0, 2.0), **kw)
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    dp = run_adaptive_dg_hp_per_member(
        F_SIN, y0s, (0.0, 2.0), mesh=mesh, **kw
    )
    assert len(ref) == len(dp)
    for a, b in zip(ref, dp):
        np.testing.assert_array_equal(a.ns, b.ns)
        np.testing.assert_array_equal(a.times, b.times)
        np.testing.assert_allclose(a.est_total, b.est_total, atol=1e-6)
