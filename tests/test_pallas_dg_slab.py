"""Fused DG-in-time slab ensemble kernel (ops/pallas/dg_slab.py) vs the
XLA batched pipeline: parity, AD-derived f_u default, padding contract,
and the pallas-engine adaptive loop."""
import jax.numpy as jnp
import numpy as np
import pytest

from adjoint_ode_adaptivity_tpu.march.dg_batched import dg_estimate_batched
from adjoint_ode_adaptivity_tpu.march.dg_time import dg_time_operators
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab import (
    make_pallas_dg_estimate_ensemble,
)

F = lambda u, t: jnp.sin(u)  # noqa: E731
F_U = lambda u, t: jnp.cos(u)  # noqa: E731


def _compare(n_order, K, times, y0s, newton_iters=6, f_u=F_U):
    ops_p = dg_time_operators(n_order)
    ops_a = dg_time_operators(n_order + 1)
    run = make_pallas_dg_estimate_ensemble(
        ops_p, ops_a, F, f_u, K, newton_iters=newton_iters, interpret=True
    )
    t32 = jnp.asarray(times, jnp.float32)
    y32 = jnp.asarray(y0s, jnp.float32)
    u, v, err = run(t32, y32)
    u_r, v_r, err_r = dg_estimate_batched(
        ops_p, ops_a, F, t32, y32, newton_iters=newton_iters
    )
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_r), atol=3e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_r), atol=5e-6)
    np.testing.assert_allclose(np.asarray(err), np.asarray(err_r), atol=3e-6)
    return u, v, err


class TestDGSlabKernel:
    @pytest.mark.parametrize("n_order", [1, 2])
    def test_matches_xla_batched(self, n_order):
        K = 12
        times = np.linspace(0.0, 2.0, K + 1)
        y0s = np.random.default_rng(0).uniform(0.5, 2.0, 64)
        _compare(n_order, K, times, y0s)

    def test_ad_derived_f_u_default(self):
        K = 8
        times = np.linspace(0.0, 2.0, K + 1)
        y0s = np.random.default_rng(1).uniform(0.5, 2.0, 32)
        _compare(1, K, times, y0s, f_u=None)

    def test_zero_width_padding_contract(self):
        # padded partitions (zero-width trailing slabs) must be exact
        # identities with exactly zero error — the adaptive loop's contract
        K = 10
        times = np.concatenate(
            [np.linspace(0.0, 2.0, 8), np.full(K + 1 - 8, 2.0)]
        )
        y0s = np.random.default_rng(2).uniform(0.5, 2.0, 32)
        u, v, err = _compare(1, K, times, y0s)
        end = np.asarray(u[:, 6, -1])
        np_p = u.shape[2]
        for kp in range(7, K):
            np.testing.assert_allclose(
                np.asarray(u[:, kp]),
                np.broadcast_to(end[:, None], (len(end), np_p)),
                atol=1e-6,
            )
            np.testing.assert_allclose(np.asarray(err[:, kp]), 0.0, atol=1e-6)

    def test_member_blocked_grid_matches_single_program(self):
        # independent members -> lane-blocked grid (the 100k-IC scale
        # path): 96 members in 3 programs of 32 vs one program
        K = 8
        times = np.linspace(0.0, 2.0, K + 1)
        y0s = np.random.default_rng(4).uniform(0.5, 2.0, 96)
        ops_p, ops_a = dg_time_operators(1), dg_time_operators(2)
        run_blk = make_pallas_dg_estimate_ensemble(
            ops_p, ops_a, F, F_U, K, newton_iters=6, interpret=True,
            block_members=32,
        )
        run_one = make_pallas_dg_estimate_ensemble(
            ops_p, ops_a, F, F_U, K, newton_iters=6, interpret=True,
            block_members=None,
        )
        t32 = jnp.asarray(times, jnp.float32)
        y32 = jnp.asarray(y0s, jnp.float32)
        for a, b in zip(run_blk(t32, y32), run_one(t32, y32)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    @pytest.mark.parametrize("n_dev", [8, 4, 1])
    def test_dp_sharded_matches_unsharded(self, n_dev):
        # members are independent -> ensemble_batched dp composition over
        # the mesh must be bitwise the unsharded kernel per member
        import jax
        from jax.sharding import Mesh

        from adjoint_ode_adaptivity_tpu.parallel.ensemble import (
            ensemble_batched,
        )

        K = 8
        times = jnp.asarray(np.linspace(0.0, 2.0, K + 1), jnp.float32)
        y0s = jnp.asarray(
            np.random.default_rng(5).uniform(0.5, 2.0, 128), jnp.float32
        )
        ops_p, ops_a = dg_time_operators(1), dg_time_operators(2)
        run = make_pallas_dg_estimate_ensemble(
            ops_p, ops_a, F, F_U, K, newton_iters=6, interpret=True
        )
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
        run_dp = ensemble_batched(
            lambda y, t: run(t, y), mesh, axis="data"
        )
        # shard width changes XLA CPU's SIMD packet/tail split in sin/cos
        # (ULP-level), amplified through the Newton iterations: f32 roundoff
        for a, b in zip(run_dp(y0s, times), run(times, y0s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    def test_validation(self):
        ops_p = dg_time_operators(1)
        ops_a = dg_time_operators(2)
        with pytest.raises(ValueError, match="one order above"):
            make_pallas_dg_estimate_ensemble(ops_p, ops_p, F, F_U, 4)
        run = make_pallas_dg_estimate_ensemble(
            ops_p, ops_a, F, F_U, 4, interpret=True
        )
        with pytest.raises(ValueError, match="multiple of 8"):
            run(jnp.linspace(0, 1, 5), jnp.ones(12))
        with pytest.raises(ValueError, match="Np <= 8"):
            make_pallas_dg_estimate_ensemble(
                dg_time_operators(8), dg_time_operators(9), F, F_U, 4
            )

    def test_pick_lane_block(self):
        from adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab import (
            pick_lane_block,
        )

        assert pick_lane_block(512, None, False) == 512
        # interpret mode: any divisor <= cap
        assert pick_lane_block(12, 48, True) == 6
        # hardware: 128-aligned divisor, else the full array
        assert pick_lane_block(1024, 2048, False) == 256
        assert pick_lane_block(100, 256, False) == 100
        for bad in (0, -8, 4, 12):
            with pytest.raises(ValueError, match="positive multiple of 8"):
                pick_lane_block(512, bad, True)

    def test_per_member_times_matches_xla(self):
        # (B, K+1) per-member partitions as (8, B/8) geometry tiles —
        # random interior nodes per member plus a zero-width tail slab
        K, B = 6, 16
        rng = np.random.default_rng(11)
        t_core = np.sort(rng.uniform(0.1, 1.9, (B, K - 2)), axis=1)
        times = np.concatenate(
            [
                np.zeros((B, 1)), t_core,
                np.full((B, 1), 2.0), np.full((B, 1), 2.0),
            ],
            axis=1,
        )
        y0s = rng.uniform(0.5, 2.0, B)
        ops_p, ops_a = dg_time_operators(1), dg_time_operators(2)
        run = make_pallas_dg_estimate_ensemble(
            ops_p, ops_a, F, F_U, K, newton_iters=6, interpret=True
        )
        t32 = jnp.asarray(times, jnp.float32)
        y32 = jnp.asarray(y0s, jnp.float32)
        u, v, err = run(t32, y32)
        u_r, v_r, err_r = dg_estimate_batched(
            ops_p, ops_a, F, t32, y32, newton_iters=6
        )
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_r), atol=5e-6)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_r), atol=5e-6)
        np.testing.assert_allclose(
            np.asarray(err), np.asarray(err_r), atol=5e-6
        )
        # each member's zero-width tail contributes exactly zero
        np.testing.assert_array_equal(np.asarray(err[:, -1]), 0.0)
        with pytest.raises(ValueError, match="per-member times"):
            run(t32[:, :-1], y32)

    @pytest.mark.parametrize("n_order", [4, 6])
    def test_high_order_matches_xla(self, n_order):
        # Np = 5/6 and 7/8: the in-kernel branch-free pivoted-GE solves
        # (Cramer covers Np <= 4) vs the XLA batched oracle
        from adjoint_ode_adaptivity_tpu.march.dg_batched import (
            dg_estimate_batched,
        )

        K = 4
        times = jnp.asarray(np.linspace(0.0, 2.0, K + 1), jnp.float32)
        y0s = jnp.asarray(
            np.random.default_rng(7).uniform(0.5, 2.0, 32), jnp.float32
        )
        ops_p = dg_time_operators(n_order)
        ops_a = dg_time_operators(n_order + 1)
        run = make_pallas_dg_estimate_ensemble(
            ops_p, ops_a, F, F_U, K, newton_iters=6, interpret=True
        )
        u_p, v_p, err_p = run(times, y0s)
        u_x, v_x, err_x = dg_estimate_batched(
            ops_p, ops_a, F, times, y0s, newton_iters=6
        )
        np.testing.assert_allclose(
            np.asarray(u_p), np.asarray(u_x), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(v_p), np.asarray(v_x), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(err_p), np.asarray(err_x), atol=5e-6
        )


class TestAdaptiveLoopPallasEngine:
    def test_matches_xla_engine(self):
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_ensemble,
        )

        y0s = np.random.default_rng(3).uniform(0.5, 2.0, 32).astype(np.float32)
        kw = dict(k0=2, maxit=4, tol=0.0, newton_iters=8)
        h_x = run_adaptive_dg_ensemble(
            F, y0s, (0.0, 2.0), engine="xla", **kw
        )
        h_p = run_adaptive_dg_ensemble(
            F, y0s, (0.0, 2.0), engine="pallas", **kw
        )
        assert len(h_p) == len(h_x)
        for rp, rx in zip(h_p, h_x):
            # same bisection decisions (f32 kernels vs f64/f32 XLA)
            np.testing.assert_allclose(rp.times, rx.times, atol=1e-6)
            np.testing.assert_allclose(
                rp.est_total_mean, rx.est_total_mean, atol=1e-5
            )

    @pytest.mark.parametrize("engine", ["xla", "pallas"])
    def test_mesh_dp_matches_single_device(self, engine):
        # the full ensemble-adaptive loop dp-sharded over the 8-device
        # mesh: same partitions and estimates as the unsharded loop
        import jax
        from jax.sharding import Mesh

        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_ensemble,
        )

        y0s = np.random.default_rng(6).uniform(0.5, 2.0, 64).astype(
            np.float32
        )
        kw = dict(k0=2, maxit=3, tol=0.0, newton_iters=8, engine=engine)
        h_1 = run_adaptive_dg_ensemble(F, y0s, (0.0, 2.0), **kw)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        h_m = run_adaptive_dg_ensemble(F, y0s, (0.0, 2.0), mesh=mesh, **kw)
        assert len(h_m) == len(h_1)
        for rm, r1 in zip(h_m, h_1):
            np.testing.assert_allclose(rm.times, r1.times, atol=1e-6)
            np.testing.assert_allclose(
                rm.est_total_mean, r1.est_total_mean, atol=1e-5
            )


class TestPerMemberLoopPallasEngine:
    def test_matches_xla_engine(self):
        # the fused kernel with per-member geometry tiles must reproduce
        # the XLA engine's per-member refinement decisions exactly
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_per_member,
        )

        y0s = np.random.default_rng(8).uniform(0.5, 2.0, 8).astype(np.float32)
        kw = dict(k0=3, maxit=3, tol=0.0, newton_iters=8)
        h_x = run_adaptive_dg_per_member(F, y0s, (0.0, 2.0), engine="xla", **kw)
        h_p = run_adaptive_dg_per_member(
            F, y0s, (0.0, 2.0), engine="pallas", **kw
        )
        assert len(h_p) == len(h_x)
        for rp, rx in zip(h_p, h_x):
            np.testing.assert_allclose(rp.times, rx.times, atol=1e-6)
            np.testing.assert_array_equal(rp.n_active, rx.n_active)
            np.testing.assert_allclose(rp.est_total, rx.est_total, atol=1e-5)

    def test_device_loop_matches_host_loop(self):
        # the fused while_loop must drive the Pallas kernel identically
        # to the per-iteration host loop (interpret mode on CPU)
        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_per_member,
        )

        y0s = np.random.default_rng(3).uniform(0.5, 2.0, 8).astype(np.float32)
        kw = dict(k0=3, maxit=3, tol=0.0, newton_iters=8, engine="pallas")
        h_host = run_adaptive_dg_per_member(F, y0s, (0.0, 2.0), **kw)
        h_dev = run_adaptive_dg_per_member(
            F, y0s, (0.0, 2.0), device_loop=True, **kw
        )
        assert len(h_dev) == len(h_host)
        for rd, rh in zip(h_dev, h_host):
            np.testing.assert_array_equal(rd.times, rh.times)
            np.testing.assert_array_equal(rd.est_total, rh.est_total)

    def test_mesh_dp_matches_single_device(self):
        # per-member times shard WITH the members (ensemble_batched
        # shard_extras); decisions must match the unsharded loop
        import jax
        from jax.sharding import Mesh

        from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
            run_adaptive_dg_per_member,
        )

        y0s = np.random.default_rng(9).uniform(0.5, 2.0, 64).astype(
            np.float32
        )
        kw = dict(k0=3, maxit=2, tol=0.0, newton_iters=8, engine="pallas")
        h_1 = run_adaptive_dg_per_member(F, y0s, (0.0, 2.0), **kw)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        h_m = run_adaptive_dg_per_member(F, y0s, (0.0, 2.0), mesh=mesh, **kw)
        assert len(h_m) == len(h_1)
        np.testing.assert_allclose(h_m[-1].times, h_1[-1].times, atol=1e-6)
        np.testing.assert_array_equal(h_m[-1].n_active, h_1[-1].n_active)
        # fused device loop under the same dp mesh: identical decisions
        h_f = run_adaptive_dg_per_member(
            F, y0s, (0.0, 2.0), mesh=mesh, device_loop=True, **kw
        )
        assert len(h_f) == len(h_m)
        np.testing.assert_array_equal(h_f[-1].times, h_m[-1].times)
        np.testing.assert_array_equal(h_f[-1].n_active, h_m[-1].n_active)
