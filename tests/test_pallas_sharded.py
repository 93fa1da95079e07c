"""Element-sharded fused Pallas pipeline (ops/pallas/dg_sharded.py): the
blocked-single stored-trajectory kernels composed under shard_map with
ppermute ghost halos, pinned to the single-device kernel (interpret mode on
the virtual 8-device CPU mesh) and to the XLA oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from adjoint_ode_adaptivity_tpu.adjoint.advec import (
    advec_fwd_adj_estimate,
    terminal_integral_cotangent,
)
from adjoint_ode_adaptivity_tpu.march.advec import advec_operators
from adjoint_ode_adaptivity_tpu.ops import startup_1d
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
    make_pallas_fwd_adj_estimate_grid_single_blocked,
)
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_sharded import (
    ghost_width,
    make_pallas_fwd_adj_estimate_sharded_blocked,
)
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_tiled import (
    make_pallas_fwd_adj_estimate_tiled_grid,
)
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_tiled_sharded import (
    make_pallas_fwd_adj_estimate_tiled_grid_sharded,
)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("space",))


def _problem(k=640, n_order=2, dtype=jnp.float32):
    disc = startup_1d(n_order, 0.0, 2 * np.pi, k)
    a = 2 * np.pi
    xmin = float(np.min(np.abs(disc.x[0, :] - disc.x[1, :])))
    dt = 0.5 * (0.75 / a) * xmin
    u0 = jnp.asarray(np.sin(disc.x), dtype)
    lam = terminal_integral_cotangent(disc, dtype)
    return disc, a, dt, u0, lam


class TestGhostWidth:
    def test_covers_and_tiles(self):
        for seg in (1, 2, 8, 32):
            for l_loc in (80, 1250, 10_000):
                w = ghost_width(seg, l_loc)
                assert w >= 10 * seg + 10
                assert (l_loc + 2 * w) % 8 == 0


class TestShardedPipeline:
    @pytest.mark.parametrize("n_dev", [8, 4, 1])
    def test_matches_single_device_kernel(self, n_dev):
        disc, a, dt, u0, lam = _problem()
        seg, n_seg = 2, 4
        run_1 = make_pallas_fwd_adj_estimate_grid_single_blocked(
            disc, a, dt, segment=seg, n_segments=n_seg, interpret=True
        )
        uf1, lam1, eta1 = run_1(u0, jnp.float32(0.0), lam)

        run_s = make_pallas_fwd_adj_estimate_sharded_blocked(
            disc, a, dt, _mesh(n_dev), segment=seg, n_segments=n_seg,
            interpret=True,
        )
        ufs, lams, etas, j = run_s(u0, jnp.float32(0.0), lam)

        np.testing.assert_allclose(
            np.asarray(ufs), np.asarray(uf1), rtol=0, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(lams), np.asarray(lam1), rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(etas), np.asarray(eta1), rtol=0, atol=1e-6
        )
        assert abs(float(j) - float(jnp.sum(lam * uf1))) < 1e-4

    def test_matches_xla_oracle(self):
        # independent check against the XLA estimate pipeline (f32,
        # HIGHEST-precision matmuls)
        disc, a, dt, u0, lam = _problem()
        seg, n_seg = 2, 4
        with jax.default_matmul_precision("float32"):
            ops = advec_operators(disc, a=a, dtype=jnp.float32)
            res = advec_fwd_adj_estimate(
                ops, disc, u0, dt, seg * n_seg, segment=seg, lam_end=lam
            )
        run_s = make_pallas_fwd_adj_estimate_sharded_blocked(
            disc, a, dt, _mesh(8), segment=seg, n_segments=n_seg,
            interpret=True,
        )
        ufs, lams, etas, j = run_s(u0, jnp.float32(0.0), lam)
        np.testing.assert_allclose(
            np.asarray(ufs), np.asarray(res.u_final), rtol=0, atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(etas), np.asarray(res.eta), rtol=0, atol=2e-6
        )
        assert abs(float(j) - float(res.j_value)) < 1e-4

    def test_jit_compiles_whole_pipeline(self):
        disc, a, dt, u0, lam = _problem()
        run_s = make_pallas_fwd_adj_estimate_sharded_blocked(
            disc, a, dt, _mesh(8), segment=2, n_segments=4, interpret=True
        )
        jitted = jax.jit(lambda u: run_s(u, jnp.float32(0.0), lam))
        uf, lam0, eta, j = jitted(u0)
        assert np.all(np.isfinite(np.asarray(uf)))
        assert np.isfinite(float(j))

    def test_validation_errors(self):
        disc, a, dt, u0, lam = _problem(k=640)
        with pytest.raises(ValueError, match="not divisible"):
            make_pallas_fwd_adj_estimate_sharded_blocked(
                disc, a, dt, _mesh(7), segment=2, n_segments=4, interpret=True
            )
        # ghost width larger than the local share
        with pytest.raises(ValueError, match="ghost width"):
            make_pallas_fwd_adj_estimate_sharded_blocked(
                disc, a, dt, _mesh(8), segment=32, n_segments=1, interpret=True
            )


class TestShardedTiledGrid:
    """Element-sharded + HBM-streamed composition (dg_tiled_sharded.py):
    each device streams its local chunks through VMEM with the grid kernels,
    ring ppermutes carry the wrap rows — K beyond one device's memory."""

    @pytest.mark.parametrize("n_dev,chunks", [(8, 2), (4, 4), (1, 16)])
    def test_matches_single_device_tiled_grid(self, n_dev, chunks):
        disc, a, dt, u0, lam = _problem(k=3072)
        seg, n_seg = 1, 3
        run_1 = make_pallas_fwd_adj_estimate_tiled_grid(
            disc, a, dt, segment=seg, n_segments=n_seg, chunks=16,
            interpret=True,
        )
        uf1, lam1, eta1 = run_1(u0, jnp.float32(0.0), lam)
        run_s = make_pallas_fwd_adj_estimate_tiled_grid_sharded(
            disc, a, dt, _mesh(n_dev), segment=seg, n_segments=n_seg,
            chunks=chunks, interpret=True,
        )
        ufs, lams, etas = run_s(u0, jnp.float32(0.0), lam)
        # the per-element instruction streams are identical — the sharded
        # composition is BIT-equal to the single-device kernel here
        assert np.array_equal(np.asarray(ufs), np.asarray(uf1))
        assert np.array_equal(np.asarray(lams), np.asarray(lam1))
        assert np.array_equal(np.asarray(etas), np.asarray(eta1))

    def test_multistep_segments_multi_device(self):
        # segment=2 exercises the W = 10*seg + 10 wrap-row exchange and the
        # stored trajectory's ghost degradation across DEVICE boundaries —
        # the parametrized cases run segment=1, and a 1-device mesh reduces
        # the ppermutes to identities, so neither covers this regime
        disc, a, dt, u0, lam = _problem(k=2048)
        seg, n_seg = 2, 2
        run_1 = make_pallas_fwd_adj_estimate_tiled_grid(
            disc, a, dt, segment=seg, n_segments=n_seg, chunks=8,
            interpret=True,
        )
        uf1, lam1, eta1 = run_1(u0, jnp.float32(0.0), lam)
        run_s = make_pallas_fwd_adj_estimate_tiled_grid_sharded(
            disc, a, dt, _mesh(4), segment=seg, n_segments=n_seg, chunks=2,
            interpret=True,
        )
        ufs, lams, etas = run_s(u0, jnp.float32(0.0), lam)
        assert np.array_equal(np.asarray(ufs), np.asarray(uf1))
        assert np.array_equal(np.asarray(lams), np.asarray(lam1))
        assert np.array_equal(np.asarray(etas), np.asarray(eta1))

    def test_matches_xla_oracle(self):
        disc, a, dt, u0, lam = _problem(k=3072)
        seg, n_seg = 1, 3
        with jax.default_matmul_precision("float32"):
            ops = advec_operators(disc, a=a, dtype=jnp.float32)
            ref = advec_fwd_adj_estimate(
                ops, disc, u0, dt, seg * n_seg, segment=seg, lam_end=lam
            )
        run_s = make_pallas_fwd_adj_estimate_tiled_grid_sharded(
            disc, a, dt, _mesh(8), segment=seg, n_segments=n_seg, chunks=2,
            interpret=True,
        )
        ufs, lams, etas = run_s(u0, jnp.float32(0.0), lam)
        np.testing.assert_allclose(
            np.asarray(ufs), np.asarray(ref.u_final), atol=3e-6
        )
        np.testing.assert_allclose(
            np.asarray(etas), np.asarray(ref.eta), atol=3e-6
        )

    def test_jit_whole_pipeline(self):
        disc, a, dt, u0, lam = _problem(k=3072)
        run_s = make_pallas_fwd_adj_estimate_tiled_grid_sharded(
            disc, a, dt, _mesh(8), segment=1, n_segments=2, chunks=2,
            interpret=True,
        )
        uf, lam0, eta = jax.jit(
            lambda u: run_s(u, jnp.float32(0.0), lam)
        )(u0)
        assert np.all(np.isfinite(np.asarray(eta)))

    def test_validation_errors(self):
        disc, a, dt, u0, lam = _problem(k=3072)
        with pytest.raises(ValueError, match="not divisible"):
            make_pallas_fwd_adj_estimate_tiled_grid_sharded(
                disc, a, dt, _mesh(7), segment=1, n_segments=2, chunks=2,
                interpret=True,
            )
        with pytest.raises(ValueError, match="ghost width"):
            # lm = 3072/8/8/6 = 8 < w = 20
            make_pallas_fwd_adj_estimate_tiled_grid_sharded(
                disc, a, dt, _mesh(8), segment=1, n_segments=2, chunks=6,
                interpret=True,
            )
