"""Element-tiled (HBM-streamed) pipeline vs the VMEM-resident blocked
kernel and the XLA oracle — the K-beyond-VMEM envelope path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adjoint_ode_adaptivity_tpu.adjoint.advec import (
    advec_fwd_adj_estimate,
    terminal_integral_cotangent,
)
from adjoint_ode_adaptivity_tpu.march.advec import advec_operators
from adjoint_ode_adaptivity_tpu.ops import startup_1d
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_rhs import (
    make_pallas_fwd_adj_estimate_grid_single_blocked,
)
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_tiled import (
    make_pallas_fwd_adj_estimate_tiled,
    make_pallas_fwd_adj_estimate_tiled_grid,
)


def _problem(k=640, n_order=2):
    disc = startup_1d(n_order, 0.0, 2 * np.pi, k)
    a = 2 * np.pi
    xmin = float(np.min(np.abs(disc.x[0, :] - disc.x[1, :])))
    dt = 0.5 * (0.75 / a) * xmin
    u0 = jnp.asarray(np.sin(disc.x), jnp.float32)
    lam = terminal_integral_cotangent(disc, jnp.float32)
    return disc, a, dt, u0, lam


class TestTiledPipeline:
    @pytest.mark.parametrize("chunks", [1, 4, 8])
    def test_matches_resident_kernel(self, chunks):
        disc, a, dt, u0, lam = _problem()
        seg, n_seg = 2, 4
        run_res = make_pallas_fwd_adj_estimate_grid_single_blocked(
            disc, a, dt, segment=seg, n_segments=n_seg, interpret=True
        )
        uf_r, lam_r, eta_r = run_res(u0, jnp.float32(0.0), lam)
        run_t = make_pallas_fwd_adj_estimate_tiled(
            disc, a, dt, segment=seg, n_segments=n_seg, chunks=chunks,
            interpret=True,
        )
        uf_t, lam_t, eta_t = run_t(u0, jnp.float32(0.0), lam)
        np.testing.assert_allclose(np.asarray(uf_t), np.asarray(uf_r), atol=1e-6)
        np.testing.assert_allclose(np.asarray(lam_t), np.asarray(lam_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(eta_t), np.asarray(eta_r), atol=1e-6)

    def test_matches_xla_oracle(self):
        disc, a, dt, u0, lam = _problem()
        seg, n_seg = 2, 4
        with jax.default_matmul_precision("float32"):
            ops = advec_operators(disc, a=a, dtype=jnp.float32)
            ref = advec_fwd_adj_estimate(
                ops, disc, u0, dt, seg * n_seg, segment=seg, lam_end=lam
            )
        run_t = make_pallas_fwd_adj_estimate_tiled(
            disc, a, dt, segment=seg, n_segments=n_seg, chunks=8,
            interpret=True,
        )
        uf_t, lam_t, eta_t = run_t(u0, jnp.float32(0.0), lam)
        np.testing.assert_allclose(
            np.asarray(uf_t), np.asarray(ref.u_final), atol=2e-6
        )
        np.testing.assert_allclose(np.asarray(eta_t), np.asarray(ref.eta), atol=2e-6)

    def test_jit_whole_pipeline(self):
        disc, a, dt, u0, lam = _problem()
        run_t = make_pallas_fwd_adj_estimate_tiled(
            disc, a, dt, segment=2, n_segments=2, chunks=4, interpret=True
        )
        uf, lam0, eta = jax.jit(lambda u: run_t(u, jnp.float32(0.0), lam))(u0)
        assert np.all(np.isfinite(np.asarray(eta)))

    def test_validation(self):
        disc, a, dt, u0, lam = _problem()
        with pytest.raises(ValueError, match="not divisible"):
            make_pallas_fwd_adj_estimate_tiled(
                disc, a, dt, chunks=7, interpret=True
            )
        with pytest.raises(ValueError, match="ghost width"):
            make_pallas_fwd_adj_estimate_tiled(
                disc, a, dt, segment=32, chunks=8, interpret=True
            )


class TestTiledGridPipeline:
    """Grid-streamed variant: chunks as a Pallas grid dimension on the lane
    axis of the global blocked layout (rolled ghost fill, plain lane-shift
    kernels)."""

    @pytest.mark.parametrize("chunks", [1, 4, 8])
    def test_matches_resident_kernel(self, chunks):
        disc, a, dt, u0, lam = _problem(k=2048)
        seg, n_seg = 2, 4
        run_res = make_pallas_fwd_adj_estimate_grid_single_blocked(
            disc, a, dt, segment=seg, n_segments=n_seg, interpret=True
        )
        uf_r, lam_r, eta_r = run_res(u0, jnp.float32(0.0), lam)
        run_t = make_pallas_fwd_adj_estimate_tiled_grid(
            disc, a, dt, segment=seg, n_segments=n_seg, chunks=chunks,
            interpret=True,
        )
        uf_t, lam_t, eta_t = run_t(u0, jnp.float32(0.0), lam)
        np.testing.assert_allclose(np.asarray(uf_t), np.asarray(uf_r), atol=2e-6)
        np.testing.assert_allclose(np.asarray(lam_t), np.asarray(lam_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(eta_t), np.asarray(eta_r), atol=2e-6)

    def test_matches_xla_oracle(self):
        disc, a, dt, u0, lam = _problem(k=2048)
        seg, n_seg = 2, 4
        with jax.default_matmul_precision("float32"):
            ops = advec_operators(disc, a=a, dtype=jnp.float32)
            ref = advec_fwd_adj_estimate(
                ops, disc, u0, dt, seg * n_seg, segment=seg, lam_end=lam
            )
        run_t = make_pallas_fwd_adj_estimate_tiled_grid(
            disc, a, dt, segment=seg, n_segments=n_seg, chunks=4,
            interpret=True,
        )
        uf_t, lam_t, eta_t = run_t(u0, jnp.float32(0.0), lam)
        np.testing.assert_allclose(
            np.asarray(uf_t), np.asarray(ref.u_final), atol=3e-6
        )
        np.testing.assert_allclose(np.asarray(eta_t), np.asarray(ref.eta), atol=3e-6)

    def test_validation(self):
        disc, a, dt, u0, lam = _problem(k=2048)
        with pytest.raises(ValueError, match="not divisible"):
            make_pallas_fwd_adj_estimate_tiled_grid(
                disc, a, dt, chunks=7, interpret=True
            )
        with pytest.raises(ValueError, match="ghost width"):
            # Lm = 256/32 = 8 < w = 30
            make_pallas_fwd_adj_estimate_tiled_grid(
                disc, a, dt, segment=2, chunks=32, interpret=True
            )
