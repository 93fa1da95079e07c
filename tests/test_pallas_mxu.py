"""MXU-layout pipeline (ops/pallas/dg_mxu.py) vs the XLA oracle — the
documented negative experiment kept correct (its volume dot hits 25
TFLOP/s in isolation; the full pipeline measures 0.74× the row-tuple
kernel, see the module docstring's roofline accounting)."""
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
from adjoint_ode_adaptivity_tpu.ops.pallas.dg_mxu import (
    make_pallas_fwd_adj_estimate_grid_mxu,
)

A = 2 * np.pi


class TestMxuPipeline:
    @pytest.mark.parametrize(
        "n_order,k_elems,dt", [(7, 24, 5e-5), (2, 64, 2e-4), (3, 48, 2e-4)]
    )
    def test_matches_xla_oracle(self, n_order, k_elems, dt):
        disc = startup_1d(n_order, 0.0, 2 * np.pi, k_elems)
        ops = advec_operators(disc, a=A, dtype=jnp.float32)
        seg, nseg, b = 4, 4, 8
        rng = np.random.default_rng(7)
        u0s = np.stack(
            [np.sin(np.asarray(disc.x) + p) for p in rng.uniform(0, 6, b)],
            axis=1,
        ).astype(np.float32)
        lam = terminal_integral_cotangent(disc, jnp.float32)
        lam_b = jnp.broadcast_to(lam[:, None, :], (disc.np_, b, disc.k))
        run = make_pallas_fwd_adj_estimate_grid_mxu(
            disc, A, dt, segment=seg, n_segments=nseg, batch=b, interpret=True
        )
        uf, lam0, eta = run(jnp.asarray(u0s), jnp.float32(0.0), lam_b)
        assert uf.shape == (disc.np_, b, disc.k)
        assert eta.shape == (b, disc.k)
        for j in range(0, b, 3):
            with jax.default_matmul_precision("float32"):
                ref = advec_fwd_adj_estimate(
                    ops, disc, jnp.asarray(u0s[:, j]), dt, seg * nseg,
                    segment=seg,
                )
            np.testing.assert_allclose(
                np.asarray(uf[:, j]), np.asarray(ref.u_final), rtol=2e-4,
                atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(lam0[:, j]), np.asarray(ref.lam0), rtol=2e-3,
                atol=2e-5,
            )
            np.testing.assert_allclose(
                np.asarray(eta[j]), np.asarray(ref.eta), rtol=5e-3, atol=1e-7
            )

    def test_vmem_guard(self):
        disc = startup_1d(7, 0.0, 2 * np.pi, 10_000)
        with pytest.raises(ValueError, match="reduce `segment`"):
            make_pallas_fwd_adj_estimate_grid_mxu(
                disc, A, 1e-5, segment=8, n_segments=256, batch=8
            )
