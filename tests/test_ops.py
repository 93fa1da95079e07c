"""Unit tests for the L0 spectral-element primitives.

The reference has no test suite; these convert its ad-hoc verification
mechanisms (closed-form oracles, operator identities) into regression tests.
"""
import numpy as np
import pytest

from adjoint_ode_adaptivity_tpu import ops


class TestJacobi:
    def test_legendre_low_orders_closed_form(self):
        # Orthonormal Legendre: P0 = 1/sqrt(2), P1 = sqrt(3/2) x,
        # P2 = sqrt(5/2) (3x^2-1)/2
        x = np.linspace(-1, 1, 7)
        np.testing.assert_allclose(ops.jacobi_p(x, 0, 0, 0), np.full_like(x, 1 / np.sqrt(2)))
        np.testing.assert_allclose(ops.jacobi_p(x, 0, 0, 1), np.sqrt(1.5) * x)
        np.testing.assert_allclose(
            ops.jacobi_p(x, 0, 0, 2), np.sqrt(2.5) * 0.5 * (3 * x**2 - 1), atol=1e-14
        )

    def test_orthonormality_via_quadrature(self):
        xq, wq = ops.jacobi_gq(0.0, 0.0, 12)
        for m in range(6):
            for n in range(6):
                val = np.sum(wq * ops.jacobi_p(xq, 0, 0, m) * ops.jacobi_p(xq, 0, 0, n))
                np.testing.assert_allclose(val, 1.0 if m == n else 0.0, atol=1e-13)

    def test_grad_jacobi_matches_fd(self):
        x = np.linspace(-0.9, 0.9, 11)
        h = 1e-6
        for n in range(5):
            fd = (ops.jacobi_p(x + h, 0, 0, n) - ops.jacobi_p(x - h, 0, 0, n)) / (2 * h)
            np.testing.assert_allclose(ops.grad_jacobi_p(x, 0, 0, n), fd, atol=1e-8)

    def test_gauss_quadrature_polynomial_exactness(self):
        # N+1 point Gauss integrates degree 2N+1 exactly
        for n in range(1, 6):
            x, w = ops.jacobi_gq(0.0, 0.0, n)
            for deg in range(2 * n + 2):
                exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
                np.testing.assert_allclose(np.sum(w * x**deg), exact, atol=1e-13)

    def test_gauss_lobatto_endpoints_and_symmetry(self):
        for n in range(1, 8):
            x = ops.jacobi_gl(0.0, 0.0, n)
            assert x[0] == -1.0 and x[-1] == 1.0
            np.testing.assert_allclose(x, -x[::-1], atol=1e-14)
            assert np.all(np.diff(x) > 0)

    def test_radau_points_match_reference_table(self):
        # Globals1D.m:36-42 hard-codes these
        np.testing.assert_allclose(ops.radau_points(1), [-1.0])
        np.testing.assert_allclose(ops.radau_points(2), [-1.0, 1 / 3], atol=1e-14)
        np.testing.assert_allclose(
            ops.radau_points(3), [-1.0, (1 - np.sqrt(6)) / 5, (1 + np.sqrt(6)) / 5], atol=1e-14
        )
        np.testing.assert_allclose(
            ops.radau_points(4), [-1.0, -0.575319, 0.181066, 0.822824], atol=1e-6
        )
        np.testing.assert_allclose(
            ops.radau_points(5), [-1.0, -0.72048, -0.167181, 0.446314, 0.885792], atol=1e-6
        )


class TestOperators:
    @pytest.mark.parametrize("n", [1, 2, 4, 7])
    def test_differentiation_matrix_exact_on_polynomials(self, n):
        r = ops.jacobi_gl(0.0, 0.0, n)
        v = ops.vandermonde_1d(n, r)
        dr = ops.dmatrix_1d(n, r, v)
        for deg in range(1, n + 1):
            np.testing.assert_allclose(dr @ r**deg, deg * r ** (deg - 1), atol=1e-10)
        # constant row-sum zero
        np.testing.assert_allclose(dr @ np.ones_like(r), 0.0, atol=1e-10)

    def test_mass_matrix_integrates(self):
        n = 4
        r = ops.jacobi_gl(0.0, 0.0, n)
        v = ops.vandermonde_1d(n, r)
        m = ops.mass_matrix(v)
        # 1^T M u = integral of the interpolant of u
        for deg in range(n + 1):
            exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
            np.testing.assert_allclose(np.ones(n + 1) @ m @ r**deg, exact, atol=1e-12)

    def test_stiffness_matrix_identity(self):
        # S_ij = ∫ ℓ_i ℓ'_j ;  S + S^T = B (boundary matrix)
        n = 3
        r = ops.jacobi_gl(0.0, 0.0, n)
        v = ops.vandermonde_1d(n, r)
        dr = ops.dmatrix_1d(n, r, v)
        s = ops.stiffness_matrix(v, dr)
        b = np.zeros((n + 1, n + 1))
        b[0, 0] = -1.0
        b[-1, -1] = 1.0
        np.testing.assert_allclose(s + s.T, b, atol=1e-12)

    def test_lift_matrix(self):
        # M @ LIFT = E  (lift is inverse-mass applied to the face extractor)
        n = 5
        r = ops.jacobi_gl(0.0, 0.0, n)
        v = ops.vandermonde_1d(n, r)
        lift = ops.lift_1d(n + 1, v)
        m = ops.mass_matrix(v)
        e = np.zeros((n + 1, 2))
        e[0, 0] = 1.0
        e[-1, 1] = 1.0
        np.testing.assert_allclose(m @ lift, e, atol=1e-12)

    def test_interp_matrix_exact_on_polynomials(self):
        n = 4
        r = ops.jacobi_gl(0.0, 0.0, n)
        r_to = np.linspace(-1, 1, 9)
        im = ops.interp_matrix_1d(n, r, r_to)
        for deg in range(n + 1):
            np.testing.assert_allclose(im @ r**deg, r_to**deg, atol=1e-12)

    def test_element_operators_bundle(self):
        el = ops.element_operators(3, 10)
        assert el["phi"].shape == (11, 4)
        # phi interpolates nodal polynomial data to quadrature points exactly
        u = el["r"] ** 3 - el["r"]
        np.testing.assert_allclose(el["phi"] @ u, el["rq"] ** 3 - el["rq"], atol=1e-12)
        # quadrature-based mass equals analytic mass: M = h/2 Φᵀ diag(w) Φ (h=2)
        m_quad = el["phi"].T @ np.diag(el["wq"]) @ el["phi"]
        np.testing.assert_allclose(m_quad, el["mass"], atol=1e-12)


class TestMesh:
    def test_mesh_gen(self):
        vx, etov = ops.mesh_gen_1d(0.0, 2.0, 4)
        np.testing.assert_allclose(vx, [0, 0.5, 1.0, 1.5, 2.0])
        assert etov.shape == (4, 2)

    def test_connectivity(self):
        _, etov = ops.mesh_gen_1d(0.0, 1.0, 5)
        etoe, etof = ops.connect_1d(etov)
        # interior: element 2's left neighbor is 1 (its face 1), right is 3 (face 0)
        assert etoe[2, 0] == 1 and etof[2, 0] == 1
        assert etoe[2, 1] == 3 and etof[2, 1] == 0
        # boundaries self-connect
        assert etoe[0, 0] == 0 and etoe[4, 1] == 4

    def test_startup_geometry(self):
        disc = ops.startup_1d(2, 0.0, 2 * np.pi, 10)
        assert disc.x.shape == (3, 10)
        # uniform mesh: jacobian = h/2 everywhere
        h = 2 * np.pi / 10
        np.testing.assert_allclose(disc.jac, h / 2, atol=1e-12)
        np.testing.assert_allclose(disc.fscale, 2 / h, atol=1e-12)
        # x strictly increasing along each element and across elements
        xf = disc.x.T.ravel()
        assert np.all(np.diff(xf) > -1e-14)

    def test_face_maps_pair_coincident_nodes(self):
        disc = ops.startup_1d(3, 0.0, 1.0, 6)
        xf = disc.x.T.ravel()
        np.testing.assert_allclose(xf[disc.vmap_m], xf[disc.vmap_p], atol=1e-12)
        # boundary maps: first and last volume nodes
        assert disc.vmap_i == 0
        assert disc.vmap_o == disc.np_ * disc.k - 1
        assert set(disc.vmap_b) == {0, disc.np_ * disc.k - 1}


class TestLimiters:
    def test_minmod(self):
        import jax.numpy as jnp

        v = jnp.array([[1.0, -1.0, 2.0], [2.0, -3.0, -1.0], [0.5, -0.5, 3.0]])
        out = ops.minmod(v)
        np.testing.assert_allclose(out, [0.5, -0.5, 0.0])

    def test_minmod_tvb_passthrough(self):
        import jax.numpy as jnp

        v = jnp.array([[0.1, 5.0], [4.0, 1.0], [4.0, 1.0]])
        h = jnp.array([1.0, 1.0])
        out = ops.minmod_tvb(v, m_const=1.0, h=h)
        # first column: |0.1| <= 1 -> passthrough; second: minmod of (5,1,1)=1
        np.testing.assert_allclose(out, [0.1, 1.0])

    def test_slope_limit_n_preserves_linear(self):
        import jax.numpy as jnp

        disc = ops.startup_1d(3, 0.0, 1.0, 8)
        u = jnp.asarray(2.0 * disc.x + 1.0)
        out = ops.slope_limit_n(u, jnp.asarray(disc.x), jnp.asarray(disc.v), jnp.asarray(disc.inv_v), jnp.asarray(disc.dr))
        # Interior elements are untouched; boundary elements are clamped by the
        # copied-endpoint neighbour averages (same as the reference toolkit).
        np.testing.assert_allclose(out[:, 1:-1], u[:, 1:-1], atol=1e-10)

    def test_slope_limit_n_limits_discontinuity(self):
        import jax.numpy as jnp

        disc = ops.startup_1d(4, -1.0, 1.0, 16)
        u = jnp.asarray(np.sign(disc.x) + 0.05 * np.sin(20 * disc.x))
        out = ops.slope_limit_n(u, jnp.asarray(disc.x), jnp.asarray(disc.v), jnp.asarray(disc.inv_v), jnp.asarray(disc.dr))
        # limited solution has no new extrema beyond data range
        assert float(jnp.max(out)) <= float(jnp.max(u)) + 1e-8
        assert float(jnp.min(out)) >= float(jnp.min(u)) - 1e-8
        # and it actually changed the troubled cells
        assert float(jnp.max(jnp.abs(out - u))) > 1e-3
