"""mode="smooth" hp decisions: p-vs-h chosen from the element's modal
decay (top orthonormal-Legendre mode energy fraction at the element's own
order) instead of p-until-saturated.  The reference has no hp strategy at
all (MAIN.m:137-141 only ever bisects at uniform order) — this pins OUR
semantics: smooth solutions p-refine, an unresolved local feature forces
a bisection even when the element could still raise its order.
"""
import jax
import jax.numpy as jnp
import numpy as np

from adjoint_ode_adaptivity_tpu.adapt.hp_loop import (
    _make_modal_smoothness,
    run_adaptive_dg_hp,
    run_adaptive_dg_hp_per_member,
)

F_SIN = lambda u, t: jnp.sin(u)  # noqa: E731


def _bump_f(u, t):
    # smooth-in-u RHS with a sharp temporal feature at t=0.7 (width 0.1 —
    # wide enough for the shared quadrature to see it): coarse slabs
    # containing the bump integrate a steep step and have slow modal decay
    return jnp.sin(u) + 30.0 * jnp.exp(-(((t - 0.7) / 0.1) ** 2))


class TestIndicator:
    def test_smooth_vs_rough_nodal_data(self):
        from adjoint_ode_adaptivity_tpu.ops.jacobi import jacobi_gl

        smooth = _make_modal_smoothness(3, 6, theta=0.3)
        # element 0: exp on the order-3 GL nodes of a short slab (smooth);
        # element 1: alternating kick on the same nodes (rough)
        r3 = jacobi_gl(0.0, 0.0, 3)
        u = np.zeros((2, 6))
        u[0, :4] = np.exp(0.25 * r3)
        u[1, :4] = np.exp(0.25 * r3) + np.array([0.0, 0.5, -0.5, 0.0])
        ns = jnp.asarray([3, 3], jnp.int32)
        flags = np.asarray(smooth(jnp.asarray(u), ns))
        assert flags[0] and not flags[1], flags

    def test_padding_never_leaks(self):
        # padded nodal entries are zero; an order-1 element's flag must not
        # change if garbage were masked — build with exact zeros and check
        # the live-mode energies only involve modes 0..ns
        smooth = _make_modal_smoothness(3, 6, theta=0.3)
        u = np.zeros((1, 6))
        u[0, :2] = [1.0, 1.05]  # near-constant linear element: smooth
        flags = np.asarray(smooth(jnp.asarray(u), jnp.asarray([1])))
        assert flags[0]


class TestSmoothMode:
    def test_smooth_problem_prefers_p_and_converges(self):
        kw = dict(k0=3, n0=1, n_max=4, tol=1e-9, maxit=8, newton_iters=8)
        h_sm = run_adaptive_dg_hp(
            F_SIN, 1.0, (0.0, 2.0), mode="smooth", **kw
        )
        # sin(u) is smooth everywhere: every refinement is p until
        # saturation — no bisection below the order cap
        for a, b in zip(h_sm[:-1], h_sm[1:]):
            if len(b.times) > len(a.times):  # a bisection happened
                assert a.ns.max() == 4, (a.ns, b.ns)
        assert abs(h_sm[-1].est_total) < abs(h_sm[0].est_total) * 1e-3

    def test_bump_forces_early_bisection(self):
        # the temporal bump element has slow modal decay at low order:
        # smooth mode bisects it BEFORE saturating its order — a decision
        # the 'hp' heuristic cannot make
        kw = dict(k0=2, n0=1, n_max=4, tol=0.0, maxit=4, newton_iters=10)
        h_sm = run_adaptive_dg_hp(
            _bump_f, 1.0, (0.0, 2.0), mode="smooth", **kw
        )
        bisected_below_cap = False
        for a, b in zip(h_sm[:-1], h_sm[1:]):
            if len(b.times) > len(a.times) and a.ns.max() < 4:
                bisected_below_cap = True
        assert bisected_below_cap, [list(r.ns) for r in h_sm]
        # 'hp' on the same problem never bisects below the cap
        h_hp = run_adaptive_dg_hp(_bump_f, 1.0, (0.0, 2.0), mode="hp", **kw)
        for a, b in zip(h_hp[:-1], h_hp[1:]):
            if len(b.times) > len(a.times):
                assert a.ns[np.abs(a.err).argmax()] == 4

    def test_device_loop_matches_host(self):
        kw = dict(k0=2, n0=1, n_max=3, tol=0.0, maxit=3, newton_iters=8,
                  mode="smooth")
        h_host = run_adaptive_dg_hp(_bump_f, 1.0, (0.0, 2.0), **kw)
        h_dev = run_adaptive_dg_hp(
            _bump_f, 1.0, (0.0, 2.0), device_loop=True, **kw
        )
        assert len(h_host) == len(h_dev)
        for a, b in zip(h_host, h_dev):
            np.testing.assert_array_equal(a.ns, b.ns)
            np.testing.assert_array_equal(a.times, b.times)
            assert float(a.est_total) == float(b.est_total)


class TestPerMemberSmooth:
    def test_members_decide_independently(self):
        # members with different ICs see different modal content; each
        # freezes on its own and the estimates all decrease
        y0s = np.linspace(0.5, 1.9, 8)
        kw = dict(k0=2, n0=1, n_max=3, mode="smooth", tol=0.0, maxit=4,
                  newton_iters=8)
        h = run_adaptive_dg_hp_per_member(_bump_f, y0s, (0.0, 2.0), **kw)
        assert len(h) >= 2
        first = np.abs(np.asarray(h[0].est_total))
        last = np.abs(np.asarray(h[-1].est_total))
        assert (last < first).all()
        # solo run of member 0 makes the identical decisions (the shared
        # loop trims its history to the live slots; per-member is padded)
        h0 = run_adaptive_dg_hp(_bump_f, float(y0s[0]), (0.0, 2.0), **kw)
        for r_pm, r_solo in zip(h, h0):
            k_live = len(r_solo.ns)
            np.testing.assert_array_equal(
                r_pm.ns[0][:k_live], r_solo.ns
            )
            np.testing.assert_allclose(
                r_pm.times[0][: k_live + 1], r_solo.times, atol=1e-12
            )

    def test_pallas_engine_parity(self):
        y0s = np.linspace(0.6, 1.8, 8)
        kw = dict(k0=2, n0=1, n_max=3, mode="smooth", tol=0.0, maxit=2,
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
