"""Benchmark helpers: the north-star fwd+adjoint DG advection benchmark and
a NumPy element-style baseline standing in for the MATLAB reference.

The reference publishes no numbers (SURVEY.md §6); the driver-defined target
is fwd+adjoint DoF-steps/sec on 1D DG advection at 10k elements, >100× the
MATLAB wall-clock, with effectivity parity. The baseline here is a faithful
NumPy transliteration of the MATLAB compute pattern (vectorised Dr*u and
LIFT*(...) just like utils/AdvecRHS1D.m + the One_code.mlx LSRK loop) —
MATLAB's JIT on vectorised linear algebra performs comparably to NumPy.
"""
from __future__ import annotations

import time
from typing import NamedTuple

import numpy as np

from adjoint_ode_adaptivity_tpu.march.lsrk import RK4A, RK4B, RK4C
from adjoint_ode_adaptivity_tpu.ops.mesh import Discretization1D


class BaselineResult(NamedTuple):
    dof_steps_per_sec: float
    steps_measured: int


class DGBaselineResult(NamedTuple):
    slabs_per_sec: float
    slabs_measured: int


def ensemble_fd_pipeline(n_ics: int, n_steps: int = 16, ref_factor: int = 4):
    """vmapped forward+adjoint+indicator over an IC ensemble — the
    reference's refinement-signal computation at its largest scale
    (100,000 ICs, Main_variable_params.py:234,330-341).

    Returns a jitted ``fn(u0s) -> err_steps`` (ensemble-mean indicator) and
    an example ``u0s`` batch of size ``n_ics``.
    """
    import jax
    import jax.numpy as jnp

    from adjoint_ode_adaptivity_tpu import functionals as fnl
    from adjoint_ode_adaptivity_tpu import odes
    from adjoint_ode_adaptivity_tpu.adjoint import (
        adjoint_march,
        coarse_indicator,
        interp_to_fine,
        refine_all,
        residual,
    )
    from adjoint_ode_adaptivity_tpu.march import euler_step, forward_march

    ode = odes.get_ode("du/dt=sin(u)")
    functional = fnl.get_functional("J=int(u^2)")
    step = euler_step(ode.f)
    dt = jnp.full((n_steps,), 2.0 / n_steps, jnp.float32)
    dt_fine = refine_all(dt, ref_factor)

    def one(u0):
        u = forward_march(step, u0, dt)
        u_fine = interp_to_fine(u, dt, dt_fine)
        k_vec = jax.grad(functional.value)(u_fine, dt_fine)
        v = adjoint_march(step, u_fine, dt_fine, k_vec)
        res = residual(step, u_fine, dt_fine)
        return coarse_indicator(res * v, ref_factor, "block")

    fn = jax.jit(lambda u0s: jnp.mean(jax.vmap(one)(u0s), axis=0))
    import numpy as _np

    u0s = jnp.asarray(
        _np.random.default_rng(0).uniform(-3, 3, size=n_ics), jnp.float32
    )
    return fn, u0s


def numpy_dg_pipeline_baseline(
    n_order: int,
    times: np.ndarray,
    y0s: np.ndarray,
    *,
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
    return_outputs: bool = False,
) -> DGBaselineResult:
    """Reference-style NumPy DG-in-time fwd+adjoint+error pipeline, timed.

    A faithful host transliteration of the ``matlab/dg_march.m:26-78``
    element-by-element Newton march plus the ``adj_march.m:65-120`` backward
    sweep for the sin(u) / J=∫u problem, run sequentially over the
    ``y0s`` ensemble — the reference's only scale axis for this strand is
    one process per (seed, config), so ensemble members are a host loop.
    One generosity: nodal→quadrature interpolation uses the precomputed Φ
    matrix instead of the reference's per-Newton-iteration
    ``polyfit``/``polyval`` (numerically identical, ~3× faster for the
    baseline). Returns slab-solves/sec where one slab-solve = one element's
    Newton (forward) or linear (adjoint) solve for one member.
    """
    from adjoint_ode_adaptivity_tpu.march.dg_time import dg_time_operators
    from adjoint_ode_adaptivity_tpu.ops.jacobi import jacobi_gl
    from adjoint_ode_adaptivity_tpu.ops.operators import interp_matrix_1d

    ops_p = dg_time_operators(n_order)
    ops_a = dg_time_operators(n_order + 1)
    phi_p = np.asarray(ops_p.phi)
    wq_p = np.asarray(ops_p.wq)
    rq_p = np.asarray(ops_p.rq)
    s_p = np.asarray(ops_p.stiff)
    np_p = ops_p.np_
    a_p = s_p.T.copy()
    a_p[-1, -1] -= 1.0
    phi_a = np.asarray(ops_a.phi)
    wq_a = np.asarray(ops_a.wq)
    rq_a = np.asarray(ops_a.rq)
    s_a = np.asarray(ops_a.stiff)
    m_a = np.asarray(ops_a.mass)
    np_a = ops_a.np_
    r_p = jacobi_gl(0.0, 0.0, n_order)
    to_nodes = np.asarray(interp_matrix_1d(n_order, r_p, np.asarray(ops_a.r)))
    to_quad = np.asarray(interp_matrix_1d(n_order, r_p, np.asarray(ops_a.rq)))
    base_a = -s_a.T.copy()
    base_a[0, 0] -= 1.0

    times = np.asarray(times, np.float64)
    k = len(times) - 1
    hs = times[1:] - times[:-1]
    slabs = 0
    t0 = time.perf_counter()
    for y0 in np.atleast_1d(y0s):
        # forward element-by-element Newton march (dg_march.m:26-78)
        u_all = np.empty((k, np_p))
        u_prev = float(y0)
        for ke in range(k):
            h, tl = hs[ke], times[ke]
            u = np.full(np_p, u_prev)
            f_vec = np.zeros(np_p)
            f_vec[0] = u_prev
            for _ in range(newton_maxit + 1):
                u_q = phi_p @ u
                res = a_p @ u + h / 2.0 * (phi_p.T @ (wq_p * np.sin(u_q))) + f_vec
                jac = a_p + h / 2.0 * (
                    phi_p.T @ (wq_p[:, None] * np.cos(u_q)[:, None] * phi_p)
                )
                delta = np.linalg.solve(jac, res)
                u = u - delta
                if np.linalg.norm(delta) <= newton_tol:
                    break
            u_all[ke] = u
            u_prev = u[-1]
            slabs += 1
        # backward adjoint sweep at order n+1 (adj_march.m:65-120)
        v_inflow = 0.0
        errs = np.empty(k)
        for ke in range(k - 1, -1, -1):
            h, tl = hs[ke], times[ke]
            u_q = to_quad @ u_all[ke]
            t_q = tl + (1.0 + rq_a) * h / 2.0
            m_w = h / 2.0 * (
                phi_a.T @ (wq_a[:, None] * np.cos(u_q)[:, None] * phi_a)
            )
            a_mat = base_a + m_w
            rhs = -(h / 2.0) * (m_a @ np.ones(np_a))
            rhs[-1] -= v_inflow
            v_el = np.linalg.solve(a_mat, rhs)
            u_h = to_nodes @ u_all[ke]
            u_prev_el = float(y0) if ke == 0 else u_all[ke - 1][-1]
            res = s_a.T @ u_h + h / 2.0 * (phi_a.T @ (wq_a * np.sin(u_q)))
            res[-1] -= u_h[-1]
            res[0] += u_prev_el
            errs[ke] = v_el @ res
            v_inflow = v_el[0]
            slabs += 1
    elapsed = time.perf_counter() - t0
    result = DGBaselineResult(slabs / elapsed, slabs)
    if return_outputs:
        return result, u_all, errs  # last member's outputs, for parity tests
    return result


def numpy_dg_hp_faithful_baseline(
    ns_vec: np.ndarray,
    times: np.ndarray,
    y0s: np.ndarray,
    *,
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
    return_outputs: bool = False,
) -> DGBaselineResult:
    """Order-matched, fem_setup-FAITHFUL host DG-in-time pipeline, timed.

    Unlike :func:`numpy_dg_pipeline_baseline` (which pre-computes the
    element operators once — a documented generosity), this transliterates
    the reference's actual per-element cost structure:

    - ``matlab/dg_march.m:29`` calls ``fem_setup(Ns(k),1,times(k:k+1),30*Ns(k))``
      INSIDE the element loop — every forward element rebuilds the
      Vandermonde/Dr stack and runs a Golub-Welsch ``JacobiGQ(0,0,30*Ns)``
      eigendecomposition of a (30·Ns+1)² matrix (``matlab/fem_setup.m:27``).
    - the Newton loop rebuilds ``S = (V*V')\\Dr`` and the quadrature mass
      blocks EVERY iteration (``dg_march.m:55-60``).
    - ``matlab/adj_march.m:71`` calls ``fem_setup(m,1,tspan,2*m)`` per
      adjoint element (m = Ns+1), plus two explicit ``inv(V*V')`` and the
      error-contribution operator rebuild (``adj_march.m:81-119``).

    Remaining generosities (all favour the baseline): vectorized NumPy in
    place of MATLAB's interpreted triple loop over ``Phi`` entries
    (fem_setup.m:29-38), and exact nodal interpolation in place of
    ``polyfit``/``polyval`` per Newton iteration (numerically identical).

    ``ns_vec`` is the (K,) per-element order vector. Returns slab-solves/s
    with one slab = one element's forward Newton or adjoint solve for one
    member (same accounting as :func:`numpy_dg_pipeline_baseline`).
    """
    from adjoint_ode_adaptivity_tpu.ops.jacobi import jacobi_gl, jacobi_gq
    from adjoint_ode_adaptivity_tpu.ops.operators import (
        dmatrix_1d,
        interp_matrix_1d,
        vandermonde_1d,
    )

    ns_vec = np.asarray(ns_vec, int)
    times = np.asarray(times, np.float64)
    k = len(times) - 1
    assert ns_vec.shape == (k,)
    hs = times[1:] - times[:-1]

    def fem_setup(n, n_gq):
        # StartUp1D + the Phi build (fem_setup.m:25-38): GL nodes, V, Dr,
        # then Phi = V(rq) @ inv(V) via the Golub-Welsch quadrature rule
        rq, wq = jacobi_gq(0.0, 0.0, n_gq)
        r = jacobi_gl(0.0, 0.0, n)
        v = vandermonde_1d(n, r)
        dr = dmatrix_1d(n, r, v)
        vq = vandermonde_1d(n, rq)
        phi = np.linalg.solve(v.T, vq.T).T  # = V(rq) @ inv(V)
        return r, rq, np.asarray(wq), v, dr, phi

    slabs = 0
    t0 = time.perf_counter()
    for y0 in np.atleast_1d(y0s):
        # ---- forward element-by-element Newton march (dg_march.m:26-78),
        # fem_setup rebuilt per element at 30·Ns quadrature points
        u_all = [None] * k
        r_all = [None] * k
        u_prev = float(y0)
        for ke in range(k):
            n = int(ns_vec[ke])
            np_ = n + 1
            h = hs[ke]
            r, rq, wq, v, dr, phi = fem_setup(n, 30 * n)
            b_mat = np.zeros((np_, np_))
            b_mat[-1, -1] = -1.0
            f_vec = np.zeros(np_)
            f_vec[0] = u_prev
            u = np.full(np_, u_prev)
            for _ in range(newton_maxit + 1):
                u_q = phi @ u  # polyfit/polyval-equivalent interpolation
                # per-iteration operator rebuild (dg_march.m:55-60)
                s = np.linalg.solve(v @ v.T, dr)
                a_mat = s.T + b_mat  # A = S' + B, B(end)=-1
                m_tilde = h / 2.0 * (phi.T @ (wq * np.sin(u_q)))
                dmtdu = h / 2.0 * (phi.T @ (wq[:, None] * np.cos(u_q)[:, None] * phi))
                res = a_mat @ u + m_tilde + f_vec
                delta = np.linalg.solve(a_mat + dmtdu, res)
                u = u - delta
                if np.linalg.norm(delta) <= newton_tol:
                    break
            u_all[ke] = u
            r_all[ke] = r
            u_prev = u[-1]
            slabs += 1
        # ---- backward adjoint sweep at m = Ns+1 (adj_march.m:65-120),
        # fem_setup rebuilt per element at 2·m quadrature points
        v_inflow = 0.0
        errs = np.empty(k)
        for ke in range(k - 1, -1, -1):
            n = int(ns_vec[ke])
            m = n + 1
            h = hs[ke]
            r_a, rq_a, wq_a, v_a, dr_a, phi_a = fem_setup(m, 2 * m)
            # polyfit-equivalent: primal nodal -> adjoint nodes/quad
            to_nodes = interp_matrix_1d(n, r_all[ke], r_a)
            to_quad = interp_matrix_1d(n, r_all[ke], rq_a)
            uh_k = to_nodes @ u_all[ke]
            u_q = to_quad @ u_all[ke]
            np_a = m + 1
            m_v = h / 2.0 * (phi_a.T @ (wq_a[:, None] * np.cos(u_q)[:, None] * phi_a))
            vvt_inv = np.linalg.inv(v_a @ v_a.T)  # explicit, as the reference
            m_k = h / 2.0 * vvt_inv
            s = vvt_inv @ dr_a
            a_mat = -s.T + m_v
            a_mat[0, 0] -= 1.0  # B(1)=-1
            rhs = -(m_k @ np.ones(np_a))
            rhs[-1] -= v_inflow
            v_el = np.linalg.solve(a_mat, rhs)
            # error contribution (adj_march.m:103-119): one more operator
            # rebuild + residual apply
            m_tilde = h / 2.0 * (phi_a.T @ (wq_a * np.sin(u_q)))
            s2 = np.linalg.solve(v_a @ v_a.T, dr_a)
            a2 = -s2.T
            a2[-1, -1] += 1.0  # A = -S' - B, B(end)=-1
            res = -(a2 @ uh_k) + m_tilde
            res[0] += float(y0) if ke == 0 else u_all[ke - 1][-1]
            errs[ke] = v_el @ res
            v_inflow = v_el[0]
            slabs += 1
    elapsed = time.perf_counter() - t0
    result = DGBaselineResult(slabs / elapsed, slabs)
    if return_outputs:
        # last member's forward solution + per-element AWR contributions,
        # pinned to the real solvers in tests/test_dg_batched.py
        return result, u_all, errs
    return result


def numpy_advec_fwd_adj_baseline(
    disc: Discretization1D, a: float, dt: float, n_steps: int
) -> BaselineResult:
    """NumPy/MATLAB-style forward + adjoint + error-estimate pipeline, timed.

    Computes the *same outputs* as the measured TPU pipeline: LSRK4(5)
    forward march (trajectory stored — MATLAB-style, no recomputation, which
    slightly favours this baseline), backward transpose-adjoint march, and
    the per-element adjoint-weighted step-doubling residual
    η_k += Σ λ_{n+1} ⊙ (u_{n+1} − Φ_{dt/2}²(u_n)).
    """
    np_, k = disc.np_, disc.k
    dr = np.asarray(disc.dr)
    lift = np.asarray(disc.lift)
    rx = np.asarray(disc.rx)
    fscale = np.asarray(disc.fscale)
    nx = np.asarray(disc.nx)
    flux_fac = (a * nx - 0.0) / 2.0  # alpha=1 upwind

    def rhs(u, t):
        u_left = u[0, :]
        u_right = u[-1, :]
        du0 = (u_left - np.roll(u_right, 1)) * flux_fac[0]
        du1 = (u_right - np.roll(u_left, -1)) * flux_fac[1]
        du0[0] = (u_left[0] + np.sin(a * t)) * flux_fac[0, 0]
        du1[-1] = 0.0
        du = np.stack([du0, du1])
        return -a * rx * (dr @ u) + lift @ (fscale * du)

    def rhs_t(lam):
        # transpose of the homogeneous rhs (cost-equivalent apply)
        w = fscale * (lift.T @ lam)
        s0 = w[0] * flux_fac[0]
        s1 = w[1] * flux_fac[1]
        out = -a * rx * (dr.T @ lam)
        out[0, :] += s0
        out[-1, :] += s1
        out[-1, :] -= np.roll(s0, -1)
        out[0, :] -= np.roll(s1, 1)
        return out

    def lsrk_step(u, t, h):
        resu = np.zeros_like(u)
        for s in range(5):
            r = rhs(u, t + RK4C[s] * h)
            resu = RK4A[s] * resu + h * r
            u = u + RK4B[s] * resu
        return u

    u = np.sin(np.asarray(disc.x))
    t0 = time.perf_counter()
    # forward, storing the trajectory (MATLAB-style)
    traj = np.empty((n_steps + 1,) + u.shape)
    traj[0] = u
    t = 0.0
    for n in range(n_steps):
        u = lsrk_step(u, t, dt)
        traj[n + 1] = u
        t += dt
    # backward: transpose march + adjoint-weighted step-doubling residual
    lam = np.ones_like(u)
    eta = np.zeros(k)
    for n in range(n_steps - 1, -1, -1):
        t_n = n * dt
        half = lsrk_step(traj[n], t_n, dt / 2)
        half2 = lsrk_step(half, t_n + dt / 2, dt / 2)
        r = traj[n + 1] - half2
        eta += np.sum(lam * r, axis=0)
        # fine (half-step-squared) transpose, matching adjoint/advec.py:
        # two reversed-stage passes at dt/2
        for _ in range(2):
            lr = np.zeros_like(lam)
            for s in (4, 3, 2, 1, 0):
                w = RK4B[s] * lam + lr
                lr = RK4A[s] * w
                lam = lam + (dt / 2) * rhs_t(w)
    elapsed = time.perf_counter() - t0
    dof_steps = np_ * k * (2 * n_steps)
    return BaselineResult(dof_steps / elapsed, n_steps)
