"""Declarative problem configuration — the reference's ``Problem`` NamedTuple
+ ``FunFactory`` string-keyed dispatch (python/factory.py:18-74), rebuilt as
a thin facade over the ODE/functional registries.

``get_problem_functions`` returns the same closure bundle the reference's
``FunFactory.getFunctions``/``getAdaptFunctions`` produced (fwd update, full
residual map, Jacobian diagonal, K vector, exact solutions, forward/adjoint
solvers, error estimate, adapt step) — but every function is a pure,
jit/vmap-able jnp function built on the framework layers.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

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
from adjoint_ode_adaptivity_tpu.adapt.policy import bisect_refine
from adjoint_ode_adaptivity_tpu.march.fd import euler_step, forward_march, times_from_dt

__all__ = ["Problem", "Funs", "get_problem_functions"]


class Problem(NamedTuple):
    """Problem spec (python/factory.py:18-27). ``is_net``/``linear_*`` flags
    are subsumed by the registries; kept for API familiarity."""

    case: str
    ode: str
    out_functional: str
    ref_factor: int = 4
    t_span: tuple[float, float] = (0.0, 2.0)
    u0: float = 1.0


class Funs(NamedTuple):
    """The function bundle (python/factory.py:29-36 + AdaptFuns :38-46)."""

    fwd_update: Callable  # step_fn(u, t, dt)
    get_f: Callable  # full residual map F(U) (getF)
    get_jf_diag: Callable  # sub-diagonal of the discrete Jacobian (getJF)
    get_k: Callable  # K = dJ/dU (getK)
    exact_fwd: Callable | None
    exact_adj: Callable | None  # exact_adj(t_eval) along the exact primal
    forward_solve: Callable  # forward_solve(dt) -> trajectory
    adjoint_solve: Callable  # adjoint_solve(dt, u) -> v on the fine grid
    error_estimate: Callable  # error_estimate(dt, u, v) -> per-step indicator
    adapt: Callable  # adapt(times, err_steps) -> refined times


def get_problem_functions(problem: Problem) -> Funs:
    ode = odes.get_ode(problem.ode)
    functional = fnl.get_functional(problem.out_functional)
    step = euler_step(ode.f)
    rf = problem.ref_factor
    t0, t1 = problem.t_span

    def get_f(u, dt):
        t = times_from_dt(dt, t0)
        upd = jax.vmap(step)(u[:-1], t[:-1], dt)
        return jnp.concatenate([u[:1], upd])

    def get_jf_diag(u, dt):
        t = times_from_dt(dt, t0)
        return jax.vmap(lambda uu, tt, dd: jax.grad(lambda x: step(x, tt, dd))(uu))(
            u[:-1], t[:-1], dt
        )

    def get_k(u, dt):
        return fnl.get_k(functional, u, dt)

    def forward_solve(dt, u0=None):
        return forward_march(step, problem.u0 if u0 is None else u0, dt, t0)

    def adjoint_solve(dt, u):
        dt_fine = refine_all(dt, rf)
        u_fine = interp_to_fine(u, dt, dt_fine, t0)
        k_vec = get_k(u_fine, dt_fine)
        return adjoint_march(step, u_fine, dt_fine, k_vec, t0)

    def error_estimate(dt, u, v):
        dt_fine = refine_all(dt, rf)
        u_fine = interp_to_fine(u, dt, dt_fine, t0)
        res = residual(step, u_fine, dt_fine, t0)
        return coarse_indicator(res * v, rf, "strided")

    def adapt(times, err_steps):
        return bisect_refine(times, err_steps)

    exact_adj = None
    if ode.exact_fwd is not None and functional.g_u is not None:
        def exact_adj(t_eval):
            return odes.exact_adjoint_rk4(
                ode, functional.g_u, jnp.asarray(t_eval), problem.u0, t1,
                functional.terminal,
            )

    return Funs(
        fwd_update=step,
        get_f=get_f,
        get_jf_diag=get_jf_diag,
        get_k=get_k,
        exact_fwd=ode.exact_fwd,
        exact_adj=exact_adj,
        forward_solve=forward_solve,
        adjoint_solve=adjoint_solve,
        error_estimate=error_estimate,
        adapt=adapt,
    )
