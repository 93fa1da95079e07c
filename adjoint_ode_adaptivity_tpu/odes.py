"""ODE problem registry: right-hand sides, exact primal solutions, and exact
(continuous) adjoint solutions for verification.

This replaces the reference's string-keyed closure factory
(``python/factory.py:79-267`` ``FunFactory.getFunctions`` and the per-script
copy-pasted case dispatch, e.g. ``python/Main_finite_difference.py:111-240``)
with a declarative registry of :class:`ODEProblem` records. All functions are
pure jnp and jit/vmap/grad-safe.

Exact adjoints: for ``u' = f(u, t)`` and functional ``J``, the continuous
adjoint solves ``a' = -f_u(u(t), t) · a - g_u(u(t), t)`` backward from
``a(T) = h_u(u(T))`` where ``J = ∫ g dt + h(u(T))``. Rather than the
reference's nested ``scipy.integrate.quad`` of closed-form kernels
(``python/factory.py:152-217``), we integrate this linear ODE backward with
dense fixed-step RK4 on the exact primal — device-side, deterministic, and
accurate to ~1e-10 with enough steps.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "ODEProblem",
    "get_ode",
    "register_ode",
    "ODE_REGISTRY",
    "exact_adjoint_rk4",
    "gaussian_mixture_ode",
]


class ODEProblem(NamedTuple):
    """A scalar (or small-vector) ODE ``u' = f(u, t)`` with optional oracles."""

    name: str
    f: Callable  # f(u, t) -> du/dt
    exact_fwd: Callable | None = None  # exact_fwd(t, u0) -> u(t)
    f_u: Callable | None = None  # df/du closed form (else AD is used)
    linear: bool = False


ODE_REGISTRY: dict[str, ODEProblem] = {}


def register_ode(problem: ODEProblem) -> ODEProblem:
    ODE_REGISTRY[problem.name] = problem
    return problem


def get_ode(name: str) -> ODEProblem:
    if name == "gaussian_mixture" and name not in ODE_REGISTRY:
        # registered lazily: building it draws PRNG constants, which must
        # not happen at import time (x64/platform config may not be set yet)
        register_ode(gaussian_mixture_ode())
    return ODE_REGISTRY[name]


# --- the reference's cases -------------------------------------------------

register_ode(
    ODEProblem(
        name="du/dt=u",
        f=lambda u, t: u,
        exact_fwd=lambda t, u0: u0 * jnp.exp(t),
        f_u=lambda u, t: jnp.ones_like(u),
        linear=True,
    )
)

# u' = sin(u): exact solution 2·atan2(sin(u0/2) e^t, cos(u0/2))
# (python/Main_finite_difference.py:142-143)
register_ode(
    ODEProblem(
        name="du/dt=sin(u)",
        f=lambda u, t: jnp.sin(u),
        exact_fwd=lambda t, u0: 2.0
        * jnp.arctan2(jnp.sin(u0 / 2) * jnp.exp(t), jnp.cos(u0 / 2)),
        f_u=lambda u, t: jnp.cos(u),
    )
)

# training-truth ODEs used by the NN drivers
register_ode(ODEProblem(name="du/dt=cos(2*pi*u)", f=lambda u, t: jnp.cos(2 * jnp.pi * u)))
register_ode(ODEProblem(name="du/dt=10cos(u)", f=lambda u, t: 10.0 * jnp.cos(u)))
register_ode(ODEProblem(name="du/dt=t*sin(u)", f=lambda u, t: t * jnp.sin(u)))


def gaussian_mixture_ode(
    key: jax.Array | None = None, n_u: int = 5, n_t: int = 3
) -> ODEProblem:
    """The 'complex' test ODE: a Gaussian mixture in u (n_u modes) and t
    (n_t modes) with fixed PRNG draws, mirroring
    ``python/Main_no_matrix_detect_complex.py:37-52``.
    """
    import jax.random as jrand

    m_rng, s_rng, c_rng = jrand.PRNGKey(1), jrand.PRNGKey(2), jrand.PRNGKey(3)
    u_m = jrand.normal(m_rng, (n_u,))
    u_s = jnp.abs(jrand.normal(s_rng, (n_u,)) / 3 + 1)
    t_m = jnp.abs(jrand.normal(m_rng, (n_t,)) / 6 + 0.5)
    t_s = jnp.abs(jrand.normal(s_rng, (n_t,)) / 3 + 1)
    c = jrand.normal(c_rng, (n_u + n_t,))

    def gaussian(x, m, s):
        return jnp.exp(-((x - m) ** 2) / (2 * s**2)) / jnp.sqrt(2 * jnp.pi * s**2)

    def f(u, t):
        in_u = jnp.sum(c[:n_u] * gaussian(u[..., None], u_m, u_s), axis=-1)
        in_t = jnp.sum(c[n_u:] * gaussian(jnp.asarray(t)[..., None], t_m, t_s), axis=-1)
        return in_u + in_t

    return ODEProblem(name="gaussian_mixture", f=f)


# --- exact continuous adjoint by dense backward RK4 ------------------------


def exact_adjoint_rk4(
    ode: ODEProblem,
    g_u: Callable,
    t_eval: jnp.ndarray,
    u0,
    t_end: float,
    terminal: float = 0.0,
    n_sub: int = 512,
) -> jnp.ndarray:
    """Continuous adjoint a(t) of J = ∫ g(u) dt [+ terminal·u(T)] along the
    *exact* primal, evaluated at ``t_eval``.

    Solves a' = -f_u(u(t), t)·a - g_u(u(t), t) backward from a(T)=terminal
    with ``n_sub`` RK4 steps between the end time and each evaluation point.
    Requires ``ode.exact_fwd``.

    This is the verification oracle matching the reference's quadrature
    formulas (python/factory.py:152-217) and MATLAB ``dsolve`` adjoints
    (matlab/MAIN.m:39-48).
    """
    if ode.exact_fwd is None:
        raise ValueError(f"ODE {ode.name} has no exact solution")
    f_u = ode.f_u or (lambda u, t: jax.grad(lambda uu: ode.f(uu, t))(u))

    def rhs(a, t):
        u = ode.exact_fwd(t, u0)
        return -f_u(u, t) * a - g_u(u, t)

    # march backward over a dense uniform grid from t_end to min(t_eval)
    t0 = jnp.min(t_eval)
    ts = jnp.linspace(t_end, t0, n_sub + 1)
    h = ts[1] - ts[0]  # negative

    def step(a, t):
        k1 = rhs(a, t)
        k2 = rhs(a + 0.5 * h * k1, t + 0.5 * h)
        k3 = rhs(a + 0.5 * h * k2, t + 0.5 * h)
        k4 = rhs(a + h * k3, t + h)
        a_next = a + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        return a_next, a_next

    a_end = jnp.asarray(terminal, dtype=ts.dtype)
    _, a_hist = jax.lax.scan(step, a_end, ts[:-1])
    a_grid = jnp.concatenate([a_end[None], a_hist])
    # ts is decreasing; flip for interp
    return jnp.interp(t_eval, ts[::-1], a_grid[::-1])


# vector-state system: harmonic oscillator u'' = -ω²u as a 2-vector ODE
def _harmonic_f(u, t, omega: float = 2.0):
    return jnp.stack([u[..., 1], -(omega**2) * u[..., 0]], axis=-1)


register_ode(
    ODEProblem(
        name="harmonic_oscillator",
        f=_harmonic_f,
        exact_fwd=lambda t, u0: jnp.stack(
            [
                u0[..., 0] * jnp.cos(2.0 * t) + u0[..., 1] / 2.0 * jnp.sin(2.0 * t),
                -2.0 * u0[..., 0] * jnp.sin(2.0 * t) + u0[..., 1] * jnp.cos(2.0 * t),
            ],
            axis=-1,
        ),
        linear=True,
    )
)
