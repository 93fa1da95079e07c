"""Goal-oriented hp-adaptive DG-in-time loop: refine the ORDER (p) or
bisect the slab (h) at the largest |adjoint-weighted residual|.

The reference's ``MAIN.m:29-166`` loop only ever bisects (h) at a uniform
order, but its ``dg_march(Ns, ...)`` signature carries a per-element order
vector (dg_march.m:1,29) — this module drives that latent capability as a
real adaptivity axis on top of the mixed-order solvers
(:mod:`~adjoint_ode_adaptivity_tpu.march.dg_mixed`,
:mod:`~adjoint_ode_adaptivity_tpu.adjoint.dg_mixed`).

TPU-first design: the whole iteration — coarse march at ``ns``, fine march
at ``ns + fine_offset``, adjoint at ``ns + 1``, both functionals, the
refinement decision — is ONE jit compiled once at a padded partition:
``times`` is padded with zero-width slabs (exact identities, zero error
contribution — the repo-wide padding contract, which the mixed-order march
preserves for every order) and ``ns`` is a data vector, so neither h- nor
p-refinement ever retraces.  Refinement policy per iteration at
``ref_i = argmax |err|``:

- ``mode="p"``: raise that element's order by one (argmax restricted to
  elements below ``n_max`` — a saturated element cannot improve in p).
- ``mode="h"``: bisect it (children inherit the parent's order).
- ``mode="hp"``: raise the order while ``ns[ref_i] < n_max``, else bisect —
  p-exhaustion-then-h, the simplest honest hp strategy.
- ``mode="smooth"``: decide p-vs-h from the element's MODAL DECAY (the
  classic smoothness-indicator strategy): p-refine when the top
  orthonormal-Legendre mode of the element's own solution carries at most
  a ``smooth_theta`` fraction of the modal energy (fast decay — smooth,
  order pays off exponentially), bisect otherwise (slow decay — a local
  feature the order cannot chase); saturation still forces h.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from adjoint_ode_adaptivity_tpu.adjoint.dg_mixed import (
    dg_adjoint_interp_mixed,
    dg_adjoint_march_mixed,
    dg_adjoint_reconstruct_mixed,
    dg_adjoint_solve_low_mixed,
    dg_awr_from_adjoint_mixed,
    dg_element_functional_mixed,
    dg_radau_interp_mixed,
)
from adjoint_ode_adaptivity_tpu.march.dg_mixed import (
    dg_march_mixed,
    dg_time_operators_mixed,
)

__all__ = [
    "HPAdaptResult",
    "HPPerMemberAdaptResult",
    "run_adaptive_dg_hp",
    "run_adaptive_dg_hp_per_member",
]


class HPAdaptResult(NamedTuple):
    times: np.ndarray  # (K_active+1,) partition at this iteration
    ns: np.ndarray  # (K_active,) per-element orders
    u: np.ndarray  # (K_active, np_max) padded coarse primal
    v: np.ndarray  # (K_active, np_max) padded adjoint (order ns+1)
    err: np.ndarray  # (K_active,) element contributions
    j_coarse: float
    j_fine: float
    effectivity_gap: float  # JuH − Juh (MAIN.m:55-64 telemetry)
    est_total: float  # Σ err



def _refine_candidate(times, ns, abs_err, mode, n_max, do_p, do_h,
                      smooth_ok=None):
    """One p/h refinement candidate at the |AWR| argmax on a padded
    partition: raise the argmax-eligible element's order (p), bisect the
    argmax element with order inheritance (h), p-until-saturated-then-h
    (hp), or decide p-vs-h from the element's MODAL DECAY
    (``smooth``: p where ``smooth_ok[k]`` — fast decay, the error is a
    resolution-order artifact — else bisect; saturation still forces h).
    Shared by the shared-partition and per-member loops — the single
    place that encodes the refinement semantics."""
    ref_any = jnp.argmax(abs_err)
    # p-eligibility: order-refinable LIVE elements only (zero-width
    # padding slabs must never be selected)
    eligible = (ns < n_max) & (times[1:] - times[:-1] > 0)
    ref_p = jnp.argmax(jnp.where(eligible, abs_err, -1.0))
    if mode == "p":
        ref_i, use_p = ref_p, jnp.array(True)
    elif mode == "h":
        ref_i, use_p = ref_any, jnp.array(False)
    elif mode == "smooth":
        ref_i = ref_any
        use_p = smooth_ok[ref_any] & eligible[ref_any]
    else:  # hp: p until the argmax element saturates, then bisect it
        ref_i, use_p = ref_any, eligible[ref_any]
    ns_p = ns.at[ref_i].add(jnp.where(eligible[ref_i], 1, 0)) if do_p else ns
    if do_h:
        mid = 0.5 * (times[ref_i] + times[ref_i + 1])
        idx_t = jnp.arange(times.shape[0])
        t_shift = times[jnp.maximum(idx_t - 1, 0)]
        times_h = jnp.where(
            idx_t <= ref_i, times, jnp.where(idx_t == ref_i + 1, mid, t_shift)
        )
        idx_e = jnp.arange(ns.shape[0])
        ns_shift = ns[jnp.maximum(idx_e - 1, 0)]
        ns_h = jnp.where(idx_e <= ref_i, ns, ns_shift)
    else:
        times_h, ns_h = times, ns
    return jnp.where(use_p, times, times_h), jnp.where(use_p, ns_p, ns_h)


def _make_modal_smoothness(n_max_user, np_max, theta):
    """Builds ``smooth(u, ns) -> (K,) bool``: True where the top
    orthonormal-Legendre mode of the element's nodal solution (at the
    element's OWN order ``ns[k]``) carries at most a ``theta`` fraction
    of the modal l2 energy — fast decay ⇒ the solution is smooth there
    and p-refinement is the effective move (the classic hp decay
    indicator, e.g. Houston–Süli).  The energy is normalized over modes
    ``1..n`` (the mean mode is excluded so a rough wiggle cannot hide
    under a large mean — at ``n == 1`` the mean stays in, otherwise the
    lone slope mode would always read as rough).  Works on the padded
    ``(K, np_max)`` nodal layout of the mixed solvers (padded nodal
    entries are exactly zero and the padded inv-Vandermonde columns are
    zero, so padding never leaks into the coefficients)."""
    from adjoint_ode_adaptivity_tpu.ops.jacobi import jacobi_gl
    from adjoint_ode_adaptivity_tpu.ops.operators import vandermonde_1d

    inv_v = np.zeros((n_max_user, np_max, np_max))
    for n in range(1, n_max_user + 1):
        r = jacobi_gl(0.0, 0.0, n)
        inv_v[n - 1, : n + 1, : n + 1] = np.linalg.inv(vandermonde_1d(n, r))
    inv_v = jnp.asarray(inv_v)

    def smooth(u, ns):
        t = inv_v[ns - 1]  # (K, np_max, np_max) per-element nodal→modal
        c = jnp.einsum("kij,kj->ki", t, u)
        idx = jnp.arange(np_max)[None, :]
        lo = jnp.where(ns >= 2, 1, 0)[:, None]
        live = (idx >= lo) & (idx <= ns[:, None])
        top = idx == ns[:, None]
        e_top = jnp.sum(jnp.where(top, c, 0.0) ** 2, axis=1)
        e_all = jnp.sum(jnp.where(live, c, 0.0) ** 2, axis=1)
        return e_top <= (theta * theta) * (e_all + 1e-30)

    return smooth


def _make_member_solver(mops, interp, radau, f, g, g_u, fine_offset,
                        adjoint_mode, newton_tol, newton_maxit,
                        newton_iters=None):
    """member(times, ns, y0_m) -> (u, v, err, j_c, j_f): one member's
    coarse/fine solves, adjoint (direct or Radau-reconstructed) and
    functionals — shared by all hp loop variants."""

    def member(times, ns, y0_m):
        res_c = dg_march_mixed(
            mops, f, times, ns, y0_m,
            newton_tol=newton_tol, newton_maxit=newton_maxit,
            newton_iters=newton_iters,
        )
        res_f = dg_march_mixed(
            mops, f, times, ns + fine_offset, y0_m,
            newton_tol=newton_tol, newton_maxit=newton_maxit,
            newton_iters=newton_iters,
        )
        if adjoint_mode == "reconstruct":
            v_low = dg_adjoint_solve_low_mixed(
                mops, f, res_c.u, times, ns, y0_m, g_u=g_u
            )
            v_adj = dg_adjoint_reconstruct_mixed(mops, radau, v_low, ns)
            err_adj = dg_awr_from_adjoint_mixed(
                mops, interp, f, res_c.u, times, ns, y0_m, v_adj
            )
        else:
            adj = dg_adjoint_march_mixed(
                mops, interp, f, res_c.u, times, ns, y0_m, g_u=g_u
            )
            v_adj, err_adj = adj.v, adj.err
        j_c = dg_element_functional_mixed(mops, res_c.u, times, ns, g)
        j_f = dg_element_functional_mixed(
            mops, res_f.u, times, ns + fine_offset, g
        )
        return res_c.u, v_adj, err_adj, j_c, j_f

    return member


def run_adaptive_dg_hp(
    f: Callable,
    y0,
    t_span: tuple[float, float],
    *,
    k0: int = 4,
    n0: int = 1,
    n_max: int = 4,
    mode: str = "hp",
    g: Callable = lambda u, t: u,
    g_u: Callable = lambda u, t: jnp.ones_like(u),
    tol: float = 1e-8,
    maxit: int = 30,
    fine_offset: int = 2,
    n_gq: int | None = None,
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
    newton_iters: int | None = None,
    adjoint_mode: str = "solve",
    engine: str = "xla",
    smooth_theta: float = 0.3,
    mesh=None,
    mesh_axis: str = "data",
    callback: Callable | None = None,
    checkpoint_dir: str | None = None,
    iteration=None,
    device_loop: bool = False,
) -> list[HPAdaptResult]:
    """hp-adaptive DG-in-time study; returns the per-iteration history
    (same telemetry fields as
    :func:`~adjoint_ode_adaptivity_tpu.adapt.dg_loop.run_adaptive_dg`).
    Stops when ``|Σ err| < tol`` or after ``maxit`` refinements.

    ``checkpoint_dir``: orbax-checkpoint partition + orders + history each
    iteration and resume from the latest checkpoint when present (same
    contract as the other adaptive loops; the callback is not re-invoked
    for restored iterations).

    ``adjoint_mode``: 'solve' marches the adjoint directly at order
    ``ns+1`` (adj_march); 'reconstruct' solves it AT the primal orders and
    lifts each element through Radau collocation (adj_rec) before
    weighting the residual.

    ``y0`` may be a (B,) array: the ENSEMBLE-signal hp study
    (Main_variable_params.py:330-341's mean indicator applied to hp) —
    all members share one partition and order vector, the solves vmap
    over members, and the refinement signal is the ensemble-mean
    |contribution| per element.  History then carries per-member ``u``/
    ``v`` (B, K, np_max), the ensemble-MEAN signed ``err``, and member-
    mean functionals; ``est_total = Σ_k mean_b err``.

    ``device_loop=True``: the whole study — solves, estimate, p/h
    decision, stopping tests — runs as ONE ``lax.while_loop`` dispatch
    with per-iteration results in preallocated buffers and a single fetch
    at the end; history bit-identical to the host loop (tested).
    Checkpointing degrades to one end-of-run save; the callback fires
    after the run, in order.

    ``iteration``: a prebuilt jitted per-iteration function taken from a
    prior identically-configured call's return value (the history list
    carries ``.iteration``, and — in device_loop mode — ``.run_fused`` +
    ``.fused_args``) so a caller (bench.py) can time a genuinely warm
    run; each call otherwise builds a fresh jit closure that cannot hit
    the previous call's cache (same contract as
    :func:`~adjoint_ode_adaptivity_tpu.adapt.dg_loop.run_adaptive_dg`).

    ``mode="smooth"`` decides p-vs-h per refinement from the element's
    MODAL DECAY instead of p-until-saturated: the element at the |AWR|
    argmax p-refines when its top orthonormal-Legendre mode carries at
    most a ``smooth_theta`` energy fraction (fast decay — smooth there)
    and bisects otherwise (slow decay — an unresolved feature that
    raising the order cannot fix efficiently); the ensemble variant
    tests the ensemble-MEAN solution.

    ``engine="pallas"`` (ensemble ``y0`` only): the shared partition and
    order vector broadcast across members and the whole member pipeline
    runs as ONE fused kernel launch per iteration
    (:func:`~adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab_mixed.make_pallas_dg_estimate_hp_per_member`).
    Requires elementwise ``f``/``g_u``, ``adjoint_mode="solve"``, B a
    multiple of 8 (per shard under ``mesh=``) and fixed-count Newton
    (``newton_iters``, default 8)."""
    if engine not in ("xla", "pallas"):
        raise ValueError(engine)
    if mode not in ("h", "p", "hp", "smooth"):
        raise ValueError(
            f"mode must be 'h', 'p', 'hp' or 'smooth', got {mode!r}"
        )
    if not 1 <= n0 <= n_max:
        raise ValueError(f"n0={n0} must satisfy 1 <= n0 <= n_max={n_max}")
    if adjoint_mode not in ("solve", "reconstruct"):
        raise ValueError(f"unknown adjoint_mode {adjoint_mode!r}")
    if fine_offset < 1:
        raise ValueError(
            "fine_offset must be >= 1: the adjoint solves at ns+1, which "
            "must fit the operator stack (silent table clamping otherwise "
            "- see march.dg_mixed._check_orders)"
        )
    max_k = k0 + (maxit + 1 if mode != "p" else 1)
    raw_ckpt = None
    if checkpoint_dir is not None:
        # restore BEFORE sizing: the engines below bake the padded element
        # count in, and a resume may come from a run with a LARGER maxit
        # (same pattern as run_adaptive_dg_ensemble / the per-member loops)
        from adjoint_ode_adaptivity_tpu.train.checkpoint import (
            latest_step,
            restore_checkpoint_raw,
        )

        if latest_step(checkpoint_dir) is not None:
            raw_ckpt = restore_checkpoint_raw(checkpoint_dir)
            max_k = max(max_k, len(np.asarray(raw_ckpt["times"])) - 1)
    times = np.linspace(t_span[0], t_span[1], k0 + 1)
    times = np.concatenate([times, np.full(max_k - k0, times[-1])])
    ns = np.concatenate(
        [np.full(k0, n0, np.int32), np.ones(max_k - k0, np.int32)]
    )
    do_p = mode in ("p", "hp", "smooth")
    do_h = mode in ("h", "hp", "smooth")
    y0_arr = np.asarray(y0)
    ensemble = y0_arr.ndim == 1
    if mesh is not None:
        if not ensemble:
            raise ValueError("mesh= requires a (B,) initial-condition array")
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = mesh.shape[mesh_axis]
        if y0_arr.shape[0] % n_dev:
            raise ValueError(
                f"B={y0_arr.shape[0]} must divide over {n_dev} mesh devices"
            )
        y0_arr = jax.device_put(
            y0_arr, NamedSharding(mesh, PartitionSpec(mesh_axis))
        )

    if iteration is None:
        mops = dg_time_operators_mixed(n_max + fine_offset, n_gq)
        interp = dg_adjoint_interp_mixed(mops)
        radau = (
            dg_radau_interp_mixed(mops)
            if adjoint_mode == "reconstruct" else None
        )
        if engine == "pallas":
            if not ensemble:
                raise ValueError(
                    "engine='pallas' requires an ensemble (B,) y0"
                )
            b_ens = int(y0_arr.shape[0])
            n_shard = 1 if mesh is None else mesh.shape[mesh_axis]
            if b_ens % (8 * n_shard):
                raise ValueError(
                    f"B={b_ens} must be a multiple of 8 per shard "
                    f"({n_shard} devices): the kernel maps members onto "
                    "8-row sublane tiles"
                )
            from adjoint_ode_adaptivity_tpu.ops.pallas import (
                ensure_scoped_vmem,
            )
            from adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab_mixed import (
                make_pallas_dg_estimate_hp_per_member,
            )

            ensure_scoped_vmem()
            _pl_run = make_pallas_dg_estimate_hp_per_member(
                mops, interp, f, None, max_k, n_max_user=n_max,
                fine_offset=fine_offset, g_u=g_u,
                newton_iters=newton_iters or 8,
                interpret=jax.default_backend() != "tpu",
                adjoint_mode=adjoint_mode, rad=radau,
            )
            if mesh is not None:
                from adjoint_ode_adaptivity_tpu.parallel.ensemble import (
                    ensemble_batched,
                )

                # the broadcast copies shard WITH the members
                _pl_dp = ensemble_batched(
                    lambda y, t, n, _r=_pl_run: _r(t, n, y),
                    mesh, axis=mesh_axis, shard_extras={0, 1},
                )
                _pl_run = lambda t, n, y: _pl_dp(y, t, n)  # noqa: E731

            def _pallas_members(times, ns):
                """Shared partition/orders broadcast over the ensemble."""
                t_b = jnp.broadcast_to(times, (b_ens,) + times.shape)
                n_b = jnp.broadcast_to(ns, (b_ens,) + ns.shape)
                u_b, u_fb, v_b, err_b = _pl_run(t_b, n_b, y0_arr)
                j_cb = jax.vmap(
                    lambda u_m: dg_element_functional_mixed(
                        mops, u_m, times, ns, g
                    )
                )(u_b)
                j_fb = jax.vmap(
                    lambda u_m: dg_element_functional_mixed(
                        mops, u_m, times, ns + fine_offset, g
                    )
                )(u_fb)
                return u_b, v_b, err_b, j_cb, j_fb

        _member = _make_member_solver(
            mops, interp, radau, f, g, g_u, fine_offset, adjoint_mode,
            newton_tol, newton_maxit, newton_iters,
        ) if engine == "xla" else None
        _smooth = (
            _make_modal_smoothness(n_max, mops.np_max, smooth_theta)
            if mode == "smooth" else None
        )

        @jax.jit
        def iteration(times, ns):
            if ensemble:
                if engine == "pallas":
                    u_b, v_b, err_b, j_cb, j_fb = _pallas_members(times, ns)
                else:
                    u_b, v_b, err_b, j_cb, j_fb = jax.vmap(
                        lambda ym: _member(times, ns, ym)
                    )(jnp.asarray(y0_arr))
                u_r, v_r = u_b, v_b
                err_adj = jnp.mean(err_b, axis=0)  # signed mean (history/est)
                abs_err = jnp.mean(jnp.abs(err_b), axis=0)  # the signal
                j_c, j_f = jnp.mean(j_cb), jnp.mean(j_fb)
            else:
                u_r, v_r, err_adj, j_c, j_f = _member(times, ns, y0)
                abs_err = jnp.abs(err_adj)
            smooth_ok = None
            if mode == "smooth":
                u_s = jnp.mean(u_r, axis=0) if ensemble else u_r
                smooth_ok = _smooth(u_s, ns)
            times_new, ns_new = _refine_candidate(
                times, ns, abs_err, mode, n_max, do_p, do_h, smooth_ok
            )
            # Σ err computed HERE so the host and device-loop paths use the
            # bit-identical value (XLA would otherwise reassociate the
            # mean+sum reduction differently inside the fused while_loop)
            est = jnp.sum(err_adj)
            return (
                u_r, v_r, err_adj, j_c, j_f, est, times_new, ns_new,
            )

    run_fused = None
    fused_args = None

    def _wrap(hist):
        # list subclass so the return value can carry the prebuilt jitted
        # callables for warm reuse (bench.py) without changing the API
        class _HPHistory(list):
            pass

        out = _HPHistory(hist)
        out.iteration = iteration
        out.run_fused = run_fused
        out.fused_args = fused_args
        return out

    history: list[HPAdaptResult] = []
    n_active = k0
    it0 = 0
    if checkpoint_dir is not None:
        if raw_ckpt is not None:
            raw = raw_ckpt
            history = [
                HPAdaptResult(
                    times=np.asarray(h["times"]),
                    ns=np.asarray(h["ns"]),
                    u=np.asarray(h["u"]),
                    v=np.asarray(h["v"]),
                    err=np.asarray(h["err"]),
                    j_coarse=float(h["j_coarse"]),
                    j_fine=float(h["j_fine"]),
                    effectivity_gap=float(h["effectivity_gap"]),
                    est_total=float(h["est_total"]),
                )
                for h in raw["history"]
            ]
            times = np.asarray(raw["times"])
            ns = np.asarray(raw["ns"], np.int32)
            n_active = int(raw["n_active"])
            # a resumed run may ask for MORE iterations: re-pad to this
            # run's max_k (zero-width slabs are exact identities)
            if len(times) < max_k + 1:
                times = np.concatenate(
                    [times, np.full(max_k + 1 - len(times), times[-1])]
                )
                ns = np.concatenate(
                    [ns, np.ones(max_k - len(ns), np.int32)]
                )
            it0 = len(history)
            if abs(history[-1].est_total) < tol:
                return _wrap(history)
            if bool(np.asarray(raw.get("saturated", False))):
                # the run stopped because nothing could refine (p-mode with
                # every live element order-saturated): re-running the
                # identical iteration would append a duplicate history entry
                return _wrap(history)
    times = jnp.asarray(times)
    ns = jnp.asarray(ns)
    if device_loop:
        shapes = jax.eval_shape(iteration, times, ns)
        n_nodes = times.shape[0]
        t_dtype = times.dtype

        @jax.jit
        def _run_fused(times, ns):
            bufs = tuple(
                jnp.zeros((maxit + 1,) + s.shape, s.dtype) for s in shapes[:5]
            ) + (
                jnp.zeros((maxit + 1, n_nodes), t_dtype),
                jnp.zeros((maxit + 1, ns.shape[0]), jnp.int32),
                jnp.zeros((maxit + 1,), shapes[2].dtype),  # Σerr
            )
            if mesh is not None:
                # shard the (maxit+1, B, ·) u/v history buffers on the
                # member axis — XLA would otherwise replicate the largest
                # buffers in the module across the mesh
                from jax.sharding import NamedSharding, PartitionSpec

                spec = NamedSharding(mesh, PartitionSpec(None, mesh_axis))
                n_members = int(y0_arr.shape[0])  # mesh= implies ensemble
                bufs = tuple(
                    jax.lax.with_sharding_constraint(bb, spec)
                    if bb.ndim >= 2 and bb.shape[1] == n_members else bb
                    for bb in bufs
                )

            def body(carry):
                t, nsv, bufs, it, _ = carry
                u, v, err, j_c, j_f, est, t_new, ns_new = iteration(t, nsv)
                done = jnp.abs(est) < tol
                changed = jnp.any(t_new != t) | jnp.any(ns_new != nsv)
                rows = (u, v, err, j_c, j_f, t, nsv, est)
                zero = jnp.zeros_like(it)
                bufs = tuple(
                    jax.lax.dynamic_update_slice(
                        b,
                        jnp.asarray(r, b.dtype)[None],
                        (it,) + (zero,) * (b.ndim - 1),
                    )
                    for b, r in zip(bufs, rows)
                )
                t = jnp.where(done, t, t_new)
                nsv = jnp.where(done, nsv, ns_new)
                # continue while the tolerance test fails AND something
                # refined (a saturated p-only study stops)
                return (t, nsv, bufs, it + 1, ~done & changed)

            def cond(carry):
                _, _, _, it, cont = carry
                return (it <= maxit) & cont

            t_f, ns_f, bufs, n_done, _ = jax.lax.while_loop(
                cond, body,
                (times, ns, bufs, jnp.int32(it0), jnp.array(True)),
            )
            return t_f, ns_f, bufs, n_done

        run_fused = _run_fused
        fused_args = (times, ns)
        t_f, ns_f, bufs, n_done = _run_fused(times, ns)
        n_done = int(n_done)
        bufs = [np.asarray(b) for b in bufs]
        for i in range(it0, n_done):
            t_i = bufs[5][i]
            na = int((np.diff(t_i) > 0).sum())
            result = HPAdaptResult(
                times=t_i[: na + 1].copy(),
                ns=bufs[6][i][:na].copy(),
                u=bufs[0][i][..., :na, :],
                v=bufs[1][i][..., :na, :],
                err=bufs[2][i][:na],
                j_coarse=float(bufs[3][i]),
                j_fine=float(bufs[4][i]),
                effectivity_gap=float(bufs[3][i]) - float(bufs[4][i]),
                est_total=float(bufs[7][i]),
            )
            history.append(result)
            if callback is not None:
                callback(result)
        if checkpoint_dir is not None and n_done > it0:
            from adjoint_ode_adaptivity_tpu.train.checkpoint import (
                save_checkpoint,
            )

            # the while_loop stops for one of three reasons: tol reached
            # (caught by the resume's est test), maxit exhausted, or
            # SATURATION (nothing could refine) — persist the third so a
            # resume doesn't re-run the identical iteration
            sat = n_done <= maxit and abs(float(bufs[7][n_done - 1])) >= tol
            t_f = np.asarray(t_f)
            save_checkpoint(
                checkpoint_dir,
                len(history),
                {
                    "times": t_f,
                    "ns": np.asarray(ns_f),
                    "n_active": int((np.diff(t_f) > 0).sum()),
                    "saturated": sat,
                    "history": [dict(r._asdict()) for r in history],
                },
            )
        return _wrap(history)
    saturated = False
    for it in range(it0, maxit + 1):
        u, v, err, j_c, j_f, est, times_new, ns_new = iteration(times, ns)
        est_total = float(est)
        result = HPAdaptResult(
            times=np.asarray(times)[: n_active + 1].copy(),
            ns=np.asarray(ns)[:n_active].copy(),
            u=np.asarray(u)[..., :n_active, :],
            v=np.asarray(v)[..., :n_active, :],
            err=np.asarray(err)[:n_active],
            j_coarse=float(j_c),
            j_fine=float(j_f),
            effectivity_gap=float(j_c) - float(j_f),
            est_total=est_total,
        )
        history.append(result)
        if callback is not None:
            callback(result)
        done = abs(est_total) < tol
        if not done:
            # refine unconditionally when not tol-done (dg_loop's contract:
            # the checkpoint always holds the REFINED state, so resuming
            # with a larger maxit continues exactly where an uninterrupted
            # run would be)
            t_new = np.asarray(times_new)
            changed_t = not np.array_equal(t_new, np.asarray(times))
            changed = changed_t or not np.array_equal(
                np.asarray(ns_new), np.asarray(ns)
            )
            if changed_t:
                # h-refinement grew the active count
                n_active += 1
            times, ns = times_new, ns_new
            if not changed:
                # p-mode with every live element order-saturated: nothing
                # can refine, further iterations would re-run identically
                done = saturated = True
        if checkpoint_dir is not None:
            from adjoint_ode_adaptivity_tpu.train.checkpoint import (
                save_checkpoint,
            )

            save_checkpoint(
                checkpoint_dir,
                len(history),
                {
                    "times": np.asarray(times),
                    "ns": np.asarray(ns),
                    "n_active": n_active,
                    "saturated": saturated,
                    "history": [dict(r._asdict()) for r in history],
                },
            )
        if done or it == maxit:
            break
    return _wrap(history)


class HPPerMemberAdaptResult(NamedTuple):
    """One iteration of the per-member hp study (arrays over members)."""

    times: np.ndarray  # (B, max_k+1) per-member partitions
    ns: np.ndarray  # (B, max_k) per-member order vectors
    err: np.ndarray  # (B, max_k) per-element contributions
    j_coarse: np.ndarray  # (B,)
    j_fine: np.ndarray  # (B,)
    est_total: np.ndarray  # (B,) per-member Σ err
    n_active: np.ndarray  # (B,) live element counts
    n_refining: int  # members still refining after this iteration


def run_adaptive_dg_hp_per_member(
    f: Callable,
    y0s,
    t_span: tuple[float, float],
    *,
    k0: int = 4,
    n0: int = 1,
    n_max: int = 4,
    mode: str = "hp",
    g: Callable = lambda u, t: u,
    g_u: Callable = lambda u, t: jnp.ones_like(u),
    tol: float = 1e-8,
    maxit: int = 30,
    fine_offset: int = 2,
    n_gq: int | None = None,
    newton_tol: float = 1e-7,
    newton_maxit: int = 500,
    newton_iters: int | None = None,
    adjoint_mode: str = "solve",
    engine: str = "xla",
    smooth_theta: float = 0.3,
    mesh=None,
    mesh_axis: str = "data",
    checkpoint_dir: str | None = None,
    iteration=None,
    device_loop: bool = False,
) -> list[HPPerMemberAdaptResult]:
    """PER-MEMBER hp-adaptive DG-in-time: every member of the (B,)
    initial-condition ensemble owns its OWN partition AND order vector,
    p/h-refines its own |AWR| argmax, and freezes at ``tol``
    independently — the reference's one-adaptive-job-per-IC farm
    (Submit_schedule_frontera) extended to the hp axis, vmapped into one
    compile-once jit.  A member also freezes when nothing can refine
    (mode='p' with every live element order-saturated).

    ``device_loop=True`` runs the whole study as one ``lax.while_loop``
    dispatch (on-device freeze bookkeeping and early exit, one fetch;
    history bit-identical to the host loop — tested).  ``mesh``
    data-parallelizes the members over ``mesh_axis`` (initial conditions,
    per-member partitions and order vectors all shard member-wise;
    decisions pinned equal to the single-device loop in tests).

    ``checkpoint_dir``: orbax-checkpoint the per-member partitions,
    order vectors, refining mask and history each iteration (one
    end-of-run save in device_loop mode) and resume from the latest
    checkpoint when present — same contract as the other adaptive
    loops.

    ``iteration``: prebuilt jitted per-iteration function from a prior
    identically-configured call (the returned history carries
    ``.iteration`` / ``.run_fused`` / ``.fused_args``) for genuinely warm
    re-runs — same contract as :func:`run_adaptive_dg_hp`.

    ``engine="pallas"`` fuses each iteration's whole per-member mixed-
    order pipeline — coarse march at ``ns``, fine at ``ns+fine_offset``,
    adjoint at ``ns+1``, AWR — into ONE kernel launch
    (:func:`~adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab_mixed.make_pallas_dg_estimate_hp_per_member`;
    per-member partitions AND order vectors ride as register-tile
    operands, so refinement never retraces).  Requires an elementwise
    ``f``/``g_u``, ``adjoint_mode="solve"`` and B a multiple of 8; uses
    fixed-count Newton (``newton_iters``, default 8).  Decisions are
    pinned equal to the XLA engine in tests (f32 roundoff on the
    signal)."""
    # build the scalar-iteration factory once; vmap it over members
    b = int(np.asarray(y0s).shape[0])
    if engine not in ("xla", "pallas"):
        raise ValueError(engine)
    if mode not in ("h", "p", "hp", "smooth"):
        raise ValueError(
            f"mode must be 'h', 'p', 'hp' or 'smooth', got {mode!r}"
        )
    if not 1 <= n0 <= n_max:
        raise ValueError(f"n0={n0} must satisfy 1 <= n0 <= n_max={n_max}")
    if adjoint_mode not in ("solve", "reconstruct"):
        raise ValueError(f"unknown adjoint_mode {adjoint_mode!r}")
    if fine_offset < 1:
        raise ValueError(
            "fine_offset must be >= 1: the adjoint solves at ns+1, which "
            "must fit the operator stack (silent table clamping otherwise "
            "- see march.dg_mixed._check_orders)"
        )
    do_p = mode in ("p", "hp", "smooth")
    do_h = mode in ("h", "hp", "smooth")
    history: list[HPPerMemberAdaptResult] = []
    it0 = 0
    restored = None
    if checkpoint_dir is not None:
        from adjoint_ode_adaptivity_tpu.train.checkpoint import (
            latest_step,
            restore_checkpoint_raw,
        )

        if latest_step(checkpoint_dir) is not None:
            raw = restore_checkpoint_raw(checkpoint_dir)
            history = [
                HPPerMemberAdaptResult(
                    times=np.asarray(h["times"]),
                    ns=np.asarray(h["ns"]),
                    err=np.asarray(h["err"]),
                    j_coarse=np.asarray(h["j_coarse"]),
                    j_fine=np.asarray(h["j_fine"]),
                    est_total=np.asarray(h["est_total"]),
                    n_active=np.asarray(h["n_active"]),
                    n_refining=int(h["n_refining"]),
                )
                for h in raw["history"]
            ]
            restored = raw
            it0 = len(history)
            if history[-1].n_refining == 0:
                from adjoint_ode_adaptivity_tpu.adapt.dg_loop import (
                    _resumed_history,
                )

                return _resumed_history(history)
    max_k = k0 + (maxit + 1 if mode != "p" else 1)
    if restored is not None:
        max_k = max(max_k, np.asarray(restored["times"]).shape[1] - 1)
    if restored is not None:
        # re-pad the restored per-member state to this run's max_k
        # (zero-width slabs at order 1 are exact identities)
        t_res = np.asarray(restored["times"])
        n_res = np.asarray(restored["ns"])
        if t_res.shape[1] < max_k + 1:
            t_res = np.concatenate(
                [
                    t_res,
                    np.repeat(
                        t_res[:, -1:], max_k + 1 - t_res.shape[1], axis=1
                    ),
                ],
                axis=1,
            )
            n_res = np.concatenate(
                [
                    n_res,
                    np.ones((b, max_k - n_res.shape[1]), np.int32),
                ],
                axis=1,
            )
        times0 = jnp.asarray(t_res)
        ns0 = jnp.asarray(n_res.astype(np.int32))
        refining0 = jnp.asarray(np.asarray(restored["refining"]) != 0)
        if history and history[0].times.shape[1] < max_k + 1:
            # re-pad restored HISTORY rows too, so the whole history is
            # shape-uniform (same hardening as the per-member FD/DG loops)
            def _repad(r):
                wt = max_k + 1 - r.times.shape[1]
                return r._replace(
                    times=np.concatenate(
                        [r.times, np.repeat(r.times[:, -1:], wt, axis=1)],
                        axis=1,
                    ),
                    ns=np.concatenate(
                        [r.ns, np.ones((b, wt), r.ns.dtype)], axis=1
                    ),
                    err=np.concatenate(
                        [r.err, np.zeros((r.err.shape[0], wt))], axis=1
                    ),
                )

            history = [_repad(r) for r in history]
    else:
        row_t = np.linspace(t_span[0], t_span[1], k0 + 1)
        row_t = np.concatenate([row_t, np.full(max_k - k0, row_t[-1])])
        times0 = jnp.asarray(np.broadcast_to(row_t, (b, max_k + 1)).copy())
        row_n = np.concatenate(
            [np.full(k0, n0, np.int32), np.ones(max_k - k0, np.int32)]
        )
        ns0 = jnp.asarray(np.broadcast_to(row_n, (b, max_k)).copy())
        refining0 = jnp.ones((b,), bool)
    y0_arr = jnp.asarray(np.asarray(y0s))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = mesh.shape[mesh_axis]
        if b % n_dev:
            raise ValueError(f"B={b} must divide over {n_dev} mesh devices")
        shard_b = NamedSharding(mesh, PartitionSpec(mesh_axis))
        shard_b2 = NamedSharding(mesh, PartitionSpec(mesh_axis, None))
        y0_arr = jax.device_put(y0_arr, shard_b)
        times0 = jax.device_put(times0, shard_b2)
        ns0 = jax.device_put(ns0, shard_b2)
        refining0 = jax.device_put(refining0, shard_b)

    if iteration is None:
        mops = dg_time_operators_mixed(n_max + fine_offset, n_gq)
        interp = dg_adjoint_interp_mixed(mops)
        radau = (
            dg_radau_interp_mixed(mops)
            if adjoint_mode == "reconstruct" else None
        )
        if engine == "pallas":
            from adjoint_ode_adaptivity_tpu.ops.pallas import (
                ensure_scoped_vmem,
            )
            from adjoint_ode_adaptivity_tpu.ops.pallas.dg_slab_mixed import (
                make_pallas_dg_estimate_hp_per_member,
            )

            ensure_scoped_vmem()
            pallas_run = make_pallas_dg_estimate_hp_per_member(
                mops, interp, f, None, max_k, n_max_user=n_max,
                fine_offset=fine_offset, g_u=g_u,
                newton_iters=newton_iters or 8,
                interpret=jax.default_backend() != "tpu",
                adjoint_mode=adjoint_mode, rad=radau,
            )
            if mesh is not None:
                from adjoint_ode_adaptivity_tpu.parallel.ensemble import (
                    ensemble_batched,
                )

                n_shard = mesh.shape[mesh_axis]
                if b % (8 * n_shard):
                    raise ValueError(
                        f"B={b} must be a multiple of 8 PER SHARD "
                        f"({n_shard} devices on axis {mesh_axis!r}): the "
                        "kernel maps members onto 8-row sublane tiles"
                    )
                # per-member times AND orders shard WITH the members
                _hp_dp = ensemble_batched(
                    lambda y, t, n, _run=pallas_run: _run(t, n, y),
                    mesh, axis=mesh_axis, shard_extras={0, 1},
                )
                pallas_run = lambda t, n, y: _hp_dp(y, t, n)  # noqa: E731

            def _solve_batch(times_b, ns_b):
                u_c, u_f, _v, err = pallas_run(times_b, ns_b, y0_arr)
                j_c = jax.vmap(
                    lambda u_m, t_m, n_m: dg_element_functional_mixed(
                        mops, u_m, t_m, n_m, g
                    )
                )(u_c, times_b, ns_b)
                j_f = jax.vmap(
                    lambda u_m, t_m, n_m: dg_element_functional_mixed(
                        mops, u_m, t_m, n_m + fine_offset, g
                    )
                )(u_f, times_b, ns_b)
                return u_c, err, j_c, j_f

        else:
            member = _make_member_solver(
                mops, interp, radau, f, g, g_u, fine_offset, adjoint_mode,
                newton_tol, newton_maxit, newton_iters,
            )

            def _solve_batch(times_b, ns_b):
                def one(t_m, n_m, y_m):
                    u_m, _, err_adj, j_c, j_f = member(t_m, n_m, y_m)
                    return u_m, err_adj, j_c, j_f

                return jax.vmap(one)(times_b, ns_b, y0_arr)

        _smooth = (
            _make_modal_smoothness(n_max, mops.np_max, smooth_theta)
            if mode == "smooth" else None
        )

        @jax.jit
        def iteration(times_b, ns_b, refining):
            u_cb, err, j_c, j_f = _solve_batch(times_b, ns_b)
            est = jnp.sum(err, axis=1)
            if mode == "smooth":
                sm_b = jax.vmap(_smooth)(u_cb, ns_b)
                t_new, n_new = jax.vmap(
                    lambda t_m, n_m, e_m, s_m: _refine_candidate(
                        t_m, n_m, e_m, mode, n_max, do_p, do_h, s_m
                    )
                )(times_b, ns_b, jnp.abs(err), sm_b)
            else:
                t_new, n_new = jax.vmap(
                    lambda t_m, n_m, e_m: _refine_candidate(
                        t_m, n_m, e_m, mode, n_max, do_p, do_h
                    )
                )(times_b, ns_b, jnp.abs(err))
            done = jnp.abs(est) < tol
            changed = jnp.any(t_new != times_b, axis=1) | jnp.any(
                n_new != ns_b, axis=1
            )
            # a member refines while it was refining and the tolerance test
            # still fails; it also freezes when nothing could refine
            apply = refining & ~done
            times_out = jnp.where(apply[:, None], t_new, times_b)
            ns_out = jnp.where(apply[:, None], n_new, ns_b)
            refining_out = apply & changed
            n_active = jnp.sum(
                (times_b[:, 1:] - times_b[:, :-1]) > 0, axis=1
            ).astype(jnp.int32)
            return times_out, ns_out, refining_out, err, j_c, j_f, est, n_active

    run_fused = None
    fused_args = None

    def _wrap(hist):
        class _HPPMHistory(list):
            pass

        out = _HPPMHistory(hist)
        out.iteration = iteration
        out.run_fused = run_fused
        out.fused_args = fused_args
        return out

    def _save(times_s, ns_s, refining_s):
        if checkpoint_dir is None:
            return
        from adjoint_ode_adaptivity_tpu.train.checkpoint import (
            save_checkpoint,
        )

        save_checkpoint(
            checkpoint_dir,
            len(history),
            {
                "times": np.asarray(times_s),
                "ns": np.asarray(ns_s).astype(np.int32),
                "refining": np.asarray(refining_s).astype(np.int32),
                "history": [dict(r._asdict()) for r in history],
            },
        )

    if device_loop:
        shapes = jax.eval_shape(
            iteration, times0, ns0, jnp.ones((b,), bool)
        )

        @jax.jit
        def _run_fused(times_b, ns_b, refining_b):
            bufs = tuple(
                jnp.zeros((maxit + 1,) + s.shape, s.dtype)
                for s in shapes[3:]
            ) + (
                jnp.zeros((maxit + 1,) + times_b.shape, times_b.dtype),
                jnp.zeros((maxit + 1,) + ns_b.shape, jnp.int32),
                jnp.zeros((maxit + 1,), jnp.int32),
            )
            if mesh is not None:
                # shard the history buffers on the member axis like the
                # FD/DG device loops — XLA would otherwise replicate them
                # (per-device memory × n_devices at ensemble scale)
                from jax.sharding import NamedSharding, PartitionSpec

                spec = NamedSharding(mesh, PartitionSpec(None, mesh_axis))
                bufs = tuple(
                    jax.lax.with_sharding_constraint(bb, spec)
                    if bb.ndim >= 2 and bb.shape[1] == b else bb
                    for bb in bufs
                )

            def body(carry):
                t, nsv, refining, bufs, it, _ = carry
                t_new, ns_new, ref_new, err, j_c, j_f, est, n_act = iteration(
                    t, nsv, refining
                )
                rows = (err, j_c, j_f, est, n_act, t, nsv,
                        jnp.sum(ref_new).astype(jnp.int32))
                zero = jnp.zeros_like(it)
                bufs = tuple(
                    jax.lax.dynamic_update_slice(
                        bb, jnp.asarray(r, bb.dtype)[None],
                        (it,) + (zero,) * (bb.ndim - 1),
                    )
                    for bb, r in zip(bufs, rows)
                )
                return (t_new, ns_new, ref_new, bufs, it + 1,
                        jnp.any(ref_new))

            def cond(carry):
                _, _, _, _, it, cont = carry
                return (it <= maxit) & cont

            t_f, ns_f, ref_f, bufs, n_done, _ = jax.lax.while_loop(
                cond, body,
                (times_b, ns_b, refining_b, bufs, jnp.int32(it0),
                 jnp.array(True)),
            )
            return bufs, n_done, t_f, ns_f, ref_f

        def run_fused(times_b, ns_b, refining_b=None):
            if refining_b is None:  # bench warm-reuse calls (t, ns) only
                refining_b = jnp.ones((times_b.shape[0],), bool)
            bufs, n_done, *_ = _run_fused(times_b, ns_b, refining_b)
            return bufs, n_done

        fused_args = (times0, ns0)
        bufs, n_done, t_f, ns_f, ref_f = _run_fused(times0, ns0, refining0)
        n_done = int(n_done)
        bufs = [np.asarray(x) for x in bufs]
        for i in range(it0, n_done):
            history.append(HPPerMemberAdaptResult(
                times=bufs[5][i], ns=bufs[6][i], err=bufs[0][i],
                j_coarse=bufs[1][i], j_fine=bufs[2][i], est_total=bufs[3][i],
                n_active=bufs[4][i], n_refining=int(bufs[7][i]),
            ))
        if n_done > it0:
            # guard a zero-iteration resume (it0 > maxit): re-saving at an
            # existing orbax step would raise (same guard as the FD/DG
            # device loops)
            _save(t_f, ns_f, ref_f)
        return _wrap(history)

    times_b, ns_b = times0, ns0
    refining = refining0
    for it in range(it0, maxit + 1):
        t_new, ns_new, ref_new, err, j_c, j_f, est, n_act = iteration(
            times_b, ns_b, refining
        )
        history.append(HPPerMemberAdaptResult(
            times=np.asarray(times_b), ns=np.asarray(ns_b),
            err=np.asarray(err), j_coarse=np.asarray(j_c),
            j_fine=np.asarray(j_f), est_total=np.asarray(est),
            n_active=np.asarray(n_act),
            n_refining=int(jnp.sum(ref_new)),
        ))
        _save(t_new, ns_new, ref_new)
        if not bool(jnp.any(ref_new)) or it == maxit:
            break
        times_b, ns_b, refining = t_new, ns_new, ref_new
    return _wrap(history)
