"""Pipeline-parallel time march over a ``pipe`` mesh axis (GPipe-style).

The per-step-params ResNetODE (one residual block per time step — the
reference's ``params_list`` marches, python/Main_variable_params.py:46-65)
is a chain of S heterogeneous stages: exactly the shape pipeline
parallelism wants. Device d of a D-device ``pipe`` axis owns the
parameters of the contiguous step range [d·S/D, (d+1)·S/D); microbatches
of initial conditions flow through the ring — each tick every device
advances its resident microbatch through its local steps (a ``lax.scan``)
and hands the state to the next device with ``lax.ppermute`` over ICI.
After M + D − 1 ticks all M microbatches have exited the last stage
(bubble fraction (D−1)/(M+D−1), the standard GPipe schedule).

Unlike hand-written pipeline frameworks there is no separate backward
schedule: ``jax.grad`` through the tick scan transposes every
``ppermute`` into the reverse-direction transfer automatically, so the
same function is a pipeline-parallel *training* step (tested equal to the
single-device march's gradients).

Per-device parameter memory is S/D stacked blocks instead of S — this is
the memory-scaling story for deep ResNetODE stacks, complementing the
``data`` (ensemble) and ``model`` (width/tensor) axes in parallel/mesh.py.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_march"]


def pipeline_march(
    step_fn: Callable,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: str | None = None,
) -> Callable:
    """Build a pipeline-parallel march over ``mesh`` axis ``axis``.

    ``step_fn(u, t, dt, params_n) -> u'`` is the same per-step contract as
    ``march.fd.forward_march_per_step``. Returns

        ``fn(params_stacked, dt, u0s, t0=0.0) -> finals``

    with ``params_stacked`` a pytree stacked over the S steps (leading
    axis S), ``dt`` shape (S,), ``u0s`` shape (M, *state) — M microbatches
    (each entry is itself typically a vmapped batch of ICs) — and
    ``finals`` shape (M, *state): the states after all S steps, identical
    to marching each microbatch through ``forward_march_per_step``
    (tested to roundoff, gradients included). S must divide evenly by the
    axis size; pick M ≥ a few × D to amortize the (D−1)-tick bubble.

    With ``data_axis`` set (a second mesh axis), each microbatch's member
    dimension (``u0s`` dim 1) is additionally sharded over that axis — the
    dp × pp composition: pipeline transfers ride ``axis`` while each stage
    processes only its ``data_axis`` slice of the members.
    """
    d_size = mesh.shape[axis]

    def stage(params_local, t_local, dt_local, u):
        """Advance ``u`` through this device's S/D steps."""

        def body(carry, x):
            t_n, dt_n, p_n = x
            return step_fn(carry, t_n, dt_n, p_n), None

        out, _ = lax.scan(body, u, (t_local, dt_local, params_local))
        return out

    def local(params_local, t_local, dt_local, u0s):
        d = lax.axis_index(axis)
        m = u0s.shape[0]
        n_ticks = m + d_size - 1

        def tick(buf, t):
            # device 0 feeds microbatch t; the rest consume what arrived
            # from the previous stage at the end of the last tick
            feed = lax.dynamic_index_in_dim(
                u0s, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            inp = jnp.where(d == 0, feed, buf)
            out = stage(params_local, t_local, dt_local, inp)
            nxt = lax.ppermute(
                out, axis, [(i, (i + 1) % d_size) for i in range(d_size)]
            )
            return nxt, out

        # the carry becomes device-varying after the first ppermute; mark
        # the (zero) initial buffer varying so the scan carry types match
        init = lax.pcast(jnp.zeros_like(u0s[0]), (axis,), to="varying")
        _, outs = lax.scan(tick, init, jnp.arange(n_ticks))
        # the last device's outputs at ticks D−1 … M+D−2 are the pipeline
        # exits of microbatches 0 … M−1; broadcast them to every device
        finals = outs[d_size - 1 :]
        finals = lax.psum(
            jnp.where(d == d_size - 1, finals, jnp.zeros_like(finals)), axis
        )
        return finals

    def fn(params_stacked, dt, u0s, t0: float = 0.0):
        dt = jnp.asarray(dt)
        t_starts = t0 + jnp.concatenate(
            [jnp.zeros((1,), dt.dtype), jnp.cumsum(dt)[:-1]]
        )
        n_steps = dt.shape[0]
        if n_steps % d_size:
            raise ValueError(
                f"n_steps={n_steps} not divisible by pipe axis size {d_size}"
            )
        u_spec = P(None, data_axis) if data_axis else P()
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), u_spec),
            out_specs=u_spec,
        )(params_stacked, t_starts, dt, jnp.asarray(u0s))

    return fn
