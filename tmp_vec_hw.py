import time
import numpy as np
import jax, jax.numpy as jnp
from adjoint_ode_adaptivity_tpu.ops.pallas import ensure_scoped_vmem
ensure_scoped_vmem()
from adjoint_ode_adaptivity_tpu import odes
from adjoint_ode_adaptivity_tpu.adjoint import (adjoint_march, coarse_indicator, interp_to_fine, refine_all, residual)
from adjoint_ode_adaptivity_tpu.march import euler_step, forward_march
from adjoint_ode_adaptivity_tpu.ops.pallas.fd_ensemble import make_pallas_fd_ensemble_vec

v_steps, v_rf = 16, 4
v_dt = jnp.full((v_steps,), 2.0/v_steps, jnp.float32)
v_dtf = refine_all(v_dt, v_rf)
step = euler_step(odes.get_ode("harmonic_oscillator").f)
def val(u_f): return jnp.sum((u_f[:-1]**2).sum(-1)*v_dtf)
def one(u0):
    u = forward_march(step, u0, v_dt)
    u_f = interp_to_fine(u, v_dt, v_dtf)
    k = jax.grad(val)(u_f)
    v = adjoint_march(step, u_f, v_dtf, k)
    res = residual(step, u_f, v_dtf)
    return coarse_indicator((res*v).sum(-1), v_rf, "block")
u0s = jnp.asarray(np.random.default_rng(21).uniform(-1,1,(102400,2)), jnp.float32)
want = jax.vmap(one)(u0s).T
run = make_pallas_fd_ensemble_vec(lambda us,t:(us[1],-4.0*us[0]), lambda us,t:((0.0,1.0),(-4.0,0.0)), 2, v_steps, v_rf, dt=2.0/v_steps)
t0=time.time(); got = jax.block_until_ready(run(u0s)); print("compile+run", time.time()-t0)
err = float(jnp.max(jnp.abs(got-want))); scale=float(jnp.max(jnp.abs(want)))
print("max_abs_err", err, "scale", scale)
assert err < 2e-4*scale + 1e-6, "MISMATCH"
print("HW PARITY OK")
