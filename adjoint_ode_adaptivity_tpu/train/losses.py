"""Loss functions for training networks through the differentiable solver.

Reference parity:
- terminal MSE ``lossFn`` (Main_new_loss.py:139-142,
  Main_variable_params.py:137-140): square of the terminal mismatch.
- trajectory ("new") loss ``newLossFn`` (Main_new_loss.py:145-150):
  trapezoid rule of squared error over the whole trajectory.
- mixed ramp (Main_new_loss.py:163-165): terminal loss weighted by
  ``10**((it+1)//10 − 4)`` added to the trajectory loss.
- full-trajectory MSE (Main_FD_with_net.py:96-99): mean squared error
  against the whole odeint trajectory.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["terminal_mse", "trajectory_trapezoid", "mixed_ramp_weight", "trajectory_mse"]


def terminal_mse(u_traj: jnp.ndarray, true_terminal: jnp.ndarray) -> jnp.ndarray:
    return jnp.squeeze(jnp.square(jnp.squeeze(u_traj[-1]) - jnp.squeeze(true_terminal)))


def trajectory_trapezoid(
    u_traj: jnp.ndarray, true_traj: jnp.ndarray, dt: jnp.ndarray
) -> jnp.ndarray:
    """Σ dt·(e²_n + e²_{n+1})/2 over the trajectory."""
    e = jnp.squeeze(u_traj) - jnp.squeeze(true_traj)
    e2 = jnp.square(e)
    return jnp.squeeze(jnp.dot((e2[:-1] + e2[1:]) / 2.0, dt))


def mixed_ramp_weight(it: jnp.ndarray | int) -> jnp.ndarray:
    """Terminal-loss weight 10**((it+1)//10 − 4) ramping up every 10 outer
    iterations."""
    return 10.0 ** ((it + 1) // 10 - 4)


def trajectory_mse(u_traj: jnp.ndarray, true_traj: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(u_traj - true_traj))
