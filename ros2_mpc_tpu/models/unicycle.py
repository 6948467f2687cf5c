"""Differential-drive unicycle kinematics, JAX-native.

The reference duplicates the same CasADi symbolic model in all three MPC
classes (``get_system_function`` at ros2_mpc/planner/local_planner_tracking.py:161-178,
ros2_mpc/planner/local_planner_point_stabilization.py:159-178,
ros2_mpc/mpc_point_stabilization.py:132-149):

    xdot = v * cos(theta),  ydot = v * sin(theta),  thetadot = w

Here it is one pure function ``f(x, u) -> xdot`` that composes with
``jax.vmap`` (scenario batching), ``jax.jacfwd`` (SQP linearization) and
``jax.lax.scan`` (horizon rollout). State is ``(x, y, theta)``, control is
``(v, w)``.
"""

from __future__ import annotations

import jax.numpy as jnp

N_STATES = 3
N_CONTROLS = 2


def f(x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Continuous-time unicycle dynamics. ``x``: (..., 3), ``u``: (..., 2)."""
    theta = x[..., 2]
    v = u[..., 0]
    w = u[..., 1]
    return jnp.stack([v * jnp.cos(theta), v * jnp.sin(theta), w], axis=-1)
