"""Kinematic bicycle (Ackermann / car-like) model, JAX-native.

Beyond-reference model family: the reference supports exactly one platform —
a differential-drive unicycle duplicated across its three MPC classes
(ros2_mpc/planner/local_planner_tracking.py:161-178 etc.). This framework's
solver core is model-generic (any ``OCP.transition``), so car-like robots
drop in without touching the engines:

    xdot = v * cos(theta)
    ydot = v * sin(theta)
    thetadot = v * tan(delta) / wheelbase

State ``(x, y, theta)``, control ``(v, delta)`` — forward speed and steering
angle. Constant steering drives a circular arc of radius
``wheelbase / tan(delta)`` (the analytic case the unit tests pin).
"""

from __future__ import annotations

import jax.numpy as jnp

N_STATES = 3
N_CONTROLS = 2


def make_f(wheelbase: float = 0.3):
    """Continuous-time dynamics ``f(x, u) -> xdot`` for a given wheelbase [m]."""

    def f(x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        theta = x[..., 2]
        v = u[..., 0]
        delta = u[..., 1]
        return jnp.stack(
            [
                v * jnp.cos(theta),
                v * jnp.sin(theta),
                v * jnp.tan(delta) / wheelbase,
            ],
            axis=-1,
        )

    return f
