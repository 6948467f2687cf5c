"""Smooth-actuation unicycle: velocities as states, accelerations as controls.

Beyond-reference model family. The reference commands (v, w) directly and
then slew-limits the published command on the host as an afterthought
(ros2_mpc/scripts/path_follower_local_planner.py:197-203, quirk #6: +0.03 on
both channels regardless of sign). Putting the actuator dynamics *in* the
OCP makes rate limiting part of the optimization instead of a post-hoc clamp:

    xdot = v cos(theta),  ydot = v sin(theta),  thetadot = w
    vdot = a,             wdot  = alpha

State ``(x, y, theta, v, w)``, control ``(a, alpha)`` — linear and angular
acceleration, box-bounded by the solver's interior-point treatment. The
planned trajectory is then C^1 in velocity by construction: consecutive
controls differ by at most ``a_max * dt`` per channel, which subsumes the
host-side slew hack with physics.
"""

from __future__ import annotations

import jax.numpy as jnp

N_STATES = 5
N_CONTROLS = 2


def f(x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Continuous-time dynamics. ``x``: (..., 5), ``u``: (..., 2)."""
    theta = x[..., 2]
    v = x[..., 3]
    w = x[..., 4]
    return jnp.stack(
        [v * jnp.cos(theta), v * jnp.sin(theta), w, u[..., 0], u[..., 1]],
        axis=-1,
    )
