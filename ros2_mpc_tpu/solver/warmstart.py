"""Warm-start utilities.

The reference re-zeroes its control guess every tick
(``u0 = np.zeros((mpc.n_controls, mpc.N))`` at
ros2_mpc/scripts/path_follower_local_planner.py:186 and
ros2_mpc/scripts/point_follower_local_planner.py:174) — no shift-and-hold,
which wastes most of the previous solve. Shifting the previous optimal
sequence one step and holding the tail is the standard RTI-style warm start;
the closed-loop drivers here use it by default (the zero guess remains
available for strict reference parity).
"""

from __future__ import annotations

import jax.numpy as jnp


def shift_controls(U: jnp.ndarray) -> jnp.ndarray:
    """Shift ``U: (N, m)`` forward one step, repeating the final control."""
    return jnp.concatenate([U[1:], U[-1:]], axis=0)
