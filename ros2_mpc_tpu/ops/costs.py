"""Stage-cost building blocks for the NMPC objectives.

The reference hand-assembles three near-duplicate CasADi objectives:

* tracking (ros2_mpc/planner/local_planner_tracking.py:106-130): time-varying
  quadratic tracking cost plus reverse-motion penalty ``exp(-v)**reverse_factor``;
* point-stabilization (ros2_mpc/planner/local_planner_point_stabilization.py:104-127):
  quadratic drive-to-pose cost with R = 0.5*I and the reverse penalty whose
  exponent is ``cost_factor`` due to swapped kwargs at the call site (:43-47);
* legacy point-stabilization (ros2_mpc/mpc_point_stabilization.py:85-100):
  hardcoded Q = diag(5e-5, 0.05, 0.05), R = 0.01*I, and the only variant that
  actually adds its obstacle cost to the objective (:100).

Two obstacle soft-cost families exist in the reference:

* Gaussian bumps ``gain * exp(-r^2 / inflation_radius^2)``
  (local_planner_point_stabilization.py:60-67) — built but never added to the
  live objective (the ``define_cost_function`` ignores its argument, :104-127);
* inverse-square barrier ``exp(gain * inflation_radius^2 / r^2)``
  (mpc_point_stabilization.py:46-53, local_planner_tracking.py:55-63 via
  ``exp(exp(-log(r^2/ir^2)) * gain)``) — only active in the legacy solver.

Here each term is a tiny pure function of one stage; the solver quadratizes
them with ``jax.grad``/``jax.hessian`` and ``vmap`` adds horizon and scenario
batch axes. Everything is branch-free and static-shape (obstacle vectors are
fixed 160-point pads, matching the reference's parameter vectors).
"""

from __future__ import annotations

import jax.numpy as jnp


def quadratic_error(e: jnp.ndarray, diag: jnp.ndarray) -> jnp.ndarray:
    """``e^T diag(w) e`` — the reference's ``mtimes(mtimes(e.T, Q), e)`` with
    diagonal weights (local_planner_tracking.py:116-123)."""
    return jnp.sum(diag * e * e, axis=-1)


def reverse_penalty(u: jnp.ndarray, factor) -> jnp.ndarray:
    """``(1/exp(v))**factor == exp(-factor * v)`` — penalizes reverse motion
    (local_planner_tracking.py:124, local_planner_point_stabilization.py:125)."""
    return jnp.exp(-factor * u[..., 0])


def gaussian_obstacle_cost(
    xy: jnp.ndarray, obs_x: jnp.ndarray, obs_y: jnp.ndarray, inflation_radius, gain
) -> jnp.ndarray:
    """``gain * sum_j exp(-((x-ox_j)^2 + (y-oy_j)^2) / ir^2)`` for one stage
    position ``xy: (..., 2)`` against padded obstacle vectors ``(n_obs,)``
    (local_planner_point_stabilization.py:60-67)."""
    dx = xy[..., 0:1] - obs_x
    dy = xy[..., 1:2] - obs_y
    r2 = dx * dx + dy * dy
    return gain * jnp.sum(jnp.exp(-r2 / (inflation_radius**2)), axis=-1)


def barrier_obstacle_cost(
    xy: jnp.ndarray, obs_x: jnp.ndarray, obs_y: jnp.ndarray, inflation_radius, gain
) -> jnp.ndarray:
    """``sum_j exp(gain * ir^2 / r_j^2)``.

    The reference writes this as ``exp(exp(-hxy) * gain)`` with
    ``hxy = log(((x-ox)/ir)^2 + ((y-oy)/ir)^2)``
    (mpc_point_stabilization.py:46-53, local_planner_tracking.py:55-63);
    algebraically ``exp(-hxy) = ir^2 / r^2``. A tiny epsilon guards r -> 0
    (the reference would emit inf there too, but IPOPT never evaluates at an
    obstacle center in practice)."""
    dx = xy[..., 0:1] - obs_x
    dy = xy[..., 1:2] - obs_y
    r2 = (dx * dx + dy * dy) / (inflation_radius**2)
    return jnp.sum(jnp.exp(gain / jnp.maximum(r2, 1e-12)), axis=-1)


OBSTACLE_COSTS = {
    "gaussian": gaussian_obstacle_cost,
    "barrier": barrier_obstacle_cost,
}
