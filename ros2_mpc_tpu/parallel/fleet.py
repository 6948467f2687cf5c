"""Fleet closed-loop evaluation: thousands of simulated robots, one program.

BASELINE.json config 3 is "the full nav loop at fixed control rate"; the
reference runs exactly one robot per process. Here the *entire closed loop*
— per-tick NMPC solve bank, first-control actuation of a vmapped plant,
shift-and-hold warm starts — is a single jitted ``lax.scan`` over control
ticks. One compiled program rolls a whole Monte-Carlo fleet of
(start, goal) scenarios forward in time: the evaluation harness for
controller changes, weight sweeps, and regression gates at fleet scale
("many solves, many chips, one program", SURVEY.md §2).

Obstacles default to far sentinels (open-floor evaluation); pass per-robot
obstacle vectors for cluttered scenes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import unicycle
from ..ops.integrators import rk4_step
from ..solver.warmstart import shift_controls


class FleetResult(NamedTuple):
    final_states: jnp.ndarray  # (B, 3)
    goal_dist: jnp.ndarray  # (B,) final planar distance to goal
    reach_fraction: jnp.ndarray  # scalar: goal_dist < threshold
    mean_dist: jnp.ndarray  # scalar
    trajectories: Optional[jnp.ndarray]  # (T+1, B, 3) when record=True


def make_fleet_rollout(
    problem,
    n_ticks: int,
    dt: float,
    goal_threshold: float = 0.2,
    record: bool = False,
    engine: str = "vmap",
):
    """Build ``rollout(thetas, U0s) -> FleetResult`` — the full closed loop
    under jit. ``thetas`` is a B-leading point-stabilization bank (the goal
    field drives each robot); plant integration is RK4 at the control rate.
    ``engine``: 'vmap' | 'fast' (lane-aligned) | 'pallas' (TPU kernel,
    bank multiple of 1024).
    """
    if engine == "fast":
        from ..solver.batched import make_bank_solver_fast

        batched_solve = make_bank_solver_fast(problem.ocp, problem.settings)
    elif engine == "pallas":
        from ..solver.pallas_kernel import make_pallas_point_stab_solver

        batched_solve = make_pallas_point_stab_solver(problem.ocp, problem.settings)
    else:
        batched_solve = jax.vmap(problem.solve)

    def plant(x, u):
        return rk4_step(unicycle.f, x, u, dt)

    def rollout(thetas, U0s):
        x0s = thetas["x0"]

        def tick(carry, _):
            xs, warm = carry
            th = dict(thetas)
            th["x0"] = xs
            sols = batched_solve(th, warm)
            u0 = sols.U[:, 0]
            u0 = jnp.where(jnp.isfinite(u0), u0, 0.0)  # graceful degradation
            xs_next = jax.vmap(plant)(xs, u0)
            warm_next = jax.vmap(shift_controls)(sols.U)
            return (xs_next, warm_next), (xs_next if record else None)

        (xs, _), traj = jax.lax.scan(tick, (x0s, U0s), None, length=n_ticks)
        goal_dist = jnp.linalg.norm(xs[:, :2] - thetas["goal"][:, :2], axis=-1)
        return FleetResult(
            final_states=xs,
            goal_dist=goal_dist,
            reach_fraction=jnp.mean((goal_dist < goal_threshold).astype(jnp.float32)),
            mean_dist=jnp.mean(goal_dist),
            trajectories=(
                jnp.concatenate([x0s[None], traj], axis=0) if record else None
            ),
        )

    return jax.jit(rollout)


def random_fleet(problem, B: int, seed: int = 0, spread: float = 1.2):
    """A (start, goal) scenario bank on open floor."""
    rng = np.random.default_rng(seed)
    x0 = np.concatenate(
        [rng.uniform(-0.3, 0.3, size=(B, 2)), rng.uniform(-np.pi, np.pi, size=(B, 1))],
        axis=1,
    )
    goal = np.concatenate(
        [rng.uniform(-spread, spread, size=(B, 2)), rng.uniform(0, 2 * np.pi, size=(B, 1))],
        axis=1,
    )
    thetas = jax.vmap(problem.make_theta)(jnp.asarray(x0), jnp.asarray(goal))
    U0 = jnp.zeros((B,) + problem.default_u0.shape)
    return thetas, U0
