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


def _make_batched_solve(problem, engine: str, interpret_default=False, **engine_opts):
    """Scenario-bank solve for the fleet tick.

    Point-stabilization banks only: the fleet's goal field drives each robot,
    so tracking problems (time-varying references) are rejected rather than
    silently solved with the point-stabilization kernel. ``interpret_default``
    controls whether the Pallas kernel falls back to interpreter mode off-TPU
    (the sharded CPU-mesh path wants that; the plain rollout must *fail*
    off-TPU so callers like solver.packed.device_tick_rate can fall back to
    the vmap engine instead of an interpreter-speed kernel)."""
    if getattr(problem, "kind", "point_stabilization") == "tracking":
        raise ValueError(
            "fleet rollouts are point-stabilization only (the goal field "
            "drives each robot); got a tracking problem"
        )
    if engine == "fast":
        from ..solver.batched import make_bank_solver_fast

        return make_bank_solver_fast(problem.ocp, problem.settings, **engine_opts)
    if engine == "pallas":
        from ..solver.pallas_kernel import make_pallas_point_stab_solver

        if "terminal_cost" in getattr(problem, "tags", ()):
            raise ValueError(
                "engine='pallas' hard-codes the parity structure (zero "
                "terminal weight); use engine='vmap' or 'fast' for problems "
                "built with a nonzero terminal_weight"
            )
        engine_opts.setdefault("interpret", interpret_default)
        return make_pallas_point_stab_solver(problem.ocp, problem.settings, **engine_opts)
    if engine_opts:
        raise ValueError(
            f"engine='vmap' takes no engine_opts, got {sorted(engine_opts)}"
        )
    return jax.vmap(problem.solve)


def _make_rollout_body(
    problem, n_ticks, dt, record, engine, interpret_default=False, **engine_opts
):
    """The per-shard closed loop: ``body(thetas, U0s) -> (xs, traj|None)``
    with every output B-leading (so it shards cleanly over the scenario
    axis — no cross-robot coupling anywhere inside the scan)."""
    batched_solve = _make_batched_solve(
        problem, engine, interpret_default=interpret_default, **engine_opts
    )

    def plant(x, u):
        return rk4_step(unicycle.f, x, u, dt)

    def body(thetas, U0s):
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
        if record:
            return xs, jnp.concatenate([x0s[None], traj], axis=0)
        return xs, None

    return body


def _fleet_summary(xs, traj, thetas, goal_threshold):
    goal_dist = jnp.linalg.norm(xs[:, :2] - thetas["goal"][:, :2], axis=-1)
    return FleetResult(
        final_states=xs,
        goal_dist=goal_dist,
        reach_fraction=jnp.mean((goal_dist < goal_threshold).astype(jnp.float32)),
        mean_dist=jnp.mean(goal_dist),
        trajectories=traj,
    )


def make_fleet_rollout(
    problem,
    n_ticks: int,
    dt: float,
    goal_threshold: float = 0.2,
    record: bool = False,
    engine: str = "vmap",
    **engine_opts,
):
    """Build ``rollout(thetas, U0s) -> FleetResult`` — the full closed loop
    under jit. ``thetas`` is a B-leading point-stabilization bank (the goal
    field drives each robot); plant integration is RK4 at the control rate.
    ``engine``: 'vmap' | 'fast' (lane-aligned) | 'pallas' (TPU kernel,
    bank multiple of 1024; raises off-TPU unless ``interpret=True`` is
    passed explicitly — see `_make_batched_solve`).
    """
    body = _make_rollout_body(problem, n_ticks, dt, record, engine, **engine_opts)

    def rollout(thetas, U0s):
        xs, traj = body(thetas, U0s)
        return _fleet_summary(xs, traj, thetas, goal_threshold)

    return jax.jit(rollout)


def make_sharded_fleet_rollout(
    problem,
    mesh,
    n_ticks: int,
    dt: float,
    goal_threshold: float = 0.2,
    record: bool = False,
    engine: str = "vmap",
    **engine_opts,
):
    """The fleet closed loop sharded over a device mesh: each device runs the
    whole ``lax.scan`` control loop on its local scenario shard (robots are
    independent, so no per-tick collectives exist to pay for), and only the
    end-of-rollout fleet statistics (reach fraction, mean goal distance)
    reduce across the mesh. This is BASELINE config 3 at pod scale: K chips
    roll K x (B/K) robots in the same wall-clock as one chip rolls B/K.

    Per-device batch must satisfy the engine packing ('fast': multiple of
    ``lanes``; 'pallas': multiple of ``tile_s * tile_l``). Inputs should be
    placed with :func:`~ros2_mpc_tpu.parallel.mesh.shard_bank`.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis_names = tuple(mesh.axis_names)
    batch_spec = P(axis_names)
    shard = NamedSharding(mesh, batch_spec)

    body = _make_rollout_body(
        problem,
        n_ticks,
        dt,
        record,
        engine,
        interpret_default=jax.default_backend() != "tpu",
        **engine_opts,
    )

    def per_shard(thetas, U0s):
        xs, traj = body(thetas, U0s)
        return (xs, traj) if record else xs

    sharded_body = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(batch_spec, batch_spec),
        out_specs=(batch_spec, P(None, *axis_names)) if record else batch_spec,
        check_vma=False,
    )

    def rollout(thetas, U0s):
        out = sharded_body(thetas, U0s)
        xs, traj = out if record else (out, None)
        # reductions happen outside the shard_map: GSPMD lowers the means to
        # all-reduces over the mesh (ICI within a slice, DCN across slices)
        return _fleet_summary(xs, traj, thetas, goal_threshold)

    return jax.jit(rollout, in_shardings=(shard, shard))


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
