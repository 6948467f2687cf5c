"""Solver parity tests against the independent f64 SciPy oracle.

This is the judge's line (SURVEY.md §7 item 4 / BASELINE.md): control error
<= 1e-3 vs a high-accuracy solve of the identical NLP at the same horizon.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from ros2_mpc_tpu.config import Params
from ros2_mpc_tpu.solver import (
    make_legacy_point_stabilization,
    make_point_stabilization,
    make_tracking,
    shift_controls,
)

PARAMS = Params()
N = 20  # BASELINE.json headline horizon


@pytest.fixture(scope="module")
def point_stab():
    return make_point_stabilization(PARAMS, horizon=N)


@pytest.fixture(scope="module")
def tracking():
    return make_tracking(PARAMS, horizon=N)


def test_point_stabilization_matches_oracle(point_stab):
    prob = point_stab
    x0 = np.array([0.0, 0.0, 0.0])
    goal = np.array([1.0, 1.0, np.pi / 2])
    theta = prob.make_theta(x0, goal)
    sol = jax.jit(prob.solve)(theta, prob.default_u0)
    assert bool(sol.converged), f"kkt={float(sol.kkt_residual):.2e}"

    U_ref, J_ref = oracle.solve_oracle(
        lambda U: oracle.point_stab_cost(
            U, x0, goal, PARAMS.dt, N,
            Q=PARAMS.Q, R=(0.5, 0.5), reverse_factor=PARAMS.cost_factor,
        ),
        N,
        u_lo=(PARAMS.pointstab_v_bounds[0], PARAMS.pointstab_w_bounds[0]),
        u_hi=(PARAMS.pointstab_v_bounds[1], PARAMS.pointstab_w_bounds[1]),
    )
    err = np.max(np.abs(np.asarray(sol.U) - U_ref))
    assert err <= 1e-3, f"control error {err:.2e} vs oracle (J={J_ref:.6f}, J_tpu={float(sol.cost):.6f})"
    assert float(sol.cost) <= J_ref + 1e-4


def test_point_stabilization_reverse_goal(point_stab):
    """Goal behind the robot exercises the reverse penalty and v lower bound."""
    prob = point_stab
    x0 = np.array([0.0, 0.0, 0.0])
    goal = np.array([-0.6, 0.0, 0.0])
    theta = prob.make_theta(x0, goal)
    sol = jax.jit(prob.solve)(theta, prob.default_u0)
    U_ref, J_ref = oracle.solve_oracle(
        lambda U: oracle.point_stab_cost(
            U, x0, goal, PARAMS.dt, N,
            Q=PARAMS.Q, R=(0.5, 0.5), reverse_factor=PARAMS.cost_factor,
        ),
        N,
        u_lo=(PARAMS.pointstab_v_bounds[0], PARAMS.pointstab_w_bounds[0]),
        u_hi=(PARAMS.pointstab_v_bounds[1], PARAMS.pointstab_w_bounds[1]),
    )
    err = np.max(np.abs(np.asarray(sol.U) - U_ref))
    assert err <= 1e-3, f"control error {err:.2e}"


def test_tracking_matches_oracle(tracking):
    prob = tracking
    x0 = np.array([0.05, -0.05, 0.1])
    # Straight-line reference at the nominal cruise speed.
    ts = np.arange(1, N + 1) * PARAMS.dt
    x_ref = np.stack([0.15 * ts, np.zeros(N), np.zeros(N)], axis=1)
    u_ref = np.tile([0.15, 0.0], (N, 1))
    theta = prob.make_theta(x0, x_ref, u_ref)
    sol = jax.jit(prob.solve)(theta, prob.default_u0)
    assert bool(sol.converged), f"kkt={float(sol.kkt_residual):.2e}"

    U_ref_opt, J_ref = oracle.solve_oracle(
        lambda U: oracle.tracking_cost(
            U, x0, x_ref, u_ref, PARAMS.dt, N,
            Q=PARAMS.Q, R=PARAMS.R, reverse_factor=PARAMS.reverse_factor,
        ),
        N,
        u_lo=(PARAMS.tracking_v_bounds[0], PARAMS.tracking_w_bounds[0]),
        u_hi=(PARAMS.tracking_v_bounds[1], PARAMS.tracking_w_bounds[1]),
    )
    err = np.max(np.abs(np.asarray(sol.U) - U_ref_opt))
    assert err <= 1e-3, f"control error {err:.2e} (J_ref={J_ref:.6f}, J={float(sol.cost):.6f})"


def test_legacy_with_active_obstacles():
    """The legacy formulation is the only one whose obstacle cost is live
    (mpc_point_stabilization.py:100). Obstacles block the straight line; the
    solver must stay finite, feasible, and near-stationary."""
    prob = make_legacy_point_stabilization(PARAMS, horizon=N)
    x0 = np.array([0.0, 0.0, 0.0])
    goal = np.array([1.0, 0.0, 0.0])
    n_obs = PARAMS.n_obstacle_points
    obs_x = np.full(n_obs, 100.0)
    obs_y = np.full(n_obs, 100.0)
    obs_x[:3] = [0.5, 0.5, 0.5]
    obs_y[:3] = [0.05, -0.35, 0.45]
    theta = prob.make_theta(x0, goal, obs_x, obs_y)
    sol = jax.jit(prob.solve)(theta, prob.default_u0)
    U = np.asarray(sol.U)
    assert np.all(np.isfinite(U))
    assert np.all(U[:, 0] >= PARAMS.legacy_v_bounds[0] - 1e-6)
    assert np.all(U[:, 0] <= PARAMS.legacy_v_bounds[1] + 1e-6)
    assert np.all(np.abs(U[:, 1]) <= PARAMS.legacy_w_bounds[1] + 1e-6)

    U_ref, J_ref = oracle.solve_oracle(
        lambda Uv: oracle.legacy_cost(
            Uv, x0, goal, PARAMS.dt, N, obs_x, obs_y,
            PARAMS.inflation_radius, PARAMS.reverse_factor, PARAMS.cost_factor,
        ),
        N,
        u_lo=(PARAMS.legacy_v_bounds[0], PARAMS.legacy_w_bounds[0]),
        u_hi=(PARAMS.legacy_v_bounds[1], PARAMS.legacy_w_bounds[1]),
        U0=U,  # polish from our solution: checks ours is a true local optimum
    )
    # The legacy objective is nearly flat in position (Q_x = 5e-5,
    # mpc_point_stabilization.py:88), so parameter drift along the valley is
    # meaningless; optimality is judged by cost gap and stationarity instead.
    assert float(sol.cost) <= J_ref + 1e-4, (
        f"cost {float(sol.cost):.6f} vs oracle-polished {J_ref:.6f}"
    )
    # f32 gradient noise near the exponential obstacle cliffs floors the raw
    # stationarity measure around 1e-2; the tight check is the cost gap above.
    assert float(sol.kkt_residual) <= 3e-2


def test_solver_is_vmappable(point_stab):
    prob = point_stab
    B = 8
    rng = np.random.default_rng(1)
    x0s = rng.uniform(-0.2, 0.2, size=(B, 3))
    goals = rng.uniform(-1, 1, size=(B, 3))
    thetas = jax.vmap(prob.make_theta)(jnp.asarray(x0s), jnp.asarray(goals))
    U0s = jnp.zeros((B, N, 2))
    sols = jax.jit(jax.vmap(prob.solve))(thetas, U0s)
    assert sols.U.shape == (B, N, 2)
    # Batched solve must agree with a single solve element-wise.
    single = prob.solve(prob.make_theta(x0s[3], goals[3]), prob.default_u0)
    np.testing.assert_allclose(np.asarray(sols.U[3]), np.asarray(single.U), atol=1e-5)


def test_warm_start_shift(point_stab):
    U = jnp.arange(10.0).reshape(5, 2)
    shifted = shift_controls(U)
    np.testing.assert_allclose(np.asarray(shifted[:-1]), np.asarray(U[1:]))
    np.testing.assert_allclose(np.asarray(shifted[-1]), np.asarray(U[-1]))

    # Warm-started re-solve of the same problem converges at least as well.
    prob = point_stab
    theta = prob.make_theta(jnp.zeros(3), jnp.array([0.8, 0.3, 0.0]))
    sol1 = jax.jit(prob.solve)(theta, prob.default_u0)
    sol2 = jax.jit(prob.solve)(theta, shift_controls(sol1.U))
    assert float(sol2.cost) <= float(sol1.cost) + 1e-5


def test_corrected_point_stab_with_active_obstacles_matches_oracle():
    """Corrected mode activates the Gaussian obstacle cost
    (local_planner_point_stabilization.py:60-67 made live): oracle parity
    must hold for the augmented objective too."""
    prob = make_point_stabilization(PARAMS, horizon=N, reference_parity=False)
    x0 = np.array([0.0, 0.0, 0.0])
    goal = np.array([1.0, 0.0, 0.0])
    n_obs = PARAMS.n_obstacle_points
    obs_x = np.full(n_obs, 100.0)
    obs_y = np.full(n_obs, 100.0)
    obs_x[:2] = [0.5, 0.6]
    obs_y[:2] = [0.1, -0.1]
    theta = prob.make_theta(x0, goal, obs_x, obs_y)
    sol = jax.jit(prob.solve)(theta, prob.default_u0)

    gain = PARAMS.reverse_factor  # quirk #2 swap: gain = reverse_factor

    def obstacle(xy):
        return oracle.gaussian_obstacle(xy, obs_x, obs_y, PARAMS.inflation_radius, gain)

    U_ref, J_ref = oracle.solve_oracle(
        lambda U: oracle.point_stab_cost(
            U, x0, goal, PARAMS.dt, N,
            Q=PARAMS.Q, R=(0.5, 0.5), reverse_factor=PARAMS.cost_factor,
            obstacle=obstacle,
        ),
        N,
        u_lo=(PARAMS.pointstab_v_bounds[0], PARAMS.pointstab_w_bounds[0]),
        u_hi=(PARAMS.pointstab_v_bounds[1], PARAMS.pointstab_w_bounds[1]),
        U0=np.asarray(sol.U),  # same basin: polish from our solution
    )
    assert float(sol.cost) <= J_ref + 1e-4
    err = np.max(np.abs(np.asarray(sol.U) - U_ref))
    assert err <= 2e-3, f"control drift {err:.2e} (J={float(sol.cost):.6f} vs {J_ref:.6f})"


def test_packed_solve_matches_dict_theta(point_stab, tracking):
    """solver/packed.py: the single-transfer packed path must be bit-identical
    to the dict-theta path for both live formulations."""
    from ros2_mpc_tpu.solver.packed import make_packed_point_stab, make_packed_tracking

    rng = np.random.default_rng(5)
    x0 = rng.uniform(-0.3, 0.3, 3)
    goal = rng.uniform(-1, 1, 3)
    obs_x = np.full(PARAMS.n_obstacle_points, 100.0)
    obs_y = np.full(PARAMS.n_obstacle_points, 100.0)
    obs_x[:2], obs_y[:2] = [0.4, 0.5], [0.2, -0.2]

    solve_p, pack = make_packed_point_stab(point_stab, PARAMS)
    ref = jax.jit(point_stab.solve)(point_stab.make_theta(x0, goal, obs_x, obs_y), point_stab.default_u0)
    got, got_warm = jax.jit(solve_p)(pack(x0, goal, obs_x, obs_y), point_stab.default_u0)
    np.testing.assert_array_equal(np.asarray(got.U), np.asarray(ref.U))
    # in-jit warm start == shift-and-hold of the solution
    np.testing.assert_array_equal(np.asarray(got_warm), np.asarray(shift_controls(ref.U)))

    x_ref = np.cumsum(np.tile([0.03, 0.0, 0.0], (N, 1)), axis=0)
    u_ref = np.tile([0.15, 0.0], (N, 1))
    solve_t, pack_t = make_packed_tracking(tracking, PARAMS)
    ref2 = jax.jit(tracking.solve)(tracking.make_theta(x0, x_ref, u_ref, obs_x, obs_y), tracking.default_u0)
    got2, _ = jax.jit(solve_t)(pack_t(x0, x_ref, u_ref, obs_x, obs_y), tracking.default_u0)
    np.testing.assert_array_equal(np.asarray(got2.U), np.asarray(ref2.U))


def test_terminal_pose_cost_parks_instead_of_orbiting():
    """ROADMAP: with the reference formulation (no terminal cost, quirk #5)
    the receding-horizon tracker *orbits* a misaligned goal; the per-axis
    terminal pose cost parks it. Both behaviors pinned."""
    from ros2_mpc_tpu.models import unicycle
    from ros2_mpc_tpu.ops.integrators import rk4_step

    goal = np.array([0.5, 0.4, 0.0])
    x_ref = np.tile(goal, (N, 1))
    u_ref = np.zeros((N, 2))

    def closed_loop(terminal_weight, ticks=120):
        prob = make_tracking(PARAMS, horizon=N, terminal_weight=terminal_weight)
        solve = jax.jit(prob.solve)
        x = jnp.array([0.0, 0.0, np.pi / 2])  # misaligned start
        U = prob.default_u0
        for _ in range(ticks):
            sol = solve(prob.make_theta(np.asarray(x), x_ref, u_ref), U)
            x = rk4_step(unicycle.f, x, sol.U[0], PARAMS.dt)
            U = shift_controls(sol.U)
        xf = np.asarray(x)
        pos_err = float(np.linalg.norm(xf[:2] - goal[:2]))
        yaw_err = float(abs((xf[2] - goal[2] + np.pi) % (2 * np.pi) - np.pi))
        return pos_err, yaw_err

    orbit_pos, _ = closed_loop((0.0, 0.0, 0.0))
    assert orbit_pos > 0.4, f"expected the documented orbit, got pos_err={orbit_pos:.3f}"

    park_pos, park_yaw = closed_loop((100.0, 100.0, 10.0))
    assert park_pos < 0.15, f"terminal cost failed to park: pos_err={park_pos:.3f}"
    assert park_yaw < 0.3, f"terminal cost failed to align: yaw_err={park_yaw:.3f}"
