"""Whole-solver Pallas kernel vs the XLA engines (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ros2_mpc_tpu.config import Params
from ros2_mpc_tpu.solver import SolverSettings, make_point_stabilization
from ros2_mpc_tpu.solver.pallas_kernel import make_pallas_point_stab_solver

PARAMS = Params()
N = 10
FAST = SolverSettings(barrier_stages=4, iters_per_stage=3, n_alphas=6)


def _bank(prob, B, seed=0, with_obstacles=False):
    rng = np.random.default_rng(seed)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 3)))
    goals = jnp.asarray(rng.uniform(-1.2, 1.2, size=(B, 3)))
    if with_obstacles:
        n_obs = PARAMS.n_obstacle_points
        ox = np.full((B, n_obs), 100.0)
        oy = np.full((B, n_obs), 100.0)
        ox[:, 0] = rng.uniform(0.3, 0.7, size=B)
        oy[:, 0] = rng.uniform(-0.2, 0.2, size=B)
        thetas = jax.vmap(prob.make_theta)(x0s, goals, jnp.asarray(ox), jnp.asarray(oy))
    else:
        thetas = jax.vmap(prob.make_theta)(x0s, goals)
    return thetas, jnp.zeros((B, N, 2))


def test_pallas_kernel_matches_reference_engine():
    prob = make_point_stabilization(PARAMS, horizon=N, settings=FAST)
    B = 16
    thetas, U0 = _bank(prob, B)
    ref = jax.jit(jax.vmap(prob.solve))(thetas, U0)
    solve_pl = make_pallas_point_stab_solver(
        prob.ocp, FAST, interpret=True, tile_s=2, tile_l=8
    )
    got = solve_pl(thetas, U0)
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.X), np.asarray(ref.X), atol=1e-4)
    # KKT residual should certify the same convergence picture
    assert np.mean(np.asarray(got.converged)) >= np.mean(np.asarray(ref.converged)) - 0.2


def test_pallas_kernel_with_active_obstacles():
    """Corrected-mode point stabilization (live Gaussian obstacle cost)."""
    prob = make_point_stabilization(
        PARAMS, horizon=N, settings=FAST, reference_parity=False
    )
    B = 16
    thetas, U0 = _bank(prob, B, seed=1, with_obstacles=True)
    ref = jax.jit(jax.vmap(prob.solve))(thetas, U0)
    solve_pl = make_pallas_point_stab_solver(
        prob.ocp, FAST, interpret=True, tile_s=2, tile_l=8
    )
    got = solve_pl(thetas, U0)
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U), atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-3)


def test_pallas_tracking_kernel_matches_reference():
    from ros2_mpc_tpu.solver import make_tracking
    from ros2_mpc_tpu.solver.pallas_kernel import make_pallas_tracking_solver

    prob = make_tracking(PARAMS, horizon=N, settings=FAST, reference_parity=False)
    B = 16
    rng = np.random.default_rng(5)
    x0 = rng.uniform(-0.2, 0.2, size=(B, 3))
    ts = np.arange(1, N + 1) * PARAMS.dt
    x_ref = np.stack(
        [x0[:, 0:1] + 0.15 * ts[None], np.zeros((B, N)), np.zeros((B, N))], axis=2
    )
    u_ref = np.tile([0.15, 0.0], (B, N, 1))
    n_obs = PARAMS.n_obstacle_points
    ox = np.full((B, n_obs), 100.0)
    oy = np.full((B, n_obs), 100.0)
    ox[:, 0] = rng.uniform(0.3, 0.6, size=B)  # one live obstacle near the line
    oy[:, 0] = rng.uniform(-0.15, 0.15, size=B)
    thetas = jax.vmap(prob.make_theta)(
        jnp.asarray(x0), jnp.asarray(x_ref), jnp.asarray(u_ref),
        jnp.asarray(ox), jnp.asarray(oy),
    )
    U0 = jnp.zeros((B, N, 2))
    ref = jax.jit(jax.vmap(prob.solve))(thetas, U0)
    got = make_pallas_tracking_solver(prob.ocp, FAST, interpret=True, tile_s=2, tile_l=8)(
        thetas, U0
    )
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U), atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-3)


def test_pallas_tracking_kernel_terminal_weight():
    """The corrected parking mode (nonzero terminal pose weight,
    solver/problems.py::make_tracking terminal_weight) must run on the
    Pallas tracking kernel and match the vmap engine — and the weight must
    actually bend the solution (vs the parity zero-weight solve)."""
    from ros2_mpc_tpu.solver import make_tracking
    from ros2_mpc_tpu.solver.pallas_kernel import make_pallas_tracking_solver

    B = 16
    rng = np.random.default_rng(7)
    x0 = rng.uniform(-0.2, 0.2, size=(B, 3))
    ts = np.arange(1, N + 1) * PARAMS.dt
    x_ref = np.stack(
        [
            x0[:, 0:1] + 0.15 * ts[None],
            np.zeros((B, N)),
            np.full((B, N), 0.9),  # misaligned reference yaw: the stage
        ],  # Q[2]=0.005 barely pays for the turn; the terminal weight must
        axis=2,  # (ROADMAP goal-orbiting fix)
    )
    u_ref = np.tile([0.15, 0.0], (B, N, 1))
    tw = (2.0, 2.0, 1.0)
    prob = make_tracking(
        PARAMS, horizon=N, settings=FAST, reference_parity=False, terminal_weight=tw
    )
    prob0 = make_tracking(PARAMS, horizon=N, settings=FAST, reference_parity=False)
    thetas = jax.vmap(prob.make_theta)(
        jnp.asarray(x0), jnp.asarray(x_ref), jnp.asarray(u_ref)
    )
    thetas0 = jax.vmap(prob0.make_theta)(
        jnp.asarray(x0), jnp.asarray(x_ref), jnp.asarray(u_ref)
    )
    U0 = jnp.zeros((B, N, 2))
    ref = jax.jit(jax.vmap(prob.solve))(thetas, U0)
    solve_pl = make_pallas_tracking_solver(prob.ocp, FAST, interpret=True, tile_s=2, tile_l=8)
    got = solve_pl(thetas, U0)
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U), atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-3)
    # same kernel build, zero weights in theta -> the parity solution
    got0 = solve_pl(thetas0, U0)
    ref0 = jax.jit(jax.vmap(prob0.solve))(thetas0, U0)
    np.testing.assert_allclose(np.asarray(got0.U), np.asarray(ref0.U), atol=5e-4)
    # the terminal weight must do real work: final yaw pulled toward 0.9
    yaw_err = np.abs(np.asarray(got.X)[:, -1, 2] - 0.9)
    yaw_err0 = np.abs(np.asarray(got0.X)[:, -1, 2] - 0.9)
    assert np.mean(yaw_err) < np.mean(yaw_err0) - 0.1


def test_fast_sincos_accuracy_and_kernel_parity():
    """The kernels' default paired-polynomial sin/cos (~2x VPU throughput of
    the stock lowering) must stay within a few 1e-6 of numpy over the whole
    plausible angle range (un-wrapped fleet rollouts reach tens of radians),
    and the kernel's two sincos modes must agree within the engines' parity
    band."""
    from ros2_mpc_tpu.solver.pallas_kernel import _fast_sincos

    x = jnp.asarray(np.linspace(-60.0, 60.0, 400001), dtype=jnp.float32)
    c, s = jax.jit(_fast_sincos)(x)
    x64 = np.asarray(x, dtype=np.float64)
    assert float(jnp.max(jnp.abs(c - np.cos(x64)))) < 5e-6
    assert float(jnp.max(jnp.abs(s - np.sin(x64)))) < 5e-6

    prob = make_point_stabilization(PARAMS, horizon=N, settings=FAST)
    thetas, U0 = _bank(prob, 16, seed=9)
    got_fast = make_pallas_point_stab_solver(
        prob.ocp, FAST, interpret=True, tile_s=2, tile_l=8, fast_sincos=True
    )(thetas, U0)
    got_stock = make_pallas_point_stab_solver(
        prob.ocp, FAST, interpret=True, tile_s=2, tile_l=8, fast_sincos=False
    )(thetas, U0)
    np.testing.assert_allclose(
        np.asarray(got_fast.U), np.asarray(got_stock.U), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_fast.cost), np.asarray(got_stock.cost), rtol=1e-3
    )


def test_pallas_kernel_live_prefix_chunking_edges():
    """The chunked obstacle loop must be exact at its edge cases: a live
    obstacle in the *last* slot (n_live = n_obs, full loop), obstacles
    straddling chunk boundaries, and an all-sentinel bank (n_live = 0 with a
    nonzero weight — corrected mode on open floor)."""
    prob = make_point_stabilization(PARAMS, horizon=N, settings=FAST, reference_parity=False)
    B = 16
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 3)))
    goals = jnp.asarray(rng.uniform(-1.2, 1.2, size=(B, 3)))
    n_obs = PARAMS.n_obstacle_points
    ox = np.full((B, n_obs), 100.0)
    oy = np.full((B, n_obs), 100.0)
    # chunk-boundary straddle (indices 7, 8) and a live point in the LAST slot
    ox[:, 7] = rng.uniform(0.3, 0.6, size=B)
    oy[:, 7] = rng.uniform(-0.2, 0.2, size=B)
    ox[:, 8] = rng.uniform(-0.6, -0.3, size=B)
    oy[:, 8] = rng.uniform(-0.2, 0.2, size=B)
    ox[:, n_obs - 1] = rng.uniform(0.2, 0.5, size=B)
    oy[:, n_obs - 1] = rng.uniform(0.2, 0.5, size=B)
    thetas = jax.vmap(prob.make_theta)(x0s, goals, jnp.asarray(ox), jnp.asarray(oy))
    U0 = jnp.zeros((B, N, 2))
    ref = jax.jit(jax.vmap(prob.solve))(thetas, U0)
    got = make_pallas_point_stab_solver(prob.ocp, FAST, interpret=True, tile_s=2, tile_l=8)(
        thetas, U0
    )
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost), rtol=2e-4)

    # all-sentinel with nonzero weight: n_live == 0 short-circuits to the
    # obstacle-free solution exactly
    ox[:] = 100.0
    oy[:] = 100.0
    thetas0 = jax.vmap(prob.make_theta)(x0s, goals, jnp.asarray(ox), jnp.asarray(oy))
    ref0 = jax.jit(jax.vmap(prob.solve))(thetas0, U0)
    got0 = make_pallas_point_stab_solver(prob.ocp, FAST, interpret=True, tile_s=2, tile_l=8)(
        thetas0, U0
    )
    np.testing.assert_allclose(np.asarray(got0.U), np.asarray(ref0.U), atol=2e-4)
