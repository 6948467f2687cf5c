"""Beyond-reference problem families on the same solver core.

The reference hard-wires one platform (differential-drive unicycle) into
three near-duplicate CasADi classes; adding a vehicle there means writing a
fourth symbolic ``Mpc`` class from scratch. Here the solver is generic over
the :class:`~.ilqr.OCP` template — any ``transition``/``stage_cost`` with
any (n_states, n_controls) — so new model families are a page of pure
functions. Three are shipped as proof and as useful capabilities:

* :func:`make_bicycle_point_stabilization` — kinematic bicycle (Ackermann /
  car-like, ``models/bicycle.py``): drive-to-pose with steering-angle
  bounds and active Gaussian obstacle costs.
* :func:`make_smooth_point_stabilization` — smooth-actuation unicycle
  (``models/unicycle_dyn.py``): accelerations are the controls, so command
  rate limiting is optimized in the OCP instead of clamped on the host
  (the reference's quirk-#6 slew hack).
* :func:`make_quadrotor_hover` — 12-state / 4-control quadrotor
  (``models/quadrotor.py``): fly-to-pose with thrust/torque bounds; the
  family where the generic engines' exact quadratization runs on 16x16
  stage blocks instead of the unicycle's 5x5.

All return the standard :class:`~.problems.Problem`, so ``jax.vmap``
scenario banks, ``parallel.mesh.make_bank_solver`` mesh sharding, and the
MPPI/hybrid engines compose unchanged. The lane-aligned bank engine
(``solver/batched.py``) is model-generic over small (n, m) OCPs, so these
families get bank-scale throughput via ``engine='fast'`` too — the
quadrotor's 4x4 ``Quu`` solves route through the unrolled component
Cholesky. Only the whole-solver Pallas kernels remain unicycle-specific
(hand-derived Jacobian closed forms) and reject these kinds loudly
(parallel/mesh.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..config import Params
from ..models import bicycle, quadrotor, unicycle_dyn
from ..ops import costs
from ..ops.integrators import make_step
from .ilqr import OCP, SolverSettings, make_solver
from .problems import Problem, _no_obstacles


def make_bicycle_point_stabilization(
    params: Params = Params(),
    *,
    wheelbase: float = 0.3,
    v_bounds: tuple = (-0.1, 0.3),
    steer_max: float = 0.45,
    horizon: Optional[int] = None,
    settings: Optional[SolverSettings] = None,
) -> Problem:
    """Drive-to-pose NMPC for a car-like robot (kinematic bicycle).

    theta keys: ``x0`` (3,), ``goal`` (3,), ``obs_x``/``obs_y`` (n_obs,),
    ``Q`` (3,), ``R`` (2,), ``obstacle_gain``, ``inflation_radius``,
    ``obstacle_weight`` (active by default — this is a corrected-mode-only
    family; there is no reference quirk to preserve).
    """
    N = horizon if horizon is not None else params.N
    F = make_step(bicycle.make_f(wheelbase), "rk4", params.dt)

    def stage_cost(x, u, k, theta):
        e = x - theta["goal"]
        return (
            costs.quadratic_error(e, theta["Q"])
            + costs.quadratic_error(u, theta["R"])
            + theta["obstacle_weight"]
            * costs.gaussian_obstacle_cost(
                x[:2], theta["obs_x"], theta["obs_y"],
                theta["inflation_radius"], theta["obstacle_gain"],
            )
        )

    def terminal_cost(x, theta):
        return 0.0

    ocp = OCP(
        transition=F,
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        horizon=N,
        n_states=bicycle.N_STATES,
        n_controls=bicycle.N_CONTROLS,
        u_lo=(v_bounds[0], -steer_max),
        u_hi=(v_bounds[1], steer_max),
    )
    settings = settings or SolverSettings()

    def make_theta(x0, goal, obs_x=None, obs_y=None):
        if obs_x is None or obs_y is None:
            obs_x, obs_y = _no_obstacles(params)
        return {
            "x0": jnp.asarray(x0, dtype=float),
            "goal": jnp.asarray(goal, dtype=float),
            "obs_x": jnp.asarray(obs_x, dtype=float),
            "obs_y": jnp.asarray(obs_y, dtype=float),
            "Q": jnp.asarray(params.Q, dtype=float),
            "R": jnp.asarray([0.5, 0.5], dtype=float),
            "obstacle_gain": jnp.asarray(params.reverse_factor, dtype=float),
            "inflation_radius": jnp.asarray(params.inflation_radius, dtype=float),
            "obstacle_weight": jnp.asarray(1.0),
        }

    return Problem(
        solve=make_solver(ocp, settings),
        make_theta=make_theta,
        default_u0=jnp.zeros((N, 2)),
        ocp=ocp,
        settings=settings,
        kind="bicycle",
    )


def make_smooth_point_stabilization(
    params: Params = Params(),
    *,
    a_bounds: tuple = (-0.3, 0.3),
    alpha_bounds: tuple = (-1.0, 1.0),
    v_limit: float = 0.2,
    w_limit: float = 0.5,
    horizon: Optional[int] = None,
    settings: Optional[SolverSettings] = None,
) -> Problem:
    """Drive-to-pose NMPC with actuator dynamics in the OCP.

    State ``(x, y, theta, v, w)``; controls are accelerations, box-bounded by
    the interior point. Velocity magnitudes are kept under
    ``v_limit``/``w_limit`` by a smooth quadratic hinge (soft constraint —
    velocities are states here, and the solver's hard bounds apply to
    controls). The terminal cost parks the platform: pose error plus
    velocity magnitude must both pay.

    theta keys: ``x0`` (5,), ``goal`` (3,), obstacle vectors, ``Q`` (3,),
    ``R`` (2,), ``damp`` (2,), ``vel_limit_weight``, ``terminal_weight``,
    ``obstacle_gain``, ``inflation_radius``, ``obstacle_weight``.
    """
    N = horizon if horizon is not None else params.N
    F = make_step(unicycle_dyn.f, "rk4", params.dt)
    vw_lim = jnp.asarray([v_limit, w_limit])

    def _vel_hinge(x, theta):
        # smooth one-sided quadratic: zero inside the limit, (|v|-lim)^2 out
        over = jnp.maximum(jnp.abs(x[3:5]) - vw_lim, 0.0)
        return theta["vel_limit_weight"] * jnp.sum(over * over)

    def stage_cost(x, u, k, theta):
        e = x[:3] - theta["goal"]
        return (
            costs.quadratic_error(e, theta["Q"])
            + costs.quadratic_error(x[3:5], theta["damp"])
            + costs.quadratic_error(u, theta["R"])
            + _vel_hinge(x, theta)
            + theta["obstacle_weight"]
            * costs.gaussian_obstacle_cost(
                x[:2], theta["obs_x"], theta["obs_y"],
                theta["inflation_radius"], theta["obstacle_gain"],
            )
        )

    def terminal_cost(x, theta):
        e = x[:3] - theta["goal"]
        return theta["terminal_weight"] * (
            costs.quadratic_error(e, theta["Q"])
            + jnp.sum(x[3:5] * x[3:5])
        )

    ocp = OCP(
        transition=F,
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        horizon=N,
        n_states=unicycle_dyn.N_STATES,
        n_controls=unicycle_dyn.N_CONTROLS,
        u_lo=(a_bounds[0], alpha_bounds[0]),
        u_hi=(a_bounds[1], alpha_bounds[1]),
    )
    settings = settings or SolverSettings()

    def make_theta(x0, goal, obs_x=None, obs_y=None):
        if obs_x is None or obs_y is None:
            obs_x, obs_y = _no_obstacles(params)
        return {
            "x0": jnp.asarray(x0, dtype=float),
            "goal": jnp.asarray(goal, dtype=float),
            "obs_x": jnp.asarray(obs_x, dtype=float),
            "obs_y": jnp.asarray(obs_y, dtype=float),
            "Q": jnp.asarray(params.Q, dtype=float),
            "R": jnp.asarray([0.5, 0.5], dtype=float),
            "damp": jnp.asarray([0.05, 0.05], dtype=float),
            "vel_limit_weight": jnp.asarray(50.0),
            "terminal_weight": jnp.asarray(10.0),
            "obstacle_gain": jnp.asarray(params.reverse_factor, dtype=float),
            "inflation_radius": jnp.asarray(params.inflation_radius, dtype=float),
            "obstacle_weight": jnp.asarray(1.0),
        }

    return Problem(
        solve=make_solver(ocp, settings),
        make_theta=make_theta,
        default_u0=jnp.zeros((N, 2)),
        ocp=ocp,
        settings=settings,
        kind="smooth",
        tags=("terminal_cost",),
    )


def make_quadrotor_hover(
    *,
    mass: float = 0.5,
    inertia: tuple = (2.3e-3, 2.3e-3, 4.0e-3),
    tau_max: float = 0.02,
    dt: float = 0.05,
    horizon: int = 30,
    settings: Optional[SolverSettings] = None,
) -> Problem:
    """Fly-to-pose NMPC for a 12-state quadrotor (``models/quadrotor.py``).

    The control box is physical: thrust in [0, 2 m g] (a rotor cannot pull)
    and body torques in [-tau_max, tau_max]; the interior-point treatment
    handles the asymmetric 4-dim box exactly like the unicycle's 2-dim one.
    ``default_u0`` tiles the analytic hover input — the natural warm start
    for a platform whose zero-control trajectory is free fall.

    theta keys: ``x0`` (12,), ``goal`` (4: x, y, z, yaw), ``Qp``, ``Qv``,
    ``Qatt``, ``Qw`` (scalars), ``R`` (4,), ``terminal_weight``.
    """
    N = horizon
    F = make_step(quadrotor.make_f(mass, inertia), "rk4", dt)
    u_hover = quadrotor.hover_control(mass)

    def _errors(x, theta):
        ep = x[0:3] - theta["goal"][0:3]
        epsi = x[8] - theta["goal"][3]
        return ep, x[3:6], x[6], x[7], epsi, x[9:12]

    def stage_cost(x, u, k, theta):
        ep, v, phi, th, epsi, w = _errors(x, theta)
        eu = u - u_hover
        return (
            theta["Qp"] * jnp.sum(ep * ep)
            + theta["Qv"] * jnp.sum(v * v)
            + theta["Qatt"] * (phi * phi + th * th + epsi * epsi)
            + theta["Qw"] * jnp.sum(w * w)
            + costs.quadratic_error(eu, theta["R"])
        )

    def terminal_cost(x, theta):
        ep, v, phi, th, epsi, w = _errors(x, theta)
        return theta["terminal_weight"] * (
            jnp.sum(ep * ep)
            + jnp.sum(v * v)
            + phi * phi
            + th * th
            + epsi * epsi
            + jnp.sum(w * w)
        )

    ocp = OCP(
        transition=F,
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        horizon=N,
        n_states=quadrotor.N_STATES,
        n_controls=quadrotor.N_CONTROLS,
        u_lo=(0.0, -tau_max, -tau_max, -tau_max),
        u_hi=(2.0 * mass * quadrotor.GRAVITY, tau_max, tau_max, tau_max),
    )
    settings = settings or SolverSettings()

    def make_theta(x0, goal):
        return {
            "x0": jnp.asarray(x0, dtype=float),
            "goal": jnp.asarray(goal, dtype=float).reshape(4),
            "Qp": jnp.asarray(1.0),
            "Qv": jnp.asarray(0.1),
            "Qatt": jnp.asarray(0.5),
            "Qw": jnp.asarray(0.01),
            "R": jnp.asarray([0.1, 10.0, 10.0, 10.0]),
            "terminal_weight": jnp.asarray(10.0),
        }

    return Problem(
        solve=make_solver(ocp, settings),
        make_theta=make_theta,
        default_u0=jnp.tile(u_hover, (N, 1)),
        ocp=ocp,
        settings=settings,
        kind="quadrotor",
        tags=("terminal_cost",),
    )
