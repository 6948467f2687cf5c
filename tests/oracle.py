"""Independent NLP oracle for solver parity tests.

CasADi/IPOPT (the reference's solver) is not available in this image, so the
golden answers come from an independent float64 NumPy implementation of the
exact same condensed NLPs, solved with SciPy. This mirrors the reference
formulations directly (file:line cites below), sharing no code with the JAX
solver under test.

BASELINE.md target: control error <= 1e-3 vs the oracle at the same horizon.
"""

from __future__ import annotations

import numpy as np
from scipy import optimize


def unicycle_f(x, u):
    """ros2_mpc/planner/local_planner_tracking.py:176 (identical in all three)."""
    return np.array([u[0] * np.cos(x[2]), u[0] * np.sin(x[2]), u[1]])


def euler_step(x, u, dt):
    return x + dt * unicycle_f(x, u)


def rk4_step(x, u, dt):
    k1 = unicycle_f(x, u)
    k2 = unicycle_f(x + dt / 2 * k1, u)
    k3 = unicycle_f(x + dt / 2 * k2, u)
    k4 = unicycle_f(x + dt * k3, u)
    return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


def rollout(x0, U, dt, integrator):
    step = rk4_step if integrator == "rk4" else euler_step
    X = [np.asarray(x0, dtype=float)]
    for u in U:
        X.append(step(X[-1], u, dt))
    return np.stack(X)


def barrier_obstacle(xy, obs_x, obs_y, ir, gain):
    r2 = ((xy[0] - obs_x) ** 2 + (xy[1] - obs_y) ** 2) / ir**2
    return float(np.sum(np.exp(gain / np.maximum(r2, 1e-12))))


def gaussian_obstacle(xy, obs_x, obs_y, ir, gain):
    r2 = (xy[0] - obs_x) ** 2 + (xy[1] - obs_y) ** 2
    return float(gain * np.sum(np.exp(-r2 / ir**2)))


def point_stab_cost(U, x0, goal, dt, N, Q, R, reverse_factor, obstacle=None):
    """local_planner_point_stabilization.py:104-127: states k=0..N-1 vs goal,
    R*||u||^2, exp(-reverse_factor*v); obstacle term optional (dead in ref)."""
    U = U.reshape(N, 2)
    X = rollout(x0, U, dt, "rk4")
    J = 0.0
    for k in range(N):
        e = X[k] - goal
        J += e @ (np.asarray(Q) * e) + U[k] @ (np.asarray(R) * U[k])
        J += np.exp(-reverse_factor * U[k, 0])
        if obstacle is not None:
            J += obstacle(X[k, :2])
    return J


def tracking_cost(U, x0, x_ref, u_ref, dt, N, Q, R, reverse_factor):
    """local_planner_tracking.py:106-130: x_k vs pf[k], Euler shooting."""
    U = U.reshape(N, 2)
    X = rollout(x0, U, dt, "euler")
    J = 0.0
    for k in range(N):
        ex = X[k] - x_ref[k]
        eu = U[k] - u_ref[k]
        J += ex @ (np.asarray(Q) * ex) + eu @ (np.asarray(R) * eu)
        J += np.exp(-reverse_factor * U[k, 0])
    return J


def legacy_cost(U, x0, goal, dt, N, obs_x, obs_y, ir, obstacle_gain, reverse_factor):
    """mpc_point_stabilization.py:85-100 (+ obstacle over k=0..N at :48)."""
    U = U.reshape(N, 2)
    X = rollout(x0, U, dt, "rk4")
    Q = np.array([0.00005, 0.05, 0.05])
    R = np.array([0.01, 0.01])
    J = 0.0
    for k in range(N):
        e = X[k] - goal
        J += e @ (Q * e) + U[k] @ (R * U[k]) + np.exp(-reverse_factor * U[k, 0])
    for k in range(N + 1):
        J += barrier_obstacle(X[k, :2], obs_x, obs_y, ir, obstacle_gain)
    return J


def solve_oracle(cost_fn, N, u_lo, u_hi, U0=None):
    """High-accuracy f64 solve of the condensed box-constrained NLP."""
    if U0 is None:
        U0 = np.zeros((N, 2))
    bounds = [(u_lo[i % 2], u_hi[i % 2]) for i in range(2 * N)]
    res = optimize.minimize(
        cost_fn,
        U0.reshape(-1),
        method="L-BFGS-B",
        bounds=bounds,
        options={"maxiter": 20000, "maxfun": 200000, "ftol": 1e-16, "gtol": 1e-12},
    )
    # Polish with a second pass from the solution (helps on flat valleys).
    res = optimize.minimize(
        cost_fn,
        res.x,
        method="L-BFGS-B",
        bounds=bounds,
        options={"maxiter": 20000, "maxfun": 200000, "ftol": 1e-16, "gtol": 1e-12},
    )
    return res.x.reshape(N, 2), res.fun
