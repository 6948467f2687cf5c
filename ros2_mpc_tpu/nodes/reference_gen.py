"""Reference-trajectory and obstacle extraction helpers for the control-loop
nodes — behavior-parity rebuilds of the free functions in
ros2_mpc/scripts/path_follower_local_planner.py and
ros2_mpc/scripts/point_follower_local_planner.py.

All documented reference quirks are preserved (SURVEY.md ledger):
* omega finite-difference is Delta-heading / 2 and velocity is
  ||Delta xy|| / dt * 2 (path_follower:14-23);
* obstacle vectors pad by broadcasting the first obstacle; an empty scan
  yields sentinel obstacles at 100 m (path_follower:101-131, quirk #10);
* the tracking node's occupancy math (``1 - grid`` with grid in {0, 100})
  can never equal 0, so its obstacle extraction *always* degenerates to the
  100 m sentinels (path_follower:102,106 — on top of the obstacle cost being
  discarded, quirk #1). ``normalized=True`` gives the point-follower variant
  (``1 - grid/100``, point_follower:89) which does find obstacles.
"""

from __future__ import annotations

import numpy as np

from ..ops import grid as gridops


def get_headings(path_xy: np.ndarray, dt: float):
    """(heading, velocity, omega) finite differences along a path
    (path_follower_local_planner.py:14-23)."""
    path_heading = np.arctan2(
        path_xy[1:, 1] - path_xy[:-1, 1], path_xy[1:, 0] - path_xy[:-1, 0]
    )
    path_heading = np.append(path_heading, path_heading[-1])
    path_omega = (path_heading[1:] - path_heading[:-1]) / 2
    path_velocity = (np.linalg.norm(path_xy[1:, :] - path_xy[:-1, :], axis=1) / dt) * 2
    path_velocity = np.append(path_velocity, path_velocity[-1])
    return path_heading, path_velocity, path_omega


def get_path_headings(path_xy: np.ndarray):
    """Heading-only variant used by the global path publisher
    (scripts/global_path_publisher.py:13-25)."""
    path_heading = np.arctan2(np.diff(path_xy[:, 1]), np.diff(path_xy[:, 0]))
    return np.append(path_heading, path_heading[-1])


def get_reference_trajectory(x0, goal, path_xy, path_heading, path_velocity, path_omega, N):
    """Time-varying reference (pxf, puf) for the tracking MPC
    (path_follower_local_planner.py:26-73): nearest-point anchoring, goal
    tiling within 0.5 m of the path end, last-element padding."""
    path_heading = np.asarray(path_heading).reshape(-1)
    nearest_point = int(np.argmin(np.linalg.norm(x0[0:2] - path_xy, axis=1)))
    if np.linalg.norm(x0[0:2] - path_xy[-1, :]) < 0.5:
        pxf = np.tile(goal[:3], N).reshape(-1, 1)
    else:
        if nearest_point + N > len(path_xy):
            deficit = N - len(path_xy[nearest_point:])
            path_xy = np.append(
                path_xy, np.transpose(np.repeat(path_xy[-1, :], deficit).reshape(2, -1)), axis=0
            )
            deficit_h = N - len(path_heading[nearest_point:])
            path_heading = np.append(path_heading, np.repeat(path_heading[-1], deficit_h))
        pxf = np.column_stack(
            (path_xy[nearest_point : nearest_point + N, :], path_heading[nearest_point : nearest_point + N])
        )
        pxf = pxf.flatten().reshape(-1, 1)

    if len(path_velocity) != len(path_omega):
        deficit = len(path_velocity) - len(path_omega)
        path_omega = np.append(path_omega, np.repeat(path_omega[-1], deficit))
    if nearest_point + N > len(path_velocity):
        deficit_v = N - len(path_velocity[nearest_point:])
        path_velocity = np.append(path_velocity, np.repeat(path_velocity[-1], deficit_v))
        deficit_w = N - len(path_omega[nearest_point:])
        path_omega = np.append(path_omega, np.repeat(path_omega[-1], deficit_w))
    puf = np.column_stack(
        (path_velocity[nearest_point : nearest_point + N], path_omega[nearest_point : nearest_point + N])
    )
    puf = puf.flatten().reshape(-1, 1)
    return pxf, puf


def get_goal_for_mpc(path_xy, path_heading, goal, pos, lookahead_dist: float = 0.5):
    """Carrot selection for point stabilization
    (point_follower_local_planner.py:16-30): nearer than the lookahead, chase
    the true goal pose (yaw = goal[4] mod 2pi); otherwise the first path point
    farther than the lookahead."""
    path_heading = np.asarray(path_heading).reshape(-1)
    if np.linalg.norm(goal[:2] - pos[:2]) < lookahead_dist:
        return np.array([goal[0], goal[1], goal[4] % (2 * np.pi)])
    dist = np.linalg.norm(path_xy - pos[:2], axis=1)
    idx = np.where(dist > lookahead_dist)[0]
    idx = int(np.argmin(dist)) if len(idx) == 0 else int(idx[0])
    return np.append(path_xy[idx], path_heading[idx] % (2 * np.pi))


def get_obstacles(
    scan_data,
    angles,
    size,
    resolution,
    pos,
    ori,
    n_obstacle_points: int,
    normalized: bool,
):
    """Obstacle XY vectors (fixed length) from a laser scan
    (path_follower_local_planner.py:101-131 / point_follower:88-118).

    ``normalized=False`` reproduces the tracking node's broken ``1 - grid``
    selection (always sentinels); ``normalized=True`` the working
    ``1 - grid/100`` variant."""
    import jax.numpy as jnp

    raster = gridops.make_scan_to_occupancy(resolution, size * 2)
    occ = np.asarray(raster(jnp.asarray(np.asarray(scan_data, dtype=float)), jnp.asarray(angles)))
    occ = (1 - occ / 100.0) if normalized else (1 - occ)
    occ = np.rot90(occ, k=2)
    # NOTE: the reference binds the *first* return (meter_y) to its local
    # ``x`` (path_follower:104 vs utils/utils.py:124) — mirrored exactly.
    x_field, y_field = gridops.convert_to_map_coordinates(jnp.asarray(occ), resolution)
    x_field, y_field = np.asarray(x_field), np.asarray(y_field)
    obstacles_idx = np.where(occ == 0)
    obs_x, obs_y = x_field[obstacles_idx], y_field[obstacles_idx]
    rotated = np.array(
        gridops.rotate_coordinates(jnp.asarray(np.array([obs_x, obs_y])), float(ori[2]))
    )
    rotated[0, :] += pos[0]
    rotated[1, :] += pos[1]
    x_obs, y_obs = rotated[0], rotated[1]
    ones = np.ones(n_obstacle_points)
    try:
        x_arr = ones * x_obs[0]
        x_arr[: len(x_obs)] = x_obs[:n_obstacle_points]
        y_arr = ones * y_obs[0]
        y_arr[: len(y_obs)] = y_obs[:n_obstacle_points]
    except IndexError:
        # quirk #10: empty scan -> phantom obstacles at 100 m
        x_arr = ones * 100.0
        y_arr = ones * 100.0
    return x_arr, y_arr


def scan_to_world_obstacles(
    scan_data,
    angles,
    size,
    pos,
    yaw,
    n_obstacle_points: int,
):
    """Corrected obstacle extraction: world-frame obstacle points straight
    from scan polar geometry, restricted to the local costmap window.

    The reference's pipeline (rasterize -> rot90 -> meter fields -> gather ->
    rotate) additionally *transposes* the cloud because it binds
    ``convert_to_map_coordinates``'s ``(meter_y, meter_x)`` return to
    ``x, y`` (path_follower:104 vs utils/utils.py:124) — harmless there since
    the obstacle cost is never active (quirk #1), but fatal once it is. This
    function is the geometrically-correct default for the live nodes;
    :func:`get_obstacles` remains the quirk-faithful variant."""
    r = np.asarray(scan_data, dtype=float)
    n = len(r)
    beam = np.arange(n) * (angles[1] - angles[0]) / n + angles[0]
    with np.errstate(invalid="ignore"):
        wx = pos[0] + r * np.cos(yaw + beam)
        wy = pos[1] + r * np.sin(yaw + beam)
    keep = np.isfinite(wx) & np.isfinite(wy)
    keep &= (np.abs(wx - pos[0]) <= size) & (np.abs(wy - pos[1]) <= size)
    wx, wy = wx[keep], wy[keep]
    # Pad with far sentinels — NOT the reference's first-obstacle broadcast
    # (quirk #10), which multiplies one real point's soft-cost weight ~160x
    # and repels the robot from phantom mass once obstacle costs are live.
    x_arr = np.full(n_obstacle_points, 100.0)
    y_arr = np.full(n_obstacle_points, 100.0)
    m = min(len(wx), n_obstacle_points)
    x_arr[:m] = wx[:m]
    y_arr[:m] = wy[:m]
    return x_arr, y_arr


def slew_limited_command(u, u_last, slew: float):
    """The reference's per-tick slew limiter, including its quirk of adding
    +slew to *both* channels regardless of error sign
    (path_follower_local_planner.py:197-203, quirk #6). Returns
    (v_cmd, w_cmd, u_last_next)."""
    u = np.asarray(u, dtype=float)
    if np.linalg.norm(u - u_last) > slew:
        return float(u_last[0]) + slew, float(u_last[1]) + slew, u
    return float(u[0]), float(u[1]), u
