"""Scan/grid/coordinate kernels — JAX replacements for the reference's
numba-JIT functions (ros2_mpc/utils/utils.py).

Every function is pure, static-shape, and jit/vmap-composable: scan
rasterization is a masked scatter (``.at[].set`` with ``mode='drop'``),
gathers are mask + affine fields, transforms are tiny matmuls. Grid geometry
(cell counts) must be static, so the factories close over resolution/size.

Reference quirks preserved or documented:

* index truncation toward zero (``int(x)``) when scattering
  (utils/utils.py:39,88) — reproduced with ``astype(int32)``;
* NaN sanitization in ``convert_laser_scan_to_xy_coordinates`` assigns
  ``np.min(x_coords)`` which is itself NaN when NaNs are present
  (utils/utils.py:62-63) — corrected here to the min over finite values;
* ``convert_to_map_coordinates`` returns ``(meter_y, meter_x)`` in that order
  with negated axes (utils/utils.py:114-124) — preserved exactly.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp


def rotate_coordinates(coordinates: jnp.ndarray, rotation) -> jnp.ndarray:
    """2D rotation of ``(2, P)`` stacked coordinates (utils/utils.py:145-152)."""
    c, s = jnp.cos(rotation), jnp.sin(rotation)
    rot = jnp.array([[c, -s], [s, c]])
    return rot @ coordinates


def euler_from_quaternion(x, y, z, w):
    """Quaternion -> (roll, pitch, yaw) (utils/utils.py:127-142; duplicated at
    core/robot_state_publisher.py:34-55)."""
    t0 = 2.0 * (w * x + y * z)
    t1 = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(t0, t1)
    t2 = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(t2)
    t3 = 2.0 * (w * z + x * y)
    t4 = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(t3, t4)
    return roll, pitch, yaw


def quaternion_from_yaw(yaw):
    """(z, w) of a pure-yaw quaternion — the inverse the reference inlines when
    publishing poses (scripts/global_path_publisher.py:46-47)."""
    return jnp.sin(yaw / 2.0), jnp.cos(yaw / 2.0)


def _sanitize_scan_xy(ranges: jnp.ndarray, angle_min, angle_max, rotation):
    """Polar -> rotated Cartesian with NaN/Inf handling shared by the scan
    converters (utils/utils.py:19-32)."""
    n = ranges.shape[0]
    angles = jnp.arange(n) * (angle_max - angle_min) / n + angle_min
    x = ranges * jnp.cos(angles)
    y = ranges * jnp.sin(angles)
    xy = rotate_coordinates(jnp.stack([x, y]), rotation)
    x, y = xy[0], xy[1]

    def fix(v, nan_fill):
        finite = jnp.isfinite(v)
        vmax = jnp.max(jnp.where(jnp.isinf(v), -jnp.inf, jnp.where(jnp.isnan(v), -jnp.inf, v)))
        v = jnp.where(jnp.isinf(v), vmax, v)
        v = jnp.where(jnp.isnan(v), nan_fill(v, finite), v)
        return v

    # occupancy-grid variant fills NaN with 0 (utils/utils.py:28-29)
    x0 = fix(x, lambda v, m: 0.0)
    y0 = fix(y, lambda v, m: 0.0)
    # xy variant fills NaN with the finite minimum (corrected; see module doc)
    xmin = fix(x, lambda v, m: jnp.min(jnp.where(m, v, jnp.inf)))
    ymin = fix(y, lambda v, m: jnp.min(jnp.where(m, v, jnp.inf)))
    return (x0, y0), (xmin, ymin)


@lru_cache(maxsize=None)
def make_scan_to_occupancy(map_resolution: float, map_size: float):
    """Factory for the laser-scan rasterizer (utils/utils.py:5-43).

    ``map_size`` is meters per side; the grid is ``num_cells^2`` with the
    sensor at the center. Returns occupied cells as 100.0, free as 0.0.
    """
    num_cells = int(map_size / map_resolution)

    @jax.jit
    def scan_to_occupancy(ranges, angles, rotation=0.0):
        (x, y), _ = _sanitize_scan_xy(ranges, angles[0], angles[1], rotation)
        xi = ((x + map_size / 2) / map_resolution).astype(jnp.int32)
        yi = ((y + map_size / 2) / map_resolution).astype(jnp.int32)
        valid = (xi >= 0) & (xi < num_cells) & (yi >= 0) & (yi < num_cells)
        grid = jnp.zeros((num_cells, num_cells))
        yi = jnp.where(valid, yi, num_cells)  # pushed out of range -> dropped
        return grid.at[yi, xi].set(100.0, mode="drop")

    return scan_to_occupancy


def scan_to_xy(ranges, angles, rotation=0.0):
    """Sanitized world-frame XY point lists from a scan (utils/utils.py:46-68)."""
    _, (x, y) = _sanitize_scan_xy(ranges, angles[0], angles[1], rotation)
    return x, y


@lru_cache(maxsize=None)
def make_xy_to_occupancy(map_resolution: float, num_cells_x: int, num_cells_y: int):
    """Factory for the XY -> occupancy scatter (utils/utils.py:71-92)."""

    @jax.jit
    def xy_to_occupancy(x, y, map_origin):
        xi = ((x - map_origin[0]) / map_resolution).astype(jnp.int32)
        yi = ((y - map_origin[1]) / map_resolution).astype(jnp.int32)
        valid = (xi >= 0) & (xi < num_cells_y) & (yi >= 0) & (yi < num_cells_x)
        grid = jnp.zeros((num_cells_x, num_cells_y))
        yi = jnp.where(valid, yi, num_cells_x)
        return grid.at[yi, xi].set(100.0, mode="drop")

    return xy_to_occupancy


@jax.jit
def occupancy_to_xy_fields(occ_grid, map_resolution, map_origin, occupied_value=255.0):
    """Occupancy -> (mask, x_field, y_field): the static-shape core of
    ``convert_occ_grid_to_xy_coordinates`` (utils/utils.py:95-111). The
    reference flips the grid and appends list entries per occupied cell;
    here the mask selects entries from dense coordinate fields (hosts can
    ``np.nonzero`` the mask for the ragged list API)."""
    g = jnp.flipud(occ_grid)
    mask = g == occupied_value
    rows = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    x = cols * map_resolution + map_origin[0]
    y = rows * map_resolution + map_origin[1]
    return mask, x, y


def convert_occ_grid_to_xy_coordinates(occ_grid, map_resolution, map_origin):
    """Ragged host API matching the reference's list return."""
    import numpy as np

    mask, x, y = occupancy_to_xy_fields(
        jnp.asarray(occ_grid, dtype=float), map_resolution, jnp.asarray(map_origin, dtype=float)
    )
    m = np.asarray(mask)
    return list(np.asarray(x)[m]), list(np.asarray(y)[m])


@partial(jax.jit, static_argnums=())
def convert_to_map_coordinates(occ_grid, map_resolution=0.8):
    """Per-cell meter coordinate fields centered on the grid midpoint,
    returned as ``(meter_y, meter_x)`` with negated axes — exact preserve of
    utils/utils.py:114-124 (the local-costmap -> obstacle-XY transform)."""
    h, w = occ_grid.shape
    origin_y = (h // 2) * map_resolution
    origin_x = (w // 2) * map_resolution
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    meter_x = -cols * map_resolution + origin_x
    meter_y = -rows * map_resolution + origin_y
    return meter_y, meter_x


def world_to_map(world_x, world_y, map_shape, map_origin, map_resolution):
    """World meters -> map pixel (col, row-from-bottom flipped), matching
    utils/utils.py:155-158 (note the y-flip against image row order)."""
    mx = jnp.asarray([world_x, world_y])
    mc = ((mx - jnp.asarray(map_origin)) / map_resolution).astype(jnp.int32)
    return jnp.array([mc[0], map_shape[0] - mc[1]])


def map_to_world(path, map_shape, map_origin, map_resolution):
    """Map pixel path ``(P, 2)`` (row, col) -> world XY ``(P, 2)``
    (utils/utils.py:161-169). Returns None on an empty path as the reference
    does."""
    import numpy as np

    path = np.asarray(path)
    if path.ndim != 2 or path.shape[0] == 0:
        return None
    flipped = np.column_stack((path[:, 1], map_shape[0] - path[:, 0]))
    return flipped * map_resolution + np.asarray(map_origin)
