"""Closed-loop simulator: jitted unicycle plant + grid lidar + bus I/O.

The reference has no in-repo simulation at all — multi-node behavior is only
ever exercised against a real robot or an externally-installed Gazebo/nav2
stack (install.sh:1-7, SURVEY.md §4). This simulator closes the loop in one
process: a JAX unicycle plant integrated with RK4, a vectorized ray-marched
lidar over the occupancy map, and publishers for the exact topics the node
graph consumes (``/map``, ``/scan``, ``/robot_position``) with ``cmd_vel``
actuation — the deterministic test harness for the full navigation stack.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Params
from ..models import unicycle
from ..ops.integrators import rk4_step
from .bus import LaserScan, MessageBus, Odometry, Pose, Quaternion, Twist
from .topics import MapServer


@partial(jax.jit, static_argnums=(2, 4, 7))
def lidar_scan(
    occupied,  # (H, W) bool, pgm row order (row 0 = top)
    origin,  # (2,) world meters of the bottom-left map corner
    resolution,
    pose,  # (3,) x, y, yaw
    n_beams: int,
    angle_min,
    angle_max,
    max_range: float,
):
    """Ray-marched ranges in the robot frame (inf past max_range) — all beams
    and all samples evaluated as one fused gather."""
    H, W = occupied.shape
    step = resolution / 2.0
    n_steps = int(max_range / step)
    beam_angles = pose[2] + angle_min + jnp.arange(n_beams) * (angle_max - angle_min) / n_beams
    ts = (jnp.arange(n_steps) + 1.0) * step  # (T,)
    px = pose[0] + jnp.cos(beam_angles)[:, None] * ts[None, :]
    py = pose[1] + jnp.sin(beam_angles)[:, None] * ts[None, :]
    col = ((px - origin[0]) / resolution).astype(jnp.int32)
    row_from_bottom = ((py - origin[1]) / resolution).astype(jnp.int32)
    row = H - 1 - row_from_bottom
    inside = (col >= 0) & (col < W) & (row >= 0) & (row < H)
    hit = jnp.where(inside, occupied[jnp.clip(row, 0, H - 1), jnp.clip(col, 0, W - 1)], False)
    first = jnp.argmax(hit, axis=1)  # (B,)
    any_hit = jnp.any(hit, axis=1)
    return jnp.where(any_hit, ts[first], jnp.inf)


@jax.jit
def plant_step(x, u, dt):
    return rk4_step(unicycle.f, x, jnp.asarray(u), dt)


class Simulator:
    """Single-robot world wired onto a :class:`MessageBus`."""

    def __init__(
        self,
        bus: MessageBus,
        map_image: np.ndarray,  # trinary pgm convention: 254 free/0 occ/205 unknown
        map_info: dict,
        start_pose=(0.0, 0.0, 0.0),
        params: Params = Params(),
        n_beams: int = 360,
        max_range: float = 3.5,
        noise: dict | None = None,
        noise_seed: int = 0,
    ):
        """``noise`` keys (all std-devs, default 0 = the deterministic sim):
        ``odom_xy`` [m] and ``odom_yaw`` [rad] on the published/localized
        pose, ``scan`` (multiplicative, per beam) on lidar ranges, ``cmd``
        (multiplicative) on actuated velocities — a TurtleBot3-class error
        budget is ``{"odom_xy": 0.01, "odom_yaw": 0.01, "scan": 0.01,
        "cmd": 0.05}``."""
        self.bus = bus
        self.params = params
        self.map_image = np.asarray(map_image)
        self.map_info = map_info
        self.occupied = jnp.asarray(self.map_image == 0)
        self.origin = jnp.asarray(map_info["origin"][:2], dtype=float)
        self.resolution = float(map_info["resolution"])
        self.pose = jnp.asarray(start_pose, dtype=float)
        self.cmd = np.zeros(2)
        self.n_beams = n_beams
        self.max_range = max_range
        self.noise = dict(noise or {})
        self._rng = np.random.default_rng(noise_seed)
        # Dynamic (unmapped) obstacles: a callable returning world-XY centers
        # of moving discs the lidar must see — other robots in a shared world
        # (nodes/multi_robot.py), pedestrians, etc.
        self.moving_obstacles = None  # Optional[Callable[[], list[xy]]]
        self.obstacle_radius = 0.15
        self.map_server = MapServer(bus)
        bus.subscribe("cmd_vel", self._cmd_callback)
        self.publish_map()
        self.publish_state()
        self.publish_scan()

    def _cmd_callback(self, msg: Twist):
        self.cmd = np.array([msg.linear_x, msg.angular_z])

    def publish_map(self):
        """ROS-convention OccupancyGrid exactly as the reference map_server
        publishes it (core/map_server.py:16-20: 0 -> 100 occupied,
        254/205 -> 0 free, int8, flipud)."""
        img = self.map_image.copy().astype(np.int16)
        occ = np.where(img == 0, 100, 0).astype(np.int8)
        self.map_server.publish_map(np.flipud(occ), self.map_info)

    def measured_pose(self) -> np.ndarray:
        """Ground-truth pose corrupted by the localization error budget —
        what the tf chain / odometry consumers observe."""
        pose = np.asarray(self.pose, dtype=float)
        if self.noise.get("odom_xy") or self.noise.get("odom_yaw"):
            pose = pose + np.array(
                [
                    self._rng.normal(0.0, self.noise.get("odom_xy", 0.0)),
                    self._rng.normal(0.0, self.noise.get("odom_xy", 0.0)),
                    self._rng.normal(0.0, self.noise.get("odom_yaw", 0.0)),
                ]
            )
        return pose

    def publish_state(self):
        x, y, yaw = (float(v) for v in self.measured_pose())
        self.bus.publish(
            "/robot_position",
            Odometry(
                pose=Pose(
                    x=x,
                    y=y,
                    orientation=Quaternion(z=float(np.sin(yaw / 2)), w=float(np.cos(yaw / 2))),
                ),
                twist=Twist(linear_x=float(self.cmd[0]), angular_z=float(self.cmd[1])),
            ),
        )

    def _circle_ranges(self, centers) -> np.ndarray:
        """Analytic ray-circle first-hit distances for the dynamic discs
        (inf where a beam misses every disc or the hit is out of range)."""
        pose = np.asarray(self.pose, dtype=float)
        beams = pose[2] + (-np.pi) + np.arange(self.n_beams) * (2 * np.pi) / self.n_beams
        d = np.stack([np.cos(beams), np.sin(beams)], axis=1)  # (B, 2)
        out = np.full(self.n_beams, np.inf)
        r2 = self.obstacle_radius**2
        for c in centers:
            rel = np.asarray(c, dtype=float)[:2] - pose[:2]
            along = d @ rel
            perp2 = float(rel @ rel) - along**2
            t = along - np.sqrt(np.maximum(r2 - perp2, 0.0))
            hit = (perp2 < r2) & (t > 0) & (t <= self.max_range)
            out = np.where(hit, np.minimum(out, t), out)
        return out

    def publish_scan(self):
        ranges = np.asarray(
            lidar_scan(
                self.occupied,
                self.origin,
                self.resolution,
                self.pose,
                self.n_beams,
                -np.pi,
                np.pi,
                self.max_range,
            )
        )
        if self.moving_obstacles is not None:
            centers = self.moving_obstacles()
            if centers:
                ranges = np.minimum(ranges, self._circle_ranges(centers))
        if self.noise.get("scan"):
            finite = np.isfinite(ranges)
            ranges = np.where(
                finite,
                ranges * (1.0 + self._rng.normal(0.0, self.noise["scan"], size=ranges.shape)),
                ranges,
            )
        self.bus.publish(
            "/scan",
            LaserScan(ranges=ranges, angle_min=-np.pi, angle_max=np.pi),
        )

    def step(self, dt=None, publish: bool = True):
        """Advance the plant one control period. ``publish=True`` republishes
        sensors immediately (the lock-step sim graph); the wall-clock live
        graph passes ``publish=False`` and paces state/scan on their own
        timers instead (nodes/live.py)."""
        dt = self.params.dt if dt is None else dt
        cmd = self.cmd
        if self.noise.get("cmd"):
            cmd = cmd * (1.0 + self._rng.normal(0.0, self.noise["cmd"], size=2))
        self.pose = plant_step(self.pose, cmd, dt)
        if publish:
            self.publish_state()
            self.publish_scan()
        return np.asarray(self.pose)

    def in_collision(self) -> bool:
        col = int((float(self.pose[0]) - float(self.origin[0])) / self.resolution)
        row = self.map_image.shape[0] - 1 - int(
            (float(self.pose[1]) - float(self.origin[1])) / self.resolution
        )
        if not (0 <= row < self.map_image.shape[0] and 0 <= col < self.map_image.shape[1]):
            return True
        return bool(self.map_image[row, col] == 0)
