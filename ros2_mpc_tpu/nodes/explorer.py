"""Autonomous exploration node: frontier goals over the live mapper.

Closes the autonomy loop the reference cannot even start: with the
occupancy mapper building /map live (nodes/mapper.py) and the frontier
extractor ranking the boundary between known-free and unknown space
(planner/frontier.py), this node publishes its OWN navigation goals — drive
to the nearest frontier, map what the lidar reveals, repeat until the
reachable world is closed. No human goal, no prior map.

Policy: a new frontier goal is picked when (a) there is none yet, (b) the
current one is reached, or (c) progress stalls for ``stall_ticks`` control
ticks (an unreachable frontier — e.g. behind a doorway the planner's
inflation seals — is abandoned and excluded from re-selection)."""

from __future__ import annotations

import numpy as np

from ..config import Params
from ..planner.frontier import frontier_goal_candidates
from .bus import MessageBus, Pose, PoseStamped, Quaternion
from .topics import OdomSubscriber


class ExplorerNode:
    def __init__(
        self,
        bus: MessageBus,
        mapper,
        params: Params = Params(),
        min_cluster: int = 8,
        min_distance: float = 0.4,
        stall_ticks: int = 150,
        exclusion_radius: float = 0.5,
    ):
        self.bus = bus
        self.mapper = mapper
        self.params = params
        self.min_cluster = min_cluster
        self.min_distance = min_distance
        self.stall_ticks = stall_ticks
        self.exclusion_radius = exclusion_radius
        self.odom = OdomSubscriber(bus)
        self.goal: np.ndarray | None = None
        self.done = False
        self.n_goals = 0
        self.abandoned: list[np.ndarray] = []
        self._best_d = np.inf
        self._since_progress = 0

    def _frontier_goals(self, robot_xy) -> list[np.ndarray]:
        """Cluster centroids in world XY, nearest first, exclusions applied."""
        cands = frontier_goal_candidates(
            self.mapper.occupancy(), robot_xy,
            self.mapper.origin, self.mapper.resolution,
            min_size=self.min_cluster, min_distance=self.min_distance,
        )
        return [
            xy for xy in cands
            if not any(
                np.linalg.norm(xy - a) < self.exclusion_radius for a in self.abandoned
            )
        ]

    def _publish_goal(self, xy, robot_xy):
        yaw = float(np.arctan2(xy[1] - robot_xy[1], xy[0] - robot_xy[0]))
        self.bus.publish(
            "/goal_pose",
            PoseStamped(
                pose=Pose(
                    x=float(xy[0]), y=float(xy[1]),
                    orientation=Quaternion(
                        z=float(np.sin(yaw / 2)), w=float(np.cos(yaw / 2))
                    ),
                )
            ),
        )

    def tick(self) -> dict:
        if self.done:
            return {"status": "complete", "n_goals": self.n_goals}
        pos, _ = self.odom.get_states()
        if pos is None:
            return {"status": "waiting_for_odom"}
        robot_xy = np.asarray(pos[:2], dtype=float)

        need_new = self.goal is None
        if self.goal is not None:
            d = float(np.linalg.norm(robot_xy - self.goal))
            if d < self.params.goal_threshold + 0.1:
                need_new = True  # frontier reached; the map has grown
            elif d < self._best_d - 0.02:
                self._best_d = d
                self._since_progress = 0
            else:
                self._since_progress += 1
                if self._since_progress > self.stall_ticks:
                    self.abandoned.append(self.goal)
                    need_new = True

        if need_new:
            goals = self._frontier_goals(robot_xy)
            if not goals:
                self.done = True
                self.goal = None
                return {"status": "complete", "n_goals": self.n_goals}
            self.goal = goals[0]
            self._best_d = np.inf
            self._since_progress = 0
            self.n_goals += 1
            self._publish_goal(self.goal, robot_xy)
        return {"status": "exploring", "goal": self.goal, "n_goals": self.n_goals}
