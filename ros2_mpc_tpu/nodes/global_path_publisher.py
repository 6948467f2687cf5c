"""Global path publisher node — behavior-parity rebuild of
ros2_mpc/scripts/global_path_publisher.py:70-135 (call stack SURVEY.md §3.3):
goal + map + odom -> dilate map -> A* -> Savitzky-Golay smoothing ->
world-frame path with heading quaternions on 'smoothed_plan'. Keeps the
reference's empty-path fallback to the previous path and its
"Goal Unreachable!" handling."""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from ..config import Params
from ..ops import costmap as costmapops
from ..ops import grid as gridops
from ..planner import AStarPlanner2
from .bus import MessageBus
from .reference_gen import get_path_headings
from .topics import GoalSubscriber, MapSubscriber, OdomSubscriber, PathPublisher

log = logging.getLogger("global_path_publisher")


class GlobalPathPublisherNode:
    def __init__(self, bus: MessageBus, params: Params = Params()):
        self.params = params
        self.path_publisher = PathPublisher(bus)
        self.map_node = MapSubscriber(bus)
        self.odom_node = OdomSubscriber(bus)
        self.goal_listener = GoalSubscriber(bus)
        self.planner = AStarPlanner2()
        self.path_last = None

    def tick(self) -> dict:
        p = self.params
        goal = self.goal_listener.get_goal()
        if goal is None:
            return {"status": "waiting_for_goal"}
        goal_xy = goal[:2]
        map_image, map_info = self.map_node.get_map()
        pos, _ = self.odom_node.get_states()
        if map_image is None or pos is None:
            return {"status": "waiting_for_map_or_odom"}

        # dilate x2 with the reference's kernel 8 (quirk #5: named 'erode')
        map_image = np.asarray(
            costmapops.erode_image(jnp.asarray(map_image.astype(np.float32)), p.map_dilation_kernel)
        )
        robot_on_map = np.asarray(
            gridops.world_to_map(pos[0], pos[1], map_image.shape, map_info["origin"], map_info["resolution"])
        )
        start = (int(robot_on_map[1]), int(robot_on_map[0]))
        goal_on_map = np.asarray(
            gridops.world_to_map(goal_xy[0], goal_xy[1], map_image.shape, map_info["origin"], map_info["resolution"])
        )
        goal_rc = (int(goal_on_map[1]), int(goal_on_map[0]))

        path = self.planner.get_path(start, goal_rc, map_image)
        if len(path) == 0:
            log.warning("Path empty. Using last path as reference!")
            path = self.path_last
        else:
            self.path_last = path
        if self.path_last is None:
            log.error("Goal Unreachable!")
            return {"status": "unreachable"}

        path_xy = gridops.map_to_world(path, map_image.shape, map_info["origin"], map_info["resolution"])
        if path_xy is None:
            log.error("Goal Unreachable!")
            return {"status": "unreachable"}
        try:
            path_heading = get_path_headings(path_xy)
            self.path_publisher.publish_path(path_xy, path_heading)
            if len(path_xy) <= 5:
                log.info("Goal Reached!")
                return {"status": "goal_reached", "path_xy": path_xy}
        except IndexError:
            log.info("Goal Reached!")
            return {"status": "goal_reached"}
        return {"status": "published", "path_xy": path_xy}


def main():
    from .launch import run_sim_stack

    run_sim_stack(follower="tracking")


if __name__ == "__main__":
    main()
