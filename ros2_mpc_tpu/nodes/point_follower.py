"""Point-stabilization (carrot-chasing) control-loop node — behavior-parity
rebuild of ros2_mpc/scripts/point_follower_local_planner.py:121-231
(call stack SURVEY.md §3.2)."""

from __future__ import annotations

import time

import jax
import numpy as np

from ..config import Params
from ..solver import SolverSettings, make_point_stabilization
from ..solver.packed import make_packed_point_stab
from ..utils.telemetry import Telemetry
from .bus import MessageBus
from .reference_gen import (
    StaticStructureFilter,
    get_goal_for_mpc,
    get_obstacles,
    scan_to_world_obstacles,
    slew_limited_command,
)
from .topics import (
    CmdVelPublisher,
    GoalPointPublisher,
    GoalSubscriber,
    LaserSubscriber,
    MapSubscriber,
    OdomSubscriber,
    RobotController,
)


class PointFollowerNode:
    def __init__(
        self,
        bus: MessageBus,
        params: Params = Params(),
        reference_parity: bool = False,
        horizon: int | None = None,
        settings: SolverSettings | None = None,
        escape_after: int | None = None,
        cmd_topic: str = "cmd_vel",
    ):
        """``escape_after``: opt-in basin-escape recovery. After that many
        consecutive non-converged warm-started solves, one tick runs the
        multi-start global/local engine (solver/mppi.py: one batched iLQR
        polish over the warm start, the MPPI elite, and deterministic arc
        seeds) instead of the plain local solve, and its solution re-seeds
        the warm start. Targets the local engine's measured failure mode —
        stalling on the wrong side of an exponential obstacle wall (incl.
        the symmetric saddle sampling alone cannot break) — which the
        reference cannot recover from at all (a failed IPOPT solve raises
        and kills the node, local_planner_tracking.py:74). Off by default:
        the escape tick costs ~an order of magnitude more compute."""
        self.params = params
        self.reference_parity = reference_parity
        self.robot_controller = RobotController(bus)
        self.odom_node = OdomSubscriber(bus)
        self.cmd_vel_publisher = CmdVelPublisher(bus, cmd_topic)
        self.goal_listener = GoalSubscriber(bus)
        self.laser_node = LaserSubscriber(bus)
        self.goal_point_publisher = GoalPointPublisher(bus)
        # corrected mode: live obstacle costs see only *unmapped* returns
        self.static_filter = None if reference_parity else StaticStructureFilter(MapSubscriber(bus))
        if settings is None:
            settings = SolverSettings() if reference_parity else SolverSettings.realtime()
        self.problem = make_point_stabilization(
            params, reference_parity=reference_parity, horizon=horizon, settings=settings
        )
        self.N = self.problem.ocp.horizon
        # Packed-theta path: one host->device transfer per tick (solver/packed.py).
        solve_packed, self._pack = make_packed_point_stab(self.problem, params)
        self._solve = jax.jit(solve_packed)
        self.escape_after = escape_after
        self._stall = 0
        self._stall_goal = None  # stall evidence is per-goal
        self.n_escapes = 0
        if escape_after is not None:
            from ..solver.mppi import MppiSettings, make_multistart_solver

            # Full iLQR schedule for the polish (not the follower's realtime
            # profile): the arc seeds start cold, and a 12-iteration RTI
            # schedule cannot converge them — every candidate would come
            # back non-converged and the escape would select the warm start
            # it already had. A rare recovery tick can afford the compute.
            escape_solver = make_multistart_solver(
                self.problem.ocp,
                SolverSettings(),
                MppiSettings(n_samples=128, n_iters=8),
            )
            esc_packed, _ = make_packed_point_stab(
                self.problem, params, solve_fn=escape_solver
            )
            self._solve_escape = jax.jit(esc_packed)
            self._escape_key = jax.random.PRNGKey(0)
            # Pay the XLA compile now (the node's most expensive program):
            # compiling lazily would stall the live control loop for seconds
            # on the first escaping tick, blowing every task deadline.
            n = params.n_obstacle_points
            far = np.full(n, 100.0)
            self._solve_escape(
                self._pack(np.zeros(3), np.zeros(3), far, far),
                self.problem.default_u0,
                jax.random.PRNGKey(1),
            )
        self.u_warm = self.problem.default_u0
        self.u_last = np.zeros(2)
        self.goal_flag = False
        self.telemetry = Telemetry("point_follower")

    def tick(self, now: float | None = None) -> dict:
        p = self.params
        goal = self.goal_listener.get_goal()
        if goal is None:
            return {"status": "waiting_for_goal"}
        if self.escape_after is not None:
            # a stale stall count from a previous (possibly unreachable)
            # goal must not trigger an escape on the first tick to a new one
            gk = (round(float(goal[0]), 3), round(float(goal[1]), 3))
            if gk != self._stall_goal:
                self._stall_goal = gk
                self._stall = 0
        scan_data, angles = self.laser_node.get_scan()
        pos, ori = self.odom_node.get_states()
        if scan_data is None or pos is None:
            return {"status": "waiting_for_sensors"}

        if self.reference_parity:
            # the point follower's normalized grid variant (point_follower:89)
            # finds cells but transposes the cloud (see reference_gen doc).
            x_obs, y_obs = get_obstacles(
                scan_data, angles, p.costmap_size, p.resolution, pos, ori,
                p.n_obstacle_points, normalized=True,
            )
        else:
            mask, map_info = self.static_filter.current()
            x_obs, y_obs = scan_to_world_obstacles(
                scan_data, angles, p.costmap_size, pos, ori[2], p.n_obstacle_points,
                static_mask=mask, map_info=map_info,
            )
        path_xy, path_headings = self.robot_controller.get_path()
        if path_xy is None or len(path_xy) < 1:
            return {"status": "waiting_for_path"}

        # quirk: yaw folded into [0, 2pi) here (point_follower:172)
        x0 = np.array([pos[0], pos[1], ori[2] % (2 * np.pi)])
        goal_mpc = get_goal_for_mpc(path_xy, path_headings, goal, pos, p.look_ahead_distance)
        self.goal_point_publisher.publish_goal_point(goal_mpc)

        packed = self._pack(x0, goal_mpc, x_obs, y_obs)
        U0 = self.problem.default_u0 if self.reference_parity else self.u_warm
        escaping = self.escape_after is not None and self._stall >= self.escape_after
        t0 = time.perf_counter()
        if escaping:
            self._escape_key, key = jax.random.split(self._escape_key)
            sol, u_warm_next = self._solve_escape(packed, U0, key)
            self.n_escapes += 1
            self._stall = 0
        else:
            sol, u_warm_next = self._solve(packed, U0)
        solve_s = time.perf_counter() - t0
        u = np.asarray(sol.U[0])
        if not np.all(np.isfinite(u)):
            u = self.u_last
        else:
            self.u_warm = u_warm_next  # device-resident, shifted inside the jit
        if self.escape_after is not None and not escaping:
            self._stall = 0 if bool(sol.converged) else self._stall + 1
        self.telemetry.record(
            solve_s=solve_s,
            kkt=float(sol.kkt_residual),
            cost=float(sol.cost),
            converged=bool(sol.converged),
        )

        if self.goal_flag:
            self.cmd_vel_publisher.publish_cmd(0.0, 0.0)
        else:
            v_cmd, w_cmd, self.u_last = slew_limited_command(u, self.u_last, p.slew_limit)
            self.cmd_vel_publisher.publish_cmd(v_cmd, w_cmd)

        if np.linalg.norm(x0[0:2] - goal[0:2]) > p.goal_threshold:
            self.goal_flag = False
        elif not self.goal_flag:
            self.cmd_vel_publisher.publish_cmd(0.0, 0.0)
            self.goal_flag = True
        return {
            "status": "goal_reached" if self.goal_flag else "chasing",
            "u": u,
            "carrot": goal_mpc,
            "solve_s": solve_s,
            "escaped": escaping,
        }


def main():
    """Console entry: the carrot-chasing control loop on the wall-clock live
    graph (point_follower_local_planner.py:121-231 semantics at 5 Hz)."""
    from .live import main as live_main
    import sys

    sys.argv = [sys.argv[0], "--follower", "point", *sys.argv[1:]]
    live_main()


if __name__ == "__main__":
    main()
