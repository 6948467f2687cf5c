"""Host-shim unit tests: bus semantics, topic ingestion quirks, reference
generation helpers, obstacle extraction, slew limiter."""

import numpy as np

from ros2_mpc_tpu.config import Params
from ros2_mpc_tpu.nodes import MessageBus
from ros2_mpc_tpu.nodes.bus import (
    LaserScan,
    Odometry,
    Pose,
    PoseStamped,
    Quaternion,
    Transform,
    Twist,
)
from ros2_mpc_tpu.nodes.reference_gen import (
    get_goal_for_mpc,
    get_headings,
    get_obstacles,
    get_reference_trajectory,
    slew_limited_command,
)
from ros2_mpc_tpu.nodes.state_publishers import TransformPublisherNode
from ros2_mpc_tpu.nodes.topics import GoalSubscriber, OdomSubscriber

PARAMS = Params()


def yaw_quat(yaw):
    return Quaternion(z=np.sin(yaw / 2), w=np.cos(yaw / 2))


def test_bus_pull_semantics():
    bus = MessageBus()
    assert bus.latest("/x") == (None, 0)
    bus.publish("/x", 41)
    bus.publish("/x", 42)
    msg, seq = bus.latest("/x")
    assert msg == 42 and seq == 2


def test_odom_subscriber_rounds_to_2_decimals():
    """quirk #8: ingestion rounding (ros_topics.py:67-80)."""
    bus = MessageBus()
    sub = OdomSubscriber(bus)
    bus.publish(
        "/robot_position",
        Odometry(pose=Pose(x=1.23456, y=-0.98765, orientation=yaw_quat(0.5))),
    )
    pos, ori = sub.get_states()
    np.testing.assert_allclose(pos, [1.23, -0.99])
    np.testing.assert_allclose(ori[2], 0.5, atol=5e-3)


def test_goal_subscriber_five_vector():
    bus = MessageBus()
    sub = GoalSubscriber(bus)
    bus.publish("/goal_pose", PoseStamped(pose=Pose(x=2.0, y=3.0, orientation=yaw_quat(1.0))))
    goal = sub.get_goal()
    assert goal.shape == (5,)
    np.testing.assert_allclose(goal[:2], [2.0, 3.0])
    np.testing.assert_allclose(goal[4], 1.0, atol=5e-3)


def test_transform_publisher_negates_translation():
    """quirk #7 (transform_publisher.py:25-28)."""
    bus = MessageBus()
    TransformPublisherNode(bus)
    bus.publish("/odom", Odometry(pose=Pose(x=1.5, y=-2.5)))
    tf = bus.lookup_transform("map", "odom")
    assert tf.x == -1.5 and tf.y == 2.5


def test_get_headings_quirks():
    """quirk: omega = dheading/2, v = ||dxy||/dt * 2 (path_follower:14-23)."""
    path = np.array([[0.0, 0.0], [0.1, 0.0], [0.2, 0.1]])
    heading, vel, omega = get_headings(path, dt=0.2)
    np.testing.assert_allclose(heading[0], 0.0)
    np.testing.assert_allclose(heading[1], np.arctan2(0.1, 0.1))
    assert len(heading) == 3
    np.testing.assert_allclose(vel[0], 0.1 / 0.2 * 2)
    np.testing.assert_allclose(omega[0], (heading[1] - heading[0]) / 2)


def test_reference_trajectory_shapes_and_goal_tiling():
    N = 10
    path = np.stack([np.linspace(0, 2, 50), np.zeros(50)], axis=1)
    heading, vel, omega = get_headings(path, 0.2)
    goal = np.array([2.0, 0.0, 0.0, 0.0, 0.0])
    # far from the end: sliced reference
    pxf, puf = get_reference_trajectory(np.array([0.0, 0.0, 0.0]), goal, path, heading, vel, omega, N)
    assert pxf.shape == (3 * N, 1) and puf.shape == (2 * N, 1)
    # near the end: goal tiled (path_follower:32-33)
    pxf2, _ = get_reference_trajectory(np.array([1.9, 0.0, 0.0]), goal, path, heading, vel, omega, N)
    np.testing.assert_allclose(pxf2.reshape(N, 3), np.tile(goal[:3], (N, 1)))
    # nearest point at path end: padding path (path_follower:39-48)
    pxf3, puf3 = get_reference_trajectory(np.array([5.0, 3.0, 0.0]), goal, path, heading, vel, omega, N)
    assert pxf3.shape == (3 * N, 1) and puf3.shape == (2 * N, 1)


def test_carrot_selection():
    path = np.stack([np.linspace(0, 2, 21), np.zeros(21)], axis=1)
    heading = np.zeros(21)
    goal = np.array([2.0, 0.0, 0.0, 0.0, 1.0])
    pos = np.array([0.0, 0.0])
    carrot = get_goal_for_mpc(path, heading, goal, pos, lookahead_dist=0.5)
    assert np.linalg.norm(carrot[:2] - pos) > 0.5
    # within lookahead of the true goal: exact goal pose with yaw mod 2pi
    carrot2 = get_goal_for_mpc(path, heading, goal, np.array([1.8, 0.0]), 0.5)
    np.testing.assert_allclose(carrot2, [2.0, 0.0, 1.0])


def test_obstacle_extraction_normalized_vs_quirk():
    scan = np.full(360, np.inf)
    scan[0] = 1.0  # one return straight ahead
    angles = np.array([-np.pi, np.pi])
    pos = np.array([0.5, 0.5])
    ori = np.array([0.0, 0.0, 0.0])
    n = PARAMS.n_obstacle_points
    # working variant finds the obstacle cloud
    x_obs, y_obs = get_obstacles(scan, angles, PARAMS.costmap_size, PARAMS.resolution, pos, ori, n, normalized=True)
    assert x_obs.shape == (n,)
    assert np.any(np.abs(x_obs) < 50)  # something near the robot
    # quirk: the tracking node's un-normalized math always degenerates to
    # 100 m sentinels (path_follower:102,106,126-129)
    x_q, y_q = get_obstacles(scan, angles, PARAMS.costmap_size, PARAMS.resolution, pos, ori, n, normalized=False)
    np.testing.assert_allclose(x_q, 100.0)
    np.testing.assert_allclose(y_q, 100.0)


def test_all_inf_scan_phantom_self_obstacle():
    """Reference quirk: an all-inf scan turns NaN in the rotation matmul
    (inf - inf), NaN sanitizes to 0, and rasterizes a single phantom obstacle
    at the sensor's own cell (utils/utils.py:20-29 + :145-152). Faithfully
    reproduced; the padded vector broadcasts that one cell everywhere
    (quirk #10)."""
    scan = np.full(360, np.inf)
    angles = np.array([-np.pi, np.pi])
    n = PARAMS.n_obstacle_points
    x_obs, y_obs = get_obstacles(
        scan, angles, PARAMS.costmap_size, PARAMS.resolution, np.zeros(2), np.zeros(3), n, normalized=True
    )
    assert np.all(np.abs(x_obs) <= 0.1)
    assert np.all(np.abs(y_obs) <= 0.1)


def test_slew_limiter_quirk():
    """quirk #6: +slew on both channels regardless of sign
    (path_follower:197-203)."""
    u_last = np.array([0.0, 0.0])
    v, w, u_next = slew_limited_command(np.array([0.1, -0.1]), u_last, 0.03)
    assert v == 0.03 and w == 0.03  # both bumped +0.03 even though w error < 0
    np.testing.assert_allclose(u_next, [0.1, -0.1])
    # small change passes through
    v2, w2, _ = slew_limited_command(np.array([0.01, 0.01]), u_last, 0.03)
    assert v2 == 0.01 and w2 == 0.01
