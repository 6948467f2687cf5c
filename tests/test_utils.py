"""Asset, PGM I/O, visualization, telemetry, and distributed-noop tests."""

import os

import numpy as np

from ros2_mpc_tpu.config import Params
from ros2_mpc_tpu.parallel import distributed
from ros2_mpc_tpu.utils import Telemetry, pgm, viz

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pgm_roundtrip(tmp_path):
    img = pgm.synthetic_indoor_map(60, 80, seed=1)
    path = str(tmp_path / "m.pgm")
    pgm.write_pgm(path, img)
    back = pgm.read_pgm(path)
    np.testing.assert_array_equal(back, img)


def test_read_ascii_pgm(tmp_path):
    path = str(tmp_path / "a.pgm")
    with open(path, "w") as fh:
        fh.write("P2\n# comment\n3 2\n255\n0 100 200\n254 205 0\n")
    img = pgm.read_pgm(path)
    np.testing.assert_array_equal(img, [[0, 100, 200], [254, 205, 0]])


def test_shipped_assets_load():
    p = Params.load(os.path.join(REPO, "ros2_mpc_tpu", "assets", "params.yaml"))
    assert p.dt == 0.2 and p.N == 30 and p.Q == (1.0, 1.0, 0.005)
    img = pgm.read_pgm(os.path.join(REPO, "maps", "map_synthetic.pgm"))
    meta = pgm.load_map_yaml(os.path.join(REPO, "maps", "map_synthetic.yaml"))
    assert img.shape == (250, 250)
    assert meta["resolution"] == 0.05
    assert set(np.unique(img)) <= {0, 205, 254}


def test_params_yaml_roundtrip(tmp_path):
    import yaml

    p = Params(dt=0.1, N=15)
    path = str(tmp_path / "params.yaml")
    with open(path, "w") as fh:
        yaml.safe_dump(p.to_yaml_dict(), fh)
    p2 = Params.load(path)
    assert p2.dt == 0.1 and p2.N == 15
    assert p2.n_obstacle_points == p.n_obstacle_points


def test_viz_render_png(tmp_path):
    img = pgm.synthetic_indoor_map(80, 80, seed=2)
    info = {"resolution": 0.05, "origin": [-2.0, -2.0]}
    trace = np.stack([np.linspace(-1, 1, 30), np.linspace(-1, 0.5, 30)], axis=1)
    out = str(tmp_path / "world.png")
    rgb = viz.render_world(img, info, robot_trace=trace, goal_xy=(1.0, 0.5), out_path=out)
    assert rgb.shape == (80, 80, 3)
    assert os.path.getsize(out) > 100
    with open(out, "rb") as fh:
        assert fh.read(8) == b"\x89PNG\r\n\x1a\n"
    # trace stamped in red
    assert (rgb[..., 0] == 220).any()


def test_telemetry_percentiles():
    t = Telemetry("x")
    for v in range(100):
        t.record(solve_s=v / 1000.0)
    p = t.percentiles("solve_s")
    assert 0.04 < p["p50"] < 0.06
    assert p["p99"] > 0.09
    s = t.summary()
    assert s["solve_s"]["max"] == 0.099


def test_distributed_noop_single_host():
    info = distributed.initialize()
    assert info["initialized"] is False
    assert info["process_count"] == 1
    assert info["global_devices"] == 8  # virtual CPU mesh
