from .mesh import (
    SCENARIO_AXIS,
    bank_metrics,
    make_bank_solver,
    make_host_chip_mesh,
    make_mesh,
    shard_bank,
)
from .fleet import (
    arc_path_fleet,
    circle_swarm,
    grid_swap_swarm,
    make_fleet_rollout,
    make_generic_fleet_rollout,
    make_sharded_fleet_rollout,
    make_sharded_swarm_rollout,
    make_sharded_tracking_fleet_rollout,
    make_swarm_rollout,
    make_tracking_fleet_rollout,
    random_fleet,
)
from .sweep import SweepSpec, build_sweep_thetas, run_sweep
from . import distributed

__all__ = [
    "SCENARIO_AXIS",
    "bank_metrics",
    "make_bank_solver",
    "make_host_chip_mesh",
    "make_mesh",
    "shard_bank",
    "arc_path_fleet",
    "circle_swarm",
    "grid_swap_swarm",
    "make_fleet_rollout",
    "make_generic_fleet_rollout",
    "make_sharded_fleet_rollout",
    "make_sharded_swarm_rollout",
    "make_sharded_tracking_fleet_rollout",
    "make_swarm_rollout",
    "make_tracking_fleet_rollout",
    "random_fleet",
    "SweepSpec",
    "build_sweep_thetas",
    "run_sweep",
    "distributed",
]
