from .mesh import (
    SCENARIO_AXIS,
    bank_metrics,
    make_bank_solver,
    make_host_chip_mesh,
    make_mesh,
    shard_bank,
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
    "SweepSpec",
    "build_sweep_thetas",
    "run_sweep",
    "distributed",
]
