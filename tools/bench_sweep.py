"""Monte-Carlo tuning sweep at BASELINE config-5 scale, on the available
hardware: 25 (Q, R) weight configs x 4096 scenarios = 102,400 N=20 NMPC
solves per sweep tick (the "~100k solves/tick" target), evaluated with the
whole-solver Pallas kernel. Writes a JSON artifact (default SWEEP.json;
pass the output path as argv[1] — e.g. SWEEP_r04.json per round).

On a multi-host slice the same sweep shards over the global mesh
(parallel/mesh.py + parallel/distributed.py); this artifact records the
single-chip number the pod run divides by.
"""

from __future__ import annotations

import json
import os
import sys
import time


# runnable as `python tools/bench_sweep.py` without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_path: str = "SWEEP.json"):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu_mpc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ros2_mpc_tpu.config import Params
    from ros2_mpc_tpu.parallel.sweep import SweepSpec, run_sweep
    from ros2_mpc_tpu.solver import make_point_stabilization

    params = Params()
    prob = make_point_stabilization(params, horizon=20)
    spec = SweepSpec(scenarios_per_config=4096)
    n_solves = len(spec.q_scales) * len(spec.r_scales) * spec.scenarios_per_config
    engine = "pallas" if jax.default_backend() == "tpu" else "vmap"

    run_sweep(prob, spec, params=params, engine=engine)  # compile
    t0 = time.perf_counter()
    out = run_sweep(prob, spec, params=params, engine=engine)
    wall = time.perf_counter() - t0

    artifact = {
        "backend": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
        "engine": engine,
        "n_configs": int(out["configs"].shape[0]),
        "scenarios_per_config": spec.scenarios_per_config,
        "n_solves_per_tick": n_solves,
        "sweep_tick_wall_s": round(wall, 3),
        "solves_per_s": round(n_solves / wall, 1),
        "best_config_qr_scales": [float(v) for v in out["best_config"]],
        "mean_goal_error_by_config": {
            f"q={q:g},r={r:g}": round(float(e), 4)
            for (q, r), e in zip(out["configs"], out["mean_goal_error"])
        },
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:])
