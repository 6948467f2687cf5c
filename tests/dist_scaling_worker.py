"""Worker for the multi-process (DCN-analogue) scaling measurement.

Launched (never imported) by ros2_mpc_tpu.parallel.scaling_bench's
distributed mode and by tests/test_scaling_distributed.py: 2 OS processes x
4 virtual CPU devices form one 8-device global mesh over local TCP. Each
engine is timed twice:

* **1-dev baseline**: a process-local single-device bank solve (no mesh, no
  collectives) on ``jax.local_devices()[0]`` — run on process 0 while the
  other process parks in a coordination barrier;
* **8-dev global**: the sharded bank step over the full global mesh — the
  telemetry all-reduces cross the process (TCP) boundary every step, which
  is exactly the DCN path a real pod pays.

Process 0 prints one ``DIST_SCALING_OK {json}`` line with per-engine
throughput and efficiency. The same contention caveat as the virtual-mesh
bench applies (8 virtual devices on 2 physical cores: ceiling = cores /
devices); ``efficiency_vs_ceiling`` is the partitioning+collective number
this environment can actually validate.
"""

import json
import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ros2_mpc_tpu.config import Params
    from ros2_mpc_tpu.parallel.distributed import initialize
    from ros2_mpc_tpu.parallel.mesh import make_bank_solver, make_mesh
    from ros2_mpc_tpu.solver import make_point_stabilization
    from ros2_mpc_tpu.solver.mppi import MppiSettings

    info = initialize()
    assert info["initialized"] and info["process_count"] == 2, info
    from jax.experimental import multihost_utils

    N = 10
    per_dev = 64
    reps = 3
    prob = make_point_stabilization(Params(), horizon=N)
    n_global = info["global_devices"]
    proc = info["process_index"]

    def bank(B):
        rng = np.random.default_rng(0)
        thetas = jax.vmap(prob.make_theta)(
            jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 3))),
            jnp.asarray(rng.uniform(-1.0, 1.0, size=(B, 3))),
        )
        return jax.tree.map(np.asarray, thetas), np.zeros((B, N, 2), np.float32)

    engines = {
        "vmap": {},
        "fast": {"lanes": per_dev},
        "pallas": {"tile_s": 1, "tile_l": per_dev, "interpret": True},
        "mppi": {"settings": MppiSettings(n_samples=16, n_iters=2)},
    }

    results = []
    for engine, opts in engines.items():
        # --- 1-dev process-local baseline (proc 0 measures; proc 1 waits)
        multihost_utils.sync_global_devices(f"pre-base-{engine}")
        base_rate = 0.0
        if proc == 0:
            th_h, U0_h = bank(per_dev)
            mesh1 = make_mesh(1)  # first global device == proc 0's first local
            step1 = make_bank_solver(prob, mesh1, engine=engine, **opts)
            th1 = jax.device_put(jax.tree.map(jnp.asarray, th_h))
            U01 = jax.device_put(jnp.asarray(U0_h))
            jax.block_until_ready(step1(th1, U01))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(step1(th1, U01))
                ts.append(time.perf_counter() - t0)
            base_rate = per_dev / min(ts)
        multihost_utils.sync_global_devices(f"post-base-{engine}")

        # --- n-dev global-mesh step (both processes participate)
        B = per_dev * n_global
        th_h, U0_h = bank(B)
        mesh = make_mesh()
        sharding = NamedSharding(mesh, P("scenario"))

        def to_global(a):
            a = np.asarray(a)
            return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])

        thetas = jax.tree.map(to_global, th_h)
        U0 = to_global(U0_h)
        step = make_bank_solver(prob, mesh, engine=engine, **opts)
        jax.block_until_ready(step(thetas, U0))
        multihost_utils.sync_global_devices(f"pre-global-{engine}")
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(step(thetas, U0))
            ts.append(time.perf_counter() - t0)
        global_rate = B / min(ts)
        multihost_utils.sync_global_devices(f"post-global-{engine}")

        if proc == 0:
            eff = global_rate / (base_rate * n_global)
            results.append(
                {
                    "engine": engine,
                    "solves_per_s_1dev": base_rate,
                    "solves_per_s_ndev": global_rate,
                    "scaling_efficiency": eff,
                }
            )

    if proc == 0:
        ceiling = min(1.0, (os.cpu_count() or 1) / n_global)
        for r in results:
            r["efficiency_vs_ceiling"] = min(1.0, r["scaling_efficiency"] / ceiling)
        out = {
            "mode": "2-process jax.distributed over TCP (DCN analogue)",
            "processes": info["process_count"],
            "global_devices": n_global,
            "per_device_batch": per_dev,
            "horizon": N,
            "physical_cores": os.cpu_count(),
            "contention_ceiling": ceiling,
            "results": results,
        }
        print("DIST_SCALING_OK " + json.dumps(out))
        sys.stdout.flush()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
