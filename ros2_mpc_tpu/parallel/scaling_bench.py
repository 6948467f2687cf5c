"""Scaling-efficiency benchmark harness (BASELINE target: >= 80% efficiency
from 1 chip to >= 2 hosts).

Measures bank-solve throughput at 1 device vs n devices on whatever mesh is
available — real TPU chips on a pod slice (after
``parallel.distributed.initialize``), or the virtual CPU mesh in CI, where it
validates the harness and the GSPMD partitioning rather than silicon scaling.
The workload is embarrassingly parallel across scenarios, so the measured
inefficiency isolates partitioning overhead + the collective telemetry
reductions (scalar latency-bound all-reduces over ICI/DCN).
"""

from __future__ import annotations

import time

import numpy as np


def run(per_device_batch: int = 512, horizon: int = 20, reps: int = 3, engine: str = "vmap"):
    import jax
    import jax.numpy as jnp

    from ..config import Params
    from ..solver import make_point_stabilization
    from .mesh import make_bank_solver, make_mesh, shard_bank

    params = Params()
    prob = make_point_stabilization(params, horizon=horizon)
    n_dev = len(jax.devices())
    results = {}
    for nd in sorted({1, n_dev}):
        B = per_device_batch * nd
        rng = np.random.default_rng(0)
        thetas = jax.vmap(prob.make_theta)(
            jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 3))),
            jnp.asarray(rng.uniform(-1.5, 1.5, size=(B, 3))),
        )
        U0 = jnp.zeros((B, horizon, 2))
        mesh = make_mesh(nd)
        step = make_bank_solver(prob, mesh, engine=engine)
        thetas = shard_bank(thetas, mesh)
        U0 = shard_bank(U0, mesh)
        jax.block_until_ready(step(thetas, U0))  # compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(step(thetas, U0))
            times.append(time.perf_counter() - t0)
        best = min(times)
        results[nd] = B / best
    eff = results[n_dev] / (results[1] * n_dev) if n_dev > 1 else 1.0
    return {
        "devices": n_dev,
        "solves_per_s_1dev": results[1],
        "solves_per_s_ndev": results.get(n_dev, results[1]),
        "scaling_efficiency": eff,
    }


def main():
    out = run()
    print(
        f"devices={out['devices']} 1-dev={out['solves_per_s_1dev']:.0f}/s "
        f"n-dev={out['solves_per_s_ndev']:.0f}/s efficiency={out['scaling_efficiency']*100:.1f}%"
    )


if __name__ == "__main__":
    main()
