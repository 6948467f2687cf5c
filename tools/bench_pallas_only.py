"""Time only the Pallas whole-solver kernel on TPU (no XLA-engine recompile)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from ros2_mpc_tpu.config import Params
    from ros2_mpc_tpu.solver import make_point_stabilization
    from ros2_mpc_tpu.solver.pallas_kernel import make_pallas_point_stab_solver

    P = Params()
    N, B = 20, 4096
    prob = make_point_stabilization(P, horizon=N)
    rng = np.random.default_rng(0)
    thetas = jax.vmap(prob.make_theta)(
        jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3))),
        jnp.asarray(np.c_[rng.uniform(-1.5, 1.5, (B, 2)), rng.uniform(-np.pi, np.pi, (B, 1))]),
    )
    U0 = jnp.zeros((B, N, 2))
    fn = jax.jit(make_pallas_point_stab_solver(prob.ocp, prob.settings))
    print("compiling pallas kernel...", flush=True)
    t0 = time.perf_counter()
    sols = fn(thetas, U0)
    jax.block_until_ready(sols)
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(thetas, U0))
        times.append(time.perf_counter() - t0)
    best = min(times)
    conv = float(jnp.mean(sols.converged.astype(jnp.float32)))
    print(
        f"pallas: best={best*1e3:.2f}ms -> {B/best:,.0f} solves/s conv={conv*100:.1f}%",
        flush=True,
    )


if __name__ == "__main__":
    main()
