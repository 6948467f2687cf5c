"""Compare the XLA bank engine vs the whole-solver Pallas kernel on TPU."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from ros2_mpc_tpu.config import Params
    from ros2_mpc_tpu.solver import make_point_stabilization
    from ros2_mpc_tpu.solver.batched import make_bank_solver_fast
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
    Uref = None
    engines = [
        ("xla_bank", jax.jit(make_bank_solver_fast(prob.ocp, prob.settings))),
        ("pallas", jax.jit(make_pallas_point_stab_solver(prob.ocp, prob.settings))),
    ]
    for name, fn in engines:
        t0 = time.perf_counter()
        sols = fn(thetas, U0)
        jax.block_until_ready(sols)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(thetas, U0))
            times.append(time.perf_counter() - t0)
        best = min(times)
        conv = float(jnp.mean(sols.converged.astype(jnp.float32)))
        print(
            f"{name}: compile={compile_s:.1f}s best={best*1e3:.2f}ms "
            f"-> {B/best:,.0f} solves/s conv={conv*100:.1f}%",
            flush=True,
        )
        if Uref is None:
            Uref = np.asarray(sols.U)
        else:
            print("  max|dU| vs xla:", float(np.max(np.abs(np.asarray(sols.U) - Uref))), flush=True)


if __name__ == "__main__":
    main()
