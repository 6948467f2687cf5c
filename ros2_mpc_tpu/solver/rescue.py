"""Two-pass straggler rescue: kill the convergence tail of a scenario bank.

On obstacle-active banks the standard fixed schedule leaves a few percent of
scenarios above the strict KKT tolerance (measured 3.3% at KKT<1e-4 on the
bench bank, rounds 2-3) — the exponential obstacle cost's cliffs stall the
line search on hard geometries. Re-running the *whole* bank on a longer
schedule would cost ~3x; the stragglers are rare, so the efficient scheme is
a second, compacted pass:

1. **first pass**: the standard bank solve (any engine);
2. **compaction**: gather the non-converged scenario indices (fixed capacity
   ``C`` — shape-static under jit via ``top_k`` on the converged mask);
3. **rescue bank**: each straggler enters twice — once cold-started (escapes
   a bad basin) and once warm-started from its first-pass iterate (finishes
   a nearly-converged run) — and the whole ``2C`` bank is solved once on a
   longer schedule;
4. **scatter-back**: per straggler the best of {first-pass, cold rescue,
   warm rescue} by KKT residual wins; converged rows are untouched.

The whole thing is one jitted program: one dispatch per bank, pipelineable
like the plain solve. The rescue pass also changes the optimal *first* pass:
since stragglers get a second chance, the first pass can run the fast
schedule (SolverSettings.fast) and spend the saved iterations on the rescue
bank. Measured on the bench bank (4096 scenarios, 3 live obstacles, TPU v5
lite): standard single pass 96.7% strictly converged at 304k solves/s ->
fast-first two-pass (capacity 512) **99.6% at 281k solves/s**. Of the ~15
still-unconverged rows, most are f32-noise-limited (an x64 re-solve
converges them) and ~5 are genuine saddle geometries.

The reference has no analogue: a non-convergent IPOPT solve simply raises
and kills the node (ros2_mpc/planner/local_planner_tracking.py:74).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .ilqr import OCP, Solution, SolverSettings


def rescue_schedule() -> SolverSettings:
    """The measured-best rescue schedule: ~3.2x a standard solve per
    scenario (16 barrier stages x 10 iterations, 12 line-search alphas) —
    paid only for the straggler fraction of the bank."""
    return SolverSettings(barrier_stages=16, iters_per_stage=10, n_alphas=12)


def make_two_pass_solver(
    first_solve: Callable,
    rescue_solve: Callable,
    capacity: int,
    kkt_tol: Optional[float] = None,
):
    """Fuse ``first_solve`` and a compacted straggler ``rescue_solve`` into
    one ``solve(thetas, U0s) -> Solution``.

    ``rescue_solve`` must accept a bank of ``2 * capacity`` scenarios (cold
    and warm seeds are concatenated); for the Pallas engine pick ``capacity``
    so ``2 * capacity`` is a multiple of its ``tile_s * tile_l``. If more
    than ``capacity`` scenarios fail the first pass, the lowest-indexed ones
    are rescued and the rest keep their first-pass iterates (monitor the
    first-pass converged fraction when sizing).

    ``kkt_tol`` sets the tolerance at which the merged ``converged`` flags
    are recomputed; it should match the tolerance of the settings the two
    passes were built with (the factory wrappers below pass it through).
    Default: the stock ``SolverSettings().kkt_tol``.
    """
    tol = SolverSettings().kkt_tol if kkt_tol is None else kkt_tol

    def solve(thetas, U0s):
        sols = first_solve(thetas, U0s)
        sub, seeds, idx, fail = _select_stragglers(sols, thetas, U0s, capacity)
        rsols = rescue_solve(sub, seeds)
        return _merge_rescue(sols, rsols, idx, fail, capacity, tol)

    return solve


def _select_stragglers(sols, thetas, U0s, capacity):
    """Gather the top-``capacity`` non-converged rows into a cold+warm
    rescue bank. Shape-static (top_k): failed rows score above every
    converged row; ties broken toward low index for determinism."""
    B = sols.kkt_residual.shape[0]
    fail = jnp.logical_not(sols.converged)
    score = fail.astype(jnp.float32) * 2.0 - jnp.arange(B) / B
    _, idx = jax.lax.top_k(score, capacity)
    sub = jax.tree_util.tree_map(lambda l: jnp.concatenate([l[idx], l[idx]]), thetas)
    seeds = jnp.concatenate([jnp.zeros_like(U0s[idx]), sols.U[idx]])
    return sub, seeds, idx, fail


def _merge_rescue(sols, rsols, idx, fail, capacity, tol):
    """Scatter the better of {cold, warm} rescue rows back into the bank —
    only where the rescue actually improved the residual AND the row was a
    straggler (padding rows drawn in by top_k keep their converged
    first-pass iterates). The merged ``converged`` flags are recomputed at
    the caller's tolerance (matches what the pass engines report)."""
    k_c, k_w = rsols.kkt_residual[:capacity], rsols.kkt_residual[capacity:]
    take_cold = k_c <= k_w

    def best(cold, warm):
        shape = (capacity,) + (1,) * (cold.ndim - 1)
        return jnp.where(take_cold.reshape(shape), cold, warm)

    k_r = best(k_c, k_w)
    U_r = best(rsols.U[:capacity], rsols.U[capacity:])
    X_r = best(rsols.X[:capacity], rsols.X[capacity:])
    c_r = best(rsols.cost[:capacity], rsols.cost[capacity:])
    improved = jnp.logical_and(k_r < sols.kkt_residual[idx], fail[idx])

    def merge(old, new):
        shape = (capacity,) + (1,) * (new.ndim - 1)
        take = improved.reshape(shape)
        return old.at[idx].set(jnp.where(take, new, old[idx]))

    kkt = merge(sols.kkt_residual, k_r)
    return Solution(
        U=merge(sols.U, U_r),
        X=merge(sols.X, X_r),
        cost=merge(sols.cost, c_r),
        kkt_residual=kkt,
        converged=kkt < tol,
        n_iters=sols.n_iters,
        reg=sols.reg,
    )


def make_pallas_two_pass_point_stab(
    ocp: OCP,
    settings: SolverSettings = SolverSettings(),
    *,
    capacity: int = 512,
    rescue_settings: Optional[SolverSettings] = None,
    interpret: bool = False,
    tile_s: int = 8,
    tile_l: int = 128,
    rescue_tile_s: Optional[int] = None,
):
    """The production two-pass point-stabilization bank: Pallas first pass +
    Pallas rescue pass in one jit. ``2 * capacity`` must be a multiple of
    the rescue kernel's tile (default: rescue_tile_s chosen so one tile
    covers the rescue bank). Pair a ``SolverSettings.fast()`` first pass
    with the default capacity for the measured-best throughput/convergence
    point (see the module docstring)."""
    from .pallas_kernel import make_pallas_point_stab_solver

    rescue_settings = rescue_settings or rescue_schedule()
    rbank = 2 * capacity
    if rescue_tile_s is None:
        rescue_tile_s = max(1, rbank // tile_l)
    if rbank % (rescue_tile_s * tile_l):
        raise ValueError(
            f"rescue bank {rbank} must be a multiple of rescue tile "
            f"{rescue_tile_s}x{tile_l}"
        )
    first = make_pallas_point_stab_solver(
        ocp, settings, interpret=interpret, tile_s=tile_s, tile_l=tile_l
    )
    rescue = make_pallas_point_stab_solver(
        ocp, rescue_settings, interpret=interpret, tile_s=rescue_tile_s, tile_l=tile_l
    )
    return make_two_pass_solver(first, rescue, capacity, kkt_tol=settings.kkt_tol)


def make_pallas_two_pass_tracking(
    ocp: OCP,
    settings: SolverSettings = SolverSettings(),
    *,
    capacity: int = 512,
    rescue_settings: Optional[SolverSettings] = None,
    interpret: bool = False,
    tile_s: int = 8,
    tile_l: int = 128,
    rescue_tile_s: Optional[int] = None,
):
    """The tracking twin of :func:`make_pallas_two_pass_point_stab`: Pallas
    tracking first pass + compacted cold/warm rescue, one jit (terminal
    weights and obstacle terms included — the kernel carries them in theta)."""
    from .pallas_kernel import make_pallas_tracking_solver

    rescue_settings = rescue_settings or rescue_schedule()
    rbank = 2 * capacity
    if rescue_tile_s is None:
        rescue_tile_s = max(1, rbank // tile_l)
    if rbank % (rescue_tile_s * tile_l):
        raise ValueError(
            f"rescue bank {rbank} must be a multiple of rescue tile "
            f"{rescue_tile_s}x{tile_l}"
        )
    first = make_pallas_tracking_solver(
        ocp, settings, interpret=interpret, tile_s=tile_s, tile_l=tile_l
    )
    rescue = make_pallas_tracking_solver(
        ocp, rescue_settings, interpret=interpret, tile_s=rescue_tile_s, tile_l=tile_l
    )
    return make_two_pass_solver(first, rescue, capacity, kkt_tol=settings.kkt_tol)


def make_polish_stage(
    first_solve: Callable,
    polish_solve: Callable,
    capacity: int,
    kkt_tol: Optional[float] = None,
):
    """Compacted warm-only stage: run ``first_solve``, gather the top
    ``capacity`` non-converged rows, polish them from their own iterates
    (``polish_solve(thetas_sub, U_sub)``), and merge back wherever the KKT
    residual strictly improved. The warm-only twin of
    :func:`make_two_pass_solver` (a polish has no use for cold seeds)."""
    tol = SolverSettings().kkt_tol if kkt_tol is None else kkt_tol

    def solve(thetas, U0s):
        sols = first_solve(thetas, U0s)
        sub, warm, idx, fail = _select_polish(sols, thetas, capacity)
        psols = polish_solve(sub, warm)
        return _merge_polish(sols, psols, idx, fail, capacity, tol)

    return solve


def _select_polish(sols, thetas, capacity):
    B = sols.kkt_residual.shape[0]
    fail = jnp.logical_not(sols.converged)
    score = fail.astype(jnp.float32) * 2.0 - jnp.arange(B) / B
    _, idx = jax.lax.top_k(score, capacity)
    sub = jax.tree_util.tree_map(lambda l: l[idx], thetas)
    return sub, sols.U[idx], idx, fail


def _merge_polish(sols, psols, idx, fail, capacity, tol):
    improved = jnp.logical_and(psols.kkt_residual < sols.kkt_residual[idx], fail[idx])

    def merge(old, new):
        shape = (capacity,) + (1,) * (new.ndim - 1)
        take = improved.reshape(shape)
        return old.at[idx].set(jnp.where(take, new, old[idx]))

    kkt = merge(sols.kkt_residual, psols.kkt_residual)
    return Solution(
        U=merge(sols.U, psols.U),
        X=merge(sols.X, psols.X),
        cost=merge(sols.cost, psols.cost),
        kkt_residual=kkt,
        converged=kkt < tol,
        n_iters=sols.n_iters,
        reg=sols.reg,
    )


def make_fast_polish_solver(
    ocp: OCP,
    settings: SolverSettings = SolverSettings(),
    *,
    capacity: int = 1536,
    polish_iters: int = 12,
    lanes: int = 128,
    fuse: bool = True,
):
    """Model-generic bank composite: lane-aligned first pass + compacted
    box-DDP KKT polish — the production configuration for the ext model
    families, where the straggler tail is control-saturated rows whose
    clipped-feedback Riccati direction stalls (the box-DDP masking fixes
    exactly that). Any small-(n, m) OCP with batch-safe callables works;
    nothing here is unicycle-specific.

    Measured on the TPU v5 lite quadrotor bank (B=4096, N=20, hover warm
    start): plain default schedule 9.2k solves/s at 72.6% strict
    convergence; ``SolverSettings.fast()`` first pass + 12-iteration polish
    at capacity 1536 -> **14.9k solves/s at 97.8%** — faster AND more
    robust, because the fast schedule's savings pay for a targeted
    last-mile pass instead of blanket iterations.

    ``fuse=False`` jits the stages separately (see
    :func:`make_multistart_two_pass_solver`); do not wrap the unfused
    solve in ``jax.jit``.
    """
    from .batched import make_bank_kkt_polish, make_bank_solver_fast

    first = make_bank_solver_fast(ocp, settings, lanes=lanes)
    p_lanes = next(l for l in (128, 64, 32, 16, 8, 4, 2, 1) if capacity % l == 0)
    polish = make_bank_kkt_polish(
        ocp, n_iters=polish_iters, kkt_tol=settings.kkt_tol, lanes=p_lanes
    )
    if fuse:
        return make_polish_stage(first, polish, capacity, kkt_tol=settings.kkt_tol)
    tol = settings.kkt_tol
    first_j = jax.jit(first)
    polish_j = jax.jit(polish)
    sel = jax.jit(lambda s, th: _select_polish(s, th, capacity))
    mer = jax.jit(lambda s, p, i, f: _merge_polish(s, p, i, f, capacity, tol))

    def solve(thetas, U0s):
        sols = first_j(thetas, U0s)
        sub, warm, idx, fail = sel(sols, thetas)
        psols = polish_j(sub, warm)
        return mer(sols, psols, idx, fail)

    return solve


def make_multistart_two_pass_solver(
    ocp: OCP,
    settings: SolverSettings = SolverSettings(),
    *,
    capacity: int = 768,
    swing_fracs: tuple = (1.0,),
    rescue_settings: Optional[SolverSettings] = None,
    rescue_swing_fracs: Optional[tuple] = None,
    polish_iters: int = 12,
    polish_capacity: Optional[int] = None,
    fuse: bool = True,
    engine: str = "pallas",
    **engine_opts,
):
    """Basin escape x straggler rescue, one jit: the round-4 verdict's
    composite. The two production robustness modes were never composed —
    ``multistart_bank`` had no second pass and ``rescue`` had no multistart
    seeds — yet both are one bank-engine call by construction, so their
    composition is just :func:`make_two_pass_solver` over two
    :func:`~ros2_mpc_tpu.solver.multistart_bank.make_bank_multistart_solver`
    passes:

    1. **first pass**: K = 1 + 2*len(swing_fracs) arc-seeded starts per
       scenario at the caller's schedule, best-of per scenario — breaks the
       symmetric saddles a single gradient start cannot;
    2. **rescue pass**: the non-converged rows re-enter (cold + warm) on
       the long :func:`rescue_schedule` *with the arc seeds again* — the
       obstacle-cliff stragglers get both more iterations and fresh basins;
    3. **KKT polish** (``polish_iters`` box-DDP KKT-descent steps,
       :func:`~ros2_mpc_tpu.solver.batched.make_bank_kkt_polish`): the
       still-non-converged tail sits at the f32 cost-resolution floor where
       no merit line search can move — the polish accepts on the projected
       gradient instead and converges it (measured on the CPU saddle bank:
       89.5% -> 99.6% strict).

    Cost model: rescue adds ``2 * capacity * K_rescue`` kernel rows at the
    long schedule on top of the ``B * K`` first-pass rows — with the
    defaults (B=4096, K=3, capacity=768) about +67% over the plain bank
    multistart, paid only when sizing for >= 95% strict convergence on
    adversarial banks (the round-4 saddle bank stood at 87.6% without it).

    For the Pallas engine (default), ``2 * capacity * K_rescue`` must be a
    multiple of the rescue kernel tile; the default ``capacity=768`` with
    ``swing_fracs=(1.0,)`` (K=3) gives a 4608-row rescue bank = 36 x 128
    lanes (``rescue_tile_s=12`` below). The reference's only answer to a
    non-convergent solve is a node crash
    (ros2_mpc/planner/local_planner_tracking.py:74).

    ``fuse=True`` (default) returns one jit-composable program — the
    caller wraps it in ``jax.jit`` and pays a single dispatch per bank.
    ``fuse=False`` jits each stage and each compaction/merge step
    separately (5-7 dispatches per bank): same numerics, same device
    residency between stages, but each XLA program stays the size of one
    stage — the fallback for compile environments that cannot hold the
    whole three-stage module (the tunneled AOT compile helper OOMs on the
    fused B=4096 N=40 program; dispatches pipeline, so sustained
    throughput is barely affected). Do NOT wrap the unfused solve in
    ``jax.jit``.
    """
    from .multistart_bank import make_bank_multistart_solver

    rescue_settings = rescue_settings or rescue_schedule()
    rescue_swing_fracs = rescue_swing_fracs or swing_fracs
    k_rescue = 1 + 2 * len(rescue_swing_fracs)
    rbank = 2 * capacity * k_rescue
    rescue_opts = dict(engine_opts)
    if engine == "pallas":
        tile_l = engine_opts.get("tile_l", 128)
        rescue_opts["tile_s"] = rescue_opts.pop(
            "rescue_tile_s", max(1, rbank // tile_l)
        )
        engine_opts.pop("rescue_tile_s", None)
        if rbank % (rescue_opts["tile_s"] * tile_l):
            raise ValueError(
                f"rescue bank {rbank} (2 * capacity * K_rescue) must be a "
                f"multiple of the rescue tile {rescue_opts['tile_s']}x{tile_l}"
            )
    else:
        rescue_opts.pop("rescue_tile_s", None)
        if engine == "fast" and "lanes" in rescue_opts:
            # the rescue bank (2 * capacity * K_rescue rows) is smaller than
            # the first-pass bank; shrink its lane width until it divides
            lanes_r = max(1, int(rescue_opts["lanes"]))
            while rbank % lanes_r:
                lanes_r //= 2
            rescue_opts["lanes"] = max(1, lanes_r)
    first = make_bank_multistart_solver(
        ocp, settings, swing_fracs=swing_fracs, engine=engine, **engine_opts
    )
    rescue = make_bank_multistart_solver(
        ocp,
        rescue_settings,
        swing_fracs=rescue_swing_fracs,
        engine=engine,
        **rescue_opts,
    )
    if fuse:
        base = make_two_pass_solver(first, rescue, capacity, kkt_tol=settings.kkt_tol)
    else:
        tol = settings.kkt_tol
        first_j = jax.jit(first)
        rescue_j = jax.jit(rescue)
        sel2 = jax.jit(lambda s, th, U: _select_stragglers(s, th, U, capacity))
        mer2 = jax.jit(lambda s, r, i, f: _merge_rescue(s, r, i, f, capacity, tol))

        def base(thetas, U0s):  # unfused twin of the fused two-pass
            sols = first_j(thetas, U0s)
            sub, seeds, idx, fail = sel2(sols, thetas, U0s)
            rsols = rescue_j(sub, seeds)
            return mer2(sols, rsols, idx, fail)

    if not polish_iters:
        return base
    from .batched import make_bank_kkt_polish

    pc = polish_capacity or capacity
    # lane-aligned polish: pick the largest lane width dividing the stage
    lanes = next(l for l in (128, 64, 32, 16, 8, 4, 2, 1) if pc % l == 0)
    polish = make_bank_kkt_polish(
        ocp, n_iters=polish_iters, kkt_tol=settings.kkt_tol, lanes=lanes
    )
    if fuse:
        return make_polish_stage(base, polish, pc, kkt_tol=settings.kkt_tol)
    tol = settings.kkt_tol
    polish_j = jax.jit(polish)
    sel3 = jax.jit(lambda s, th: _select_polish(s, th, pc))
    mer3 = jax.jit(lambda s, p, i, f: _merge_polish(s, p, i, f, pc, tol))

    def solve_unfused(thetas, U0s):
        sols = base(thetas, U0s)
        sub, warm, idx, fail = sel3(sols, thetas)
        psols = polish_j(sub, warm)
        return mer3(sols, psols, idx, fail)

    return solve_unfused
