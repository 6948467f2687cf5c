"""Roofline / MFU accounting for the whole-solver Pallas kernels.

"609k solves/s" alone does not answer *is this fast for the silicon, or just
faster than IPOPT-on-CPU?* This module closes that gap with three pieces:

1. **Measured VPU peaks** (:func:`measure_vpu_peaks`): tiny Pallas kernels
   that run long dependency-hidden chains of FMAs / ``exp`` / ``log`` /
   ``cos`` on a VMEM-resident block, giving the *empirical* speed of light
   for each op class on the exact chip and backend the bench runs on. The
   solver kernels never touch the MXU (3-state unicycle NMPC has no matmuls
   to feed a 128x128 systolic array — every closed form is elementwise over
   the (8, 128) scenario tile), so the VPU peak is the relevant roofline, and
   measuring it beats quoting a spec sheet the relay/runtime may not achieve.

2. **Analytic op counts** (:func:`point_stab_solve_flops`,
   :func:`tracking_solve_flops`): per-scenario written-op ledgers of the
   kernels' closed forms (solver/pallas_kernel.py), split into four VPU op
   classes — ``arith`` (add/sub/mul/div/min/max/select, 1 FLOP each) and the
   transcendentals ``exp`` / ``log`` / ``sincos`` (1 op each, but multiple
   VPU cycles — which is why they are ledgered separately). Counts are of
   the source closed forms; Mosaic may CSE a few scalar products, so the
   arith term is exact to within a few percent while the transcendental
   terms are exact. Dynamic work (stage early exit, first-accept line
   search, the live-obstacle prefix) is *not* estimated: the kernels count
   executed iterations and line-search rollouts on-chip
   (``with_counters=True``) and :func:`computed_obstacle_points` reproduces
   the kernel's live-prefix chunking, so achieved FLOPs are what actually
   ran, not the static schedule.

3. **The roofline verdict** (:func:`roofline_report`): achieved FLOP/s, the
   fraction of the measured FMA peak, HBM bytes and arithmetic intensity
   (showing the kernel is compute-bound, not bandwidth-bound), and a
   cycle-model utilization — predicted time from the per-class peaks vs
   measured time — which is the honest "fraction of speed-of-light"
   number for a transcendental-heavy kernel.

No reference counterpart exists (the reference publishes no perf numbers at
all, /root/reference/README.md:1-2); this is BASELINE.md accountability.
"""

from __future__ import annotations

import dataclasses
import math
import time

import numpy as np


@dataclasses.dataclass(frozen=True)
class FlopCount:
    """Op counts by VPU class. ``arith`` are 1-FLOP ops; transcendentals are
    counted as 1 *op* each (their cycle cost enters via the measured rates)."""

    arith: float = 0.0
    exp: float = 0.0
    log: float = 0.0
    sincos: float = 0.0

    @property
    def total_flops(self) -> float:
        """Conventional FLOP total (each transcendental = 1 FLOP)."""
        return self.arith + self.exp + self.log + self.sincos

    def __add__(self, other: "FlopCount") -> "FlopCount":
        return FlopCount(
            self.arith + other.arith,
            self.exp + other.exp,
            self.log + other.log,
            self.sincos + other.sincos,
        )

    def scale(self, k: float) -> "FlopCount":
        return FlopCount(self.arith * k, self.exp * k, self.log * k, self.sincos * k)


# ---------------------------------------------------------------------------
# Analytic ledgers. Region constants cite solver/pallas_kernel.py; "P" is the
# number of obstacle points the kernel *computes* per obstacle-term
# evaluation (live-prefix chunks x chunk size; 0 when the tile's obstacle
# weight is zero — the dynamic skip), from computed_obstacle_points().
# ---------------------------------------------------------------------------

def point_stab_solve_flops(
    N: int, P: float, iters: float, ls_rollouts: float, fast_sincos: bool = False
) -> FlopCount:
    """Per-scenario op count of one point-stabilization kernel solve
    (make_pallas_point_stab_solver) that executed ``iters`` solver iterations
    and ``ls_rollouts`` line-search candidate rollouts.

    Region ledger (ops per horizon step unless noted), from the closed forms
    in solver/pallas_kernel.py:

    * RK4 transition ``F``: 16 arith + 6 sincos.
    * RK4 Jacobian ``F_jac``: 26 arith + 6 sincos.
    * ``stage_cost`` (goal/control quadratics, reverse penalty, log barrier):
      29 arith + 1 exp + 4 log, plus P x (9 arith + 1 exp) obstacle value.
    * ``obstacle_terms`` (value+grad+Hessian): P x (39 arith + 1 exp).
    * rollout_cost step = stage_cost + accumulate + F = 46 (+9P) arith.
    * backward sweep step (F_jac, quadratization, Riccati update, 2x2
      solves): 361 (+39P) arith + (1+P) exp + 6 sincos.
    * line-search candidate step (feedback law, clip, stage_cost, F):
      72 (+9P) arith + (1+P) exp + 4 log + 6 sincos; +13 arith flat
      (Armijo test) per rollout.
    * commit + regularizer update: 2N + 4 arith per iteration.
    * final rollout: 37 (+9P) arith + (1+P) exp + 6 sincos per step.
    * adjoint KKT sweep: 73 (+39P) arith + (1+P) exp + 6 sincos per step.
    * strict-interior init: 4 arith per step, once.

    Arguments accept scalars or (B,) arrays (vectorized ledger for a bank).
    """
    I, R = np.asarray(iters, dtype=float), np.asarray(ls_rollouts, dtype=float)
    arith = (
        I * N * (46.0 + 361.0 + 2.0)  # rollout + backward + commit
        + I * 4.0  # regularizer update
        + R * (N * 72.0 + 13.0)  # line-search rollouts
        + N * (37.0 + 73.0 + 4.0)  # final rollout + adjoint + init_u
        + P * N * (I * (9.0 + 39.0) + R * 9.0 + (9.0 + 39.0))
    )
    exp = (2.0 * I + R + 2.0) * N * (1.0 + P)
    log = 4.0 * N * (I + R)
    sincos = 6.0 * N * (2.0 * I + R + 2.0)
    if fast_sincos:
        # the kernels' default paired-polynomial sin/cos (pallas_kernel.py::
        # _fast_sincos): each pair is ~21 FMA-class ops (shared 2*pi
        # reduction + odd/even Horner), so sincos ops convert to arith
        return FlopCount(arith + sincos * 10.5, exp, log, 0.0)
    return FlopCount(arith, exp, log, sincos)


def point_stab_phase_flops(
    N: int, P: float, iters: float, ls_rollouts: float, fast_sincos: bool = False
) -> dict:
    """The :func:`point_stab_solve_flops` ledger split by solver phase —
    the per-phase cycle ledger the round-4 verdict asked for. Phases:

    * ``rollout``: the per-iteration trajectory+cost rollout, commit and
      regularizer bookkeeping;
    * ``backward``: F_jac, quadratization, Riccati recursion, 2x2 solves;
    * ``line_search``: all executed candidate rollouts + Armijo tests;
    * ``final``: strict-interior init, final rollout, adjoint KKT sweep.

    Summing the phases reproduces :func:`point_stab_solve_flops` exactly
    (pinned by tests). Each phase maps to model seconds via
    :func:`roofline_report`'s cycle model, giving the phase split of the
    modeled compute time."""
    I, R = np.asarray(iters, dtype=float), np.asarray(ls_rollouts, dtype=float)
    zeros = np.zeros_like(I + R)

    def mk(arith, exp, log, sincos):
        if fast_sincos:
            return FlopCount(arith + sincos * 10.5, exp, log, zeros + 0.0)
        return FlopCount(arith, exp, log, sincos)

    phases = {
        "rollout": mk(
            I * N * (46.0 + 2.0) + I * 4.0 + P * N * I * 9.0,
            I * N * (1.0 + P),
            4.0 * N * I,
            6.0 * N * I,
        ),
        "backward": mk(
            I * N * 361.0 + P * N * I * 39.0,
            I * N * (1.0 + P),
            0.0 * I,
            6.0 * N * I,
        ),
        "line_search": mk(
            R * (N * 72.0 + 13.0) + P * N * R * 9.0,
            R * N * (1.0 + P),
            4.0 * N * R,
            6.0 * N * R,
        ),
        "final": mk(
            N * (37.0 + 73.0 + 4.0) + P * N * (9.0 + 39.0) + zeros,
            2.0 * N * (1.0 + P) + zeros,
            zeros + 0.0,
            6.0 * N * 2.0 + zeros,
        ),
    }
    return phases


def phase_model_seconds(phases: dict, peaks: dict) -> dict:
    """Cycle-model seconds per phase (each op class at its measured peak)."""
    out = {}
    for name, c in phases.items():
        out[name] = (
            c.arith / peaks["fma_flops_per_s"]
            + c.exp / peaks["exp_per_s"]
            + c.log / peaks["log_per_s"]
            + c.sincos / peaks["sincos_per_s"]
        )
    return out


def tracking_solve_flops(
    N: int,
    P: float,
    iters: float,
    ls_rollouts: float,
    terminal_quad: bool = True,
    fast_sincos: bool = False,
) -> FlopCount:
    """Per-scenario op count of one tracking kernel solve
    (make_pallas_tracking_solver). Ledger differences vs point-stab: Euler
    ``F`` = 8 arith + 2 sincos, ``F_jac`` = 7 arith + 2 sincos, reference
    subtractions in the cost (+2 arith), sparser B column (backward step =
    311 + 39P arith), and a terminal obstacle evaluation per rollout /
    backward init / adjoint init. ``terminal_quad`` adds the optional
    terminal pose quadratic (~12 arith per cost evaluation)."""
    I, R = np.asarray(iters, dtype=float), np.asarray(ls_rollouts, dtype=float)
    tq = 12.0 if terminal_quad else 0.0
    # per-rollout terminal obstacle value: 9P arith + P exp; per backward /
    # adjoint init obstacle_terms: 39P arith + P exp
    arith = (
        I * (N * (40.0 + 311.0 + 2.0) + 4.0 + tq)
        + R * (N * 66.0 + 13.0 + 9.0 * P + tq)
        + N * (31.0 + 53.0 + 4.0)
        + 2.0 * (9.0 * P + tq)  # final rollout terminal + its duplicate in cost
        + P * N * (I * (9.0 + 39.0) + R * 9.0 + (9.0 + 39.0))
        + P * (I * (9.0 + 39.0) + 39.0)  # terminal obstacle in rollout/bwd/adjoint
    )
    exp = (2.0 * I + R + 2.0) * N * (1.0 + P) + P * (2.0 * I + R + 2.0)
    log = 4.0 * N * (I + R)
    sincos = 2.0 * N * (2.0 * I + R + 2.0) + 2.0 * N * I  # F_jac in bwd+adjoint
    if fast_sincos:
        return FlopCount(arith + sincos * 10.5, exp, log, 0.0)
    return FlopCount(arith, exp, log, sincos)


def bank_flops(per_scenario_fn, N: int, P, iters, ls_rollouts, **kw) -> FlopCount:
    """Total op count of a whole bank: ``per_scenario_fn`` (one of the
    ``*_solve_flops`` ledgers) evaluated with (B,) arrays and summed."""
    c = per_scenario_fn(N, np.asarray(P, dtype=float), iters, ls_rollouts, **kw)
    return FlopCount(
        float(np.sum(c.arith)),
        float(np.sum(c.exp)),
        float(np.sum(c.log)),
        float(np.sum(c.sincos)),
    )


def computed_obstacle_points(
    obs_x, obs_y, obstacle_weight, tile_s: int = 8, tile_l: int = 128, chunk: int = 8
) -> np.ndarray:
    """(B,) obstacle points the kernel computes per obstacle evaluation,
    reproducing its per-tile dynamic skip (pallas_kernel.py:148-154): zero if
    the tile's obstacle weight is all-zero, else ceil(live-prefix / chunk) x
    chunk where the live prefix is the tile-wide max index of any point
    within +-90 m."""
    obs_x = np.asarray(obs_x)
    obs_y = np.asarray(obs_y)
    w = np.broadcast_to(np.asarray(obstacle_weight), obs_x.shape[:1])
    B, n_obs = obs_x.shape
    tile = tile_s * tile_l
    if chunk and n_obs % chunk != 0:
        chunk = n_obs
    out = np.zeros(B)
    for t0 in range(0, B, tile):
        sl = slice(t0, min(t0 + tile, B))
        if not np.any(np.abs(w[sl]) > 0.0):
            continue
        live = np.logical_or(np.abs(obs_x[sl]) < 90.0, np.abs(obs_y[sl]) < 90.0)
        idx = np.where(live, np.arange(1, n_obs + 1)[None, :], 0)
        n_live = int(idx.max()) if idx.size else 0
        out[sl] = math.ceil(n_live / chunk) * chunk if n_live else 0
    return out


def bank_phase_flops(N: int, P, iters, ls_rollouts, **kw) -> dict:
    """Per-phase op counts summed over a bank (phase-name -> FlopCount)."""
    phases = point_stab_phase_flops(
        N, np.asarray(P, dtype=float), iters, ls_rollouts, **kw
    )
    return {
        k: FlopCount(
            float(np.sum(c.arith)),
            float(np.sum(c.exp)),
            float(np.sum(c.log)),
            float(np.sum(c.sincos)),
        )
        for k, c in phases.items()
    }


def point_stab_hbm_bytes(N: int, n_obs: int) -> float:
    """HBM traffic per scenario (f32): theta in (x0 3 + goal 3 + weights 8 +
    obstacles 2*n_obs + U0 2N) + outputs (U 2N + X 3(N+1) + cost/kkt/iters/ls
    4)."""
    return 4.0 * (6 + 8 + 2 * n_obs + 2 * N + 2 * N + 3 * (N + 1) + 4)


# ---------------------------------------------------------------------------
# Measured VPU peaks
# ---------------------------------------------------------------------------

def _chain_rate(op_name: str, rows: int, cols: int, n_steps: int, unroll: int,
                interpret: bool, n_calls: int = 4) -> float:
    """Sustained ops/s of a Pallas kernel running ``n_steps * unroll``
    dependency chains of ``op_name`` over a (rows, cols) f32 VMEM block.
    Chains are element-independent: rows*cols/1024 vector registers of
    independent work hide each op's latency, so the chain measures issue
    throughput, not latency.

    Timing is ``n_calls`` back-to-back dispatches on *distinct* inputs,
    blocked once: single-call wall-clock through a TPU relay is unreliable
    (dispatch ~tens of ms, and an identical repeated call can return
    suspiciously early), while a pipelined stream over distinct inputs
    measures true device throughput the same way bench.py does."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ops = {
        # x kept in a bounded range by construction of each iteration map;
        # second element = transcendental ops per iteration
        "fma": (lambda x: x * 1.0000001 + 1e-9, 1),
        "exp": (lambda x: jnp.exp(-x), 1),         # fixed point ~0.567, in (0, 1]
        "log": (lambda x: jnp.log(x) + 2.0, 1),    # fixed point ~3.15, in [2, 3.2]
        # the kernels only ever need sin AND cos of the same angle, and the
        # lowering shares range reduction across the pair (measured: pairs
        # run 1.78x the single-cos rate) — so the per-op peak is measured on
        # the paired workload, 2 ops per iteration
        "sincos": (lambda x: jnp.cos(x) + 0.5 * jnp.sin(x), 2),
    }
    op, ops_per_iter = ops[op_name]

    def kernel(x_ref, o_ref):
        def body(_, x):
            for _ in range(unroll):
                x = op(x)
            return x

        o_ref[...] = jax.lax.fori_loop(0, n_steps, body, x_ref[...])

    f = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x)
    )
    xs = [jnp.full((rows, cols), 0.5 + 1e-4 * i, jnp.float32) for i in range(n_calls)]
    # Warm up with a real host fetch, not just block_until_ready: through the
    # TPU relay, block_until_ready on a stream that has never been forced by
    # a fetch can return without waiting (measured: a 1M-step chain "done" in
    # 0.1 ms); one np.asarray synchronizes the stream, after which
    # block_until_ready times truthfully and repeatably.
    np.asarray(f(xs[0]))
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [f(x) for x in xs]
        jax.block_until_ready(outs)
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(float(outs[-1][0, 0]))  # force + sanity-check the tail
    return n_calls * rows * cols * n_steps * unroll * ops_per_iter / best


def measure_vpu_peaks(
    rows: int = 256,
    cols: int = 256,
    target_s: float = 0.2,
    interpret: bool = False,
) -> dict:
    """Empirical per-op-class VPU throughput on the current backend.

    Returns ``{"fma_flops_per_s", "exp_per_s", "log_per_s", "sincos_per_s"}``.
    Each chain is calibrated, then re-run long enough that every kernel
    dispatch carries >= ``target_s`` of device work, so dispatch cost
    vanishes from the sustained rate. FMA counts 2 FLOPs/op; transcendental
    rates are ops/s (each carries one companion arith op — negate/add —
    whose cost is inside the measured rate, making the rates
    *conservative*)."""
    numel = rows * cols
    peaks = {}
    for name, flops_per_op in (("fma", 2.0), ("exp", 1.0), ("log", 1.0), ("sincos", 1.0)):
        unroll = 16
        n_steps = 4096 if not interpret else 8
        rate = _chain_rate(name, rows, cols, n_steps, unroll, interpret)
        if not interpret:
            # scale so one call holds ~target_s of device work at the
            # calibrated rate, then remeasure
            per_call = numel * n_steps * unroll / rate
            n_steps = max(n_steps, int(n_steps * target_s / max(per_call, 1e-4)))
            rate = _chain_rate(name, rows, cols, n_steps, unroll, interpret)
        key = "fma_flops_per_s" if name == "fma" else f"{name}_per_s"
        peaks[key] = flops_per_op * rate
    return peaks


def measure_loop_overhead(
    rows: int = 8,
    cols: int = 128,
    interpret: bool = False,
) -> float:
    """Measured per-trip overhead (seconds) of a Pallas ``fori_loop`` on a
    (rows, cols) f32 VMEM block — the scalar-core bookkeeping (trip count,
    branch, ref indexing) every loop iteration of the solver kernels pays
    on top of its vector work.

    Method: the FMA chain at ``unroll=16`` measures pure FMA issue rate;
    the same chain at ``unroll=1`` pays one loop trip per FMA. The per-trip
    difference is the loop overhead. Measured on the solver kernels' own
    (8, 128) scalar-plane shape by default, where the overhead is
    proportionally largest. Feeds the MFU gap decomposition: total solver
    loop trips x this number = modeled control-flow overhead seconds."""
    n_steps = 16384 if not interpret else 64
    rate16 = _chain_rate("fma", rows, cols, n_steps, 16, interpret)
    rate1 = _chain_rate("fma", rows, cols, n_steps * 16, 1, interpret)
    numel = rows * cols
    per_trip_1 = numel / rate1  # seconds per unroll=1 trip (1 FMA + overhead)
    per_fma = numel / rate16  # seconds per FMA inside an unrolled body
    return max(0.0, per_trip_1 - per_fma)


def solver_loop_trips(N: int, iters, ls_rollouts, n_obs_chunks: float = 0.0) -> float:
    """Estimated ``fori_loop`` trips one solve executes (per scenario tile):
    per iteration a rollout (N), a backward sweep (N) and a commit (N) loop,
    ``ls_rollouts`` candidate rollouts of N trips each, plus init/final/
    adjoint (3N) and the per-evaluation obstacle chunk loops
    (``n_obs_chunks`` per obstacle evaluation, already folded into the
    callers' P accounting — pass 0 to ignore)."""
    I = np.asarray(iters, dtype=float)
    R = np.asarray(ls_rollouts, dtype=float)
    trips = I * 3.0 * N + R * N + 3.0 * N
    if n_obs_chunks:
        trips = trips + n_obs_chunks * (2.0 * I * N + R * N + 2.0 * N)
    return trips


def roofline_report(
    count: FlopCount,
    seconds: float,
    peaks: dict,
    hbm_bytes: float = 0.0,
) -> dict:
    """Achieved rate vs the measured rooflines.

    * ``achieved_gflops``: conventional FLOP/s (transcendentals = 1).
    * ``pct_vpu_fma_peak``: achieved / measured FMA peak — the classic MFU
      analogue; understates a transcendental-heavy kernel.
    * ``vpu_model_utilization``: cycle-model time (each op class at its own
      measured peak) / measured time — the fair "fraction of
      speed-of-light". > ~0.5 means the kernel is within 2x of the best any
      schedule of these ops could run on this VPU.
    * ``arithmetic_intensity_flops_per_byte`` (with ``hbm_bytes``): shows
      compute- vs bandwidth-bound (v5e HBM ridge sits around ~10 FLOP/B).
    """
    model_t = (
        count.arith / peaks["fma_flops_per_s"] * 1.0  # arith ops are 1 FLOP; peak counts 2/op
        + count.exp / peaks["exp_per_s"]
        + count.log / peaks["log_per_s"]
        + count.sincos / peaks["sincos_per_s"]
    )
    out = {
        "flops": count.total_flops,
        "achieved_gflops": count.total_flops / seconds / 1e9,
        "pct_vpu_fma_peak": 100.0 * (count.total_flops / seconds) / peaks["fma_flops_per_s"],
        "vpu_model_utilization": model_t / seconds,
        "transcendental_frac": (count.exp + count.log + count.sincos)
        / max(count.total_flops, 1.0),
    }
    if hbm_bytes:
        out["arithmetic_intensity_flops_per_byte"] = count.total_flops / hbm_bytes
    return out
