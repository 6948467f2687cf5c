"""Whole-solver Pallas kernel: point-stabilization NMPC entirely in VMEM.

The XLA engines (solver/ilqr.py, solver/batched.py) express each solver
iteration as a chain of scans whose every step round-trips carries through
XLA's loop machinery. This kernel is the speed-of-light version for the
flagship problem (BASELINE.json config 1/4: batched point-stabilization
banks): ONE ``pallas_call`` runs the complete interior-point iLQR — rollouts,
analytic derivatives, Riccati backward sweep, Armijo line search, barrier
continuation — per (8, 128)-scenario tile without ever leaving VMEM.

Everything is hand-derived for the unicycle + point-stabilization objective:

* **RK4 Jacobian, closed form.** For ``f = (v cos th, v sin th, w)`` the RK4
  stages collapse (θ-dependence only): ``k3 == k2``, so
  ``F = x + dt/6 (k1 + 4 k2 + k4)`` with stage angles
  ``th1 = th, th2 = th + dt w / 2, th4 = th + dt w``. A and B are exact
  trig expressions — no autodiff in the kernel.
* **Cost quadratization, closed form**: quadratic goal/control terms,
  reverse penalty ``exp(-rf v)``, the 160-point Gaussian obstacle sum
  (value/gradient/Hessian), and the log-barrier bound terms
  (local_planner_point_stabilization.py:60-67,104-127 formulations).
* The cost is separable in (x, u), so ``l_ux == 0`` and the Riccati update
  simplifies accordingly.

Layout: scenario tiles of (8, 128) — one exact float32 VMEM tile — with the
grid over tiles. All per-scenario quantities are (8, 128) blocks; obstacle
vectors are (160, 8, 128) VMEM-resident per tile (~650 KB), total scratch
~2 MB per program instance.

Accuracy contract: matches the XLA engines' solutions (tests/test_pallas.py)
and therefore the IPOPT-class oracle within the BASELINE tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .ilqr import OCP, Solution, SolverSettings

TILE_S = 8  # sublanes per scenario tile
TILE_L = 128  # lanes per scenario tile
TILE = TILE_S * TILE_L

# Fast paired sin/cos. Profiling the kernels on TPU v5 lite showed the
# stock jnp.sin/jnp.cos lowering dominating wall-clock (~58% of the
# point-stabilization solve: the VPU runs it at ~31G pairs/s vs ~3.3T FMA
# FLOP/s — a ~50-cycle range-reduction + polynomial per element). The
# kernels only ever need sin AND cos of the same angle, and control
# problems keep |theta| small (tens of radians across a long un-wrapped
# fleet rollout), so a single cheap 2*pi reduction + odd/even minimax
# polynomials on [-pi, pi] (degree 13/14, least-squares fit; max abs error
# 3.3e-6 in f32 for |x| <= 60 rad — measured, incl. reduction rounding)
# replaces it at ~64G pairs/s (2.07x). That is far inside the engines'
# mutual 1e-4 parity band and the BASELINE 1e-3 oracle bound.
_FAST_SIN_COEFFS = (  # sin(pi*t) = t * P(t^2), t in [-1, 1]
    3.1415926409395274,
    -5.167712276801008,
    2.5501582806119174,
    -0.5992355764432307,
    0.08207129109395697,
    -0.007267320535221715,
    0.00039296507715625833,
)
_FAST_COS_COEFFS = (  # cos(pi*t) = Q(t^2)
    0.9999999999193593,
    -4.934802189554386,
    4.0587118821364125,
    -1.3352607094469389,
    0.23532212897176416,
    -0.025787854657773987,
    0.001905911958441571,
    -8.916973037465991e-05,
)
_INV_2PI = float(1.0 / (2.0 * np.pi))
_TWO_PI = float(2.0 * np.pi)
_INV_PI = float(1.0 / np.pi)


def _fast_sincos(x):
    """(cos x, sin x) via one shared range reduction + Horner pair (~21
    FMA-class ops for both)."""
    r = x - _TWO_PI * jnp.floor(x * _INV_2PI + 0.5)
    t = r * _INV_PI
    t2 = t * t
    ps = _FAST_SIN_COEFFS[-1]
    for c in _FAST_SIN_COEFFS[-2::-1]:
        ps = ps * t2 + c
    pc = _FAST_COS_COEFFS[-1]
    for c in _FAST_COS_COEFFS[-2::-1]:
        pc = pc * t2 + c
    return pc, ps * t


def _stock_sincos(x):
    return jnp.cos(x), jnp.sin(x)


def _mu_schedule_np(settings: SolverSettings) -> np.ndarray:
    stages = np.logspace(
        np.log10(settings.mu_init), np.log10(settings.mu_final), settings.barrier_stages
    )
    return np.repeat(stages, settings.iters_per_stage).astype(np.float32)


def _stage_arrays_np(settings: SolverSettings) -> tuple[np.ndarray, np.ndarray]:
    """Per-iteration (stage index, is-first-iteration-of-stage) arrays for the
    kernels' stage-level early exit."""
    stage = np.repeat(
        np.arange(settings.barrier_stages), settings.iters_per_stage
    ).astype(np.int32)
    first = np.zeros_like(stage)
    first[0] = 1
    first[1:] = (np.diff(stage) != 0).astype(np.int32)
    return stage, first


def make_pallas_point_stab_solver(
    ocp: OCP,
    settings: SolverSettings = SolverSettings(),
    *,
    interpret: bool = False,
    tile_s: int = TILE_S,
    tile_l: int = TILE_L,
    stage_tol: float = 1e-10,
    with_counters: bool = False,
    fast_sincos: bool = True,
):
    """Build ``solve_bank(thetas, U0s) -> Solution`` (B-leading, B % 1024 == 0).

    ``ocp`` must be a point-stabilization template from
    :func:`~ros2_mpc_tpu.solver.problems.make_point_stabilization` (the
    kernel hard-codes that problem structure; the generic engines cover the
    rest). ``interpret=True`` runs the kernel in interpreter mode (CPU CI).

    ``stage_tol``: stage-level early exit — once every scenario in a tile has
    Newton decrement ``-(dV1+dV2) < stage_tol * (1+|J|)`` at the current
    barrier stage (never on a stage's first iteration), the stage's remaining
    iterations are skipped. At 1e-10 the skipped steps move U by ~1e-5 —
    inside the engines' mutual 1e-4 parity band (tests/test_pallas.py).

    ``Solution.n_iters`` reports the iterations each scenario's tile actually
    executed (early exit skips count as not executed). With
    ``with_counters=True`` the solver returns ``(Solution, counters)`` where
    ``counters = {"iters": (B,), "ls_rollouts": (B,)}`` — the executed
    solver-iteration and line-search-candidate-rollout counts per scenario's
    tile, the inputs to the roofline FLOP accounting
    (:mod:`ros2_mpc_tpu.utils.roofline`).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = ocp.horizon
    dt = None  # recovered from the transition closure below
    # The OCP closes over dt; recover it by probing the transition once.
    x_probe = jnp.zeros(3)
    u_probe = jnp.array([0.0, 1.0])
    dt = float(ocp.transition(x_probe, u_probe)[2])  # theta' = theta + dt*w

    u_lo = np.asarray(ocp.u_lo, dtype=np.float32)
    u_hi = np.asarray(ocp.u_hi, dtype=np.float32)
    mus = _mu_schedule_np(settings)
    stage_idx, first_idx = _stage_arrays_np(settings)
    n_iters = len(mus)
    eps_int = (settings.interior_clip * (u_hi - u_lo)).astype(np.float32)
    c1 = settings.armijo_c1

    def kernel(
        mu_ref,  # SMEM (n_iters,): barrier schedule
        stage_iref,  # SMEM (n_iters,): barrier stage index per iteration
        first_iref,  # SMEM (n_iters,): 1 on a stage's first iteration
        x0g_ref,  # (6, S, L): px0, py0, th0, gx, gy, gth
        w_ref,  # (8, S, L): Q0, Q1, Q2, R0, R1, rf, obstacle_w*gain, inv_ir2
        obs_ref,  # (2, n_obs, S, L)
        u0_ref,  # (N, 2, S, L)
        u_out,  # (N, 2, S, L)
        x_out,  # (N+1, 3, S, L)
        cost_out,  # (S, L)
        kkt_out,  # (S, L)
        iters_out,  # (S, L): executed solver iterations (tile-wide, f32)
        lsro_out,  # (S, L): executed line-search candidate rollouts (f32)
        X_scr,  # VMEM (N+1, 3, S, L)
        U_scr,  # VMEM (N, 2, S, L)
        kff_scr,  # VMEM (N, 2, S, L)
        kfb_scr,  # VMEM (N, 2, 3, S, L)
        Ubest_scr,  # VMEM (N, 2, S, L)
        acc_scr,  # VMEM (S, L): per-scenario line-search acceptance mask
        reg_scr,  # VMEM (S, L): Levenberg regularizer (carried across iters)
        done_ref,  # SMEM (1,): number of barrier stages fully converged
        cnt_ref,  # SMEM (2,): [executed iterations, executed LS rollouts]
    ):
        # blocks carry a leading tile dim of 1
        px0, py0, th0 = x0g_ref[0, 0], x0g_ref[0, 1], x0g_ref[0, 2]
        gx, gy, gth = x0g_ref[0, 3], x0g_ref[0, 4], x0g_ref[0, 5]
        Q0, Q1, Q2 = w_ref[0, 0], w_ref[0, 1], w_ref[0, 2]
        R0, R1 = w_ref[0, 3], w_ref[0, 4]
        rf = w_ref[0, 5]
        ow = w_ref[0, 6]
        inv_ir2 = w_ref[0, 7]
        obs_x_all = obs_ref[0, 0]  # (n_obs, S, L)
        obs_y_all = obs_ref[0, 1]

        # Obstacle terms are the kernel's FLOP majority (n_obs exp chains per
        # stage evaluation). Two dynamic cuts, both bit-exact:
        # * zero weight for the whole tile — the reference-parity formulation
        #   (quirk #1) and open-floor banks — skips the chains entirely;
        # * far sentinels: the node layer pads obstacle vectors to length
        #   n_obs with points at 100 m (quirk #10 corrected mode), whose
        #   Gaussian term underflows to exactly 0.0 in f32. Points beyond
        #   +-90 m are sentinels by that convention (workspaces are tens of
        #   meters), and the live points always form a prefix, so the chunked
        #   loop below stops after the last live chunk.
        has_obs = jnp.max(jnp.abs(w_ref[0, 6])) > 0.0
        n_obs = obs_x_all.shape[0]
        obs_chunk = 8 if n_obs % 8 == 0 else n_obs
        pt_live = jnp.logical_or(jnp.abs(obs_x_all) < 90.0, jnp.abs(obs_y_all) < 90.0)
        idx1 = jax.lax.broadcasted_iota(jnp.int32, pt_live.shape, 0) + 1
        n_live = jnp.max(jnp.where(pt_live, idx1, 0))
        n_chunks_live = (n_live + obs_chunk - 1) // obs_chunk

        lo_v, lo_w = u_lo[0], u_lo[1]
        hi_v, hi_w = u_hi[0], u_hi[1]
        sincos = _fast_sincos if fast_sincos else _stock_sincos

        def F(px, py, th, v, w):
            th2 = th + 0.5 * dt * w
            th4 = th + dt * w
            c0, s0 = sincos(th)
            c2, s2 = sincos(th2)
            c4, s4 = sincos(th4)
            c = (dt / 6.0) * (c0 + 4.0 * c2 + c4)
            s = (dt / 6.0) * (s0 + 4.0 * s2 + s4)
            return px + v * c, py + v * s, th4

        def F_jac(px, py, th, v, w):
            """Closed-form RK4 A, B (see module docstring)."""
            th2 = th + 0.5 * dt * w
            th4 = th + dt * w
            c0, s0 = sincos(th)
            c2, s2 = sincos(th2)
            c4, s4 = sincos(th4)
            C = (dt / 6.0) * (c0 + 4.0 * c2 + c4)
            S = (dt / 6.0) * (s0 + 4.0 * s2 + s4)
            # d th_i/d th = 1 -> dpx'/dth = -v*S ; dpy'/dth = v*C
            a02 = -v * S
            a12 = v * C
            # d th2/dw = dt/2, d th4/dw = dt
            b01 = -(v * dt / 6.0) * (4.0 * s2 * (0.5 * dt) + s4 * dt)
            b11 = (v * dt / 6.0) * (4.0 * c2 * (0.5 * dt) + c4 * dt)
            return a02, a12, C, S, b01, b11  # A=[[1,0,a02],[0,1,a12],[0,0,1]]
            # B=[[C,b01],[S,b11],[0,dt]]

        def obstacle_terms(px, py):
            """(value, gx, gy, hxx, hxy, hyy) of ow * sum_j exp(-r^2*inv_ir2),
            accumulated over live obstacle chunks (VPU-wide, no scalar loop).
            Guarded by ``has_obs``; sentinel-tail chunks are never visited."""

            def live():
                def chunk(ci, acc):
                    val, gx_, gy_, hxx, hxy, hyy = acc
                    ox = obs_ref[0, 0, pl.ds(ci * obs_chunk, obs_chunk)]
                    oy = obs_ref[0, 1, pl.ds(ci * obs_chunk, obs_chunk)]
                    dx = px[None] - ox
                    dy = py[None] - oy
                    e = ow[None] * jnp.exp(-(dx * dx + dy * dy) * inv_ir2[None])
                    i2 = inv_ir2[None]
                    return (
                        val + jnp.sum(e, axis=0),
                        gx_ + jnp.sum(-2.0 * i2 * dx * e, axis=0),
                        gy_ + jnp.sum(-2.0 * i2 * dy * e, axis=0),
                        hxx + jnp.sum(e * (4.0 * i2 * i2 * dx * dx - 2.0 * i2), axis=0),
                        hxy + jnp.sum(e * 4.0 * i2 * i2 * dx * dy, axis=0),
                        hyy + jnp.sum(e * (4.0 * i2 * i2 * dy * dy - 2.0 * i2), axis=0),
                    )

                z = jnp.zeros_like(px)
                val, gx_, gy_, hxx, hxy, hyy = jax.lax.fori_loop(
                    0, n_chunks_live, chunk, (z, z, z, z, z, z)
                )
                return val, gx_, gy_, hxx, hxy, hyy

            def dead():
                z = jnp.zeros_like(px)
                return z, z, z, z, z, z

            return jax.lax.cond(has_obs, live, dead)

        def obstacle_value(px, py):
            """Value-only obstacle sum for cost evaluation (rollouts / line
            search): one exp chain + one reduction per live chunk — does not
            rely on the compiler DCE-ing the unused gradient/Hessian parts."""

            def live():
                def chunk(ci, acc):
                    ox = obs_ref[0, 0, pl.ds(ci * obs_chunk, obs_chunk)]
                    oy = obs_ref[0, 1, pl.ds(ci * obs_chunk, obs_chunk)]
                    dx = px[None] - ox
                    dy = py[None] - oy
                    return acc + jnp.sum(
                        ow[None] * jnp.exp(-(dx * dx + dy * dy) * inv_ir2[None]), axis=0
                    )

                return jax.lax.fori_loop(0, n_chunks_live, chunk, jnp.zeros_like(px))

            return jax.lax.cond(has_obs, live, lambda: jnp.zeros_like(px))

        def stage_cost(px, py, th, v, w, mu):
            ex, ey, eth = px - gx, py - gy, th - gth
            c = Q0 * ex * ex + Q1 * ey * ey + Q2 * eth * eth
            c = c + R0 * v * v + R1 * w * w + jnp.exp(-rf * v)
            c = c + obstacle_value(px, py)
            c = c - mu * (
                jnp.log(v - lo_v) + jnp.log(hi_v - v) + jnp.log(w - lo_w) + jnp.log(hi_w - w)
            )
            return c

        def clip_interior(v, w):
            v = jnp.clip(v, lo_v + eps_int[0], hi_v - eps_int[0])
            w = jnp.clip(w, lo_w + eps_int[1], hi_w - eps_int[1])
            return v, w

        # ---- initialize U strictly interior ----
        def init_u(k, _):
            v, w = u0_ref[0, k, 0], u0_ref[0, k, 1]
            v = jnp.clip(v, lo_v + 1e-3 * (hi_v - lo_v), hi_v - 1e-3 * (hi_v - lo_v))
            w = jnp.clip(w, lo_w + 1e-3 * (hi_w - lo_w), hi_w - 1e-3 * (hi_w - lo_w))
            U_scr[k, 0] = v
            U_scr[k, 1] = w
            return 0

        jax.lax.fori_loop(0, N, init_u, 0)

        def rollout_cost(mu):
            """Roll U_scr from x0, fill X_scr, return barrier cost."""
            X_scr[0, 0] = px0
            X_scr[0, 1] = py0
            X_scr[0, 2] = th0

            def body(k, acc):
                px, py, th = X_scr[k, 0], X_scr[k, 1], X_scr[k, 2]
                v, w = U_scr[k, 0], U_scr[k, 1]
                acc = acc + stage_cost(px, py, th, v, w, mu)
                nx, ny, nth = F(px, py, th, v, w)
                X_scr[k + 1, 0] = nx
                X_scr[k + 1, 1] = ny
                X_scr[k + 1, 2] = nth
                return acc

            return jax.lax.fori_loop(0, N, body, jnp.zeros_like(px0))

        def run_iteration(t):
            cnt_ref[0] = cnt_ref[0] + 1
            reg = reg_scr[...]
            mu = mu_ref[t]
            J = rollout_cost(mu)

            # ---- backward Riccati sweep (l_ux == 0 by separability) ----
            def bwd(i, carry):
                k = N - 1 - i
                (vx0, vx1, vx2, v00, v01, v02, v11, v12, v22, dV1, dV2) = carry
                px, py, th = X_scr[k, 0], X_scr[k, 1], X_scr[k, 2]
                v, w = U_scr[k, 0], U_scr[k, 1]
                a02, a12, bc, bsn, b01, b11 = F_jac(px, py, th, v, w)

                # cost derivatives
                _, ogx, ogy, ohxx, ohxy, ohyy = obstacle_terms(px, py)
                lx0 = 2.0 * Q0 * (px - gx) + ogx
                lx1 = 2.0 * Q1 * (py - gy) + ogy
                lx2 = 2.0 * Q2 * (th - gth)
                er = jnp.exp(-rf * v)
                sv_lo = v - lo_v
                sv_hi = hi_v - v
                sw_lo = w - lo_w
                sw_hi = hi_w - w
                lu0 = 2.0 * R0 * v - rf * er - mu * (1.0 / sv_lo - 1.0 / sv_hi)
                lu1 = 2.0 * R1 * w - mu * (1.0 / sw_lo - 1.0 / sw_hi)
                lxx00 = 2.0 * Q0 + ohxx
                lxx01 = ohxy
                lxx11 = 2.0 * Q1 + ohyy
                lxx22 = 2.0 * Q2
                luu00 = 2.0 * R0 + rf * rf * er + mu * (1.0 / (sv_lo * sv_lo) + 1.0 / (sv_hi * sv_hi))
                luu11 = 2.0 * R1 + mu * (1.0 / (sw_lo * sw_lo) + 1.0 / (sw_hi * sw_hi))

                # Qx = lx + A^T Vx ; A = [[1,0,a02],[0,1,a12],[0,0,1]]
                qx0 = lx0 + vx0
                qx1 = lx1 + vx1
                qx2 = lx2 + a02 * vx0 + a12 * vx1 + vx2
                # B = [[bc,b01],[bsn,b11],[0,dt]]
                qu0 = lu0 + bc * vx0 + bsn * vx1
                qu1 = lu1 + b01 * vx0 + b11 * vx1 + dt * vx2

                # Vxx A (3x3); A's structure: columns [e0, e1, (a02,a12,1)]
                va02 = v00 * a02 + v01 * a12 + v02
                va12 = v01 * a02 + v11 * a12 + v12
                va22 = v02 * a02 + v12 * a12 + v22
                # Qxx = lxx + A^T (Vxx A)
                q00 = lxx00 + v00
                q01 = lxx01 + v01
                q02 = va02
                q11 = lxx11 + v11
                q12 = va12
                q22 = lxx22 + a02 * va02 + a12 * va12 + va22

                # Vxx B (3x2), columns of B: b_v=(bc,bsn,0), b_w=(b01,b11,dt)
                vb00 = v00 * bc + v01 * bsn
                vb10 = v01 * bc + v11 * bsn
                vb20 = v02 * bc + v12 * bsn
                vb01 = v00 * b01 + v01 * b11 + v02 * dt
                vb11 = v01 * b01 + v11 * b11 + v12 * dt
                vb21 = v02 * b01 + v12 * b11 + v22 * dt
                # Quu = luu + B^T Vxx B  (+ reg)
                quu00 = luu00 + bc * vb00 + bsn * vb10 + reg
                quu01 = bc * vb01 + bsn * vb11
                quu11 = luu11 + b01 * vb01 + b11 * vb11 + dt * vb21 + reg
                # Qux = B^T Vxx A  (l_ux = 0)
                qux00 = bc * v00 + bsn * v01
                qux01 = bc * v01 + bsn * v11
                qux02 = bc * va02 + bsn * va12
                qux10 = b01 * v00 + b11 * v01 + dt * v02
                qux11 = b01 * v01 + b11 * v11 + dt * v12
                qux12 = b01 * va02 + b11 * va12 + dt * va22

                det = quu00 * quu11 - quu01 * quu01
                bad = jnp.logical_or(det <= 1e-12, jnp.minimum(quu00, quu11) <= 0.0)
                quu00 = jnp.where(bad, quu00 + 1e3, quu00)
                quu11 = jnp.where(bad, quu11 + 1e3, quu11)
                det = jnp.where(bad, quu00 * quu11 - quu01 * quu01, det)
                inv_det = 1.0 / det

                def solve2(r0, r1):
                    return (
                        (quu11 * r0 - quu01 * r1) * inv_det,
                        (quu00 * r1 - quu01 * r0) * inv_det,
                    )

                kf0, kf1 = solve2(-qu0, -qu1)
                K00, K10 = solve2(-qux00, -qux10)
                K01, K11 = solve2(-qux01, -qux11)
                K02, K12 = solve2(-qux02, -qux12)

                kff_scr[k, 0] = kf0
                kff_scr[k, 1] = kf1
                kfb_scr[k, 0, 0] = K00
                kfb_scr[k, 0, 1] = K01
                kfb_scr[k, 0, 2] = K02
                kfb_scr[k, 1, 0] = K10
                kfb_scr[k, 1, 1] = K11
                kfb_scr[k, 1, 2] = K12

                # Vx' = Qx + K^T Quu kff + K^T Qu + Qux^T kff
                qk0 = quu00 * kf0 + quu01 * kf1
                qk1 = quu01 * kf0 + quu11 * kf1
                nvx0 = qx0 + K00 * qk0 + K10 * qk1 + K00 * qu0 + K10 * qu1 + qux00 * kf0 + qux10 * kf1
                nvx1 = qx1 + K01 * qk0 + K11 * qk1 + K01 * qu0 + K11 * qu1 + qux01 * kf0 + qux11 * kf1
                nvx2 = qx2 + K02 * qk0 + K12 * qk1 + K02 * qu0 + K12 * qu1 + qux02 * kf0 + qux12 * kf1

                # Vxx' = Qxx + K^T Quu K + K^T Qux + Qux^T K (symmetrized)
                qkK0 = quu00 * K00 + quu01 * K10
                qkK1 = quu01 * K00 + quu11 * K10
                qkK0b = quu00 * K01 + quu01 * K11
                qkK1b = quu01 * K01 + quu11 * K11
                qkK0c = quu00 * K02 + quu01 * K12
                qkK1c = quu01 * K02 + quu11 * K12
                n00 = q00 + K00 * qkK0 + K10 * qkK1 + 2.0 * (K00 * qux00 + K10 * qux10)
                n01 = q01 + K00 * qkK0b + K10 * qkK1b + (K00 * qux01 + K10 * qux11) + (K01 * qux00 + K11 * qux10)
                n02 = q02 + K00 * qkK0c + K10 * qkK1c + (K00 * qux02 + K10 * qux12) + (K02 * qux00 + K12 * qux10)
                n11 = q11 + K01 * qkK0b + K11 * qkK1b + 2.0 * (K01 * qux01 + K11 * qux11)
                n12 = q12 + K01 * qkK0c + K11 * qkK1c + (K01 * qux02 + K11 * qux12) + (K02 * qux01 + K12 * qux11)
                n22 = q22 + K02 * qkK0c + K12 * qkK1c + 2.0 * (K02 * qux02 + K12 * qux12)

                dV1 = dV1 + kf0 * qu0 + kf1 * qu1
                dV2 = dV2 + 0.5 * (kf0 * qk0 + kf1 * qk1)
                return (nvx0, nvx1, nvx2, n00, n01, n02, n11, n12, n22, dV1, dV2)

            zero = jnp.zeros_like(px0)
            init = tuple(zero for _ in range(11))
            (_, _, _, _, _, _, _, _, _, dV1, dV2) = jax.lax.fori_loop(0, N, bwd, init)

            # ---- stage-level early exit: the per-scenario Newton decrement
            # -(dV1+dV2) is >= 0 (dV2 == -dV1/2 for the exact step) and decays
            # quadratically within a barrier stage; once the whole tile is
            # below stage_tol*(1+|J|), the remaining iterations at this mu are
            # no-ops — mark the stage done so one_iteration skips them. Never
            # on a stage's first iteration (a fresh mu resets the decrement).
            dec = -(dV1 + dV2)

            @pl.when(
                jnp.logical_and(
                    first_iref[t] == 0,
                    jnp.max(dec - stage_tol * (1.0 + jnp.abs(J))) < 0.0,
                )
            )
            def _mark_stage_done():
                done_ref[0] = stage_iref[t] + 1

            # ---- line search: alphas descending, per-scenario first-accept ----
            # `acc_scr` is a float mask (1.0 = accepted): carrying i1 vectors
            # through scf loops trips a Mosaic layout bug (vector<8x128x32xi1>
            # vpad masks) on TPU. It lives in scratch (not a loop carry) so the
            # alpha body can be predicated out with pl.when once every
            # scenario in the tile has accepted — typically after 1-2 alphas,
            # skipping most of the up-to-n_alphas candidate rollouts.
            acc_scr[...] = jnp.zeros_like(px0)

            def try_alpha(J, alpha):
                # candidate rollout with feedback, cost into acc; stash U in
                # Ubest only where this is the first acceptance. Rows whose
                # candidate is rejected keep stale values in Ubest — they are
                # either overwritten by the next alpha (take still true) or
                # masked out by `commit` (acc_mask false), never read.
                cnt_ref[1] = cnt_ref[1] + 1
                accepted = acc_scr[...]
                px, py, th = px0, py0, th0

                def fbody(k, carry):
                    px, py, th, acc = carry
                    dx0 = px - X_scr[k, 0]
                    dx1 = py - X_scr[k, 1]
                    dx2 = th - X_scr[k, 2]
                    v = U_scr[k, 0] + alpha * kff_scr[k, 0] + (
                        kfb_scr[k, 0, 0] * dx0 + kfb_scr[k, 0, 1] * dx1 + kfb_scr[k, 0, 2] * dx2
                    )
                    w = U_scr[k, 1] + alpha * kff_scr[k, 1] + (
                        kfb_scr[k, 1, 0] * dx0 + kfb_scr[k, 1, 1] * dx1 + kfb_scr[k, 1, 2] * dx2
                    )
                    v, w = clip_interior(v, w)
                    acc = acc + stage_cost(px, py, th, v, w, mu)
                    # store candidate where not yet accepted (cheap: overwrite)
                    take = accepted < 0.5
                    Ubest_scr[k, 0] = jnp.where(take, v, Ubest_scr[k, 0])
                    Ubest_scr[k, 1] = jnp.where(take, w, Ubest_scr[k, 1])
                    nx, ny, nth = F(px, py, th, v, w)
                    return nx, ny, nth, acc

                _, _, _, Jc = jax.lax.fori_loop(0, N, fbody, (px, py, th, jnp.zeros_like(px0)))
                expected = -(alpha * dV1 + alpha * alpha * dV2)
                Jc = jnp.where(jnp.isnan(Jc), jnp.inf, Jc)
                ok = Jc <= J - c1 * jnp.maximum(expected, 0.0)
                newly = jnp.where(jnp.logical_and(ok, accepted < 0.5), 1.0, 0.0)
                acc_scr[...] = jnp.maximum(accepted, newly)

            # NOTE: try_alpha overwrites Ubest rows where "not accepted", so
            # once a scenario accepts, later (smaller) alphas must not clobber
            # its stored candidate — handled by the `take` mask.
            # fori (not Python-unrolled) keeps the Mosaic program size small:
            # an unrolled 6x copy of the candidate rollout made remote compile
            # time explode.
            def alpha_step(a, carry):
                @pl.when(jnp.min(acc_scr[...]) < 0.5)
                def _():
                    # 0.5**a via exp (math.powf does not legalize in Mosaic)
                    alpha = jnp.exp(-0.6931471805599453 * a.astype(jnp.float32))
                    try_alpha(J, alpha)

                return carry

            jax.lax.fori_loop(0, settings.n_alphas, alpha_step, 0)

            acc_mask = acc_scr[...] > 0.5

            def commit(k, _):
                U_scr[k, 0] = jnp.where(acc_mask, Ubest_scr[k, 0], U_scr[k, 0])
                U_scr[k, 1] = jnp.where(acc_mask, Ubest_scr[k, 1], U_scr[k, 1])
                return 0

            jax.lax.fori_loop(0, N, commit, 0)
            reg_scr[...] = jnp.where(
                acc_mask,
                jnp.maximum(reg * 0.5, settings.reg_min),
                jnp.minimum(reg * 10.0 + settings.reg_min, settings.reg_max),
            )

        reg_scr[...] = jnp.full(px0.shape, settings.reg_init, dtype=jnp.float32)
        done_ref[0] = 0
        cnt_ref[0] = 0
        cnt_ref[1] = 0

        def one_iteration(t, carry):
            @pl.when(done_ref[0] <= stage_iref[t])
            def _():
                run_iteration(t)

            return carry

        jax.lax.fori_loop(0, n_iters, one_iteration, 0)

        # ---- final rollout, true cost, adjoint KKT residual ----
        def final_cost():
            X_scr[0, 0] = px0
            X_scr[0, 1] = py0
            X_scr[0, 2] = th0

            def body(k, acc):
                px, py, th = X_scr[k, 0], X_scr[k, 1], X_scr[k, 2]
                v, w = U_scr[k, 0], U_scr[k, 1]
                ex, ey, eth = px - gx, py - gy, th - gth
                c = Q0 * ex * ex + Q1 * ey * ey + Q2 * eth * eth
                c = c + R0 * v * v + R1 * w * w + jnp.exp(-rf * v)
                acc = acc + c + obstacle_value(px, py)
                nx, ny, nth = F(px, py, th, v, w)
                X_scr[k + 1, 0] = nx
                X_scr[k + 1, 1] = ny
                X_scr[k + 1, 2] = nth
                return acc

            return jax.lax.fori_loop(0, N, body, jnp.zeros_like(px0))

        Jtrue = final_cost()

        def adjoint(i, carry):
            k = N - 1 - i
            l0, l1, l2, kkt = carry
            px, py, th = X_scr[k, 0], X_scr[k, 1], X_scr[k, 2]
            v, w = U_scr[k, 0], U_scr[k, 1]
            a02, a12, bc, bsn, b01, b11 = F_jac(px, py, th, v, w)
            _, ogx, ogy, _, _, _ = obstacle_terms(px, py)
            lx0 = 2.0 * Q0 * (px - gx) + ogx
            lx1 = 2.0 * Q1 * (py - gy) + ogy
            lx2 = 2.0 * Q2 * (th - gth)
            er = jnp.exp(-rf * v)
            gu0 = 2.0 * R0 * v - rf * er + bc * l0 + bsn * l1
            gu1 = 2.0 * R1 * w + b01 * l0 + b11 * l1 + dt * l2
            # projected-gradient residual per control
            r0 = jnp.abs(v - jnp.clip(v - gu0, lo_v, hi_v))
            r1 = jnp.abs(w - jnp.clip(w - gu1, lo_w, hi_w))
            kkt = jnp.maximum(kkt, jnp.maximum(r0, r1))
            n0 = lx0 + l0
            n1 = lx1 + l1
            n2 = lx2 + a02 * l0 + a12 * l1 + l2
            return n0, n1, n2, kkt

        zero = jnp.zeros_like(px0)
        _, _, _, kkt = jax.lax.fori_loop(0, N, adjoint, (zero, zero, zero, zero))

        def emit(k, _):
            u_out[0, k, 0] = U_scr[k, 0]
            u_out[0, k, 1] = U_scr[k, 1]
            x_out[0, k, 0] = X_scr[k, 0]
            x_out[0, k, 1] = X_scr[k, 1]
            x_out[0, k, 2] = X_scr[k, 2]
            return 0

        jax.lax.fori_loop(0, N, emit, 0)
        x_out[0, N, 0] = X_scr[N, 0]
        x_out[0, N, 1] = X_scr[N, 1]
        x_out[0, N, 2] = X_scr[N, 2]
        cost_out[0] = Jtrue
        kkt_out[0] = kkt
        zero_sl = jnp.zeros_like(px0)
        iters_out[0] = zero_sl + cnt_ref[0].astype(jnp.float32)
        lsro_out[0] = zero_sl + cnt_ref[1].astype(jnp.float32)

    tile = tile_s * tile_l

    def solve_bank(thetas, U0s):
        B = jax.tree_util.tree_leaves(thetas)[0].shape[0]
        assert B % tile == 0, f"bank size {B} must be a multiple of {tile}"
        n_tiles = B // tile
        n_obs = thetas["obs_x"].shape[1]

        def pack(leaf):  # (B, *s) -> (*s, n_tiles, S, L), then tiles leading
            moved = jnp.moveaxis(jnp.asarray(leaf, jnp.float32), 0, -1)
            return jnp.moveaxis(
                moved.reshape(moved.shape[:-1] + (n_tiles, tile_s, tile_l)), -3, 0
            )  # (n_tiles, *s, S, L)

        x0g = jnp.stack(
            [
                pack(thetas["x0"][:, 0]),
                pack(thetas["x0"][:, 1]),
                pack(thetas["x0"][:, 2]),
                pack(thetas["goal"][:, 0]),
                pack(thetas["goal"][:, 1]),
                pack(thetas["goal"][:, 2]),
            ],
            axis=1,
        )  # (n_tiles, 6, S, L)
        wts = jnp.stack(
            [
                pack(thetas["Q"][:, 0]),
                pack(thetas["Q"][:, 1]),
                pack(thetas["Q"][:, 2]),
                pack(thetas["R"][:, 0]),
                pack(thetas["R"][:, 1]),
                pack(thetas["reverse_factor"]),
                pack(thetas["obstacle_weight"] * thetas["obstacle_gain"]),
                pack(1.0 / (thetas["inflation_radius"] ** 2)),
            ],
            axis=1,
        )  # (n_tiles, 8, S, L)
        obs = jnp.stack([pack(thetas["obs_x"]), pack(thetas["obs_y"])], axis=1)
        # (n_tiles, 2, n_obs, S, L)
        u0 = pack(U0s)  # (B, N, 2) -> (n_tiles, N, 2, S, L)

        grid = (n_tiles,)
        out_shape = (
            jax.ShapeDtypeStruct((n_tiles, N, 2, tile_s, tile_l), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, N + 1, 3, tile_s, tile_l), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_s, tile_l), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_s, tile_l), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_s, tile_l), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_s, tile_l), jnp.float32),
        )
        bspec = lambda *shape: pl.BlockSpec(
            (1,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM
        )
        U_t, X_t, J_t, kkt_t, it_t, ls_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_iters,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((n_iters,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((n_iters,), lambda i: (0,), memory_space=pltpu.SMEM),
                bspec(6, tile_s, tile_l),
                bspec(8, tile_s, tile_l),
                bspec(2, n_obs, tile_s, tile_l),
                bspec(N, 2, tile_s, tile_l),
            ],
            out_specs=(
                bspec(N, 2, tile_s, tile_l),
                bspec(N + 1, 3, tile_s, tile_l),
                bspec(tile_s, tile_l),
                bspec(tile_s, tile_l),
                bspec(tile_s, tile_l),
                bspec(tile_s, tile_l),
            ),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((N + 1, 3, tile_s, tile_l), jnp.float32),
                pltpu.VMEM((N, 2, tile_s, tile_l), jnp.float32),
                pltpu.VMEM((N, 2, tile_s, tile_l), jnp.float32),
                pltpu.VMEM((N, 2, 3, tile_s, tile_l), jnp.float32),
                pltpu.VMEM((N, 2, tile_s, tile_l), jnp.float32),
                pltpu.VMEM((tile_s, tile_l), jnp.float32),
                pltpu.VMEM((tile_s, tile_l), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((2,), jnp.int32),
            ],
            interpret=interpret,
        )(jnp.asarray(mus), jnp.asarray(stage_idx), jnp.asarray(first_idx), x0g, wts, obs, u0)

        def unpack(arr):  # (n_tiles, *s, S, L) -> (B, *s)
            moved = jnp.moveaxis(arr, 0, -3)  # (*s, n_tiles, S, L)
            flat = moved.reshape(moved.shape[:-3] + (B,))
            return jnp.moveaxis(flat, -1, 0)

        U = unpack(U_t)
        X = unpack(X_t)
        J = unpack(J_t)
        kkt = unpack(kkt_t)
        iters = unpack(it_t).astype(jnp.int32)
        sol = Solution(
            U=U,
            X=X,
            cost=J,
            kkt_residual=kkt,
            converged=kkt < settings.kkt_tol,
            n_iters=iters,
            reg=jnp.zeros((B,)),
        )
        if with_counters:
            return sol, {"iters": iters, "ls_rollouts": unpack(ls_t).astype(jnp.int32)}
        return sol

    return solve_bank


def make_pallas_tracking_solver(
    ocp: OCP,
    settings: SolverSettings = SolverSettings(),
    *,
    interpret: bool = False,
    tile_s: int = TILE_S,
    tile_l: int = TILE_L,
    stage_tol: float = 1e-10,
    with_counters: bool = False,
    fast_sincos: bool = True,
    wrap_yaw: bool = None,
):
    """Whole-solver Pallas kernel for the trajectory-tracking formulation
    (make_tracking): Euler transition (quirk #3), time-varying x/u references
    (quirk #4 indexing handled by the theta builder), Gaussian obstacle term
    (weighted; 0 under parity), reverse penalty, optional terminal pose
    quadratic ``||x_N - x_ref[N-1]||^2_W`` (the corrected parking mode;
    zero weights reproduce parity exactly), log-barrier bounds. Same tile
    layout and algorithm as the point-stabilization kernel.

    ``wrap_yaw`` (default: read from ``ocp.meta``, set by make_tracking's
    corrected mode) wraps the yaw tracking error to (-pi, pi] in the cost,
    its analytic gradients, and the KKT adjoint — mirroring the OCP's
    corrected-mode stage cost so engine cross-parity holds."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = ocp.horizon
    if wrap_yaw is None:
        wrap_yaw = "wrap_yaw" in getattr(ocp, "meta", ())
    x_probe = jnp.zeros(3)
    u_probe = jnp.array([0.0, 1.0])
    dt = float(ocp.transition(x_probe, u_probe)[2])

    u_lo = np.asarray(ocp.u_lo, dtype=np.float32)
    u_hi = np.asarray(ocp.u_hi, dtype=np.float32)
    mus = _mu_schedule_np(settings)
    stage_idx, first_idx = _stage_arrays_np(settings)
    n_iters = len(mus)
    eps_int = (settings.interior_clip * (u_hi - u_lo)).astype(np.float32)
    c1 = settings.armijo_c1

    def kernel(
        mu_ref,  # SMEM (n_iters,)
        stage_iref,  # SMEM (n_iters,)
        first_iref,  # SMEM (n_iters,)
        x0_ref,  # (3, S, L)
        xref_ref,  # (N, 3, S, L)
        uref_ref,  # (N, 2, S, L)
        w_ref,  # (11, S, L): Q0,Q1,Q2,R0,R1,rf, ow*gain, inv_ir2, TW0,TW1,TW2
        obs_ref,  # (2, n_obs, S, L)
        u0_ref,  # (N, 2, S, L)
        u_out,
        x_out,
        cost_out,
        kkt_out,
        iters_out,
        lsro_out,
        X_scr,
        U_scr,
        kff_scr,
        kfb_scr,
        Ubest_scr,
        acc_scr,
        reg_scr,
        done_ref,
        cnt_ref,
    ):
        px0, py0, th0 = x0_ref[0, 0], x0_ref[0, 1], x0_ref[0, 2]
        Q0, Q1, Q2 = w_ref[0, 0], w_ref[0, 1], w_ref[0, 2]
        R0, R1 = w_ref[0, 3], w_ref[0, 4]
        rf = w_ref[0, 5]
        ow = w_ref[0, 6]
        inv_ir2 = w_ref[0, 7]
        TW0, TW1, TW2 = w_ref[0, 8], w_ref[0, 9], w_ref[0, 10]
        obs_x_all = obs_ref[0, 0]
        obs_y_all = obs_ref[0, 1]
        # dynamic obstacle skip + live-prefix chunking — see the
        # point-stabilization kernel
        has_obs = jnp.max(jnp.abs(w_ref[0, 6])) > 0.0
        n_obs = obs_x_all.shape[0]
        obs_chunk = 8 if n_obs % 8 == 0 else n_obs
        pt_live = jnp.logical_or(jnp.abs(obs_x_all) < 90.0, jnp.abs(obs_y_all) < 90.0)
        idx1 = jax.lax.broadcasted_iota(jnp.int32, pt_live.shape, 0) + 1
        n_live = jnp.max(jnp.where(pt_live, idx1, 0))
        n_chunks_live = (n_live + obs_chunk - 1) // obs_chunk
        lo_v, lo_w = u_lo[0], u_lo[1]
        hi_v, hi_w = u_hi[0], u_hi[1]
        sincos = _fast_sincos if fast_sincos else _stock_sincos

        if wrap_yaw:
            # corrected-mode yaw error wrap: gradient 1 a.e., Hessian exact
            def wyaw(e):
                two_pi = 6.283185307179586
                return e - two_pi * jnp.round(e * (1.0 / two_pi))
        else:
            def wyaw(e):
                return e

        def F(px, py, th, v, w):
            c, s = sincos(th)
            return px + dt * v * c, py + dt * v * s, th + dt * w

        def F_jac(px, py, th, v, w):
            c, s = sincos(th)
            # A = [[1,0,-dt v s],[0,1,dt v c],[0,0,1]]
            # B = [[dt c,0],[dt s,0],[0,dt]]
            return -dt * v * s, dt * v * c, dt * c, dt * s

        def obstacle_terms(px, py):
            def live():
                def chunk(ci, acc):
                    val, gx_, gy_, hxx, hxy, hyy = acc
                    ox = obs_ref[0, 0, pl.ds(ci * obs_chunk, obs_chunk)]
                    oy = obs_ref[0, 1, pl.ds(ci * obs_chunk, obs_chunk)]
                    dx = px[None] - ox
                    dy = py[None] - oy
                    e = ow[None] * jnp.exp(-(dx * dx + dy * dy) * inv_ir2[None])
                    i2 = inv_ir2[None]
                    return (
                        val + jnp.sum(e, axis=0),
                        gx_ + jnp.sum(-2.0 * i2 * dx * e, axis=0),
                        gy_ + jnp.sum(-2.0 * i2 * dy * e, axis=0),
                        hxx + jnp.sum(e * (4.0 * i2 * i2 * dx * dx - 2.0 * i2), axis=0),
                        hxy + jnp.sum(e * 4.0 * i2 * i2 * dx * dy, axis=0),
                        hyy + jnp.sum(e * (4.0 * i2 * i2 * dy * dy - 2.0 * i2), axis=0),
                    )

                z = jnp.zeros_like(px)
                val, gx_, gy_, hxx, hxy, hyy = jax.lax.fori_loop(
                    0, n_chunks_live, chunk, (z, z, z, z, z, z)
                )
                return val, gx_, gy_, hxx, hxy, hyy

            def dead():
                z = jnp.zeros_like(px)
                return z, z, z, z, z, z

            return jax.lax.cond(has_obs, live, dead)

        def obstacle_value(px, py):
            """Value-only obstacle sum (see the point-stabilization kernel)."""

            def live():
                def chunk(ci, acc):
                    ox = obs_ref[0, 0, pl.ds(ci * obs_chunk, obs_chunk)]
                    oy = obs_ref[0, 1, pl.ds(ci * obs_chunk, obs_chunk)]
                    dx = px[None] - ox
                    dy = py[None] - oy
                    return acc + jnp.sum(
                        ow[None] * jnp.exp(-(dx * dx + dy * dy) * inv_ir2[None]), axis=0
                    )

                return jax.lax.fori_loop(0, n_chunks_live, chunk, jnp.zeros_like(px))

            return jax.lax.cond(has_obs, live, lambda: jnp.zeros_like(px))

        def terminal_quad(px, py, th):
            # optional terminal pose cost ||x_N - x_ref[N-1]||^2_W (zero W
            # under parity — reference quirk #5: no terminal state cost)
            ex = px - xref_ref[0, N - 1, 0]
            ey = py - xref_ref[0, N - 1, 1]
            eth = wyaw(th - xref_ref[0, N - 1, 2])
            return TW0 * ex * ex + TW1 * ey * ey + TW2 * eth * eth

        def stage_cost(k, px, py, th, v, w, mu):
            ex = px - xref_ref[0, k, 0]
            ey = py - xref_ref[0, k, 1]
            eth = wyaw(th - xref_ref[0, k, 2])
            ev = v - uref_ref[0, k, 0]
            ew = w - uref_ref[0, k, 1]
            c = Q0 * ex * ex + Q1 * ey * ey + Q2 * eth * eth
            c = c + R0 * ev * ev + R1 * ew * ew + jnp.exp(-rf * v)
            c = c + obstacle_value(px, py)
            c = c - mu * (
                jnp.log(v - lo_v) + jnp.log(hi_v - v) + jnp.log(w - lo_w) + jnp.log(hi_w - w)
            )
            return c

        def clip_interior(v, w):
            v = jnp.clip(v, lo_v + eps_int[0], hi_v - eps_int[0])
            w = jnp.clip(w, lo_w + eps_int[1], hi_w - eps_int[1])
            return v, w

        def init_u(k, _):
            v, w = u0_ref[0, k, 0], u0_ref[0, k, 1]
            v = jnp.clip(v, lo_v + 1e-3 * (hi_v - lo_v), hi_v - 1e-3 * (hi_v - lo_v))
            w = jnp.clip(w, lo_w + 1e-3 * (hi_w - lo_w), hi_w - 1e-3 * (hi_w - lo_w))
            U_scr[k, 0] = v
            U_scr[k, 1] = w
            return 0

        jax.lax.fori_loop(0, N, init_u, 0)

        def rollout_cost(mu):
            X_scr[0, 0] = px0
            X_scr[0, 1] = py0
            X_scr[0, 2] = th0

            def body(k, acc):
                px, py, th = X_scr[k, 0], X_scr[k, 1], X_scr[k, 2]
                v, w = U_scr[k, 0], U_scr[k, 1]
                acc = acc + stage_cost(k, px, py, th, v, w, mu)
                nx, ny, nth = F(px, py, th, v, w)
                X_scr[k + 1, 0] = nx
                X_scr[k + 1, 1] = ny
                X_scr[k + 1, 2] = nth
                return acc

            acc = jax.lax.fori_loop(0, N, body, jnp.zeros_like(px0))
            # terminal obstacle term (the tracking OCP's stage-N cost)
            # + the optional terminal pose quadratic
            return (
                acc
                + obstacle_value(X_scr[N, 0], X_scr[N, 1])
                + terminal_quad(X_scr[N, 0], X_scr[N, 1], X_scr[N, 2])
            )

        def run_iteration(t):
            cnt_ref[0] = cnt_ref[0] + 1
            reg = reg_scr[...]
            mu = mu_ref[t]
            J = rollout_cost(mu)

            def bwd(i, carry):
                k = N - 1 - i
                (vx0, vx1, vx2, v00, v01, v02, v11, v12, v22, dV1, dV2) = carry
                px, py, th = X_scr[k, 0], X_scr[k, 1], X_scr[k, 2]
                v, w = U_scr[k, 0], U_scr[k, 1]
                a02, a12, bc, bsn = F_jac(px, py, th, v, w)

                _, ogx, ogy, ohxx, ohxy, ohyy = obstacle_terms(px, py)
                ex = px - xref_ref[0, k, 0]
                ey = py - xref_ref[0, k, 1]
                eth = wyaw(th - xref_ref[0, k, 2])
                ev = v - uref_ref[0, k, 0]
                ew = w - uref_ref[0, k, 1]
                lx0 = 2.0 * Q0 * ex + ogx
                lx1 = 2.0 * Q1 * ey + ogy
                lx2 = 2.0 * Q2 * eth
                er = jnp.exp(-rf * v)
                sv_lo = v - lo_v
                sv_hi = hi_v - v
                sw_lo = w - lo_w
                sw_hi = hi_w - w
                lu0 = 2.0 * R0 * ev - rf * er - mu * (1.0 / sv_lo - 1.0 / sv_hi)
                lu1 = 2.0 * R1 * ew - mu * (1.0 / sw_lo - 1.0 / sw_hi)
                lxx00 = 2.0 * Q0 + ohxx
                lxx01 = ohxy
                lxx11 = 2.0 * Q1 + ohyy
                lxx22 = 2.0 * Q2
                luu00 = 2.0 * R0 + rf * rf * er + mu * (1.0 / (sv_lo * sv_lo) + 1.0 / (sv_hi * sv_hi))
                luu11 = 2.0 * R1 + mu * (1.0 / (sw_lo * sw_lo) + 1.0 / (sw_hi * sw_hi))

                qx0 = lx0 + vx0
                qx1 = lx1 + vx1
                qx2 = lx2 + a02 * vx0 + a12 * vx1 + vx2
                qu0 = lu0 + bc * vx0 + bsn * vx1
                qu1 = lu1 + dt * vx2

                va02 = v00 * a02 + v01 * a12 + v02
                va12 = v01 * a02 + v11 * a12 + v12
                va22 = v02 * a02 + v12 * a12 + v22
                q00 = lxx00 + v00
                q01 = lxx01 + v01
                q02 = va02
                q11 = lxx11 + v11
                q12 = va12
                q22 = lxx22 + a02 * va02 + a12 * va12 + va22

                # B columns: b_v = (bc, bsn, 0), b_w = (0, 0, dt)
                vb00 = v00 * bc + v01 * bsn
                vb10 = v01 * bc + v11 * bsn
                vb20 = v02 * bc + v12 * bsn
                vb01 = v02 * dt
                vb11 = v12 * dt
                vb21 = v22 * dt
                quu00 = luu00 + bc * vb00 + bsn * vb10 + reg
                quu01 = bc * vb01 + bsn * vb11
                quu11 = luu11 + dt * vb21 + reg
                qux00 = bc * v00 + bsn * v01
                qux01 = bc * v01 + bsn * v11
                qux02 = bc * va02 + bsn * va12
                qux10 = dt * v02
                qux11 = dt * v12
                qux12 = dt * va22

                det = quu00 * quu11 - quu01 * quu01
                bad = jnp.logical_or(det <= 1e-12, jnp.minimum(quu00, quu11) <= 0.0)
                quu00 = jnp.where(bad, quu00 + 1e3, quu00)
                quu11 = jnp.where(bad, quu11 + 1e3, quu11)
                det = jnp.where(bad, quu00 * quu11 - quu01 * quu01, det)
                inv_det = 1.0 / det

                def solve2(r0, r1):
                    return (
                        (quu11 * r0 - quu01 * r1) * inv_det,
                        (quu00 * r1 - quu01 * r0) * inv_det,
                    )

                kf0, kf1 = solve2(-qu0, -qu1)
                K00, K10 = solve2(-qux00, -qux10)
                K01, K11 = solve2(-qux01, -qux11)
                K02, K12 = solve2(-qux02, -qux12)

                kff_scr[k, 0] = kf0
                kff_scr[k, 1] = kf1
                kfb_scr[k, 0, 0] = K00
                kfb_scr[k, 0, 1] = K01
                kfb_scr[k, 0, 2] = K02
                kfb_scr[k, 1, 0] = K10
                kfb_scr[k, 1, 1] = K11
                kfb_scr[k, 1, 2] = K12

                qk0 = quu00 * kf0 + quu01 * kf1
                qk1 = quu01 * kf0 + quu11 * kf1
                nvx0 = qx0 + K00 * qk0 + K10 * qk1 + K00 * qu0 + K10 * qu1 + qux00 * kf0 + qux10 * kf1
                nvx1 = qx1 + K01 * qk0 + K11 * qk1 + K01 * qu0 + K11 * qu1 + qux01 * kf0 + qux11 * kf1
                nvx2 = qx2 + K02 * qk0 + K12 * qk1 + K02 * qu0 + K12 * qu1 + qux02 * kf0 + qux12 * kf1

                qkK0 = quu00 * K00 + quu01 * K10
                qkK1 = quu01 * K00 + quu11 * K10
                qkK0b = quu00 * K01 + quu01 * K11
                qkK1b = quu01 * K01 + quu11 * K11
                qkK0c = quu00 * K02 + quu01 * K12
                qkK1c = quu01 * K02 + quu11 * K12
                n00 = q00 + K00 * qkK0 + K10 * qkK1 + 2.0 * (K00 * qux00 + K10 * qux10)
                n01 = q01 + K00 * qkK0b + K10 * qkK1b + (K00 * qux01 + K10 * qux11) + (K01 * qux00 + K11 * qux10)
                n02 = q02 + K00 * qkK0c + K10 * qkK1c + (K00 * qux02 + K10 * qux12) + (K02 * qux00 + K12 * qux10)
                n11 = q11 + K01 * qkK0b + K11 * qkK1b + 2.0 * (K01 * qux01 + K11 * qux11)
                n12 = q12 + K01 * qkK0c + K11 * qkK1c + (K01 * qux02 + K11 * qux12) + (K02 * qux01 + K12 * qux11)
                n22 = q22 + K02 * qkK0c + K12 * qkK1c + 2.0 * (K02 * qux02 + K12 * qux12)

                dV1 = dV1 + kf0 * qu0 + kf1 * qu1
                dV2 = dV2 + 0.5 * (kf0 * qk0 + kf1 * qk1)
                return (nvx0, nvx1, nvx2, n00, n01, n02, n11, n12, n22, dV1, dV2)

            zero = jnp.zeros_like(px0)
            _, tgx, tgy, thxx, thxy, thyy = obstacle_terms(X_scr[N, 0], X_scr[N, 1])
            # terminal quadratic's gradient/Hessian (diagonal W) folds into
            # the value-function seed alongside the obstacle terms
            texN = X_scr[N, 0] - xref_ref[0, N - 1, 0]
            teyN = X_scr[N, 1] - xref_ref[0, N - 1, 1]
            tethN = wyaw(X_scr[N, 2] - xref_ref[0, N - 1, 2])
            init = (
                tgx + 2.0 * TW0 * texN,
                tgy + 2.0 * TW1 * teyN,
                2.0 * TW2 * tethN,
                thxx + 2.0 * TW0,
                thxy,
                zero,
                thyy + 2.0 * TW1,
                zero,
                2.0 * TW2 + zero,
                zero,
                zero,
            )
            (_, _, _, _, _, _, _, _, _, dV1, dV2) = jax.lax.fori_loop(0, N, bwd, init)

            # Stage-level early exit (see the point-stabilization kernel).
            dec = -(dV1 + dV2)

            @pl.when(
                jnp.logical_and(
                    first_iref[t] == 0,
                    jnp.max(dec - stage_tol * (1.0 + jnp.abs(J))) < 0.0,
                )
            )
            def _mark_stage_done():
                done_ref[0] = stage_iref[t] + 1

            # Same first-accept line search as the point-stabilization kernel:
            # acc_scr lives in scratch so pl.when can skip remaining alphas
            # once the whole tile has accepted; rejected candidates left in
            # Ubest are overwritten by the next alpha or masked by `commit`.
            acc_scr[...] = jnp.zeros_like(px0)

            def try_alpha(J, alpha):
                cnt_ref[1] = cnt_ref[1] + 1
                accepted = acc_scr[...]
                px, py, th = px0, py0, th0

                def fbody(k, carry):
                    px, py, th, acc = carry
                    dx0 = px - X_scr[k, 0]
                    dx1 = py - X_scr[k, 1]
                    dx2 = th - X_scr[k, 2]
                    v = U_scr[k, 0] + alpha * kff_scr[k, 0] + (
                        kfb_scr[k, 0, 0] * dx0 + kfb_scr[k, 0, 1] * dx1 + kfb_scr[k, 0, 2] * dx2
                    )
                    w = U_scr[k, 1] + alpha * kff_scr[k, 1] + (
                        kfb_scr[k, 1, 0] * dx0 + kfb_scr[k, 1, 1] * dx1 + kfb_scr[k, 1, 2] * dx2
                    )
                    v, w = clip_interior(v, w)
                    acc = acc + stage_cost(k, px, py, th, v, w, mu)
                    take = accepted < 0.5
                    Ubest_scr[k, 0] = jnp.where(take, v, Ubest_scr[k, 0])
                    Ubest_scr[k, 1] = jnp.where(take, w, Ubest_scr[k, 1])
                    nx, ny, nth = F(px, py, th, v, w)
                    return nx, ny, nth, acc

                cx, cy, cth, Jc = jax.lax.fori_loop(0, N, fbody, (px, py, th, jnp.zeros_like(px0)))
                Jc = Jc + obstacle_value(cx, cy) + terminal_quad(cx, cy, cth)
                expected = -(alpha * dV1 + alpha * alpha * dV2)
                Jc = jnp.where(jnp.isnan(Jc), jnp.inf, Jc)
                ok = Jc <= J - c1 * jnp.maximum(expected, 0.0)
                newly = jnp.where(jnp.logical_and(ok, accepted < 0.5), 1.0, 0.0)
                acc_scr[...] = jnp.maximum(accepted, newly)

            def alpha_step(a, carry):
                @pl.when(jnp.min(acc_scr[...]) < 0.5)
                def _():
                    alpha = jnp.exp(-0.6931471805599453 * a.astype(jnp.float32))
                    try_alpha(J, alpha)

                return carry

            jax.lax.fori_loop(0, settings.n_alphas, alpha_step, 0)
            acc_mask = acc_scr[...] > 0.5

            def commit(k, _):
                U_scr[k, 0] = jnp.where(acc_mask, Ubest_scr[k, 0], U_scr[k, 0])
                U_scr[k, 1] = jnp.where(acc_mask, Ubest_scr[k, 1], U_scr[k, 1])
                return 0

            jax.lax.fori_loop(0, N, commit, 0)
            reg_scr[...] = jnp.where(
                acc_mask,
                jnp.maximum(reg * 0.5, settings.reg_min),
                jnp.minimum(reg * 10.0 + settings.reg_min, settings.reg_max),
            )

        reg_scr[...] = jnp.full(px0.shape, settings.reg_init, dtype=jnp.float32)
        done_ref[0] = 0
        cnt_ref[0] = 0
        cnt_ref[1] = 0

        def one_iteration(t, carry):
            @pl.when(done_ref[0] <= stage_iref[t])
            def _():
                run_iteration(t)

            return carry

        jax.lax.fori_loop(0, n_iters, one_iteration, 0)

        def final_cost():
            X_scr[0, 0] = px0
            X_scr[0, 1] = py0
            X_scr[0, 2] = th0

            def body(k, acc):
                px, py, th = X_scr[k, 0], X_scr[k, 1], X_scr[k, 2]
                v, w = U_scr[k, 0], U_scr[k, 1]
                ex = px - xref_ref[0, k, 0]
                ey = py - xref_ref[0, k, 1]
                eth = wyaw(th - xref_ref[0, k, 2])
                ev = v - uref_ref[0, k, 0]
                ew = w - uref_ref[0, k, 1]
                c = Q0 * ex * ex + Q1 * ey * ey + Q2 * eth * eth
                c = c + R0 * ev * ev + R1 * ew * ew + jnp.exp(-rf * v)
                acc = acc + c + obstacle_value(px, py)
                nx, ny, nth = F(px, py, th, v, w)
                X_scr[k + 1, 0] = nx
                X_scr[k + 1, 1] = ny
                X_scr[k + 1, 2] = nth
                return acc

            acc = jax.lax.fori_loop(0, N, body, jnp.zeros_like(px0))
            return (
                acc
                + obstacle_value(X_scr[N, 0], X_scr[N, 1])
                + terminal_quad(X_scr[N, 0], X_scr[N, 1], X_scr[N, 2])
            )

        Jtrue = final_cost()

        def adjoint(i, carry):
            k = N - 1 - i
            l0, l1, l2, kkt = carry
            px, py, th = X_scr[k, 0], X_scr[k, 1], X_scr[k, 2]
            v, w = U_scr[k, 0], U_scr[k, 1]
            a02, a12, bc, bsn = F_jac(px, py, th, v, w)
            _, ogx, ogy, _, _, _ = obstacle_terms(px, py)
            ex = px - xref_ref[0, k, 0]
            ey = py - xref_ref[0, k, 1]
            eth = wyaw(th - xref_ref[0, k, 2])
            ev = v - uref_ref[0, k, 0]
            ew = w - uref_ref[0, k, 1]
            lx0 = 2.0 * Q0 * ex + ogx
            lx1 = 2.0 * Q1 * ey + ogy
            lx2 = 2.0 * Q2 * eth
            er = jnp.exp(-rf * v)
            gu0 = 2.0 * R0 * ev - rf * er + bc * l0 + bsn * l1
            gu1 = 2.0 * R1 * ew + dt * l2
            r0 = jnp.abs(v - jnp.clip(v - gu0, lo_v, hi_v))
            r1 = jnp.abs(w - jnp.clip(w - gu1, lo_w, hi_w))
            kkt = jnp.maximum(kkt, jnp.maximum(r0, r1))
            n0 = lx0 + l0
            n1 = lx1 + l1
            n2 = lx2 + a02 * l0 + a12 * l1 + l2
            return n0, n1, n2, kkt

        zero = jnp.zeros_like(px0)
        _, agx, agy, _, _, _ = obstacle_terms(X_scr[N, 0], X_scr[N, 1])
        aexN = X_scr[N, 0] - xref_ref[0, N - 1, 0]
        aeyN = X_scr[N, 1] - xref_ref[0, N - 1, 1]
        aethN = wyaw(X_scr[N, 2] - xref_ref[0, N - 1, 2])
        _, _, _, kkt = jax.lax.fori_loop(
            0,
            N,
            adjoint,
            (agx + 2.0 * TW0 * aexN, agy + 2.0 * TW1 * aeyN, 2.0 * TW2 * aethN, zero),
        )

        def emit(k, _):
            u_out[0, k, 0] = U_scr[k, 0]
            u_out[0, k, 1] = U_scr[k, 1]
            x_out[0, k, 0] = X_scr[k, 0]
            x_out[0, k, 1] = X_scr[k, 1]
            x_out[0, k, 2] = X_scr[k, 2]
            return 0

        jax.lax.fori_loop(0, N, emit, 0)
        x_out[0, N, 0] = X_scr[N, 0]
        x_out[0, N, 1] = X_scr[N, 1]
        x_out[0, N, 2] = X_scr[N, 2]
        cost_out[0] = Jtrue
        kkt_out[0] = kkt
        zero_sl = jnp.zeros_like(px0)
        iters_out[0] = zero_sl + cnt_ref[0].astype(jnp.float32)
        lsro_out[0] = zero_sl + cnt_ref[1].astype(jnp.float32)

    tile = tile_s * tile_l

    def solve_bank(thetas, U0s):
        B = jax.tree_util.tree_leaves(thetas)[0].shape[0]
        assert B % tile == 0, f"bank size {B} must be a multiple of {tile}"
        n_tiles = B // tile
        n_obs = thetas["obs_x"].shape[1]

        def pack(leaf):
            moved = jnp.moveaxis(jnp.asarray(leaf, jnp.float32), 0, -1)
            return jnp.moveaxis(
                moved.reshape(moved.shape[:-1] + (n_tiles, tile_s, tile_l)), -3, 0
            )

        x0 = jnp.stack([pack(thetas["x0"][:, i]) for i in range(3)], axis=1)
        xref = pack(thetas["x_ref"])  # (n_tiles, N, 3, S, L)
        uref = pack(thetas["u_ref"])
        tw = thetas.get(
            "terminal_weight", jnp.zeros((thetas["x0"].shape[0], 3), jnp.float32)
        )
        wts = jnp.stack(
            [
                pack(thetas["Q"][:, 0]),
                pack(thetas["Q"][:, 1]),
                pack(thetas["Q"][:, 2]),
                pack(thetas["R"][:, 0]),
                pack(thetas["R"][:, 1]),
                pack(thetas["reverse_factor"]),
                pack(thetas["obstacle_weight"] * thetas["obstacle_gain"]),
                pack(1.0 / (thetas["inflation_radius"] ** 2)),
                pack(tw[:, 0]),
                pack(tw[:, 1]),
                pack(tw[:, 2]),
            ],
            axis=1,
        )
        obs = jnp.stack([pack(thetas["obs_x"]), pack(thetas["obs_y"])], axis=1)
        u0 = pack(U0s)

        grid = (n_tiles,)
        out_shape = (
            jax.ShapeDtypeStruct((n_tiles, N, 2, tile_s, tile_l), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, N + 1, 3, tile_s, tile_l), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_s, tile_l), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_s, tile_l), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_s, tile_l), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_s, tile_l), jnp.float32),
        )
        bspec = lambda *shape: pl.BlockSpec(
            (1,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM
        )
        U_t, X_t, J_t, kkt_t, it_t, ls_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_iters,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((n_iters,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((n_iters,), lambda i: (0,), memory_space=pltpu.SMEM),
                bspec(3, tile_s, tile_l),
                bspec(N, 3, tile_s, tile_l),
                bspec(N, 2, tile_s, tile_l),
                bspec(11, tile_s, tile_l),
                bspec(2, n_obs, tile_s, tile_l),
                bspec(N, 2, tile_s, tile_l),
            ],
            out_specs=(
                bspec(N, 2, tile_s, tile_l),
                bspec(N + 1, 3, tile_s, tile_l),
                bspec(tile_s, tile_l),
                bspec(tile_s, tile_l),
                bspec(tile_s, tile_l),
                bspec(tile_s, tile_l),
            ),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((N + 1, 3, tile_s, tile_l), jnp.float32),
                pltpu.VMEM((N, 2, tile_s, tile_l), jnp.float32),
                pltpu.VMEM((N, 2, tile_s, tile_l), jnp.float32),
                pltpu.VMEM((N, 2, 3, tile_s, tile_l), jnp.float32),
                pltpu.VMEM((N, 2, tile_s, tile_l), jnp.float32),
                pltpu.VMEM((tile_s, tile_l), jnp.float32),
                pltpu.VMEM((tile_s, tile_l), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((2,), jnp.int32),
            ],
            interpret=interpret,
        )(
            jnp.asarray(mus),
            jnp.asarray(stage_idx),
            jnp.asarray(first_idx),
            x0,
            xref,
            uref,
            wts,
            obs,
            u0,
        )

        def unpack(arr):
            moved = jnp.moveaxis(arr, 0, -3)
            flat = moved.reshape(moved.shape[:-3] + (B,))
            return jnp.moveaxis(flat, -1, 0)

        kkt = unpack(kkt_t)
        iters = unpack(it_t).astype(jnp.int32)
        sol = Solution(
            U=unpack(U_t),
            X=unpack(X_t),
            cost=unpack(J_t),
            kkt_residual=kkt,
            converged=kkt < settings.kkt_tol,
            n_iters=iters,
            reg=jnp.zeros((B,)),
        )
        if with_counters:
            return sol, {"iters": iters, "ls_rollouts": unpack(ls_t).astype(jnp.int32)}
        return sol

    return solve_bank
