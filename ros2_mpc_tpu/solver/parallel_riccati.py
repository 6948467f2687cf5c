"""Horizon-parallel LQR backward pass via ``jax.lax.associative_scan``.

The reference's only "sequence axis" is its N=30 horizon, unrolled as N
symbolic shooting constraints with no way to scale (SURVEY.md §5). The scan
formulation used by the solver engines already handles long horizons in O(N)
sequential steps; this module adds the *temporal parallelization* of the
inner LQR solve — the MPC analogue of sequence parallelism — following the
conditional-value-function element algebra of Särkkä & García-Fernández,
"Temporal Parallelization of Bayesian Smoothers" (IEEE TAC 2021): each stage
becomes an associative element

    e = (A, b, C, eta, J)

combined as

    D     = (I + C_i J_j)^{-1}
    A_ij  = A_j D A_i
    b_ij  = A_j D (b_i + C_i eta_j) + b_j
    C_ij  = A_j D C_i A_j^T + C_j
    eta_ij= A_i^T D^T (eta_j - J_j b_i) + eta_i
    J_ij  = A_i^T D^T J_j A_i + J_i

so a reverse ``associative_scan`` computes every suffix value function
V_k(x) = 1/2 x^T J_k x - eta_k^T x in O(log N) depth. General quadratic
stage costs (cross terms l_ux, control-linear l_u) are reduced to the LQT
form by completing the square in u.

This is the long-horizon capability module: for N in the reference's range
the sequential sweep is faster; past N ~ several hundred on parallel
hardware the log-depth pass wins, and the horizon axis itself becomes
shardable. Correctness is pinned against the sequential recursion in tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LQRProblem(NamedTuple):
    """Time-varying LQR data, stage-major.

    A (N, n, n), B (N, n, m): dynamics dx' = A dx + B du
    lxx (N, n, n), lux (N, m, n), luu (N, m, m): cost Hessian blocks
    lx (N, n), lu (N, m): cost gradients
    P_N (n, n), p_N (n,): terminal value quadratic/linear terms
    """

    A: jnp.ndarray
    B: jnp.ndarray
    lxx: jnp.ndarray
    lux: jnp.ndarray
    luu: jnp.ndarray
    lx: jnp.ndarray
    lu: jnp.ndarray
    P_N: jnp.ndarray
    p_N: jnp.ndarray


class LQRGains(NamedTuple):
    K: jnp.ndarray  # (N, m, n)
    kff: jnp.ndarray  # (N, m)
    P: jnp.ndarray  # (N+1, n, n) value Hessians
    p: jnp.ndarray  # (N+1, n) value gradients


def _gains_from_value(prob: LQRProblem, P_next, p_next):
    """Stage gains given V_{k+1}: the standard Riccati policy extraction."""

    def one(A, B, lux, luu, lu, P1, p1):
        Qu = lu + B.T @ p1
        Quu = luu + B.T @ P1 @ B
        Qux = lux + B.T @ P1 @ A
        sol = jnp.linalg.solve(Quu, jnp.concatenate([Qu[:, None], Qux], axis=1))
        return sol[:, 1:], sol[:, 0]  # K, kff  (du = -K dx - kff)

    return jax.vmap(one)(prob.A, prob.B, prob.lux, prob.luu, prob.lu, P_next, p_next)


def lqr_backward_sequential(prob: LQRProblem) -> LQRGains:
    """Reference O(N) backward recursion (lax.scan)."""

    def body(carry, inp):
        P1, p1 = carry
        A, B, lxx, lux, luu, lx, lu = inp
        Qx = lx + A.T @ p1
        Qu = lu + B.T @ p1
        Qxx = lxx + A.T @ P1 @ A
        Quu = luu + B.T @ P1 @ B
        Qux = lux + B.T @ P1 @ A
        sol = jnp.linalg.solve(Quu, jnp.concatenate([Qu[:, None], Qux], axis=1))
        kff = sol[:, 0]
        K = sol[:, 1:]
        P = Qxx - Qux.T @ K
        p = Qx - Qux.T @ kff
        P = 0.5 * (P + P.T)
        return (P, p), (P, p)

    (P0, p0), (P_tail, p_tail) = jax.lax.scan(
        body,
        (prob.P_N, prob.p_N),
        (prob.A, prob.B, prob.lxx, prob.lux, prob.luu, prob.lx, prob.lu),
        reverse=True,
    )
    P_all = jnp.concatenate([P_tail, prob.P_N[None]], axis=0)
    p_all = jnp.concatenate([p_tail, prob.p_N[None]], axis=0)
    K, kff = _gains_from_value(prob, P_all[1:], p_all[1:])
    return LQRGains(K=K, kff=kff, P=P_all, p=p_all)


def _make_elements(prob: LQRProblem):
    """Stage elements: complete the square in u, map to LQT leaves."""
    n = prob.A.shape[-1]

    def leaf(A, B, lxx, lux, luu, lx, lu):
        Rinv_lux = jnp.linalg.solve(luu, lux)  # (m, n)
        Rinv_lu = jnp.linalg.solve(luu, lu)  # (m,)
        F = A - B @ Rinv_lux
        b = -B @ Rinv_lu
        C = B @ jnp.linalg.solve(luu, B.T)
        J = lxx - lux.T @ Rinv_lux
        eta = -(lx - lux.T @ Rinv_lu)
        return F, b, C, eta, J

    Fs, bs, Cs, etas, Js = jax.vmap(leaf)(
        prob.A, prob.B, prob.lxx, prob.lux, prob.luu, prob.lx, prob.lu
    )
    # terminal element: pure cost, no propagation (A = 0 ends dependencies)
    zero_n = jnp.zeros((1, n, n))
    Fs = jnp.concatenate([Fs, zero_n], axis=0)
    bs = jnp.concatenate([bs, jnp.zeros((1, n))], axis=0)
    Cs = jnp.concatenate([Cs, zero_n], axis=0)
    etas = jnp.concatenate([etas, -prob.p_N[None]], axis=0)
    Js = jnp.concatenate([Js, prob.P_N[None]], axis=0)
    return Fs, bs, Cs, etas, Js


def _combine(left, right):
    """Associative combination; 'left' is earlier in time."""
    A1, b1, C1, eta1, J1 = left
    A2, b2, C2, eta2, J2 = right
    n = A1.shape[-1]
    I = jnp.eye(n, dtype=A1.dtype)
    # batched over leading dims
    IC1J2 = I + C1 @ J2
    D = jnp.linalg.solve(IC1J2, I * jnp.ones_like(IC1J2))  # (..., n, n) = (I + C1 J2)^{-1}
    A2D = A2 @ D
    A = A2D @ A1
    b = (A2D @ (b1 + (C1 @ eta2[..., None])[..., 0])[..., None])[..., 0] + b2
    C = A2D @ C1 @ jnp.swapaxes(A2, -1, -2) + C2
    Dt = jnp.swapaxes(D, -1, -2)
    A1tDt = jnp.swapaxes(A1, -1, -2) @ Dt
    eta = (A1tDt @ (eta2 - (J2 @ b1[..., None])[..., 0])[..., None])[..., 0] + eta1
    J = A1tDt @ J2 @ A1 + J1
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return A, b, C, eta, J


def lqr_backward_parallel(prob: LQRProblem) -> LQRGains:
    """O(log N)-depth backward pass via reverse associative scan."""
    elems = _make_elements(prob)
    # reverse=True is "flip, scan, flip back": the operator's first argument
    # is the accumulation of LATER-time elements, so swap roles to keep
    # _combine's (earlier, later) convention.
    suffix = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True, axis=0
    )
    _, _, _, etas, Js = suffix
    P_all = Js  # (N+1, n, n): V_k Hessian
    p_all = -etas  # (N+1, n): V_k gradient
    K, kff = _gains_from_value(prob, P_all[1:], p_all[1:])
    return LQRGains(K=K, kff=kff, P=P_all, p=p_all)
