"""12-state quadrotor rigid-body model, JAX-native.

Beyond-reference model family #3 (after the bicycle and the smooth-actuation
unicycle): the reference's solver stack is welded to a 3-state unicycle
(ros2_mpc/planner/local_planner_tracking.py:161-178); this framework's
engines are generic over the OCP template, and a 12-state / 4-control
platform is where that generality is non-trivial — the iLQR's exact
quadratization runs on 16x16 stage blocks here, not 5x5.

State (12): position p (world), velocity v (world), attitude as ZYX Euler
angles (roll phi, pitch theta, yaw psi), body angular rate omega.
Controls (4): total thrust T [N] plus body torques tau [N m].

    pdot     = v
    vdot     = (T/m) * R(phi, theta, psi) e3 - g e3
    eulerdot = W(phi, theta) omega
    omegadot = J^-1 (tau - omega x J omega)

with R the body-to-world rotation and W the Euler-rate kinematics matrix.
Hover is the analytic fixed point u = (m g, 0, 0, 0) at any pose with zero
v/omega and level attitude — the equilibrium the unit tests pin. The Euler
parameterization has its singularity at |theta| = pi/2; the hover OCP's
attitude weights keep iterates far from it (aggressive aerobatics would
want a quaternion variant).
"""

from __future__ import annotations

import jax.numpy as jnp

N_STATES = 12
N_CONTROLS = 4
GRAVITY = 9.81


def make_f(
    mass: float = 0.5,
    inertia: tuple = (2.3e-3, 2.3e-3, 4.0e-3),
    g: float = GRAVITY,
):
    """Continuous-time dynamics ``f(x, u) -> xdot`` (diagonal inertia [kg m^2])."""
    Jx, Jy, Jz = inertia

    def f(x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        v = x[..., 3:6]
        phi, th, psi = x[..., 6], x[..., 7], x[..., 8]
        wx, wy, wz = x[..., 9], x[..., 10], x[..., 11]
        T = u[..., 0]
        tx, ty, tz = u[..., 1], u[..., 2], u[..., 3]

        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
        cth, sth = jnp.cos(th), jnp.sin(th)
        cpsi, spsi = jnp.cos(psi), jnp.sin(psi)

        # body z-axis in world frame (third column of R_zyx)
        ez_x = cpsi * sth * cphi + spsi * sphi
        ez_y = spsi * sth * cphi - cpsi * sphi
        ez_z = cth * cphi
        a = T / mass
        vdot = jnp.stack([a * ez_x, a * ez_y, a * ez_z - g], axis=-1)

        # Euler-rate kinematics (ZYX)
        tth = sth / cth
        phidot = wx + sphi * tth * wy + cphi * tth * wz
        thdot = cphi * wy - sphi * wz
        psidot = (sphi * wy + cphi * wz) / cth

        # rigid-body rotation with diagonal inertia
        wxdot = (tx - (Jz - Jy) * wy * wz) / Jx
        wydot = (ty - (Jx - Jz) * wz * wx) / Jy
        wzdot = (tz - (Jy - Jx) * wx * wy) / Jz

        return jnp.concatenate(
            [
                v,
                vdot,
                jnp.stack([phidot, thdot, psidot], axis=-1),
                jnp.stack([wxdot, wydot, wzdot], axis=-1),
            ],
            axis=-1,
        )

    return f


def hover_control(mass: float = 0.5, g: float = GRAVITY) -> jnp.ndarray:
    """The analytic hover input (m g, 0, 0, 0)."""
    return jnp.array([mass * g, 0.0, 0.0, 0.0])
