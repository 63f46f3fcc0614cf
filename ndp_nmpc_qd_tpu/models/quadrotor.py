"""Quadrotor body-rate dynamics: the 10-state model both OCPs share.

State  x = [px, py, pz, vx, vy, vz, qw, qx, qy, qz]
Input  u = [wx, wy, wz, c]   (body rates rad/s, collective acceleration m/s^2)

One parameterized implementation covers both reference models: with
`f_dist = 0` it is the pure-NMPC model (`nmpc_ctl/nmpc_body_rate_ctl.py:147-158`),
with nonzero disturbance force it is the NDP model which adds `f_dist/mass` to
the velocity derivatives (`ndp_nmpc_ctl/ndp_nmpc_body_rate_ctl.py:151-162`).

The quaternion is deliberately NOT normalized inside the dynamics — the
reference's CasADi model integrates the raw kinematics, and matching its
SQP-RTI iterates requires identical drift behavior.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..params import VehicleParams

NX = 10
NU = 4


def body_rate_dynamics(
    x: jnp.ndarray,
    u: jnp.ndarray,
    f_dist: jnp.ndarray | None = None,
    *,
    mass: float = 1.4844,
    gravity: float = 9.81,
) -> jnp.ndarray:
    """Continuous-time xdot; batched over arbitrary leading axes.

    Args:
      x: (..., 10) state.
      u: (..., 4) control.
      f_dist: optional (..., 3) world-frame disturbance force [N].
    """
    vx, vy, vz = x[..., 3], x[..., 4], x[..., 5]
    qw, qx, qy, qz = x[..., 6], x[..., 7], x[..., 8], x[..., 9]
    wx, wy, wz, c = u[..., 0], u[..., 1], u[..., 2], u[..., 3]

    # thrust direction = body z-axis in world frame, scaled by collective accel
    ax = 2.0 * (qx * qz + qw * qy) * c
    ay = 2.0 * (qy * qz - qw * qx) * c
    az = (1.0 - 2.0 * qx**2 - 2.0 * qy**2) * c - gravity

    if f_dist is not None:
        ax = ax + f_dist[..., 0] / mass
        ay = ay + f_dist[..., 1] / mass
        az = az + f_dist[..., 2] / mass

    dq_w = (-wx * qx - wy * qy - wz * qz) * 0.5
    dq_x = (wx * qw + wz * qy - wy * qz) * 0.5
    dq_y = (wy * qw - wz * qx + wx * qz) * 0.5
    dq_z = (wz * qw + wy * qx - wx * qy) * 0.5

    return jnp.stack([vx, vy, vz, ax, ay, az, dq_w, dq_x, dq_y, dq_z], axis=-1)


def make_dynamics(vehicle: VehicleParams):
    """Bind vehicle constants; returns f(x, u, f_dist) -> xdot."""

    def f(x, u, f_dist=None):
        return body_rate_dynamics(
            x, u, f_dist, mass=vehicle.mass, gravity=vehicle.gravity
        )

    return f


def hover_state(pos: jnp.ndarray, yaw_q: jnp.ndarray | None = None) -> jnp.ndarray:
    """Stationary state at `pos` with identity (or given) attitude."""
    pos = jnp.asarray(pos)
    batch = pos.shape[:-1]
    zeros3 = jnp.zeros(batch + (3,), pos.dtype)
    if yaw_q is None:
        q = jnp.broadcast_to(
            jnp.asarray([1.0, 0.0, 0.0, 0.0], pos.dtype), batch + (4,)
        )
    else:
        q = yaw_q
    return jnp.concatenate([pos, zeros3, q], axis=-1)


def hover_input(vehicle: VehicleParams, batch=(), dtype=jnp.float32) -> jnp.ndarray:
    """u that holds hover: zero rates, c = g (collective *acceleration*).

    NOTE a reference quirk: its hold-position reference uses
    u = [0,0,0, mass*gravity] (`pt_pub/pt_publisher.py:51`) — dimensionally a
    force even though the model input c is an acceleration. The trajectory
    path divides collective_force by mass (`pt_publisher.py:143`) so only the
    fix-point path carries the mass factor. `traj.refgen.gen_fix_pt_ref`
    reproduces that quirk for parity; this helper returns the physically
    correct hover acceleration g.
    """
    u = jnp.zeros(batch + (4,), dtype)
    return u.at[..., 3].set(vehicle.gravity)
