"""Full-attitude quadrotor model with per-rotor thrust inputs.

The reference declares but never implements a motor-thrust controller
(`nmpc_ctl/nmpc_motor_thrust_ctl.py:11-13` is an empty stub). This module
supplies that capability: a 13-state rigid-body model whose inputs are the
four rotor thrusts, using the vehicle constants the reference already ships
(inertia Jx/Jy/Jz, arm length, 45-degree X frame, rotor thrust/torque
coefficients — `params/fhnp_params.py:9-27`).

State  x = [p(3), v(3), q(4), omega(3)]   (body rates now part of the state)
Input  u = [f1, f2, f3, f4]               rotor thrusts [N]

Rotor layout (X configuration, 45-degree arms, z-up body frame):
  rotor 1: front-right (+x, -y), spins CCW   rotor 2: back-left  (-x, +y), CCW
  rotor 3: front-left  (+x, +y), spins CW    rotor 4: back-right (-x, -y), CW
Yaw drag torque per rotor is (c_q / c_t) * f with sign by spin direction.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..params import VehicleParams

NXT = 13
NUT = 4


def rotor_geometry(veh: VehicleParams):
    """Returns (arm, kappa): moment arm of each rotor about the body axes
    (l_frame * sin(alpha_frame)) and the yaw torque/thrust ratio c_q/c_t."""
    import math

    arm = veh.l_frame * math.sin(veh.alpha_frame)
    kappa = veh.c_q / veh.c_t
    return arm, kappa


def thrust_allocation_matrix(veh: VehicleParams) -> jnp.ndarray:
    """4x4 map [f1..f4] -> [F_total, tau_x, tau_y, tau_z].

    tau = sum r_i x (0,0,f_i): tau_x = sum y_i f_i, tau_y = -sum x_i f_i;
    CCW rotors drag the body clockwise (-z).
    """
    arm, kappa = rotor_geometry(veh)
    # positions: 1 (+x,-y) CCW, 2 (-x,+y) CCW, 3 (+x,+y) CW, 4 (-x,-y) CW
    return jnp.asarray(
        [
            [1.0, 1.0, 1.0, 1.0],
            [-arm, arm, arm, -arm],  # tau_x = sum(y_i f_i)
            [-arm, arm, -arm, arm],  # tau_y = -sum(x_i f_i)
            [-kappa, -kappa, kappa, kappa],
        ]
    )


def thrust_dynamics(
    x: jnp.ndarray,
    u: jnp.ndarray,
    f_dist: jnp.ndarray | None = None,
    *,
    veh: VehicleParams,
) -> jnp.ndarray:
    """Continuous-time xdot for the 13-state model; batched on leading axes."""
    v = x[..., 3:6]
    qw, qx, qy, qz = x[..., 6], x[..., 7], x[..., 8], x[..., 9]
    wx, wy, wz = x[..., 10], x[..., 11], x[..., 12]

    A = thrust_allocation_matrix(veh).astype(x.dtype)
    wrench = jnp.einsum("ij,...j->...i", A, u)
    F = wrench[..., 0]
    tau = wrench[..., 1:4]

    c = F / veh.mass  # collective acceleration
    ax = 2.0 * (qx * qz + qw * qy) * c
    ay = 2.0 * (qy * qz - qw * qx) * c
    az = (1.0 - 2.0 * qx**2 - 2.0 * qy**2) * c - veh.gravity
    if f_dist is not None:
        ax = ax + f_dist[..., 0] / veh.mass
        ay = ay + f_dist[..., 1] / veh.mass
        az = az + f_dist[..., 2] / veh.mass

    dq_w = (-wx * qx - wy * qy - wz * qz) * 0.5
    dq_x = (wx * qw + wz * qy - wy * qz) * 0.5
    dq_y = (wy * qw - wz * qx + wx * qz) * 0.5
    dq_z = (wz * qw + wy * qx - wx * qy) * 0.5

    J = jnp.asarray([veh.Jx, veh.Jy, veh.Jz], x.dtype)
    w = x[..., 10:13]
    Jw = J * w
    gyro = jnp.cross(w, Jw)
    dw = (tau - gyro) / J

    return jnp.concatenate(
        [
            v,
            jnp.stack([ax, ay, az], axis=-1),
            jnp.stack([dq_w, dq_x, dq_y, dq_z], axis=-1),
            dw,
        ],
        axis=-1,
    )


def hover_thrust(veh: VehicleParams) -> float:
    """Per-rotor thrust at hover: m g / 4."""
    return veh.mass * veh.gravity / 4.0


def rotor_thrust_bounds(veh: VehicleParams):
    """(f_min, f_max) per rotor from the propeller model: f = c_t * rpm^2
    (`fhnp_params.py:23-27`, o_min/o_max in kRPM)."""
    f_min = veh.c_t * (veh.o_min * 1000.0) ** 2
    f_max = veh.c_t * (veh.o_max * 1000.0) ** 2
    return float(f_min), float(f_max)
