"""Differential flatness: flat outputs -> full state + input.

Vectorized jnp reimplementation of the reference's `diff_flatness`
(`pt_pub/pt_publisher.py:188-248`): thrust direction from desired
acceleration, body frame from thrust direction + yaw, body rates from the
jerk projection, all batched over arbitrary leading axes and fused into the
control-step graph under jit (the reference runs this serially on host for
each of the 101 long-list points).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import quat
from .polyopt import FlatOutputs


class FullState(NamedTuple):
    """x (…,10) and u (…,4) for the body-rate model (the reference's
    `TrajFullStatePt` packed via `traj_full_pt_2_x_u`,
    `pt_publisher.py:126-149`)."""

    x: jnp.ndarray
    u: jnp.ndarray


def diff_flatness(fo: FlatOutputs, *, mass: float, gravity: float) -> FullState:
    """[pos, vel, acc, jerk, yaw, yaw_dot] -> x=[p,v,q], u=[pqr, c].

    c is the collective ACCELERATION u1/mass (the model input), matching the
    division at `pt_publisher.py:143`.
    """
    acc = fo.acc
    e_z = jnp.zeros_like(acc).at[..., 2].set(gravity)
    t_des = acc + e_z
    t_norm = jnp.linalg.norm(t_des, axis=-1, keepdims=True)
    z_b = t_des / t_norm
    u1 = t_norm[..., 0] * mass  # collective force

    x_c = jnp.stack(
        [jnp.cos(fo.yaw), jnp.sin(fo.yaw), jnp.zeros_like(fo.yaw)], axis=-1
    )
    zx = jnp.cross(z_b, x_c)
    y_b = zx / jnp.linalg.norm(zx, axis=-1, keepdims=True)
    x_b = jnp.cross(y_b, z_b)
    R_wb = jnp.stack([x_b, y_b, z_b], axis=-1)  # columns = body axes

    h_w = (mass / u1[..., None]) * (
        fo.jerk - jnp.sum(z_b * fo.jerk, axis=-1, keepdims=True) * z_b
    )
    p = -jnp.sum(h_w * y_b, axis=-1)
    q = jnp.sum(h_w * x_b, axis=-1)
    r = fo.yaw_dot * z_b[..., 2]

    q_wb = quat.from_rotation_matrix(R_wb)  # w >= 0 (ROS convention)

    x = jnp.concatenate([fo.pos, fo.vel, q_wb], axis=-1)
    u = jnp.stack([p, q, r, u1 / mass], axis=-1)
    return FullState(x, u)
