"""Quaternion algebra (wxyz convention, batched over leading axes).

The reference manipulates quaternions through CasADi scalar expressions
(`nmpc_ctl/nmpc_body_rate_ctl.py:147-179`) and tf_conversions
(`pt_pub/pt_publisher.py:188-248`). Here everything is vectorized jnp on the
last axis so the same code paths serve single states, horizons, and swarms.

Convention: q = [qw, qx, qy, qz], Hamilton product, world<-body rotation.
"""

from __future__ import annotations

import jax.numpy as jnp


def multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2 on the last axis."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v (world <- body) by unit quaternion q."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix (world <- body)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def from_rotation_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion with qw >= 0.

    Branch-free Shepperd-style reconstruction: compute all four candidate
    quaternions (each numerically stable in a different region) and select the
    one keyed to the largest diagonal combination with jnp.where — no
    data-dependent control flow, so it vectorizes and jits cleanly.

    The reference relies on tf's `quaternion_from_matrix` and then asserts the
    ROS convention w > 0 (`pt_pub/pt_publisher.py:236-244`).
    """
    m00 = R[..., 0, 0]
    m11 = R[..., 1, 1]
    m22 = R[..., 2, 2]
    m01, m02, m10, m12, m20, m21 = (
        R[..., 0, 1], R[..., 0, 2], R[..., 1, 0], R[..., 1, 2], R[..., 2, 0], R[..., 2, 1],
    )

    tr = m00 + m11 + m22
    # four candidates, each scaled by 4*component^2 (always >= 0)
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(a):
        return jnp.sqrt(jnp.maximum(a, 1e-24))

    # candidate built from qw
    sw = safe_sqrt(qw2) * 2.0
    cand_w = jnp.stack([sw / 4.0, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], axis=-1)
    sx = safe_sqrt(qx2) * 2.0
    cand_x = jnp.stack([(m21 - m12) / sx, sx / 4.0, (m01 + m10) / sx, (m02 + m20) / sx], axis=-1)
    sy = safe_sqrt(qy2) * 2.0
    cand_y = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, sy / 4.0, (m12 + m21) / sy], axis=-1)
    sz = safe_sqrt(qz2) * 2.0
    cand_z = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, sz / 4.0], axis=-1)

    vals = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(vals, axis=-1)[..., None]
    q = jnp.where(
        best == 0, cand_w, jnp.where(best == 1, cand_x, jnp.where(best == 2, cand_y, cand_z))
    )
    # ROS convention: qw >= 0 (pt_publisher.py:236)
    q = jnp.where(q[..., :1] < 0, -q, q)
    return normalize(q)


def from_yaw(yaw: jnp.ndarray) -> jnp.ndarray:
    """Yaw-only quaternion (roll = pitch = 0)."""
    half = yaw * 0.5
    z = jnp.zeros_like(yaw)
    return jnp.stack([jnp.cos(half), z, z, jnp.sin(half)], axis=-1)


def yaw(q: jnp.ndarray) -> jnp.ndarray:
    """Extract ZYX-euler yaw angle from a quaternion.

    Matches `tf_conversions.transformations.euler_from_quaternion(...)[2]` as
    used at `pt_pub/base_pt_publisher.py:66-68`.
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def error_vector(q: jnp.ndarray, q_ref: jnp.ndarray) -> jnp.ndarray:
    """The reference's nonlinear quaternion tracking error [qe_x, qe_y, qe_z].

    Exactly the CasADi expressions at `nmpc_ctl/nmpc_body_rate_ctl.py:164-166`:
        qe_x = qwr*qx - qw*qxr + qyr*qz - qy*qzr
        qe_y = qwr*qy - qw*qyr - qxr*qz + qx*qzr
        qe_z = qxr*qy - qx*qyr + qwr*qz - qw*qzr
    (the vector part of q ⊗ q_ref^{-1} for unit quaternions).
    """
    qw, qx, qy, qz = jnp.moveaxis(q, -1, 0)
    qwr, qxr, qyr, qzr = jnp.moveaxis(q_ref, -1, 0)
    return jnp.stack(
        [
            qwr * qx - qw * qxr + qyr * qz - qy * qzr,
            qwr * qy - qw * qyr - qxr * qz + qx * qzr,
            qxr * qy - qx * qyr + qwr * qz - qw * qzr,
        ],
        axis=-1,
    )
