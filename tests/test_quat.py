"""Quaternion algebra unit tests (vs scipy.spatial.transform as oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from ndp_nmpc_qd_tpu.ops import quat

# fast tier (VERDICT r4 item 7): this whole file is in the <5 min smoke set
pytestmark = pytest.mark.smoke


def random_unit_quats(rng, n):
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_multiply_matches_scipy(rng):
    q1 = random_unit_quats(rng, 32)
    q2 = random_unit_quats(rng, 32)
    got = np.asarray(quat.multiply(jnp.asarray(q1), jnp.asarray(q2)))
    # scipy uses xyzw ordering
    r = Rotation.from_quat(q1[:, [1, 2, 3, 0]]) * Rotation.from_quat(
        q2[:, [1, 2, 3, 0]]
    )
    want = r.as_quat()[:, [3, 0, 1, 2]]
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * want, atol=1e-12)


def test_rotate_matches_matrix(rng):
    q = random_unit_quats(rng, 32)
    v = rng.standard_normal((32, 3))
    got = np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray(v)))
    want = Rotation.from_quat(q[:, [1, 2, 3, 0]]).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_rotation_matrix_roundtrip(rng):
    q = random_unit_quats(rng, 64)
    q[q[:, 0] < 0] *= -1  # canonical w >= 0
    R = np.asarray(quat.to_rotation_matrix(jnp.asarray(q)))
    want = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R, want, atol=1e-12)

    q_back = np.asarray(quat.from_rotation_matrix(jnp.asarray(R)))
    np.testing.assert_allclose(q_back, q, atol=1e-9)


def test_from_rotation_matrix_degenerate_branches():
    # 180-degree rotations exercise every selection branch
    for axis in ["x", "y", "z"]:
        R = Rotation.from_euler(axis, 180, degrees=True).as_matrix()
        q = np.asarray(quat.from_rotation_matrix(jnp.asarray(R)))
        R_back = np.asarray(quat.to_rotation_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(R_back, R, atol=1e-9)


def test_yaw_matches_euler(rng):
    q = random_unit_quats(rng, 64)
    got = np.asarray(quat.yaw(jnp.asarray(q)))
    want = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_euler("xyz")[:, 2]
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_error_vector_is_relative_rotation_vector_part(rng):
    """qe == vector part of q (x) q_ref^{-1} for unit quaternions."""
    q = random_unit_quats(rng, 32)
    qr = random_unit_quats(rng, 32)
    got = np.asarray(quat.error_vector(jnp.asarray(q), jnp.asarray(qr)))
    rel = np.asarray(
        quat.multiply(jnp.asarray(q), quat.conjugate(jnp.asarray(qr)))
    )
    np.testing.assert_allclose(got, rel[:, 1:], atol=1e-12)


def test_from_yaw():
    yaws = jnp.asarray([0.0, 0.5, -2.0])
    q = quat.from_yaw(yaws)
    np.testing.assert_allclose(np.asarray(quat.yaw(q)), np.asarray(yaws), atol=1e-12)
