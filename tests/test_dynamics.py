"""Body-rate dynamics + ERK integrator tests: finite-difference Jacobians,
energy-free sanity checks, and disturbance-force parity with the pure model."""

import jax
import jax.numpy as jnp
import numpy as np

from ndp_nmpc_qd_tpu.models.quadrotor import body_rate_dynamics, hover_input, hover_state
from ndp_nmpc_qd_tpu.ops.integrators import linearize, make_discrete_dynamics, rk4_step
from ndp_nmpc_qd_tpu.ops import quat
from ndp_nmpc_qd_tpu.params import VehicleParams
import pytest

# fast tier (VERDICT r4 item 7): this whole file is in the <5 min smoke set
pytestmark = pytest.mark.smoke

VEH = VehicleParams()


def f(x, u, fd=None):
    return body_rate_dynamics(x, u, fd, mass=VEH.mass, gravity=VEH.gravity)


def random_state(rng):
    x = rng.standard_normal(10)
    x[6:10] /= np.linalg.norm(x[6:10])
    return jnp.asarray(x)


def test_hover_is_equilibrium():
    x = hover_state(jnp.asarray([0.0, 0.0, 1.0]))
    u = hover_input(VEH, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(f(x, u)), np.zeros(10), atol=1e-12)


def test_velocity_dynamics_is_rotated_thrust(rng):
    """accel rows must equal R(q) @ [0,0,c] - g e_z for unit quaternions."""
    for _ in range(10):
        x = random_state(rng)
        u = jnp.asarray(rng.standard_normal(4))
        ds = f(x, u)
        Rm = quat.to_rotation_matrix(x[6:10])
        want = Rm @ jnp.asarray([0.0, 0.0, u[3]]) - jnp.asarray([0.0, 0.0, VEH.gravity])
        np.testing.assert_allclose(np.asarray(ds[3:6]), np.asarray(want), atol=1e-12)


def test_quaternion_kinematics_norm_preserving(rng):
    """d/dt ||q||^2 = 2 q . qdot = 0 for the body-rate kinematics."""
    for _ in range(10):
        x = random_state(rng)
        u = jnp.asarray(rng.standard_normal(4))
        ds = f(x, u)
        assert abs(float(jnp.dot(x[6:10], ds[6:10]))) < 1e-12


def test_disturbance_force_additivity(rng):
    x = random_state(rng)
    u = jnp.asarray(rng.standard_normal(4))
    fd = jnp.asarray(rng.standard_normal(3))
    base = f(x, u)
    with_fd = f(x, u, fd)
    delta = np.zeros(10)
    delta[3:6] = np.asarray(fd) / VEH.mass
    np.testing.assert_allclose(np.asarray(with_fd - base), delta, atol=1e-12)


def test_rk4_convergence_order(rng):
    """RK4 local error ~ O(h^5): error ratio ~ 2^4 when halving h via substeps."""
    x = random_state(rng)
    u = jnp.asarray([0.5, -0.3, 0.2, 12.0])
    dt = 0.1
    fine = rk4_step(f, x, u, dt, substeps=64)
    e1 = float(jnp.linalg.norm(rk4_step(f, x, u, dt, 1) - fine))
    e2 = float(jnp.linalg.norm(rk4_step(f, x, u, dt, 2) - fine))
    assert e1 / e2 > 10.0  # 4th order => ~16


def test_linearize_matches_finite_differences(rng):
    phi = make_discrete_dynamics(f, 0.1)
    x = random_state(rng)
    u = jnp.asarray(rng.standard_normal(4))
    x_next, A, B = linearize(phi, x, u)
    eps = 1e-6
    A_fd = np.zeros((10, 10))
    for j in range(10):
        dxj = np.zeros(10)
        dxj[j] = eps
        A_fd[:, j] = np.asarray(
            (phi(x + dxj, u) - phi(x - dxj, u)) / (2 * eps)
        )
    B_fd = np.zeros((10, 4))
    for j in range(4):
        duj = np.zeros(4)
        duj[j] = eps
        B_fd[:, j] = np.asarray((phi(x, u + duj) - phi(x, u - duj)) / (2 * eps))
    np.testing.assert_allclose(np.asarray(A), A_fd, atol=1e-8)
    np.testing.assert_allclose(np.asarray(B), B_fd, atol=1e-8)


def test_dynamics_batched(rng):
    xs = jnp.asarray(rng.standard_normal((7, 10)))
    us = jnp.asarray(rng.standard_normal((7, 4)))
    batched = body_rate_dynamics(xs, us, mass=VEH.mass, gravity=VEH.gravity)
    for i in range(7):
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(f(xs[i], us[i])), atol=1e-12
        )
