"""Estimator tests: KF convergence to the true throttle gain, gating,
filter behavior, and a golden comparison against a straight numpy port of
the reference's update equations."""

import jax
import jax.numpy as jnp
import numpy as np

from ndp_nmpc_qd_tpu.estimators.filters import (
    alpha_filter_init,
    alpha_filter_update,
    differentiator_init,
    differentiator_update,
)
from ndp_nmpc_qd_tpu.estimators.hover_throttle import (
    hover_throttle_init,
    hover_throttle_update,
    throttle_from_collective,
)
from ndp_nmpc_qd_tpu.params import EstimatorParams
import pytest

# fast tier (VERDICT r4 item 7): this whole file is in the <5 min smoke set
pytestmark = pytest.mark.smoke

EP = EstimatorParams()


def numpy_reference_kf(vz_seq, throttle_seq):
    """Literal numpy port of HoverThrottleEstimator.update
    (`hover_throttle_estimator.py:37-52`) + Differentiator
    (`differentiator.py:14-23`) for golden comparison."""
    tau, ts = 0.05, EP.ts_est
    a1 = (2 * tau - ts) / (2 * tau + ts)
    a2 = 2 / (2 * tau + ts)
    x_d1, xd_d1 = 0.0, 0.0

    x = np.array([[0.0], [EP.k_throttle_init]])
    P = np.eye(2)
    H = np.array([[1 / EP.mass, 0.0]])
    Q = np.diag(EP.Q_diag)
    R = EP.R
    ks = []
    for vz, th in zip(vz_seq, throttle_seq):
        az = a1 * xd_d1 + a2 * (vz - x_d1)
        x_d1, xd_d1 = vz, az
        if 0.1 < th < 1:
            Phi = np.array([[0.0, th], [0.0, 1.0]])
            z = az + EP.gravity
            P = Phi @ P @ Phi.T + Q
            K = P @ H.T @ np.linalg.inv(H @ P @ H.T + R)
            x = Phi @ x
            x = x + K @ (z - H @ x)
            P = (np.eye(2) - K @ H) @ P
        ks.append(x[1, 0])
    return np.array(ks)


def test_kf_matches_numpy_reference(rng):
    n = 300
    vz = 0.3 * np.sin(0.1 * np.arange(n)) + 0.01 * rng.standard_normal(n)
    th = 0.28 + 0.02 * np.sin(0.05 * np.arange(n))
    th[50:60] = 0.05  # gated out
    th[100:105] = 1.5  # gated out

    want = numpy_reference_kf(vz, th)

    st = hover_throttle_init(EP, dtype=jnp.float64)

    def step(st, inp):
        st, k = hover_throttle_update(st, inp[0], inp[1], EP)
        return st, k

    _, got = jax.lax.scan(step, st, jnp.stack([jnp.asarray(vz), jnp.asarray(th)], axis=-1))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)


def test_kf_converges_to_true_gain(rng):
    """Simulate hover: a_z ~ 0, so z = g = k_true * throttle / mass."""
    k_true = 42.0
    n = 2000
    th = np.clip(EP.mass * EP.gravity / k_true + 0.002 * rng.standard_normal(n), 0.11, 0.99)
    # measured accel consistent with the model: az = k*th/m - g; vz integrates it
    az = k_true * th / EP.mass - EP.gravity
    vz = np.concatenate([[0.0], np.cumsum(az) * EP.ts_est])[:-1]

    st = hover_throttle_init(EP, dtype=jnp.float64)

    def step(st, inp):
        st, k = hover_throttle_update(st, inp[0], inp[1], EP)
        return st, k

    _, ks = jax.lax.scan(step, st, jnp.stack([jnp.asarray(vz), jnp.asarray(th)], axis=-1))
    assert abs(float(ks[-1]) - k_true) < 1.0, float(ks[-1])


def test_kf_batched(rng):
    st = hover_throttle_init(EP, batch=(3,), dtype=jnp.float64)
    vz = jnp.asarray(rng.standard_normal(3) * 0.1)
    th = jnp.asarray([0.3, 0.05, 0.5])  # middle one gated
    st2, k = hover_throttle_update(st, vz, th, EP)
    assert k.shape == (3,)
    assert float(k[1]) == EP.k_throttle_init  # gated: unchanged


def test_throttle_conversion():
    assert float(throttle_from_collective(jnp.asarray(9.81), jnp.asarray(50.0), EP.mass)) > 0
    assert float(throttle_from_collective(jnp.asarray(9.81), jnp.asarray(0.0), EP.mass)) == 0.0


def test_alpha_filter():
    st = alpha_filter_init(1.0)
    st, y = alpha_filter_update(st, 0.0, alpha=0.8)
    np.testing.assert_allclose(float(y), 0.8)
    for _ in range(100):
        st, y = alpha_filter_update(st, 0.0, alpha=0.8)
    assert abs(float(y)) < 1e-9


def test_differentiator_tracks_slope():
    st = differentiator_init((), jnp.float64)
    ts = 0.02
    for k in range(200):
        st, xd = differentiator_update(st, 3.0 * k * ts, ts)
    np.testing.assert_allclose(float(xd), 3.0, atol=1e-6)
