"""Hover-throttle Kalman filter: estimates the throttle->collective-force
gain used to convert the NMPC's collective acceleration into a normalized
throttle command.

Pure-function port of the reference's `HoverThrottleEstimator`
(`hv_throttle_est/hover_throttle_estimator.py:15-53`):

  state   x = [f_collect, k_throttle]
  predict Phi = [[0, throttle], [0, 1]]   (f = k * throttle)
  measure z = a_z + g,  H = [1/mass, 0]
  gating  update only while 0.1 < throttle < 1 (jnp.where, not branching)

a_z comes from the Tustin dirty-derivative of v_z (filters.differentiator).
State is a pytree -> scans over time, vmaps over swarms, and runs fused in
the same device program as the controller.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..params import EstimatorParams
from .filters import DifferentiatorState, differentiator_init, differentiator_update


class HoverThrottleState(NamedTuple):
    x: jnp.ndarray  # (..., 2) [f_collect, k_throttle]
    P: jnp.ndarray  # (..., 2, 2)
    diff: DifferentiatorState


def hover_throttle_init(
    ep: EstimatorParams, batch=(), dtype=jnp.float32
) -> HoverThrottleState:
    x = jnp.zeros(batch + (2,), dtype).at[..., 1].set(ep.k_throttle_init)
    P = jnp.broadcast_to(jnp.eye(2, dtype=dtype), batch + (2, 2))
    return HoverThrottleState(x, P, differentiator_init(batch, dtype))


def hover_throttle_update(
    state: HoverThrottleState, vz: jnp.ndarray, throttle: jnp.ndarray, ep: EstimatorParams
):
    """One 50 Hz estimator tick. Returns (new_state, k_throttle)."""
    diff, az = differentiator_update(state.diff, vz, ep.ts_est, ep.diff_tau)

    dtype = state.x.dtype
    z = az + ep.gravity
    zero = jnp.zeros_like(throttle)
    one = jnp.ones_like(throttle)
    Phi = jnp.stack(
        [
            jnp.stack([zero, throttle], axis=-1),
            jnp.stack([zero, one], axis=-1),
        ],
        axis=-2,
    )  # (..., 2, 2)
    H = jnp.asarray([1.0 / ep.mass, 0.0], dtype)
    Q = jnp.diag(jnp.asarray(ep.Q_diag, dtype))
    R = jnp.asarray(ep.R, dtype)

    P_pred = Phi @ state.P @ jnp.swapaxes(Phi, -1, -2) + Q
    S = H @ P_pred @ H + R  # scalar innovation covariance
    K = (P_pred @ H) / S[..., None]  # (..., 2)
    x_pred = (Phi @ state.x[..., None])[..., 0]
    innov = z - x_pred @ H
    x_new = x_pred + K * innov[..., None]
    P_new = (jnp.eye(2, dtype=dtype) - K[..., None] * H) @ P_pred

    # gate: only update while the throttle is meaningfully in range
    gate = (throttle > 0.1) & (throttle < 1.0)
    g1 = gate[..., None]
    g2 = gate[..., None, None]
    x_out = jnp.where(g1, x_new, state.x)
    P_out = jnp.where(g2, P_new, state.P)

    new_state = HoverThrottleState(x_out, P_out, diff)
    return new_state, x_out[..., 1]


def throttle_from_collective(c: jnp.ndarray, k_throttle: jnp.ndarray, mass: float):
    """collective acceleration -> normalized throttle
    (`nmpc_node.py:273-283`): thrust = c * mass / k_throttle."""
    safe_k = jnp.where(k_throttle == 0, 1.0, k_throttle)
    return jnp.where(k_throttle == 0, 0.0, c * mass / safe_k)
