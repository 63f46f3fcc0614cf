"""In-graph quadrotor plant: the dop_sim role, on device.

Every launch file in the reference pulls in the (external) `dop_sim`
simulator through mavros topics (`launch/one_qd_nmpc.launch:8-11`). Here the
plant is a pure jnp step function fused into the same XLA program as the
controller, so whole benchmark episodes run on the TPU with zero host I/O.

The plant consumes AttitudeTarget-shaped commands — body rates + normalized
throttle (`nmpc_node.py:273-283`) — converts throttle back to collective
force through ITS OWN gain `k_throttle_true` (which the hover-throttle
estimator must discover), optionally applies first-order actuator lags, adds
external forces (downwash coupling), integrates with RK4 substeps, and
re-normalizes the quaternion (physical plant, unlike the solver model).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.quadrotor import body_rate_dynamics
from ..ops import quat
from ..ops.integrators import rk4_step
from ..params import SimParams, VehicleParams


class PlantState(NamedTuple):
    x: jnp.ndarray  # (..., 10)
    w_act: jnp.ndarray  # (..., 3) actual body rates (if rate lag enabled)
    c_act: jnp.ndarray  # (...,) actual collective accel (if thrust lag)


def plant_init(x0: jnp.ndarray, vehicle: VehicleParams) -> PlantState:
    batch = x0.shape[:-1]
    return PlantState(
        x=x0,
        w_act=jnp.zeros(batch + (3,), x0.dtype),
        c_act=jnp.full(batch, vehicle.gravity, x0.dtype),
    )


def plant_step(
    state: PlantState,
    body_rate_cmd: jnp.ndarray,  # (..., 3)
    throttle: jnp.ndarray,  # (...,)
    f_ext: jnp.ndarray,  # (..., 3) world-frame external force [N]
    dt: float,
    vehicle: VehicleParams,
    sim: SimParams,
) -> PlantState:
    """Advance the plant by one control period dt (internally substepped)."""
    c_cmd = throttle * sim.k_throttle_true / vehicle.mass  # accel, inverts nmpc_u_2_att_tgt

    if sim.rate_tau > 0:
        a = jnp.exp(-dt / sim.rate_tau)
        w = a * state.w_act + (1 - a) * body_rate_cmd
    else:
        w = body_rate_cmd
    if sim.thrust_tau > 0:
        a = jnp.exp(-dt / sim.thrust_tau)
        c = a * state.c_act + (1 - a) * c_cmd
    else:
        c = c_cmd

    u = jnp.concatenate([w, c[..., None]], axis=-1)

    def f(x, u):
        return body_rate_dynamics(
            x, u, f_ext, mass=vehicle.mass, gravity=vehicle.gravity
        )

    substeps = max(1, int(round(dt / sim.ts_sim)))
    x = rk4_step(f, state.x, u, dt, substeps)
    x = x.at[..., 6:10].set(quat.normalize(x[..., 6:10]))
    return PlantState(x=x, w_act=w, c_act=c)
