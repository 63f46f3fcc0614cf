"""Closed-loop mission for the motor-thrust controller.

The reference declares a motor-thrust controller but never implements it
(`nmpc_ctl/nmpc_motor_thrust_ctl.py:11-13` is an empty stub). The solver and
model exist here (`solver/ocp_thrust.py`, `models/quadrotor_thrust.py`); this
module closes the loop so the capability is reachable from a mission
(`python -m ndp_nmpc_qd_tpu one_qd --controller thrust`), not just from unit
tests: a 13-state per-rotor plant (first-order rotor lag, RK4 substeps,
quaternion renorm — the dop_sim role for this actuation mode) driven by the
thrust RTI controller over the same hold-then-track mission phasing as
`closed_loop.make_episode`, reporting the same tracking-RMSE metrics the
reference returns in its TrackTraj result (`nmpc_node.py:186-200`).

No hover-throttle estimator appears in this loop: the controller commands
rotor forces directly, so there is no normalized-throttle gain to identify
(the estimator exists to invert `nmpc_u_2_att_tgt`, `nmpc_node.py:273-283`,
which this actuation path bypasses).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.quadrotor import hover_state
from ..models.quadrotor_thrust import hover_thrust, thrust_dynamics
from ..ops import quat
from ..ops.integrators import rk4_step
from ..params import NdpNmpcConfig
from ..solver.ocp_thrust import (
    ThrustOcpWeights,
    make_thrust_rti_controller,
    thrust_refs_from_bodyrate,
)
from ..traj.polyopt import PiecewisePoly, eval_traj
from ..traj.refgen import nmpc_refs
from .closed_loop import EpisodeMetrics


class ThrustPlantState(NamedTuple):
    x: jnp.ndarray  # (..., 13)
    f_act: jnp.ndarray  # (..., 4) actual rotor thrusts (first-order lag)


class ThrustEpisodeState(NamedTuple):
    plant: ThrustPlantState
    rti: object  # RtiState, (D, ...)
    hold_xr: jnp.ndarray  # (D, N+1, 13)
    hold_ur: jnp.ndarray  # (D, N, 4)
    tick: jnp.ndarray
    n_track: jnp.ndarray
    pos_err2: jnp.ndarray  # (D,)
    yaw_err2: jnp.ndarray  # (D,)
    ok_all: jnp.ndarray  # (D,)


def thrust_plant_step(state, f_cmd, f_ext, dt, veh, sim):
    """Per-rotor plant step: rotor lag + RK4 of the 13-state dynamics."""
    if sim.thrust_tau > 0:
        a = jnp.exp(-dt / sim.thrust_tau)
        f = a * state.f_act + (1 - a) * f_cmd
    else:
        f = f_cmd

    def dyn(x, u):
        return thrust_dynamics(x, u, f_ext, veh=veh)

    substeps = max(1, int(round(dt / sim.ts_sim)))
    x = rk4_step(dyn, state.x, f, dt, substeps)
    x = x.at[..., 6:10].set(quat.normalize(x[..., 6:10]))
    return ThrustPlantState(x=x, f_act=f)


def make_thrust_episode(
    cfg: NdpNmpcConfig,
    traj: PiecewisePoly,
    *,
    n_drones: int = 1,
    tw: ThrustOcpWeights = ThrustOcpWeights(),
    qp_iters: int = 12,
    hold_ticks: int = 0,
):
    """Build (init_fn, step_fn, run_fn); same contract/metrics shape as
    `closed_loop.make_episode` (form_rmse is reported as the tracking error,
    there being no formation here — drones are independent)."""
    ocp, veh = cfg.ocp, cfg.vehicle
    ctl = make_thrust_rti_controller(ocp, veh, tw, qp_iters=qp_iters)
    D, N = n_drones, ocp.N_node
    upd = jax.vmap(ctl.update)

    def init_fn(dtype=jnp.float32) -> ThrustEpisodeState:
        fo0 = eval_traj(traj, jnp.zeros((), dtype))
        x0_10 = hover_state(fo0.pos.astype(dtype))
        x0 = jnp.concatenate([x0_10, jnp.zeros(3, dtype)])
        x0 = jnp.tile(x0, (D, 1))
        f_h = jnp.full((D, 4), hover_thrust(veh), dtype)
        xr0 = jnp.tile(x0[:, None], (1, N + 1, 1))
        ur0 = jnp.tile(f_h[:, None], (1, N, 1))
        return ThrustEpisodeState(
            plant=ThrustPlantState(x=x0, f_act=f_h),
            rti=jax.vmap(ctl.reset)(xr0, ur0),
            hold_xr=xr0,
            hold_ur=ur0,
            tick=jnp.zeros((), jnp.int32),
            n_track=jnp.zeros((), jnp.int32),
            pos_err2=jnp.zeros((D,), dtype),
            yaw_err2=jnp.zeros((D,), dtype),
            ok_all=jnp.ones((D,), bool),
        )

    def step_fn(st: ThrustEpisodeState, _=None):
        dtype = st.plant.x.dtype
        in_hold = st.tick < hold_ticks
        t = (st.tick - hold_ticks).astype(dtype) * ocp.ts_nmpc
        t = jnp.maximum(t, 0.0)

        xr10, ur4 = nmpc_refs(traj, t, ocp, veh)
        xr_T, ur_T = thrust_refs_from_bodyrate(
            xr10.astype(dtype), ur4.astype(dtype), veh
        )
        xr = jnp.where(in_hold, st.hold_xr, xr_T[None])
        ur = jnp.where(in_hold, st.hold_ur, ur_T[None])

        u0, rti, info = upd(st.rti, st.plant.x, xr, ur)
        plant = thrust_plant_step(
            st.plant, u0, jnp.zeros((D, 3), dtype), ocp.ts_nmpc, veh, cfg.sim
        )

        fo_t = eval_traj(traj, t)
        pos_e2 = jnp.sum(
            (fo_t.pos[None].astype(dtype) - st.plant.x[:, 0:3]) ** 2, axis=-1
        )
        yaw_e2 = (
            jnp.degrees(fo_t.yaw.astype(dtype) - quat.yaw(st.plant.x[:, 6:10]))
            ** 2
        )
        track = jnp.logical_not(in_hold)
        new = ThrustEpisodeState(
            plant=plant,
            rti=rti,
            hold_xr=st.hold_xr,
            hold_ur=st.hold_ur,
            tick=st.tick + 1,
            n_track=st.n_track + track.astype(jnp.int32),
            pos_err2=st.pos_err2 + jnp.where(track, pos_e2, 0.0),
            yaw_err2=st.yaw_err2 + jnp.where(track, yaw_e2, 0.0),
            ok_all=st.ok_all & info.ok,
        )
        return new, None

    def run_fn(st: ThrustEpisodeState, n_ticks: int):
        st, _ = jax.lax.scan(step_fn, st, None, length=n_ticks)
        n = jnp.maximum(st.n_track, 1).astype(st.pos_err2.dtype)
        pos_rmse = jnp.sqrt(st.pos_err2 / n)
        metrics = EpisodeMetrics(
            pos_rmse=pos_rmse,
            yaw_rmse_deg=jnp.sqrt(st.yaw_err2 / n),
            form_rmse=pos_rmse,
            ok=st.ok_all,
            recovered=jnp.zeros((), jnp.int32),
        )
        return st, metrics, None

    return init_fn, step_fn, run_fn
