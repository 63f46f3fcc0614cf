"""Swarm-scale FORMATION episodes: S independent leader/follower swarms
(each a `three_qd_ndp_nmpc.launch` instance) on one chip, with the controller
fed ONE flattened S*G scenario batch so the packed Pallas IPM keeps its
1024-lane blocks full.

This is the formation/NDP counterpart of the `swarm` config's independent
drones (VERDICT r1 weak item 5): every group runs the full semantics —
one-tick-delayed PredXU exchange from its leader, alpha-filtered formation
offsets, the leader's r_horiz-gated downwash forecast from member 1's
horizon, and within-group plant-side wake coupling. Groups are placed on a
spatial grid (spacing >> the 3 m wake decay) and are exactly independent, so
`tests/test_swarm_scale.py` can assert the grouped program == vmapped
single-swarm episodes.

Semantics mirrored 1:1 from `sim/closed_loop.py` (same reference citations);
the group axis is a reshape, not a new code path, so the solve is one
(S*G)-batch call.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..estimators.hover_throttle import (
    hover_throttle_init,
    hover_throttle_update,
    throttle_from_collective,
)
from ..models.downwash_mlp import MlpParams, predict_downwash
from ..models.quadrotor import hover_state
from ..ops import quat
from ..params import NdpNmpcConfig
from ..solver.rti import make_batched_rti_controller
from ..swarm.formation import (
    offset_references,
    rate_converted_alpha,
    reference_formation_offsets,
)
from ..traj.polyopt import PiecewisePoly, eval_traj
from ..traj.refgen import gen_fix_pt_ref, nmpc_refs
from .closed_loop import EpisodeMetrics, EpisodeState
from .downwash_truth import pairwise_downwash
from .plant import plant_init, plant_step


def grid_placement(n_swarms: int, spacing: float = 12.0) -> np.ndarray:
    """(S, 3) swarm anchor offsets on a square grid, far enough apart that
    wake coupling (decays by ~3 m) and the r_horiz = 1 m NDP gate never
    couple groups."""
    k = int(np.ceil(np.sqrt(n_swarms)))
    s = np.arange(n_swarms)
    return np.stack(
        [spacing * (s % k), spacing * (s // k), np.zeros(n_swarms)], axis=-1
    )


def make_formation_swarm(
    cfg: NdpNmpcConfig,
    traj: PiecewisePoly,
    *,
    n_swarms: int,
    drones_per_swarm: int = 3,
    use_ndp: bool = True,
    downwash_params: MlpParams | None = None,
    true_downwash: bool = True,
    qp_iters: int = 12,
    hold_ticks: int = 0,
    placement: np.ndarray | None = None,
    solver_backend: str = "auto",
    solver_warm_start: bool = False,
):
    """Build (init_fn, step_fn, run_fn); state/metrics carry the flat
    B = n_swarms * drones_per_swarm drone axis (EpisodeState layout)."""
    ocp, veh, est_p, dw = cfg.ocp, cfg.vehicle, cfg.estimator, cfg.downwash
    S, G = n_swarms, drones_per_swarm
    B, N = S * G, ocp.N_node
    if solver_backend == "auto":
        solver_backend = (
            "pallas" if B >= 512 and jax.default_backend() != "cpu" else "jax"
        )
    ctl = make_batched_rti_controller(
        ocp, veh, with_disturbance=True, qp_iters=qp_iters,
        backend=solver_backend, warm_start=solver_warm_start,
    )
    formation_fn = jax.vmap(
        lambda lx: reference_formation_offsets(lx, n_drones=G)
    )
    alpha_tick = rate_converted_alpha(0.8, 0.05, ocp.ts_nmpc)
    if placement is None:
        placement = grid_placement(S)
    member = jnp.tile(jnp.arange(G), S)  # (B,) index within group
    is_leader = member == 0

    def init_fn(dtype=jnp.float32) -> EpisodeState:
        place = jnp.asarray(placement, dtype)  # (S, 3)
        fo0 = eval_traj(traj, jnp.zeros((), dtype))
        lead_x0 = hover_state(
            fo0.pos.astype(dtype)[None] + place
        )  # (S, 10)
        # the reference's x-switching offset rule applies in each swarm's OWN
        # frame (each group is a translated three_qd_ndp instance)
        offsets0 = formation_fn(lead_x0.at[:, 0:3].add(-place))  # (S, G, 3)
        x0 = jnp.repeat(lead_x0, G, axis=0)
        x0 = x0.at[:, 0:3].add(offsets0.reshape(B, 3))
        xr0, ur0 = jax.vmap(lambda x: gen_fix_pt_ref(x, ocp, veh))(x0)
        rti0 = ctl.reset(xr0, ur0)
        return EpisodeState(
            plant=plant_init(x0, veh),
            rti=rti0,
            est=hover_throttle_init(est_p, batch=(B,), dtype=dtype),
            lpf_offset=offsets0.reshape(B, 3),
            prev_ref_x=xr0,
            prev_ref_u=ur0,
            hold_xr=xr0,
            hold_ur=ur0,
            tick=jnp.zeros((), jnp.int32),
            n_track=jnp.zeros((), jnp.int32),
            pos_err2=jnp.zeros((B,), dtype),
            yaw_err2=jnp.zeros((B,), dtype),
            form_err2=jnp.zeros((B,), dtype),
            ok_all=jnp.ones((B,), bool),
        )

    def step_fn(st: EpisodeState, _=None):
        dtype = st.plant.x.dtype
        place = jnp.asarray(placement, dtype)
        in_hold = st.tick < hold_ticks
        t = (st.tick - hold_ticks).astype(dtype) * ocp.ts_nmpc
        t = jnp.maximum(t, 0.0)
        t_all = traj.t_cum[-1].astype(dtype)
        finished = jnp.logical_and(jnp.logical_not(in_hold), t >= t_all)

        x_g = st.plant.x.reshape(S, G, 10)
        lead_x = x_g[:, 0]  # (S, 10)

        # 1. leader references: one trajectory evaluation, offset per swarm
        xr_T, ur_T = nmpc_refs(traj, t, ocp, veh)
        xr_place = jnp.broadcast_to(
            xr_T.astype(dtype)[None], (S, N + 1, 10)
        ).at[..., 0:3].add(place[:, None, :])  # (S, N+1, 10)
        hold_lead = st.hold_xr.reshape(S, G, N + 1, 10)[:, 0]
        xr_L = jnp.where(in_hold, hold_lead, xr_place)
        ur_L = jnp.where(
            in_hold,
            st.hold_ur.reshape(S, G, N, 4)[:, 0],
            jnp.broadcast_to(ur_T.astype(dtype)[None], (S, N, 4)),
        )

        # 2. follower references from each group leader's PREVIOUS horizon
        # (offset rule evaluated in the swarm's own frame, see init_fn)
        raw_off = formation_fn(lead_x.at[:, 0:3].add(-place)).astype(dtype)
        lpf = alpha_tick * st.lpf_offset + (1 - alpha_tick) * raw_off.reshape(B, 3)
        prev_lead_x = st.prev_ref_x.reshape(S, G, N + 1, 10)[:, 0]
        prev_lead_u = st.prev_ref_u.reshape(S, G, N, 4)[:, 0]
        xr_F, ur_F = jax.vmap(offset_references)(
            prev_lead_x, prev_lead_u, lpf.reshape(S, G, 3)
        )  # (S, G, ...)
        xr = jnp.where(
            is_leader[:, None, None],
            jnp.repeat(xr_L, G, axis=0),
            xr_F.reshape(B, N + 1, 10),
        )
        ur = jnp.where(
            is_leader[:, None, None],
            jnp.repeat(ur_L, G, axis=0),
            ur_F.reshape(B, N, 4),
        )

        # 3. per-group NDP forecast: leader from member 1's previous horizon
        f_dist = jnp.zeros((B, N + 1, 3), dtype)
        if use_ndp and G > 1:
            prev_m1 = st.prev_ref_x.reshape(S, G, N + 1, 10)[:, 1]
            f_lead = predict_downwash(
                downwash_params, prev_m1, xr_L,
                r_horiz=dw.r_horiz, ego_gate_pos=lead_x[:, 0:3],
            )  # (S, N+1, 3)
            f_dist = jnp.where(
                is_leader[:, None, None],
                jnp.repeat(f_lead.astype(dtype), G, axis=0),
                f_dist,
            )

        # 4. ONE flattened solve across all swarms (fills the Pallas lanes)
        u0, rti, info = ctl.update(st.rti, st.plant.x, xr, ur, f_dist)

        # 5. throttle + estimator (frozen while tracking)
        k_th = st.est.x[..., 1]
        throttle = throttle_from_collective(u0[:, 3], k_th, veh.mass)
        est_new, _ = hover_throttle_update(
            st.est, st.plant.x[:, 5], throttle, est_p
        )
        est_active = jnp.logical_or(in_hold, finished)
        est = jax.tree.map(
            lambda new, old: jnp.where(est_active, new, old), est_new, st.est
        )

        # 6. plant step with WITHIN-GROUP wake coupling (groups are spaced
        # beyond the wake's reach; block-diagonal coupling keeps the
        # interaction O(S*G^2) instead of O((S*G)^2))
        if true_downwash and G > 1:
            f_ext = pairwise_downwash(x_g).reshape(B, 3)
        else:
            f_ext = jnp.zeros((B, 3), dtype)
        plant = plant_step(
            st.plant, u0[:, 0:3], throttle, f_ext, ocp.ts_nmpc, veh, cfg.sim
        )

        # 7. metrics
        fo_t = eval_traj(traj, t)
        lead_tgt = fo_t.pos.astype(dtype)[None] + place  # (S, 3)
        pos_tgt = jnp.where(
            is_leader[:, None], jnp.repeat(lead_tgt, G, axis=0), xr[:, 0, 0:3]
        )
        pos_e2 = jnp.sum((pos_tgt - st.plant.x[:, 0:3]) ** 2, axis=-1)
        yaw_now = quat.yaw(st.plant.x[:, 6:10])
        yaw_tgt = jnp.where(
            is_leader, fo_t.yaw.astype(dtype), quat.yaw(xr[:, 0, 6:10])
        )
        yaw_e2 = jnp.degrees(yaw_tgt - yaw_now) ** 2
        form_e2 = jnp.sum((xr[:, 0, 0:3] - st.plant.x[:, 0:3]) ** 2, axis=-1)

        track = jnp.logical_not(in_hold)
        new = EpisodeState(
            plant=plant,
            rti=rti,
            est=est,
            lpf_offset=lpf,
            prev_ref_x=xr,
            prev_ref_u=ur,
            hold_xr=st.hold_xr,
            hold_ur=st.hold_ur,
            tick=st.tick + 1,
            n_track=st.n_track + track.astype(jnp.int32),
            pos_err2=st.pos_err2 + jnp.where(track, pos_e2, 0.0),
            yaw_err2=st.yaw_err2 + jnp.where(track, yaw_e2, 0.0),
            form_err2=st.form_err2 + jnp.where(track, form_e2, 0.0),
            ok_all=st.ok_all & info.ok,
        )
        return new, None

    def run_fn(st: EpisodeState, n_ticks: int):
        st, _ = jax.lax.scan(step_fn, st, None, length=n_ticks)
        n = jnp.maximum(st.n_track, 1).astype(st.pos_err2.dtype)
        metrics = EpisodeMetrics(
            pos_rmse=jnp.sqrt(st.pos_err2 / n),
            yaw_rmse_deg=jnp.sqrt(st.yaw_err2 / n),
            form_rmse=jnp.sqrt(st.form_err2 / n),
            ok=st.ok_all,
        )
        return st, metrics, None

    return init_fn, step_fn, run_fn
