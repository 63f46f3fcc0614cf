"""Closed-loop swarm episodes: one jitted scan = controller + estimator +
plant + formation exchange + downwash, end to end on device.

This inverts the reference's process-per-drone architecture
(`launch/three_qd_nmpc_formation.launch`): drones are a batch axis D inside
ONE program. Per 50 Hz control tick (mirroring the dataflow of
`nmpc_node.py:211-231` and the leader/follower callbacks):

1. leader reference from the trajectory at t (or hold-point),
2. follower references = leader's PREVIOUSLY published horizon + low-pass-
   filtered formation offset — the one-tick delay models the pub/sub
   asynchrony the reference relies on (`nmpc_node.py:160-162`),
3. NDP leader's disturbance forecast from the follower's previous horizon
   (gated by r_horiz, `ndp_nmpc_leader_node.py:60-76`),
4. one RTI solve per drone (vmap; the pure controller is the f_dist = 0
   special case so a single program serves both modes),
5. throttle conversion through the estimated gain + hover-throttle KF tick,
6. plant step with ground-truth downwash coupling,
7. RMSE accumulation (tracking: `base_pt_publisher.py:52-79`; formation:
   `nmpc_follower_node.py:79-94`).

The scenario axis (vmapped/pjit-sharded on top of this) is the scale-out
dimension for the benchmark configs.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..estimators.hover_throttle import (
    HoverThrottleState,
    hover_throttle_init,
    hover_throttle_update,
    throttle_from_collective,
)
from ..models.downwash_mlp import MlpParams, predict_downwash
from ..models.quadrotor import hover_state
from ..ops import quat
from ..params import NdpNmpcConfig
from ..solver.rti import RtiState, make_batched_rti_controller
from ..swarm.formation import (
    offset_references,
    rate_converted_alpha,
    reference_formation_offsets,
)
from ..traj.polyopt import PiecewisePoly, eval_traj
from ..traj.refgen import gen_fix_pt_ref, nmpc_refs
from .downwash_truth import downwash_on_locals
from .plant import PlantState, plant_init, plant_step


class EpisodeState(NamedTuple):
    plant: PlantState  # (D, ...) batched
    rti: RtiState  # (D, ...)
    est: HoverThrottleState  # (D,)
    lpf_offset: jnp.ndarray  # (D, 3)
    prev_ref_x: jnp.ndarray  # (D, N+1, 10) last published horizons (PredXU)
    prev_ref_u: jnp.ndarray  # (D, N, 4)
    hold_xr: jnp.ndarray  # (D, N+1, 10) hold-point refs for the calib phase
    hold_ur: jnp.ndarray  # (D, N, 4)
    tick: jnp.ndarray  # scalar int
    n_track: jnp.ndarray  # scalar: ticks spent tracking (metric divisor)
    pos_err2: jnp.ndarray  # (D,) accumulated squared tracking error
    yaw_err2: jnp.ndarray  # (D,)
    form_err2: jnp.ndarray  # (D,) accumulated squared formation error
    ok_all: jnp.ndarray  # (D,) bool


class EpisodeMetrics(NamedTuple):
    pos_rmse: jnp.ndarray  # (D,)
    yaw_rmse_deg: jnp.ndarray  # (D,)
    form_rmse: jnp.ndarray  # (D,)
    ok: jnp.ndarray  # (D,)


def make_episode(
    cfg: NdpNmpcConfig,
    traj: PiecewisePoly,
    *,
    n_drones: int = 1,
    use_ndp: bool = False,
    downwash_params: MlpParams | None = None,
    formation_fn: Callable | None = None,
    true_downwash: bool = False,
    qp_iters: int = 12,
    record_traces: bool = False,
    hold_ticks: int = 0,
    independent: bool = False,
    solver_backend: str = "auto",
    solver_warm_start: bool = False,
    solver_jac_bf16: bool = False,
    solver_lqr_start: bool = True,
    swarm_axis_name: str | None = None,
    swarm_shards: int = 1,
):
    """Build (init_fn, step_fn, run_fn) for a swarm episode.

    Drone 0 is the leader tracking `traj`; drones 1.. follow with filtered
    offsets. `use_ndp` enables the leader's downwash forecast (requires
    `downwash_params`). `true_downwash` turns on plant-side coupling.

    `independent` reproduces the four_qd topology
    (`launch/four_qd_nmpc.launch`): every drone is its own leader tracking a
    spatially offset copy of the trajectory — no horizon exchange, no
    offset filtering, no downwash forecast. `traj` may then also be a
    SEQUENCE of trajectories (one per drone, cycled if shorter), matching
    the reference's per-namespace cmd_pc goals
    (`launch/four_qd_nmpc.launch:1-25`): each drone tracks its own
    trajectory directly, with no spatial offsets.

    `hold_ticks` reproduces the reference's mission phasing: the episode
    starts with a hold-point phase during which the hover-throttle estimator
    runs, then switches to trajectory tracking with the estimator FROZEN
    (`nmpc_node.py:146` shuts the estimator timer down on goal receipt and
    restarts it when tracking finishes, :196). Tracking RMSE accumulates only
    during the tracking phase, like `cum_error` in the action loop.

    `swarm_axis_name` + `swarm_shards` run THIS full episode under
    `shard_map` with the drone axis split over a mesh axis: `step_fn` then
    operates on the local drone block (D/swarm_shards drones) and every
    cross-drone dependency — the leader's state and previously published
    horizon (the PredXU pub/sub hop, `nmpc_node.py:116-133`), the NDP
    companion horizon (`ndp_nmpc_leader_node.py:60-76`), and the plant-side
    wake coupling — goes through an `all_gather` along that axis. With
    `swarm_axis_name=None` (default) the gathers are identity and the
    program is the single-device episode. `init_fn` always builds the
    GLOBAL-drone state; sharding is applied by placement
    (`parallel.episode.make_sharded_episode`).
    """
    ocp, veh, est_p, dw = cfg.ocp, cfg.vehicle, cfg.estimator, cfg.downwash
    multi_traj = not isinstance(traj, PiecewisePoly)
    if multi_traj:
        from ..traj.polyopt import stack_trajs

        assert independent, "per-drone trajectories require independent mode"
        trajs = list(traj)
        traj = stack_trajs(
            [trajs[i % len(trajs)] for i in range(n_drones)]
        )  # leaves (D, ...)
    # batched controller: Pallas packed path once the drone batch is big
    # enough to fill its 1024-lane blocks, scan path otherwise
    if solver_backend == "auto":
        import jax as _jax

        solver_backend = (
            "pallas"
            if n_drones >= 512 and _jax.default_backend() != "cpu"
            else "jax"
        )
    ctl = make_batched_rti_controller(
        ocp, veh, with_disturbance=True, qp_iters=qp_iters,
        backend=solver_backend, warm_start=solver_warm_start,
        jac_bf16=solver_jac_bf16, lqr_start=solver_lqr_start,
    )
    if formation_fn is None:
        formation_fn = partial(reference_formation_offsets, n_drones=n_drones)
    alpha_tick = rate_converted_alpha(0.8, 0.05, ocp.ts_nmpc)
    D, N = n_drones, ocp.N_node
    assert D % swarm_shards == 0, (D, swarm_shards)
    Dl = D // swarm_shards  # local drones per shard (== D unsharded)

    def gall(a):
        """Gather the drone axis across swarm shards (identity unsharded) —
        the collective form of the PredXU topic hop."""
        if swarm_axis_name is None:
            return a
        return jax.lax.all_gather(a, swarm_axis_name, axis=0, tiled=True)

    def global_drone_idx(dtype=jnp.int32):
        """Global drone indices of the local block."""
        if swarm_axis_name is None:
            return jnp.arange(D, dtype=dtype)
        i0 = jax.lax.axis_index(swarm_axis_name) * Dl
        return i0 + jnp.arange(Dl, dtype=dtype)

    def local_slice(a):
        """This shard's drone rows of a global (D, ...) array."""
        if swarm_axis_name is None:
            return a
        i0 = jax.lax.axis_index(swarm_axis_name) * Dl
        return jax.lax.dynamic_slice_in_dim(a, i0, Dl, axis=0)

    def init_fn(dtype=jnp.float32) -> EpisodeState:
        if multi_traj:
            # each drone hovers at its own trajectory's start; no offsets
            fo0 = jax.vmap(lambda tr: eval_traj(tr, jnp.zeros((), dtype)))(traj)
            x0 = jax.vmap(hover_state)(fo0.pos.astype(dtype))
            offsets0 = jnp.zeros((D, 3), dtype)
        else:
            fo0 = eval_traj(traj, jnp.zeros((), dtype))
            leader_x0 = hover_state(fo0.pos.astype(dtype))
            offsets0 = formation_fn(leader_x0)
            x0 = (
                jnp.tile(leader_x0, (D, 1))
                .at[:, 0:3]
                .add(offsets0.astype(dtype))
            )

        xr0, ur0 = jax.vmap(lambda x: gen_fix_pt_ref(x, ocp, veh))(x0)
        rti0 = ctl.reset(xr0, ur0)
        return EpisodeState(
            plant=plant_init(x0, veh),
            rti=rti0,
            est=hover_throttle_init(est_p, batch=(D,), dtype=dtype),
            lpf_offset=offsets0.astype(dtype),
            prev_ref_x=xr0,
            prev_ref_u=ur0,
            hold_xr=xr0,
            hold_ur=ur0,
            tick=jnp.zeros((), jnp.int32),
            n_track=jnp.zeros((), jnp.int32),
            pos_err2=jnp.zeros((D,), dtype),
            yaw_err2=jnp.zeros((D,), dtype),
            form_err2=jnp.zeros((D,), dtype),
            ok_all=jnp.ones((D,), bool),
        )

    def step_fn(st: EpisodeState, _=None):
        dtype = st.plant.x.dtype
        in_hold = st.tick < hold_ticks
        t = (st.tick - hold_ticks).astype(dtype) * ocp.ts_nmpc  # traj clock
        t = jnp.maximum(t, 0.0)
        t_all = (
            jnp.max(traj.t_cum[:, -1]) if multi_traj else traj.t_cum[-1]
        ).astype(dtype)
        finished = jnp.logical_and(jnp.logical_not(in_hold), t >= t_all)

        gidx = global_drone_idx()  # (Dl,) global indices of local drones
        is_leader = gidx == 0
        x_all = gall(st.plant.x)  # (D, 10) every drone's current state

        if multi_traj:
            traj_loc = jax.tree.map(local_slice, traj)  # this shard's trajs
        if not multi_traj:
            # 1. leader reference: hold-point during calibration, else traj
            xr_T, ur_T = nmpc_refs(traj, t, ocp, veh)
            xr_L = jnp.where(in_hold, gall(st.hold_xr)[0], xr_T.astype(dtype))
            ur_L = jnp.where(in_hold, gall(st.hold_ur)[0], ur_T.astype(dtype))

        if multi_traj:
            # four_qd with per-drone goals (`four_qd_nmpc.launch:1-25`):
            # each drone references its OWN trajectory; no offsets
            lpf = st.lpf_offset
            xr_D, ur_D = jax.vmap(lambda tr: nmpc_refs(tr, t, ocp, veh))(
                traj_loc
            )
            xr = jnp.where(in_hold, st.hold_xr, xr_D.astype(dtype))
            ur = jnp.where(in_hold, st.hold_ur, ur_D.astype(dtype))
        elif independent:
            # four_qd: every drone tracks its own offset copy of the
            # trajectory — no exchange, no filtering
            lpf = st.lpf_offset
            xr = jnp.broadcast_to(xr_L[None], (Dl,) + xr_L.shape).at[
                ..., 0:3
            ].add(lpf[:, None, :])
            ur = jnp.broadcast_to(ur_L[None], (Dl,) + ur_L.shape)
        else:
            # 2. follower references from the leader's PREVIOUS horizon
            # (one-tick-delayed PredXU exchange, `nmpc_node.py:160-162`)
            raw_off = local_slice(formation_fn(x_all[0]).astype(dtype))
            lpf = alpha_tick * st.lpf_offset + (1 - alpha_tick) * raw_off
            prev_x_all = gall(st.prev_ref_x)  # (D, N+1, 10)
            prev_u_all = gall(st.prev_ref_u)
            xr_F, ur_F = offset_references(prev_x_all[0], prev_u_all[0], lpf)
            xr = jnp.where(is_leader[:, None, None], xr_L[None], xr_F)
            ur = jnp.where(is_leader[:, None, None], ur_L[None], ur_F)

        # 3. NDP disturbance forecast (leader only, from drone 1's horizon)
        f_dist = jnp.zeros((Dl, N + 1, 3), dtype)
        if use_ndp and D > 1 and not independent:
            f_leader = predict_downwash(
                downwash_params,
                prev_x_all[1],
                xr_L,
                r_horiz=dw.r_horiz,
                ego_gate_pos=x_all[0, 0:3],
            )
            f_dist = jnp.where(
                is_leader[:, None, None], f_leader[None].astype(dtype), f_dist
            )

        # 4. one RTI solve per local drone (batched controller)
        x0 = st.plant.x
        u0, rti, info = ctl.update(st.rti, x0, xr, ur, f_dist)

        # 5. throttle conversion + estimator tick (frozen while tracking,
        #    matching the reference's timer shutdown/restart)
        k_th = st.est.x[..., 1]
        throttle = throttle_from_collective(u0[:, 3], k_th, veh.mass)
        est_new, _ = hover_throttle_update(
            st.est, st.plant.x[:, 5], throttle, est_p
        )
        est_active = jnp.logical_or(in_hold, finished)  # scalar: one mission clock
        est = jax.tree.map(
            lambda new, old: jnp.where(est_active, new, old), est_new, st.est
        )

        # 6. plant step with ground-truth coupling (forces on local drones
        #    from ALL drones' gathered states)
        if true_downwash and D > 1:
            f_ext = downwash_on_locals(st.plant.x, x_all, gidx)
        else:
            f_ext = jnp.zeros((Dl, 3), dtype)
        plant = plant_step(
            st.plant, u0[:, 0:3], throttle, f_ext, ocp.ts_nmpc, veh, cfg.sim
        )

        # 7. metrics: leader vs trajectory, followers vs formation target
        if multi_traj:
            fo_t = jax.vmap(lambda tr: eval_traj(tr, t))(traj_loc)
            pos_tgt = fo_t.pos.astype(dtype)
            yaw_tgt = fo_t.yaw.astype(dtype)
        else:
            fo_t = eval_traj(traj, t)
            pos_tgt = jnp.where(
                is_leader[:, None], fo_t.pos[None].astype(dtype), xr[:, 0, 0:3]
            )
            yaw_tgt = jnp.where(
                is_leader, fo_t.yaw.astype(dtype), quat.yaw(xr[:, 0, 6:10])
            )
        pos_e2 = jnp.sum((pos_tgt - st.plant.x[:, 0:3]) ** 2, axis=-1)
        yaw_now = quat.yaw(st.plant.x[:, 6:10])
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
        out = None
        if record_traces:
            out = (st.plant.x, u0, throttle)
        return new, out

    def run_fn(st: EpisodeState, n_ticks: int):
        st, traces = jax.lax.scan(step_fn, st, None, length=n_ticks)
        n = jnp.maximum(st.n_track, 1).astype(st.pos_err2.dtype)
        metrics = EpisodeMetrics(
            pos_rmse=jnp.sqrt(st.pos_err2 / n),
            yaw_rmse_deg=jnp.sqrt(st.yaw_err2 / n),
            form_rmse=jnp.sqrt(st.form_err2 / n),
            ok=st.ok_all,
        )
        return st, metrics, traces

    return init_fn, step_fn, run_fn
