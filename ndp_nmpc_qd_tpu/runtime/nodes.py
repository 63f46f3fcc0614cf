"""Process-level nodes over the qdio bus: the interactive/hardware-facing
runtime (the reference's L4 node layer).

The benchmark path runs everything in one fused device program
(`sim/closed_loop.py`); THIS layer is the mavros-shaped async boundary for
interactive and hardware-in-the-loop use, mirroring the reference topology
one-to-one:

  ControllerDaemon  <->  ControllerNode (nmpc_node.py): odom in, body-rate
                         command out, PredXU horizon out, TrackTraj
                         goal/feedback/result protocol, hover-throttle
                         estimator gating, hold-point idle behavior.
  PlantDaemon       <->  dop_sim: integrates the quadrotor at a fixed rate,
                         publishes odometry, consumes AttitudeTarget.
  send_trajectory   <->  cmd_pc's action client: publish a TrajCoefficients
                         goal, stream feedback, collect the RMSE result.

Topics per namespace `ns` (shared-memory, latest-value):
  <ns>/odom, <ns>/attitude_target, <ns>/ref_x_u, <ns>/traj_goal,
  <ns>/traj_feedback, <ns>/traj_result, <ns>/formation_ref
"""

from __future__ import annotations

import gc
import threading
import time
from dataclasses import dataclass

import numpy as np

from . import bus as qb

# Interpreter-wide GC policy refcount: gc.disable() is global, so co-hosted
# daemons (threads in one process, as the tests run them) must not re-enable
# collection underneath each other. The first daemon in disables, the last
# one out restores the state observed at first entry.
_GC_LOCK = threading.Lock()
_GC_DEPTH = 0
_GC_WAS_ENABLED = False


def _gc_policy_enter() -> None:
    global _GC_DEPTH, _GC_WAS_ENABLED
    with _GC_LOCK:
        if _GC_DEPTH == 0:
            _GC_WAS_ENABLED = gc.isenabled()
            gc.collect()
            gc.disable()
        _GC_DEPTH += 1


def _gc_policy_exit() -> None:
    global _GC_DEPTH
    with _GC_LOCK:
        _GC_DEPTH -= 1
        if _GC_DEPTH == 0 and _GC_WAS_ENABLED:
            gc.enable()


@dataclass
class NodeTopics:
    ns: str

    def __post_init__(self):
        self.odom = qb.Topic(f"{self.ns}/odom", qb.ODOMETRY)
        self.att = qb.Topic(f"{self.ns}/attitude_target", qb.ATTITUDE_TARGET)
        self.ref_x_u = qb.Topic(f"{self.ns}/ref_x_u", qb.PRED_XU)
        self.viz_pred = qb.Topic(f"{self.ns}/viz_pred", qb.PRED_XU)
        self.goal = qb.Topic(f"{self.ns}/traj_goal", qb.TRAJ_COEFF)
        self.cancel = qb.Topic(f"{self.ns}/traj_cancel", qb.TRAJ_CANCEL)
        self.feedback = qb.Topic(f"{self.ns}/traj_feedback", qb.TRACK_FEEDBACK)
        self.result = qb.Topic(f"{self.ns}/traj_result", qb.TRACK_RESULT)
        self.formation_ref = qb.Topic(f"{self.ns}/formation_ref", qb.POINT)
        self.formation_err = qb.Topic(f"{self.ns}/formation_err", qb.FORM_ERROR)
        self.pose = qb.Topic(f"{self.ns}/pose", qb.POSE)

    @staticmethod
    def unlink(ns: str):
        for t in (
            "odom", "attitude_target", "ref_x_u", "viz_pred", "traj_goal",
            "traj_cancel", "traj_feedback", "traj_result", "formation_ref",
            "formation_err", "pose",
        ):
            qb.Topic.unlink(f"{ns}/{t}")


def _odom_to_x(m) -> np.ndarray:
    return np.concatenate([m["pos"], m["vel"], m["quat"]])


class ControllerDaemon:
    """One quadrotor's NMPC controller over the bus (single scenario).

    run(max_ticks) executes the 50 Hz loop; designed to be started in its
    own process per namespace, like the reference's one-node-per-drone
    launch files.
    """

    def __init__(
        self,
        ns: str,
        cfg=None,
        *,
        leader_ns: str | None = None,
        use_ndp: bool = False,
        companion_ns: str | None = None,
        downwash_params=None,
        pipeline: bool | None = None,
        solver: str | None = None,
    ):
        """`leader_ns` makes this a follower of that namespace's horizon.
        `use_ndp` + `companion_ns` makes this an NDP leader forecasting the
        downwash force from `companion_ns`'s published horizon (the
        `NDPLeaderNode.sub_xf_pred_callback` role,
        `ndp_nmpc_leader_node.py:60-76`).

        `pipeline` enables dispatch-ahead: each tick enqueues its solve and
        publishes the PREVIOUS tick's command instead of blocking on its own
        — one-tick-stale output, the same asynchrony class the reference
        already tolerates between its reference-producer and control-timer
        threads (`nmpc_node.py:160-162`). This hides the host<->device
        round-trip (through the axon tunnel a blocking dispatch alone costs
        ~25 ms > the 20 ms budget; pipelined, ticks complete at the device
        rate). Default: on for accelerator devices, off on CPU (which meets
        the deadline blocking and needn't pay the staleness)."""
        import jax
        import jax.numpy as jnp

        from ..estimators.hover_throttle import (
            hover_throttle_init,
            hover_throttle_update,
            throttle_from_collective,
        )
        from ..params import NdpNmpcConfig
        from ..solver.rti import make_rti_controller
        from ..swarm.formation import rate_converted_alpha
        from ..traj.refgen import gen_fix_pt_ref, nmpc_refs

        self.cfg = cfg or NdpNmpcConfig()
        self.ns = ns
        self.leader_ns = leader_ns
        self.use_ndp = use_ndp
        self.pipeline = (
            jax.default_backend() not in ("cpu",)
            if pipeline is None
            else pipeline
        )
        self.t = NodeTopics(ns)
        self.leader_ref = (
            qb.Topic(f"{leader_ns}/ref_x_u", qb.PRED_XU) if leader_ns else None
        )
        ocp, veh = self.cfg.ocp, self.cfg.vehicle

        # solver backend for the daemon's single-drone program. On
        # accelerator devices the DEPLOYED whole-step kernel (one
        # SUB*128-lane block, mostly padding at B=1) beats the scan program
        # by ~8x device time — measured r5: 0.196 ms vs 1.62 ms per B=1
        # tick, 0.815 ms vs 11.1 ms at B=64 (tools/profile_trace.py
        # `interactive_device_only`) — so `solver=None` auto-selects
        # "packed" there and "scan" on CPU (where Pallas has no compiled
        # path and the scan program already meets the deadline, p99 < 9 ms).
        if solver is None:
            solver = (
                "packed" if jax.default_backend() not in ("cpu",) else "scan"
            )
        self.solver = solver
        if solver == "packed":
            from ..solver.rti import (
                make_batched_rti_controller,
                unpack_iterates,
            )

            bctl = make_batched_rti_controller(
                ocp, veh, with_disturbance=True, qp_iters=3,
                warm_start=True, jac_bf16=True, lqr_start=False,
                whole_ipm=True, packed_state=True, whole_step=True,
            )
            f32 = jnp.float32

            class _UnbatchedPacked:
                """The unbatched make_rti_controller contract over the
                packed whole-step controller (B=1 padded to one block)."""

                @staticmethod
                def reset(xr, ur):
                    return bctl.reset(
                        jnp.asarray(xr, f32)[None], jnp.asarray(ur, f32)[None]
                    )

                @staticmethod
                def update(st, x, xr, ur, f):
                    u0, st, info = bctl.update(
                        st,
                        jnp.asarray(x, f32)[None],
                        jnp.asarray(xr, f32)[None],
                        jnp.asarray(ur, f32)[None],
                        jnp.asarray(f, f32)[None],
                    )
                    return u0[0], st, jax.tree.map(lambda a: a[0], info)

                @staticmethod
                def iterates(st):
                    # on CPU the batched controller's backend="auto" falls
                    # back to the scan path with batch-first layout
                    if getattr(bctl, "layout", "batch") == "kernel":
                        xb, ub = unpack_iterates(st, 1)
                    else:
                        xb, ub = st.x_bar, st.u_bar
                    return xb[0], ub[0]

            self.ctl = _UnbatchedPacked()
        else:
            scan_ctl = make_rti_controller(ocp, veh, with_disturbance=True)

            class _Scan:
                reset = staticmethod(scan_ctl.reset)
                update = staticmethod(scan_ctl.update)

                @staticmethod
                def iterates(st):
                    return st.x_bar, st.u_bar

            self.ctl = _Scan()
        # donate the carried solver state on the packed-kernel path: the
        # whole-step kernel aliases state inputs to outputs (in-place
        # update); donation lets the dispatch reuse the buffers instead of
        # a defensive copy. The scan backend must NOT donate — its reset()
        # state shares the xr/ur buffers also passed as update arguments
        # (donate(a) + a in one call is an XLA error).
        donate = (0,) if getattr(self.ctl, "layout", "batch") == "kernel" else ()
        self._update = jax.jit(self.ctl.update, donate_argnums=donate)
        self._gen_fix = jax.jit(lambda x: gen_fix_pt_ref(x, ocp, veh))
        # ONE reference function for every trajectory: goals are padded to
        # MAX_SEG segments (static shapes), so this compiles once at daemon
        # startup instead of stalling on a per-goal jit — the analog of the
        # reference's prebuilt-solver path (is_build_acados=False,
        # `nmpc_leader_node.py:28`).
        self._refs_jit = jax.jit(lambda tr, tt: nmpc_refs(tr, tt, ocp, veh))
        self._traj_arrays = None
        self._jnp = jnp
        self.goal_to_first_cmd_s = None  # measured per goal (AOT check)
        self._hv_init = lambda: hover_throttle_init(
            self.cfg.estimator, dtype=jnp.float64
        )
        self._hv_update = jax.jit(
            lambda st, vz, th: hover_throttle_update(
                st, vz, th, self.cfg.estimator
            )
        )
        self._throttle = throttle_from_collective
        self._alpha = rate_converted_alpha(0.8, 0.05, ocp.ts_nmpc)

        self.companion_ref = (
            qb.Topic(f"{companion_ns}/ref_x_u", qb.PRED_XU)
            if (use_ndp and companion_ns)
            else None
        )
        if use_ndp:
            from ..models.downwash_mlp import load_npz, predict_downwash

            if downwash_params is None:
                import os as _os

                downwash_params = load_npz(
                    _os.path.join(
                        _os.path.dirname(__file__), "..", "..", "assets",
                        "downwash_analytic_sn4.npz",
                    )
                )
            self._predict = jax.jit(
                lambda other, ego, gate: predict_downwash(
                    downwash_params, other, ego,
                    r_horiz=self.cfg.downwash.r_horiz, ego_gate_pos=gate,
                )
            )

    def _pad_traj(self, traj):
        """Pad a PiecewisePoly to MAX_SEG segments (zero coefficients,
        zero-length tail segments, t_cum repeating the true end time) so the
        startup-compiled reference function serves every goal."""
        import jax.numpy as jnp

        m = traj.t_seg.shape[0]
        pad = qb.MAX_SEG - m
        if pad < 0:
            raise ValueError(f"trajectory has {m} > MAX_SEG segments")
        if pad == 0:
            return traj
        t_all = traj.t_cum[-1]
        return type(traj)(
            coeff_xyz=jnp.pad(traj.coeff_xyz, ((0, pad), (0, 0), (0, 0))),
            coeff_yaw=jnp.pad(traj.coeff_yaw, ((0, pad), (0, 0))),
            t_seg=jnp.pad(traj.t_seg, (0, pad)),
            t_cum=jnp.pad(traj.t_cum, (0, pad), constant_values=t_all),
            final_pt=traj.final_pt,
        )

    def _refs_at(self, tt: float):
        import jax.numpy as jnp

        return self._refs_jit(self._traj_arrays, jnp.asarray(float(tt)))

    def _warmup(self):
        """AOT-compile every jitted function on its static shapes so the
        control loop and goal intake never hit a compile stall (cold Pallas/
        XLA compiles were measured in minutes on TPU — BENCH_r01)."""
        import jax
        import jax.numpy as jnp

        ocp, veh = self.cfg.ocp, self.cfg.vehicle
        N = ocp.N_node
        x = jnp.zeros(10).at[6].set(1.0)
        xr, ur = self._gen_fix(x)
        state = self.ctl.reset(xr, ur)
        f = jnp.zeros((N + 1, 3))
        u0, _, _ = self._update(state, x, xr, ur, f)
        est = self._hv_init()
        est, _ = self._hv_update(est, jnp.asarray(0.0), jnp.asarray(0.5))
        # dummy padded goal -> reference-function compile
        from ..traj.polyopt import fit_waypoints

        import numpy as _np

        wpts = _np.stack([_np.linspace(0, 1, 3), _np.zeros(3), _np.ones(3)], -1)
        dummy = self._pad_traj(fit_waypoints(wpts, _np.full(2, 2.0)))
        saved = self._traj_arrays
        self._traj_arrays = dummy
        xr2, _ = self._refs_at(0.0)
        if self.companion_ref is not None:
            self._predict(jnp.asarray(_np.zeros((N + 1, 10))), xr2, x[0:3])
        self._traj_arrays = saved
        jax.block_until_ready(u0)

    def run(self, max_ticks: int = 0, ready_event=None):
        import jax.numpy as jnp

        ocp, veh = self.cfg.ocp, self.cfg.vehicle
        N = ocp.N_node

        self._warmup()

        # wait for first odometry (the FC-connection gate, nmpc_node.py:77-80)
        while True:
            seq, odom = self.t.odom.read_latest()
            if seq > 0:
                break
            time.sleep(0.05)

        x_now = _odom_to_x(odom)
        xr, ur = self._gen_fix(jnp.asarray(x_now))
        state = self.ctl.reset(xr, ur)
        est = self._hv_init()
        est_active = True
        lpf_off = None

        traj = None
        traj_t0 = 0.0
        goal_id = -1
        goal_seq_seen = self.t.goal.count
        cancel_seq_seen = self.t.cancel.count
        err2 = np.zeros(2)
        n_err = 0
        form_err2 = 0.0
        n_form = 0
        last_thrust = 0.0
        f_dist = jnp.zeros((N + 1, 3))
        inflight = None  # dispatch-ahead pipeline slot: (u0, info) futures

        def publish_result(status: int):
            """TrackTraj result record (status 1 = succeeded, 2 = preempted,
            `action/TrackTraj.action:1-11`) with the RMSE accumulated so far."""
            res = np.zeros((), qb.TRACK_RESULT)
            res["goal_id"] = goal_id
            res["status"] = status
            res["pos_rmse"] = np.sqrt(err2[0] / max(n_err, 1))
            res["yaw_rmse"] = np.sqrt(err2[1] / max(n_err, 1))
            res["t"] = qb.now()
            self.t.result.publish(res)

        # Real-time GC policy: CPython's cyclic collector pauses the loop
        # for multiple ms at unpredictable ticks — observed as p99 deadline
        # outliers in the tick-latency bench. Per-tick garbage here is
        # acyclic (freed immediately by refcounting), so the control loop
        # runs with automatic collection disabled and collects explicitly
        # only while truly idle (hold-position, no active goal, and not a
        # follower — a follower tracks the leader's horizon with traj=None
        # for its whole mission, which is not idle). The reference's rospy
        # loop has the same hazard and merely warns on overrun
        # (`nmpc_node.py:216-220`). Entry/exit is refcounted so co-hosted
        # daemons in one process don't re-enable GC under each other.
        tick = 0
        n_recover = 0
        _gc_policy_enter()
        try:
            rate = qb.Rate(ocp.ts_nmpc)
            if ready_event is not None:
                ready_event.set()
            while max_ticks == 0 or tick < max_ticks:
                tick += 1
                # idle housekeeping (~every 5 s of hold): collect right
                # before the deadline sleep so the sleep slack absorbs the
                # pause instead of the control path paying it
                if (
                    tick % 250 == 0
                    and traj is None
                    and self.leader_ref is None
                ):
                    gc.collect()
                overrun = rate.sleep()

                seq, odom = self.t.odom.read_latest()
                x_now = _odom_to_x(odom)

                # --- preempt check (the actionlib cancel channel; the reference
                # checks is_preempt_requested every loop and publishes
                # set_preempted, `nmpc_node.py:165-168`). On preempt the
                # references stop advancing — the controller converges to the
                # last published horizon, exactly the reference's frozen-ref
                # behavior — and the estimator timer restarts. ---
                if self.t.cancel.count > cancel_seq_seen:
                    cancel_seq_seen = self.t.cancel.count
                    _, cmsg = self.t.cancel.read_latest()
                    cancel_id = int(cmsg["goal_id"])
                    if traj is not None and cancel_id in (-1, goal_id):
                        publish_result(2)
                        traj = None
                        est_active = True

                # --- goal intake (the action server role). A new goal while one
                # is active SUPERSEDES it: the old goal gets a status=2 result
                # (actionlib's preempt-on-new-goal semantics). ---
                if self.t.goal.count > goal_seq_seen:
                    goal_seq_seen = self.t.goal.count
                    _, gmsg = self.t.goal.read_latest()
                    if traj is not None:
                        publish_result(2)
                    traj = qb.msg_to_traj(gmsg)
                    goal_id = int(gmsg["goal_id"])
                    err2[:] = 0.0
                    n_err = 0
                    est_active = False  # estimator frozen while tracking
                    # reset the controller from the new reference (anti warm
                    # start). The per-trajectory reference function was AOT
                    # compiled at daemon startup for the padded MAX_SEG shape, so
                    # no jit stall happens here; the mission clock starts
                    # immediately (the reference's is_build_acados=False prebuilt
                    # path, `nmpc_leader_node.py:28`).
                    goal_rx_t = qb.now()
                    self._traj_arrays = self._pad_traj(traj)
                    xr, ur = self._refs_at(0.0)
                    state = self.ctl.reset(xr, ur)
                    traj_t0 = qb.now()
                    self.goal_to_first_cmd_s = -goal_rx_t  # completed post-publish

                # --- reference selection ---
                if traj is not None:
                    tt = qb.now() - traj_t0
                    t_all = float(traj.t_cum[-1])
                    xr, ur = self._refs_at(tt)
                    if tt >= t_all:  # finished: result + back to hold
                        publish_result(1)
                        traj = None
                        est_active = True
                        gc.collect()  # safe: tracking over, back to hold
                elif self.leader_ref is not None:
                    lseq, lmsg = self.leader_ref.read_latest()
                    fseq, fmsg = self.t.formation_ref.read_latest()
                    off = fmsg["xyz"] if fseq > 0 else np.zeros(3)
                    lpf_off = (
                        off
                        if lpf_off is None
                        else self._alpha * lpf_off + (1 - self._alpha) * off
                    )
                    if lseq > 0:
                        xr = jnp.asarray(lmsg["x"]).at[:, 0:3].add(
                            jnp.asarray(lpf_off)
                        )
                        ur = jnp.asarray(lmsg["u"])
                        # online formation-error feedback: the running RMSE of
                        # actual position vs the offset reference's first node
                        # (`nmpc_follower_node.py:79-94` logs exactly this)
                        fe2 = float(
                            np.sum((lmsg["x"][0, 0:3] + lpf_off - x_now[0:3]) ** 2)
                        )
                        form_err2 += fe2
                        n_form += 1
                        fm = np.zeros((), qb.FORM_ERROR)
                        fm["t"] = qb.now()
                        fm["err2"] = fe2
                        fm["rmse"] = np.sqrt(form_err2 / n_form)
                        fm["n"] = n_form
                        self.t.formation_err.publish(fm)

                # --- NDP disturbance forecast from the companion's horizon ---
                if self.companion_ref is not None:
                    cseq, cmsg = self.companion_ref.read_latest()
                    if cseq > 0:
                        f_dist = self._predict(
                            jnp.asarray(cmsg["x"]), xr, jnp.asarray(x_now[0:3])
                        )
                    else:
                        f_dist = jnp.zeros((N + 1, 3))

                # --- solve + publish ---
                # dispatch is always asynchronous (JAX returns device futures);
                # with pipeline=True we publish the PREVIOUS tick's command and
                # leave this tick's solve in flight — one-tick-stale output, the
                # reference's own asynchrony class (`nmpc_node.py:160-162`) —
                # so the tick never waits a full host<->device round-trip.
                u0_dev, state, info = self._update(
                    state, jnp.asarray(x_now), xr, ur, f_dist
                )
                if self.pipeline:
                    out_dev, out_info = (
                        inflight if inflight is not None else (u0_dev, info)
                    )
                    inflight = (u0_dev, info)
                else:
                    out_dev, out_info = u0_dev, info
                u0 = np.asarray(out_dev)

                # --- health response (the live respawn analog). The
                # reference raises on solver status != 0 and relies on the
                # launch file's respawn="true" to restart the node with a
                # fresh hold-point solver (`nmpc_body_rate_ctl.py:109-110`,
                # `launch/one_qd_nmpc.launch:4`). Here an unhealthy or
                # non-finite solve never reaches the vehicle: publish the
                # hold command (zero rates, hover collective) and re-seed
                # the solver iterates from the current reference — the
                # reset() semantics — so the next tick solves clean. ---
                if not (
                    bool(np.asarray(out_info.ok)) and np.isfinite(u0).all()
                ):
                    n_recover += 1
                    state = self.ctl.reset(xr, ur)
                    inflight = None  # in-flight solve used the poisoned state
                    u0 = np.array([0.0, 0.0, 0.0, veh.gravity])
                k_th = float(np.asarray(est.x[1]))
                thrust = float(
                    self._throttle(jnp.asarray(u0[3]), jnp.asarray(k_th), veh.mass)
                )
                att = np.zeros((), qb.ATTITUDE_TARGET)
                att["t"] = qb.now()
                att["body_rate"] = u0[0:3]
                att["thrust"] = thrust
                att["type_mask"] = 128  # IGNORE_ATTITUDE
                self.t.att.publish(att)
                last_thrust = thrust
                if self.goal_to_first_cmd_s is not None and self.goal_to_first_cmd_s < 0:
                    # first command after a goal: close the latency measurement
                    self.goal_to_first_cmd_s += qb.now()

                pred = np.zeros((), qb.PRED_XU)
                pred["t"] = qb.now()
                pred["x"] = np.asarray(xr)
                pred["u"] = np.asarray(ur)
                self.t.ref_x_u.publish(pred)

                # predicted-horizon viz at ~20 Hz: the solver's internal iterates
                # with normalized quaternions (viz_nmpc_pred_callback,
                # nmpc_node.py:233-249)
                if tick % 3 == 0:
                    viz = np.zeros((), qb.PRED_XU)
                    viz["t"] = qb.now()
                    xb_d, ub_d = self.ctl.iterates(state)
                    xb = np.asarray(xb_d)
                    qn = np.linalg.norm(xb[:, 6:10], axis=-1, keepdims=True)
                    xb = np.concatenate(
                        [xb[:, 0:6], xb[:, 6:10] / np.maximum(qn, 1e-9)], axis=-1
                    )
                    viz["x"] = xb
                    viz["u"] = np.asarray(ub_d)
                    self.t.viz_pred.publish(viz)

                    # pose broadcast: the tf2 TransformBroadcaster role
                    # (`nmpc_node.py` broadcasts the vehicle frame alongside
                    # viz_pred) — the current odom pose for external consumers
                    ps = np.zeros((), qb.POSE)
                    ps["t"] = qb.now()
                    ps["pos"] = x_now[0:3]
                    ps["quat"] = x_now[6:10]
                    self.t.pose.publish(ps)

                # --- estimator tick (gated like the reference timer) ---
                if est_active:
                    est, _ = self._hv_update(
                        est, jnp.asarray(float(x_now[5])), jnp.asarray(last_thrust)
                    )

                # --- tracking error + feedback ---
                if traj is not None:
                    from ..traj.polyopt import eval_traj

                    fo = eval_traj(traj, jnp.asarray(qb.now() - traj_t0))
                    pe = float(np.sum((np.asarray(fo.pos) - x_now[0:3]) ** 2))
                    q = x_now[6:10]
                    yaw_now = np.arctan2(
                        2 * (q[0] * q[3] + q[1] * q[2]),
                        1 - 2 * (q[2] ** 2 + q[3] ** 2),
                    )
                    ye = float(np.degrees(float(fo.yaw) - yaw_now) ** 2)
                    err2 += [pe, ye]
                    n_err += 1
                    fb = np.zeros((), qb.TRACK_FEEDBACK)
                    fb["t"] = qb.now()
                    fb["goal_id"] = goal_id
                    fb["percent_complete"] = min(
                        (qb.now() - traj_t0) / float(traj.t_cum[-1]), 1.0
                    )
                    fb["pos_error"] = pe
                    fb["yaw_error"] = ye
                    self.t.feedback.publish(fb)

        finally:
            _gc_policy_exit()

        return dict(
            ticks=rate.ticks,
            overruns=rate.overruns,
            recoveries=n_recover,
            goal_to_first_cmd_s=self.goal_to_first_cmd_s,
        )


class PlantDaemon:
    """The dop_sim role: integrates one quadrotor, bridges the bus."""

    def __init__(self, ns: str, cfg=None, x0=None):
        from ..params import NdpNmpcConfig

        self.cfg = cfg or NdpNmpcConfig()
        self.ns = ns
        self.t = NodeTopics(ns)
        self.x0 = x0 if x0 is not None else np.array(
            [0, 0, 1, 0, 0, 0, 1, 0, 0, 0], dtype=np.float64
        )

    def run(self, max_ticks: int = 0, rate_hz: float = 200.0, ready_event=None):
        import jax
        import jax.numpy as jnp

        from ..sim.plant import plant_init, plant_step

        veh, sim = self.cfg.vehicle, self.cfg.sim
        dt = 1.0 / rate_hz
        step = jax.jit(
            lambda st, w, th: plant_step(
                st, w, th, jnp.zeros(3), dt, veh, sim
            )
        )
        st = plant_init(jnp.asarray(self.x0), veh)

        rate = qb.Rate(dt)
        if ready_event is not None:
            ready_event.set()
        tick = 0
        hover_th = veh.mass * veh.gravity / sim.k_throttle_true
        while max_ticks == 0 or tick < max_ticks:
            tick += 1
            rate.sleep()
            seq, att = self.t.att.read_latest()
            if seq > 0:
                w = jnp.asarray(att["body_rate"])
                th = jnp.asarray(float(att["thrust"]))
            else:
                w = jnp.zeros(3)
                th = jnp.asarray(hover_th)
            st = step(st, w, th)
            x = np.asarray(st.x)
            m = np.zeros((), qb.ODOMETRY)
            m["t"] = qb.now()
            m["pos"] = x[0:3]
            m["vel"] = x[3:6]
            m["quat"] = x[6:10]
            self.t.odom.publish(m)
        return dict(ticks=rate.ticks, overruns=rate.overruns)


def send_trajectory(
    ns: str,
    traj,
    goal_id: int = 1,
    timeout_s: float = 60.0,
    cancel_after_s: float | None = None,
):
    """cmd_pc action-client role: send a goal, stream feedback, return the
    result record (blocks until the controller reports done or timeout).

    `cancel_after_s` requests preemption that long after the goal is sent
    (the actionlib cancel path) — the returned result then carries status=2.
    """
    topics = NodeTopics(ns)
    topics.goal.publish(qb.traj_to_msg(traj, goal_id))
    t0 = qb.now()
    result_count0 = topics.result.count
    feedback = []
    cancelled = False
    while qb.now() - t0 < timeout_s:
        if (
            cancel_after_s is not None
            and not cancelled
            and qb.now() - t0 >= cancel_after_s
        ):
            cancel_trajectory(ns, goal_id)
            cancelled = True
        if topics.result.count > result_count0:
            _, res = topics.result.read_latest()
            if int(res["goal_id"]) == goal_id:
                return res, feedback
        fseq, fb = topics.feedback.read_latest()
        if fseq > 0 and int(fb["goal_id"]) == goal_id:
            feedback.append(fb.copy())
        time.sleep(0.05)
    raise TimeoutError(f"no result from {ns} within {timeout_s}s")


def cancel_trajectory(ns: str, goal_id: int = -1) -> None:
    """Publish a TrackTraj preempt request (goal_id = -1 cancels whatever
    goal is active) — `set_preempted` semantics, `nmpc_node.py:165-168`."""
    m = np.zeros((), qb.TRAJ_CANCEL)
    m["t"] = qb.now()
    m["goal_id"] = goal_id
    qb.Topic(f"{ns}/traj_cancel", qb.TRAJ_CANCEL).publish(m)
