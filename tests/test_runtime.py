"""Native runtime tests: shared-memory bus semantics, seqlock integrity
under concurrent writes, the rate executor, and a live two-thread
plant+controller mission through the full TrackTraj protocol."""

import threading
import time
import uuid

import numpy as np
import pytest

from ndp_nmpc_qd_tpu.runtime import bus as qb

# fast tier (VERDICT r4 item 7): the protocol core carries @pytest.mark.smoke
# per function; the four >20 s daemon-topology tests stay full-suite-only


@pytest.fixture
def ns():
    name = f"test_{uuid.uuid4().hex[:8]}"
    yield name
    from ndp_nmpc_qd_tpu.runtime.nodes import NodeTopics

    NodeTopics.unlink(name)


@pytest.mark.smoke
def test_pub_sub_roundtrip(ns):
    t = qb.Topic(f"{ns}/odom", qb.ODOMETRY)
    seq, _ = t.read_latest()
    assert seq == 0  # nothing yet

    m = np.zeros((), qb.ODOMETRY)
    m["pos"] = [1.0, 2.0, 3.0]
    m["quat"] = [1.0, 0, 0, 0]
    t.publish(m)
    seq, got = t.read_latest()
    assert seq == 1
    np.testing.assert_array_equal(got["pos"], [1.0, 2.0, 3.0])

    # second reader attaches to the same shm
    t2 = qb.Topic(f"{ns}/odom", qb.ODOMETRY)
    seq, got = t2.read_latest()
    assert seq == 1
    np.testing.assert_array_equal(got["pos"], [1.0, 2.0, 3.0])
    t.close()
    t2.close()
    qb.Topic.unlink(f"{ns}/odom")


@pytest.mark.smoke
def test_latest_value_semantics(ns):
    t = qb.Topic(f"{ns}/x", qb.POINT)
    for k in range(20):
        m = np.zeros((), qb.POINT)
        m["xyz"] = [k, 0, 0]
        t.publish(m)
    seq, got = t.read_latest()
    assert seq == 20
    assert got["xyz"][0] == 19.0
    t.close()
    qb.Topic.unlink(f"{ns}/x")


@pytest.mark.smoke
def test_seqlock_no_torn_reads(ns):
    """Hammer a topic from a writer thread; every read must be a consistent
    snapshot (all lanes equal), never a torn mix of two messages."""
    t_w = qb.Topic(f"{ns}/big", qb.PRED_XU)
    t_r = qb.Topic(f"{ns}/big", qb.PRED_XU)
    stop = threading.Event()

    def writer():
        k = 0
        m = np.zeros((), qb.PRED_XU)
        while not stop.is_set():
            k += 1
            m["x"][:] = float(k)
            m["u"][:] = float(k)
            t_w.publish(m)

    th = threading.Thread(target=writer)
    th.start()
    torn = 0
    reads = 0
    t_end = time.time() + 2.0
    while time.time() < t_end:
        seq, got = t_r.read_latest()
        if seq <= 0:
            continue
        reads += 1
        vals = set(np.unique(got["x"])) | set(np.unique(got["u"]))
        if len(vals) != 1:
            torn += 1
    stop.set()
    th.join()
    # enough samples for the integrity claim to be meaningful; the exact
    # read rate is machine-load-dependent (a 2-CPU box under a concurrent
    # full-suite run was measured at ~400 reads/s), so no throughput floor
    # beyond statistical sufficiency
    assert reads > 200, reads
    assert torn == 0, f"{torn}/{reads} torn reads"
    t_w.close()
    t_r.close()
    qb.Topic.unlink(f"{ns}/big")


@pytest.mark.smoke
def test_rate_executor_timing():
    r = qb.Rate(0.005)
    t0 = qb.now()
    for _ in range(40):
        r.sleep()
    elapsed = qb.now() - t0
    # load-independent claims only (VERDICT r4 item 8): the pacing FLOOR
    # (40 x 5 ms must have elapsed — the implementation cannot undersleep)
    # and the tick count. The old < 0.35 ceiling was a box-load assumption:
    # on the shared 2-CPU box a concurrent Mosaic compile can stretch any
    # individual sleep, which is exactly what Rate.overruns records (next
    # test) — not a correctness failure of the executor.
    assert elapsed > 0.18, elapsed
    assert elapsed < 5.0, elapsed  # sanity only: hung-clock guard
    assert r.ticks == 40


@pytest.mark.smoke
def test_rate_overrun_detection():
    r = qb.Rate(0.002)
    r.sleep()
    time.sleep(0.02)  # blow the deadline
    overrun = r.sleep()
    assert overrun > 0.01
    assert r.overruns >= 1


@pytest.mark.smoke
def test_traj_msg_roundtrip():
    from ndp_nmpc_qd_tpu.traj.polyopt import fit_waypoints

    wpts = np.stack([np.linspace(0, 1, 4), np.zeros(4), np.ones(4)], axis=-1)
    traj = fit_waypoints(wpts, np.full(3, 2.0))
    m = qb.traj_to_msg(traj, goal_id=7)
    back = qb.msg_to_traj(m)
    np.testing.assert_allclose(
        np.asarray(back.coeff_xyz), np.asarray(traj.coeff_xyz), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(back.t_cum), np.asarray(traj.t_cum), atol=1e-12
    )


def test_ndp_leader_over_bus(ns):
    """NDP leader daemon consumes a companion's published horizon and keeps
    flying (the NDPLeaderNode role over the shm bus)."""
    from ndp_nmpc_qd_tpu.runtime.nodes import ControllerDaemon, PlantDaemon

    comp_ns = ns + "_comp"
    comp_ref = qb.Topic(f"{comp_ns}/ref_x_u", qb.PRED_XU)
    m = np.zeros((), qb.PRED_XU)
    m["x"][:, 2] = 1.9  # hovering 0.9 m above the plant's start (z = 1)
    m["x"][:, 6] = 1.0
    comp_ref.publish(m)

    plant = PlantDaemon(ns)
    ctl = ControllerDaemon(ns, use_ndp=True, companion_ns=comp_ns)
    pr, cr = threading.Event(), threading.Event()
    # plant outlives the controller's startup warmup (AOT compiles) + mission
    tp = threading.Thread(target=plant.run, kwargs=dict(max_ticks=4000, ready_event=pr))
    tc = threading.Thread(target=ctl.run, kwargs=dict(max_ticks=250, ready_event=cr))
    tp.start()
    pr.wait(10)
    tc.start()
    cr.wait(30)
    tc.join(60)
    tp.join(60)

    # The plant applies NO real coupling, so an ACTIVE forecast makes the
    # controller compensate a phantom downward force — the drone must end
    # visibly ABOVE the 1.0 m setpoint (without the forecast it holds 1.0
    # exactly). The band is wide because under full-suite CPU load the
    # real-time threads get starved and the transient may not have settled.
    _, odom = plant.t.odom.read_latest()
    assert 0.05 < odom["pos"][2] - 1.0 < 1.5, odom["pos"]
    qb.Topic.unlink(f"{comp_ns}/ref_x_u")


@pytest.mark.smoke
def test_live_mission_plant_and_controller(ns):
    """Full runtime slice: plant daemon + controller daemon in threads,
    cmd_pc client sends a trajectory, result reports a small RMSE."""
    from ndp_nmpc_qd_tpu.runtime.nodes import (
        ControllerDaemon,
        PlantDaemon,
        send_trajectory,
    )
    from ndp_nmpc_qd_tpu.traj.polyopt import fit_waypoints

    plant = PlantDaemon(ns)
    ctl = ControllerDaemon(ns)

    plant_ready = threading.Event()
    ctl_ready = threading.Event()
    # plant outlives controller warmup + the ~8 s mission (200 Hz vs 50 Hz)
    t_plant = threading.Thread(
        target=plant.run, kwargs=dict(max_ticks=4400, ready_event=plant_ready)
    )
    t_ctl = threading.Thread(
        target=ctl.run, kwargs=dict(max_ticks=700, ready_event=ctl_ready)
    )
    t_plant.start()
    plant_ready.wait(10)
    t_ctl.start()
    ctl_ready.wait(30)

    wpts = np.stack(
        [[0, 0.5, 1.0, 0.5, 0.0], [0, 0.5, 0, -0.5, 0], np.ones(5)], axis=-1
    )
    traj = fit_waypoints(wpts, np.full(4, 2.0))
    res, feedback = send_trajectory(ns, traj, goal_id=3, timeout_s=30)

    t_ctl.join(30)
    t_plant.join(30)
    assert int(res["status"]) == 1
    assert float(res["pos_rmse"]) < 0.25, float(res["pos_rmse"])
    assert len(feedback) > 3
    # the tf2-role pose broadcast ran alongside viz_pred
    pseq, pose = ctl.t.pose.read_latest()
    assert pseq > 0
    assert np.isfinite(pose["pos"]).all() and np.isfinite(pose["quat"]).all()
    # the real-time GC policy (collector off during the loop) must restore
    # the interpreter-wide state on exit — in-process callers like this test
    # would otherwise silently lose cyclic collection
    import gc

    assert gc.isenabled()


def test_live_mission_pipelined_controller(ns):
    """Dispatch-ahead controller (pipeline=True, the accelerator-device
    default): publishes one-tick-stale commands — the reference's own
    asynchrony class (`nmpc_node.py:160-162`). The mission must still track
    with a small RMSE; the staleness costs at most one 20 ms period of
    reference lag."""
    from ndp_nmpc_qd_tpu.runtime.nodes import (
        ControllerDaemon,
        PlantDaemon,
        send_trajectory,
    )
    from ndp_nmpc_qd_tpu.traj.polyopt import fit_waypoints

    plant = PlantDaemon(ns)
    ctl = ControllerDaemon(ns, pipeline=True)
    assert ctl.pipeline is True

    plant_ready = threading.Event()
    ctl_ready = threading.Event()
    t_plant = threading.Thread(
        target=plant.run, kwargs=dict(max_ticks=4400, ready_event=plant_ready)
    )
    t_ctl = threading.Thread(
        target=ctl.run, kwargs=dict(max_ticks=700, ready_event=ctl_ready)
    )
    t_plant.start()
    plant_ready.wait(10)
    t_ctl.start()
    ctl_ready.wait(30)

    wpts = np.stack(
        [[0, 0.5, 1.0, 0.5, 0.0], [0, 0.5, 0, -0.5, 0], np.ones(5)], axis=-1
    )
    traj = fit_waypoints(wpts, np.full(4, 2.0))
    res, feedback = send_trajectory(ns, traj, goal_id=5, timeout_s=30)

    t_ctl.join(30)
    t_plant.join(30)
    assert int(res["status"]) == 1
    assert float(res["pos_rmse"]) < 0.3, float(res["pos_rmse"])


@pytest.mark.smoke
def test_preempt_mid_flight_then_resume(ns):
    """TrackTraj preemption (`nmpc_node.py:165-168`): cancel a goal
    mid-flight -> status=2 result with partial RMSE; the daemon returns to
    hold and accepts + completes a follow-up goal (status=1). Also checks the
    AOT-compiled goal intake: goal-to-first-command latency far under the
    per-goal jit stall it replaces."""
    from ndp_nmpc_qd_tpu.runtime.nodes import (
        ControllerDaemon,
        PlantDaemon,
        send_trajectory,
    )
    from ndp_nmpc_qd_tpu.traj.polyopt import fit_waypoints

    plant = PlantDaemon(ns)
    ctl = ControllerDaemon(ns)
    pr, cr = threading.Event(), threading.Event()
    t_plant = threading.Thread(
        target=plant.run, kwargs=dict(max_ticks=4400, ready_event=pr)
    )
    t_ctl = threading.Thread(
        target=ctl.run, kwargs=dict(max_ticks=1100, ready_event=cr)
    )
    t_plant.start()
    pr.wait(10)
    t_ctl.start()
    cr.wait(60)

    wpts = np.stack(
        [[0, 0.5, 1.0, 0.5, 0.0], [0, 0.5, 0, -0.5, 0], np.ones(5)], axis=-1
    )
    traj = fit_waypoints(wpts, np.full(4, 2.0))  # 8 s mission
    res, feedback = send_trajectory(
        ns, traj, goal_id=11, timeout_s=30, cancel_after_s=2.0
    )
    assert int(res["status"]) == 2, res  # preempted
    assert len(feedback) >= 1
    assert np.isfinite(res["pos_rmse"])  # partial-RMSE result

    # daemon recovered to hold: a fresh goal completes normally
    short = fit_waypoints(wpts[:3], np.full(2, 2.0))
    res2, _ = send_trajectory(ns, short, goal_id=12, timeout_s=30)
    assert int(res2["status"]) == 1, res2
    assert float(res2["pos_rmse"]) < 0.3

    t_ctl.join(30)
    t_plant.join(30)
    lat = ctl.goal_to_first_cmd_s
    # the claim is "no per-goal COMPILE stall" — a recompile costs seconds
    # (AOT-warmed daemons must not pay it per goal). 2.0 s still separates
    # that failure mode cleanly while tolerating scheduler delay on a
    # loaded 2-CPU box (VERDICT r4 item 8: no box-load-dependent floors)
    assert lat is not None and lat < 2.0, lat


def test_new_goal_supersedes_active(ns):
    """A new goal while one is active preempts it: the OLD goal gets a
    status=2 result before the new goal starts (actionlib semantics)."""
    from ndp_nmpc_qd_tpu.runtime.nodes import ControllerDaemon, PlantDaemon
    from ndp_nmpc_qd_tpu.traj.polyopt import fit_waypoints

    plant = PlantDaemon(ns)
    ctl = ControllerDaemon(ns)
    pr, cr = threading.Event(), threading.Event()
    t_plant = threading.Thread(
        target=plant.run, kwargs=dict(max_ticks=3200, ready_event=pr)
    )
    t_ctl = threading.Thread(
        target=ctl.run, kwargs=dict(max_ticks=800, ready_event=cr)
    )
    t_plant.start()
    pr.wait(10)
    t_ctl.start()
    cr.wait(60)

    wpts = np.stack([[0, 0.5, 1.0], [0, 0.5, 0], np.ones(3)], axis=-1)
    long_traj = fit_waypoints(wpts, np.full(2, 4.0))  # 8 s
    short_traj = fit_waypoints(wpts, np.full(2, 2.0))  # 4 s

    topics = ctl.t
    topics.goal.publish(qb.traj_to_msg(long_traj, goal_id=21))
    time.sleep(1.5)
    topics.goal.publish(qb.traj_to_msg(short_traj, goal_id=22))

    results = {}
    t_end = time.time() + 20
    while time.time() < t_end and len(results) < 2:
        seq, res = topics.result.read_latest()
        if seq > 0:
            results[int(res["goal_id"])] = int(res["status"])
        time.sleep(0.02)
    t_ctl.join(30)
    t_plant.join(30)
    assert results.get(21) == 2, results  # superseded -> preempted
    assert results.get(22) == 1, results  # new goal completed


def test_follower_formation_feedback(ns):
    """A follower publishes its online formation-error RMSE
    (`nmpc_follower_node.py:79-94`) on the formation_err topic."""
    from ndp_nmpc_qd_tpu.runtime.nodes import ControllerDaemon, PlantDaemon

    leader_ns = ns + "_lead"
    # fake leader horizon: hover at (0, 0, 1)
    lead_ref = qb.Topic(f"{leader_ns}/ref_x_u", qb.PRED_XU)
    m = np.zeros((), qb.PRED_XU)
    m["x"][:, 2] = 1.0
    m["x"][:, 6] = 1.0
    lead_ref.publish(m)

    plant = PlantDaemon(ns)
    follower = ControllerDaemon(ns, leader_ns=leader_ns)
    off = np.zeros((), qb.POINT)
    off["xyz"] = [0.0, 1.0, 0.0]
    follower.t.formation_ref.publish(off)

    pr, cr = threading.Event(), threading.Event()
    # plant outlives the follower's startup warmup + 7 s of following
    t_plant = threading.Thread(
        target=plant.run, kwargs=dict(max_ticks=4000, ready_event=pr)
    )
    t_ctl = threading.Thread(
        target=follower.run, kwargs=dict(max_ticks=350, ready_event=cr)
    )
    t_plant.start()
    pr.wait(10)
    t_ctl.start()
    cr.wait(60)
    t_ctl.join(60)
    t_plant.join(60)

    fseq, fm = follower.t.formation_err.read_latest()
    assert fseq > 0, "no formation feedback published"
    assert int(fm["n"]) > 100
    # converged near the offset target: running RMSE dominated by the initial
    # transient but the instantaneous error must have shrunk
    assert float(fm["err2"]) < 0.5, fm
    qb.Topic.unlink(f"{leader_ns}/ref_x_u")


@pytest.mark.smoke
def test_daemon_packed_solver_cpu_fallback(ns):
    """`solver="packed"` (the accelerator daemon default) must construct and
    run on CPU too: the batched controller's backend="auto" falls back to
    the scan layout there, and the viz `iterates` helper must follow the
    actual layout rather than assume kernel-packed (r5 daemon wiring)."""
    import jax

    from ndp_nmpc_qd_tpu.runtime.nodes import ControllerDaemon

    m = np.zeros((), qb.ODOMETRY)
    m["t"] = qb.now()
    m["pos"] = [0.0, 0.0, 1.0]
    m["quat"] = [1.0, 0, 0, 0]
    qb.Topic(f"{ns}/odom", qb.ODOMETRY).publish(m)

    ctl = ControllerDaemon(ns, solver="packed")
    assert ctl.solver == "packed"
    res = ctl.run(max_ticks=13)
    assert res["ticks"] == 13
    # commands stayed finite and the viz path (iterates helper) published
    _, att = ctl.t.att.read_latest()
    assert np.isfinite(att["body_rate"]).all() and np.isfinite(att["thrust"])
    vseq, viz = ctl.t.viz_pred.read_latest()
    assert vseq > 0
    assert np.isfinite(viz["x"]).all()
