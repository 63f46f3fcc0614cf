"""Live divergence recovery: the respawn analog wired into the REAL paths.

The reference's failure story is crash-and-respawn (`nmpc_body_rate_ctl.py:
109-110` raises on solver status != 0; `launch/one_qd_nmpc.launch:4`
respawn="true" restarts the node, whose __init__ re-seeds from a hold-point
reference). Here the same contract is data:

- fused episode: `make_episode(recover=True)` re-seeds diverged scenarios
  from their reference each tick and flies the hold command for the bad
  tick (chaos test: poison solver iterates mid-mission, assert healthy
  completion with bounded RMSE);
- interactive daemon: on an unhealthy/non-finite solve the published
  command is the hold command and the solver re-seeds (chaos test: NaN
  odometry mid-run).
"""

import threading
import time
import uuid

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
from ndp_nmpc_qd_tpu.runtime import bus as qb
from ndp_nmpc_qd_tpu.sim.closed_loop import make_episode
from ndp_nmpc_qd_tpu.traj.polyopt import fit_waypoints


@pytest.fixture
def ns():
    name = f"test_{uuid.uuid4().hex[:8]}"
    yield name
    from ndp_nmpc_qd_tpu.runtime.nodes import NodeTopics

    NodeTopics.unlink(name)


def _small_traj():
    wpts = np.stack(
        [[0, 0.6, 1.2, 0.6, 0.0], [0, 0.4, 0, -0.4, 0], np.ones(5)], axis=-1
    )
    return fit_waypoints(wpts, np.full(4, 2.0))


def _poison(st, drone):
    return st._replace(
        rti=st.rti._replace(x_bar=st.rti.x_bar.at[drone].set(jnp.nan))
    )


@pytest.mark.smoke
def test_episode_chaos_recovery():
    """Poison one drone's solver iterates mid-mission; with recover=True the
    episode finishes healthy with bounded RMSE and reports the re-seeds."""
    cfg = NdpNmpcConfig()
    traj = _small_traj()
    init_fn, _, run_fn = make_episode(
        cfg, traj, n_drones=3, hold_ticks=20, qp_iters=8, recover=True
    )
    run = jax.jit(run_fn, static_argnums=1)

    st = init_fn(dtype=jnp.float64)
    st, m_pre, _ = run(st, 120)
    assert bool(np.all(np.asarray(m_pre.ok)))
    assert int(m_pre.recovered) == 0

    st = _poison(st, drone=1)
    st, m_post, _ = run(st, 300)
    # healthy completion: every drone ends ok, the poisoned one was re-seeded
    assert bool(np.all(np.asarray(m_post.ok))), np.asarray(m_post.ok)
    assert int(m_post.recovered) >= 1
    assert bool(np.all(np.isfinite(np.asarray(st.plant.x))))
    # bounded RMSE: the hold-tick transient decays; the accumulated tracking
    # error stays in the sub-meter regime of the healthy mission
    assert float(np.max(np.asarray(m_post.pos_rmse))) < 1.0, np.asarray(
        m_post.pos_rmse
    )


@pytest.mark.smoke
def test_episode_chaos_without_recover_stays_dead():
    """Control experiment: the same poison with recover=False leaves the
    scenario unhealthy (the pre-round-4 behavior VERDICT r3 flagged)."""
    cfg = NdpNmpcConfig()
    traj = _small_traj()
    init_fn, _, run_fn = make_episode(
        cfg, traj, n_drones=3, hold_ticks=10, qp_iters=8, recover=False
    )
    run = jax.jit(run_fn, static_argnums=1)
    st = init_fn(dtype=jnp.float64)
    st, _, _ = run(st, 30)
    st = _poison(st, drone=1)
    st, m, _ = run(st, 60)
    ok = np.asarray(m.ok)
    assert not bool(ok[1])  # stays dead
    assert int(m.recovered) == 0


@pytest.mark.smoke
def test_daemon_health_recovery(ns):
    """NaN odometry mid-run: the daemon publishes the hold command (never a
    non-finite one), re-seeds, and resumes healthy when odometry recovers."""
    from ndp_nmpc_qd_tpu.runtime.nodes import ControllerDaemon

    odom_t = qb.Topic(f"{ns}/odom", qb.ODOMETRY)

    def pub_odom(pos, nan=False):
        m = np.zeros((), qb.ODOMETRY)
        m["t"] = qb.now()
        m["pos"] = pos
        m["quat"] = [1.0, 0, 0, 0]
        if nan:
            m["pos"][0] = np.nan
        odom_t.publish(m)

    pub_odom([0.0, 0.0, 1.0])
    ctl = ControllerDaemon(ns)
    ready = threading.Event()
    out = {}

    def run():
        out["res"] = ctl.run(max_ticks=120, ready_event=ready)

    th = threading.Thread(target=run)
    th.start()
    assert ready.wait(60)
    time.sleep(0.6)
    pub_odom([0.0, 0.0, 1.0], nan=True)  # sensor goes bad
    time.sleep(0.6)
    pub_odom([0.0, 0.0, 1.0])  # sensor recovers
    th.join(60)
    assert not th.is_alive()

    res = out["res"]
    assert res["recoveries"] >= 1, res
    # every published command was finite (the hold command covered the
    # poisoned ticks); after recovery the loop kept publishing
    _, att = ctl.t.att.read_latest()
    assert np.isfinite(att["body_rate"]).all() and np.isfinite(att["thrust"])
    assert res["ticks"] == 120


def test_sharded_episode_chaos_recovery():
    """The respawn analog under shard_map (VERDICT r4 item 4): poison one
    scenario's solver iterates on one shard of the virtual 8-device
    (data=2, swarm=4) mesh mid-mission; the sharded episode must finish
    healthy, the psum'd `recovered` counter (parallel/episode.py metric
    spec) must report the re-seed on exactly the poisoned scenario, and
    recovery behavior must equal the unsharded vmap twin."""
    from ndp_nmpc_qd_tpu.parallel.episode import make_sharded_episode
    from ndp_nmpc_qd_tpu.parallel.mesh import make_mesh

    cfg = NdpNmpcConfig()
    traj = _small_traj()
    S, D = 2, 4
    kw = dict(hold_ticks=10, qp_iters=8, recover=True, solver_backend="jax")

    def poison(st):
        # scenario 1, drone 2: one lane of one swarm shard
        return st._replace(
            rti=st.rti._replace(
                x_bar=st.rti.x_bar.at[1, 2].set(jnp.nan)
            )
        )

    # unsharded twin: vmap over scenarios
    init_fn, _, run_fn = make_episode(cfg, traj, n_drones=D, **kw)
    st_r = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (S,) + a.shape),
        init_fn(dtype=jnp.float64),
    )
    run_ref = jax.jit(jax.vmap(lambda s: run_fn(s, 40)[:2]))
    st_r, m_r0 = run_ref(st_r)
    st_r, m_r1 = run_ref(poison(st_r))

    # sharded: same program, same poison, on the virtual mesh
    mesh = make_mesh(8, swarm_axis=4)
    init_s, run_s = make_sharded_episode(
        cfg, traj, mesh, n_drones=D, scenario_batch=S, **kw
    )
    st_s, m_s0, _ = run_s(init_s(dtype=jnp.float64), 40)
    assert bool(np.all(np.asarray(m_s0.ok)))
    assert np.asarray(m_s0.recovered).tolist() == [0, 0]
    st_s, m_s1, _ = run_s(poison(st_s), 40)

    # healthy completion; the re-seed registered on the poisoned scenario
    assert bool(np.all(np.asarray(m_s1.ok))), np.asarray(m_s1.ok)
    rec = np.asarray(m_s1.recovered)
    assert rec[1] >= 1 and rec[0] == 0, rec
    assert bool(np.all(np.isfinite(np.asarray(st_s.plant.x))))
    # sharded == unsharded recovery behavior
    np.testing.assert_array_equal(rec, np.asarray(m_r1.recovered))
    np.testing.assert_array_equal(
        np.asarray(m_s1.ok), np.asarray(m_r1.ok)
    )
    np.testing.assert_allclose(
        np.asarray(m_s1.pos_rmse), np.asarray(m_r1.pos_rmse), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(st_s.plant.x), np.asarray(st_r.plant.x), atol=1e-9
    )


def test_episode_chaos_recovery_packed_state():
    """Same respawn-analog chaos drill on the kernel-layout-resident
    whole-step solver path (packed recovery: `utils.recovery.pack_ok` /
    `recover_rti_packed`), interpret mode."""
    cfg = NdpNmpcConfig()
    traj = _small_traj()
    init_fn, _, run_fn = make_episode(
        cfg, traj, n_drones=3, hold_ticks=2, qp_iters=3, recover=True,
        solver_backend="pallas", solver_interpret=True,
        solver_warm_start=True, solver_lqr_start=False,
        solver_packed_state=True, solver_whole_step=True,
    )
    run = jax.jit(run_fn, static_argnums=1)
    st = init_fn(dtype=jnp.float32)
    st, m0, _ = run(st, 5)
    assert bool(np.all(np.asarray(m0.ok))) and int(m0.recovered) == 0
    # poison drone 1's iterates: lane 1 of block 0 in the packed layout
    st = st._replace(
        rti=st.rti._replace(
            x_bar=st.rti.x_bar.at[:, :, 0, 0, 1].set(jnp.nan)
        )
    )
    st, m1, _ = run(st, 6)
    assert bool(np.all(np.asarray(m1.ok))), np.asarray(m1.ok)
    assert int(m1.recovered) >= 1
    assert bool(np.all(np.isfinite(np.asarray(st.plant.x))))
