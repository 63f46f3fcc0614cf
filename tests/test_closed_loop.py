"""End-to-end closed-loop episodes: the in-framework analog of running the
reference's launch configs against dop_sim and checking tracking RMSE.

Acceptance mirrors BASELINE.json configs:
- config 1: single-drone hover/setpoint (hold-point reference)
- config 2: single-drone figure-eight with the hover-throttle estimator in
  the loop (plant gain != estimator init)
- config 3: three-drone formation
- config 4: three-drone NDP with plant-side downwash coupling
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndp_nmpc_qd_tpu.models.downwash_mlp import load_npz
from ndp_nmpc_qd_tpu.params import NdpNmpcConfig, SimParams
from ndp_nmpc_qd_tpu.sim.closed_loop import make_episode
from ndp_nmpc_qd_tpu.traj.polyopt import fit_waypoints

import os

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")
# net trained (tools/train_downwash.py) on the in-graph plant's analytic
# ground truth — the self-consistent NDP pair (predictor approximates the
# plant's coupling, as the reference's net approximates dop_sim's)
ASSET = os.path.join(ASSET_DIR, "downwash_analytic_sn4.npz")


def eight_traj():
    t = np.linspace(0, 2 * np.pi, 9)
    wpts = np.stack(
        [2.0 * np.sin(t), 1.0 * np.sin(2 * t), 1.0 + 0.3 * np.sin(t)], axis=-1
    )
    return fit_waypoints(wpts, np.full(8, 2.0), 0.2 * np.sin(t))


@pytest.fixture(scope="module")
def cfg():
    # plant throttle gain deliberately off the estimator init (50.0)
    return NdpNmpcConfig(sim=SimParams(k_throttle_true=46.0))


def test_single_drone_figure_eight(cfg):
    """Config 2: hold-and-calibrate (estimator active), then track the eight
    with the estimator frozen — the reference's mission phasing."""
    traj = eight_traj()
    init_fn, _, run_fn = make_episode(cfg, traj, n_drones=1, hold_ticks=200)
    st = init_fn(dtype=jnp.float64)
    run = jax.jit(lambda s: run_fn(s, 1000))  # 4 s hold + 16 s tracking
    st, m, _ = run(st)
    assert bool(m.ok[0])
    assert float(m.pos_rmse[0]) < 0.08, float(m.pos_rmse[0])
    assert float(m.yaw_rmse_deg[0]) < 5.0, float(m.yaw_rmse_deg[0])
    # estimator must have found the plant's true gain during the hold phase
    assert abs(float(st.est.x[0, 1]) - 46.0) < 2.0, float(st.est.x[0, 1])


def test_three_drone_formation(cfg):
    traj = eight_traj()

    def const_formation(leader_x):
        return jnp.asarray(
            [[0.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, -1.0, 0.0]], leader_x.dtype
        )

    init_fn, _, run_fn = make_episode(
        cfg, traj, n_drones=3, formation_fn=const_formation, hold_ticks=200
    )
    st = init_fn(dtype=jnp.float64)
    st, m, _ = jax.jit(lambda s: run_fn(s, 800))(st)
    assert bool(jnp.all(m.ok))
    assert float(m.pos_rmse[0]) < 0.08
    # followers track their offset horizons
    assert float(jnp.max(m.form_rmse[1:])) < 0.15, np.asarray(m.form_rmse)


def test_three_drone_reference_switching_formation(cfg):
    """The reference's position-switched offsets (`nmpc_leader_node.py:37-46`)
    introduce ~1 m target jumps; the episode must stay healthy through the
    transients (the RMSE includes them by design)."""
    traj = eight_traj()
    init_fn, _, run_fn = make_episode(cfg, traj, n_drones=3, hold_ticks=200)
    st = init_fn(dtype=jnp.float64)
    st, m, _ = jax.jit(lambda s: run_fn(s, 800))(st)
    assert bool(jnp.all(m.ok))
    assert float(m.pos_rmse[0]) < 0.08
    assert float(jnp.max(m.form_rmse[1:])) < 0.6  # includes switch transients


def test_three_drone_ndp_beats_plain_under_downwash():
    """With plant-side downwash coupling on, the NDP leader (downwash
    forecast in the dynamics) must track clearly better than the plain
    leader — the paper's core claim, in-graph.

    The throttle gain prior is exact here (k_true = estimator init) and the
    estimator stays frozen during tracking, isolating the downwash effect —
    otherwise the KF silently absorbs the coupling force into the gain and
    NDP double-compensates (the reason the reference freezes it,
    `nmpc_node.py:146`)."""
    cfg = NdpNmpcConfig(sim=SimParams(k_throttle_true=50.0))
    traj = eight_traj()
    params = load_npz(ASSET, dtype=jnp.float64)

    # follower 1 flies directly ABOVE the leader to maximize coupling
    def stacked_formation(leader_x):
        return jnp.asarray(
            [[0.0, 0.0, 0.0], [0.0, 0.0, 0.9], [0.0, -1.5, 0.0]],
            leader_x.dtype,
        )

    results = {}
    for use_ndp in (False, True):
        init_fn, _, run_fn = make_episode(
            cfg, traj, n_drones=3, use_ndp=use_ndp,
            downwash_params=params, formation_fn=stacked_formation,
            true_downwash=True,
        )
        st = init_fn(dtype=jnp.float64)
        st, m, _ = jax.jit(lambda s: run_fn(s, 500))(st)
        results[use_ndp] = float(m.pos_rmse[0])
        assert bool(jnp.all(m.ok))
    # downwash compensation must clearly improve leader tracking
    assert results[True] < 0.5 * results[False], results


def test_four_qd_independent(cfg):
    """four_qd topology: independent drones tracking offset trajectory
    copies — every drone is a leader, no exchange."""
    traj = eight_traj()
    init_fn, _, run_fn = make_episode(
        cfg, traj, n_drones=4, independent=True, hold_ticks=150
    )
    st = init_fn(dtype=jnp.float64)
    st, m, _ = jax.jit(lambda s: run_fn(s, 500))(st)
    assert bool(jnp.all(m.ok))
    # all four track equally well (same dynamics, just offset)
    assert float(jnp.max(m.pos_rmse)) < 0.08, np.asarray(m.pos_rmse)
    assert float(jnp.std(m.pos_rmse)) < 0.01


def test_episode_is_deterministic(cfg):
    traj = eight_traj()
    init_fn, _, run_fn = make_episode(cfg, traj, n_drones=2)
    st1, m1, _ = jax.jit(lambda s: run_fn(s, 100))(init_fn(jnp.float64))
    st2, m2, _ = jax.jit(lambda s: run_fn(s, 100))(init_fn(jnp.float64))
    np.testing.assert_array_equal(np.asarray(m1.pos_rmse), np.asarray(m2.pos_rmse))


def test_four_qd_per_drone_trajectories(cfg):
    """four_qd with per-drone goals (`launch/four_qd_nmpc.launch:1-25`: each
    namespaced node receives its own cmd_pc goal): drones track DIFFERENT
    trajectories of different segment counts (exercising the stack/pad
    path), each converging to its own final point."""
    t = np.linspace(0, 2 * np.pi, 9)
    base = np.stack(
        [2.0 * np.sin(t), 1.0 * np.sin(2 * t), 1.0 + 0.3 * np.sin(t)], axis=-1
    )
    tA = fit_waypoints(base, np.full(8, 2.0), 0.2 * np.sin(t))
    t2 = np.linspace(0, 2 * np.pi, 6)  # fewer segments -> padding exercised
    wB = np.stack(
        [3.0 + np.cos(t2) - 1.0, 1.5 * np.sin(t2), 1.5 + 0.2 * np.sin(t2)],
        axis=-1,
    )
    tB = fit_waypoints(wB, np.full(5, 2.5), 0.1 * np.sin(t2))

    init_fn, _, run_fn = make_episode(
        cfg, [tA, tB, tA, tB], n_drones=4, independent=True, hold_ticks=150
    )
    st = init_fn(dtype=jnp.float64)
    # drones start at their OWN trajectory's start point, no offsets
    np.testing.assert_allclose(
        np.asarray(st.plant.x[0, 0:3]), np.asarray(eight_traj().coeff_xyz[0, 0]),
        atol=1e-9,
    )
    assert abs(float(st.plant.x[1, 0]) - 3.0) < 1e-9  # traj B starts at x=3
    st, m, _ = jax.jit(lambda s: run_fn(s, 1000))(st)  # 3s hold + 17s track
    assert bool(jnp.all(m.ok))
    assert float(jnp.max(m.pos_rmse)) < 0.08, np.asarray(m.pos_rmse)
    # pairs flying the same trajectory agree; different trajectories differ
    np.testing.assert_allclose(
        np.asarray(st.plant.x[0]), np.asarray(st.plant.x[2]), atol=1e-9
    )
    assert float(jnp.linalg.norm(st.plant.x[0, 0:3] - st.plant.x[1, 0:3])) > 0.5
    # each lands at its own final point (trajectories are 16 s / 12.5 s,
    # both finished by t=17 s)
    np.testing.assert_allclose(
        np.asarray(st.plant.x[1, 0:3]), np.asarray(wB[-1]), atol=0.05
    )
