"""Scenario yaml loading + CLI mission smoke tests."""

import jax.numpy as jnp
import numpy as np

from ndp_nmpc_qd_tpu.traj.polyopt import eval_traj
from ndp_nmpc_qd_tpu.traj.scenarios import list_scenarios, load_scenario


def test_list_scenarios():
    names = list_scenarios()
    assert "eight_high_dyn" in names
    assert "hover_step" in names


def test_load_eight_high_dyn():
    traj = load_scenario("eight_high_dyn")
    assert traj.coeff_xyz.shape == (8, 8, 3)
    # hits its waypoints
    fo = eval_traj(traj, traj.t_cum[:-1])
    np.testing.assert_allclose(float(fo.pos[0, 0]), 0.0, atol=1e-8)
    np.testing.assert_allclose(float(fo.pos[2, 0]), 2.0, atol=1e-7)
    # yaw channel fitted
    assert abs(float(fo.yaw[2]) - 0.2) < 1e-7


def test_cli_mission_with_scenario(capsys):
    import json

    from ndp_nmpc_qd_tpu.cli import main

    main(
        [
            "mission", "one_qd", "--cpu", "--scenario", "hover_step",
            "--track-secs", "4", "--hold-ticks", "50",
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] == [True]
    assert out["pos_rmse"][0] < 0.1
