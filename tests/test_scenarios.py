"""Scenario yaml loading + CLI mission smoke tests."""

import jax.numpy as jnp
import numpy as np

from ndp_nmpc_qd_tpu.traj.polyopt import eval_traj
from ndp_nmpc_qd_tpu.traj.scenarios import list_scenarios, load_scenario
import pytest

# fast tier (VERDICT r4 item 7): this whole file is in the <5 min smoke set
pytestmark = pytest.mark.smoke


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


def test_viz3d_export(tmp_path):
    """The rviz-role HTML export: runs a short mission and emits a
    self-contained interactive scene with valid embedded data."""
    import json
    import re
    import sys

    sys.argv = [
        "viz3d", "--topology", "one_qd", "--cpu", "--track-secs", "2",
        "--hold-ticks", "20", "--stride", "4",
        "--out", str(tmp_path / "m.html"),
    ]
    import tools.viz3d as viz3d

    viz3d.main()
    html = (tmp_path / "m.html").read_text()
    data = json.loads(
        re.search(r"const DATA = (\{.*?\});\n", html, re.S).group(1)
    )
    assert len(data["drones"][0]) == 1  # one drone
    assert len(data["drones"]) == len(data["times"]) > 10
    assert len(data["ref"]) == 200
    assert data["ok"] == [True]
    script = re.search(r"<script>([\s\S]*)</script>", html).group(1)
    for a, b in ("{}", "()"):
        assert script.count(a) == script.count(b)
