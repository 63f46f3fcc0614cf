"""Scenario loading: yaml waypoint files -> fitted trajectories.

The cmd_pc planner configures trajectories through yaml files
(`roslaunch cmd_pc send_traj.launch path_config_file:=eight_high_dyn.yaml`,
reference README.md:37). The schema here:

    name: eight_high_dyn
    xyz_method: snap | jerk | acceleration | velocity
    yaw_method: acceleration
    t_segment: 2.0            # uniform, OR
    t_segments: [2.0, 1.5]    # per-segment
    waypoints: [[x, y, z, yaw], ...]
"""

from __future__ import annotations

import os

import numpy as np

from .polyopt import MinMethod, PiecewisePoly, fit_waypoints

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "configs")

_METHODS = {m.value: m for m in MinMethod}


def load_scenario(path_or_name: str, dtype=None) -> PiecewisePoly:
    """Load a scenario yaml by path, or by name from configs/."""
    import yaml

    path = path_or_name
    if not os.path.exists(path):
        path = os.path.join(CONFIG_DIR, path_or_name)
        if not path.endswith(".yaml"):
            path += ".yaml"
    with open(path) as f:
        spec = yaml.safe_load(f)

    wpts = np.asarray(spec["waypoints"], dtype=np.float64)
    assert wpts.ndim == 2 and wpts.shape[1] in (3, 4), wpts.shape
    xyz = wpts[:, 0:3]
    yaw = wpts[:, 3] if wpts.shape[1] == 4 else None

    m = len(wpts) - 1
    if "t_segments" in spec:
        t_seg = np.asarray(spec["t_segments"], dtype=np.float64)
        assert len(t_seg) == m, (len(t_seg), m)
    else:
        t_seg = np.full(m, float(spec.get("t_segment", 2.0)))

    return fit_waypoints(
        xyz, t_seg, yaw,
        xyz_method=_METHODS[spec.get("xyz_method", "snap")],
        yaw_method=_METHODS[spec.get("yaw_method", "acceleration")],
        dtype=dtype,
    )


def list_scenarios() -> list:
    if not os.path.isdir(CONFIG_DIR):
        return []
    return sorted(
        f[:-5] for f in os.listdir(CONFIG_DIR) if f.endswith(".yaml")
    )
