"""Command-line mission runner: the launch-file layer.

Mirrors the reference's roslaunch topologies (`ndp_nmpc/launch/*.launch`) as
subcommands over the in-graph simulator:

  python -m ndp_nmpc_qd_tpu one_qd            # one_qd_nmpc.launch
  python -m ndp_nmpc_qd_tpu three_qd          # three_qd_nmpc_formation.launch
  python -m ndp_nmpc_qd_tpu three_qd_ndp      # three_qd_ndp_nmpc.launch
  python -m ndp_nmpc_qd_tpu four_qd           # four_qd_nmpc.launch
  python -m ndp_nmpc_qd_tpu swarm --drones 4096   # swarm-scale batch config

Each run executes a hold-calibrate phase followed by figure-eight tracking
(the `eight_high_dyn.yaml` role) and reports the tracking / formation RMSE
that the reference returns in its TrackTraj action result
(`nmpc_node.py:186-200`).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_eight(scale: float = 2.0, t_seg: float = 2.0):
    """The eight_high_dyn.yaml role: a figure-eight with yaw motion."""
    from .traj.polyopt import fit_waypoints

    t = np.linspace(0, 2 * np.pi, 9)
    wpts = np.stack(
        [scale * np.sin(t), 0.5 * scale * np.sin(2 * t), 1.0 + 0.3 * np.sin(t)],
        axis=-1,
    )
    return fit_waypoints(wpts, np.full(8, t_seg), 0.2 * np.sin(t))


def default_asset(name: str) -> str:
    return os.path.join(os.path.dirname(__file__), "..", "assets", name)


def run_mission(args) -> dict:
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from .models.downwash_mlp import load_npz
    from .params import NdpNmpcConfig, SimParams
    from .sim.closed_loop import make_episode

    topology = {
        "one_qd": dict(n_drones=1),
        "three_qd": dict(n_drones=3),
        "three_qd_ndp": dict(n_drones=3, use_ndp=True, true_downwash=True),
        "four_qd": dict(n_drones=4),
        "swarm": dict(n_drones=args.drones),
    }[args.topology]

    cfg = NdpNmpcConfig(sim=SimParams(k_throttle_true=args.k_true))
    traj = build_eight()

    kwargs = dict(topology)
    if kwargs.pop("use_ndp", False):
        kwargs["use_ndp"] = True
        kwargs["downwash_params"] = load_npz(
            args.nn or default_asset("downwash_analytic_sn4.npz")
        )
    dtype = jnp.float64 if args.f64 else jnp.float32
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    init_fn, _, run_fn = make_episode(
        cfg, traj, hold_ticks=args.hold_ticks, **kwargs
    )
    n_ticks = args.hold_ticks + int(args.track_secs / cfg.ocp.ts_nmpc)

    run = jax.jit(lambda s: run_fn(s, n_ticks)[:2])
    st = init_fn(dtype=dtype)
    t0 = time.perf_counter()
    st, metrics = run(st)
    jax.block_until_ready(metrics)
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    st2, metrics = run(init_fn(dtype=dtype))
    jax.block_until_ready(metrics)
    run_time = time.perf_counter() - t0

    result = {
        "topology": args.topology,
        "n_drones": int(topology.get("n_drones", 1)),
        "ticks": n_ticks,
        "pos_rmse": np.asarray(metrics.pos_rmse).round(5).tolist(),
        "yaw_rmse_deg": np.asarray(metrics.yaw_rmse_deg).round(4).tolist(),
        "form_rmse": np.asarray(metrics.form_rmse).round(5).tolist(),
        "ok": np.asarray(metrics.ok).tolist(),
        "wall_s_first": round(compile_and_run, 3),
        "wall_s_cached": round(run_time, 3),
        "solves_per_s": round(n_ticks * topology.get("n_drones", 1) / run_time, 1),
        "device": str(jax.devices()[0]),
    }
    return result


def main(argv=None):
    ap = argparse.ArgumentParser(prog="ndp_nmpc_qd_tpu", description=__doc__)
    ap.add_argument(
        "topology",
        choices=["one_qd", "three_qd", "three_qd_ndp", "four_qd", "swarm"],
    )
    ap.add_argument("--drones", type=int, default=4096, help="swarm size")
    ap.add_argument("--track-secs", type=float, default=16.0)
    ap.add_argument("--hold-ticks", type=int, default=200)
    ap.add_argument("--k-true", type=float, default=46.0)
    ap.add_argument("--nn", default=None, help="downwash net .npz")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args(argv)

    result = run_mission(args)
    print(json.dumps(result))
    if not all(result["ok"]):
        raise SystemExit(2)


if __name__ == "__main__":
    main()
