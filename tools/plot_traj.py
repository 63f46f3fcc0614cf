"""Offline mission analysis plots: the reference `figs/draw_traj.py` /
`draw_mul_traj.py` role, fed by in-graph episode traces instead of
rosbag->CSV exports.

Runs a mission with trace recording and renders per-axis
reference-vs-actual position / velocity / body-rate panels (one drone or a
formation), plus the throttle-estimator trace (`draw_throttle_est_fig.py`
role).

Usage:
  python tools/plot_traj.py [--topology one_qd|three_qd|three_qd_ndp]
                            [--out figs_out/]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # the episode below runs in f64

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--topology", default="one_qd",
        choices=["one_qd", "three_qd", "three_qd_ndp"],
    )
    ap.add_argument("--out", default="figs_out")
    ap.add_argument("--track-secs", type=float, default=16.0)
    args = ap.parse_args()

    from ndp_nmpc_qd_tpu.cli import build_eight, default_asset
    from ndp_nmpc_qd_tpu.models.downwash_mlp import load_npz
    from ndp_nmpc_qd_tpu.params import NdpNmpcConfig, SimParams
    from ndp_nmpc_qd_tpu.sim.closed_loop import make_episode
    from ndp_nmpc_qd_tpu.traj.polyopt import eval_traj

    cfg = NdpNmpcConfig(sim=SimParams(k_throttle_true=46.0))
    traj = build_eight()
    kwargs = {"one_qd": dict(n_drones=1),
              "three_qd": dict(n_drones=3),
              "three_qd_ndp": dict(
                  n_drones=3, use_ndp=True, true_downwash=True,
                  downwash_params=load_npz(default_asset("downwash_analytic_sn4.npz")),
              )}[args.topology]

    hold = 200
    init_fn, _, run_fn = make_episode(
        cfg, traj, hold_ticks=hold, record_traces=True, **kwargs
    )
    n_ticks = hold + int(args.track_secs / cfg.ocp.ts_nmpc)
    st, metrics, traces = jax.jit(lambda s: run_fn(s, n_ticks))(init_fn(jnp.float64))
    xs, u0s, throttles = traces  # (T, D, 10), (T, D, 4), (T, D)
    xs = np.asarray(xs)
    u0s = np.asarray(u0s)

    ts = (np.arange(n_ticks) - hold) * cfg.ocp.ts_nmpc
    track = ts >= 0
    fo = eval_traj(traj, jnp.asarray(np.clip(ts, 0, None)))
    ref_pos = np.asarray(fo.pos)
    ref_vel = np.asarray(fo.vel)

    os.makedirs(args.out, exist_ok=True)
    D = xs.shape[1]

    fig, axes = plt.subplots(3, 3, figsize=(13, 8), sharex=True)
    labels = ["x [m]", "y [m]", "z [m]"]
    for k in range(3):
        ax = axes[0][k]
        ax.plot(ts[track], ref_pos[track, k], "k--", label="ref")
        for d in range(D):
            ax.plot(ts[track], xs[track, d, k], label=f"qd{d}")
        ax.set_ylabel("pos " + labels[k])
        ax = axes[1][k]
        ax.plot(ts[track], ref_vel[track, k], "k--")
        for d in range(D):
            ax.plot(ts[track], xs[track, d, 3 + k])
        ax.set_ylabel("vel " + labels[k][0] + " [m/s]")
        ax = axes[2][k]
        for d in range(D):
            ax.plot(ts[track], u0s[track, d, k])
        ax.set_ylabel(f"body rate {'xyz'[k]} [rad/s]")
        ax.set_xlabel("t [s]")
    axes[0][0].legend(fontsize=7)
    fig.suptitle(
        f"{args.topology}: pos RMSE "
        + ", ".join(f"{v:.4f}" for v in np.asarray(metrics.pos_rmse))
        + " m"
    )
    fig.tight_layout()
    path = os.path.join(args.out, f"traj_{args.topology}.pdf")
    fig.savefig(path)
    print("wrote", path)

    # hover-throttle estimator trace (draw_throttle_est_fig.py role)
    fig2, ax = plt.subplots(figsize=(6, 3))
    ax.plot(np.asarray(throttles)[:, 0], label="throttle cmd (qd0)")
    ax.axhline(
        cfg.vehicle.mass * cfg.vehicle.gravity / cfg.sim.k_throttle_true,
        color="k", ls="--", label="true hover throttle",
    )
    ax.legend()
    ax.set_xlabel("tick")
    fig2.tight_layout()
    path2 = os.path.join(args.out, "throttle_est.pdf")
    fig2.savefig(path2)
    print("wrote", path2)


if __name__ == "__main__":
    main()
