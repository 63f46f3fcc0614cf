"""Live mission dashboard over the qdio bus: the PlotJuggler-layout role.

Attaches read-only to a running namespace's shared-memory topics (odometry,
attitude command, reference horizon — the same signals the reference's
`plotjuggler/one_qd_tracking.xml` charts from `ref_x_u` + mavros odom) and
either renders a live matplotlib window or, headless, records for --secs and
writes a PNG dashboard.

Usage (with `serve` + `simnode` daemons running):
  python tools/live_plot.py --ns fhnp --secs 10 --out /tmp/dash.png
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="fhnp")
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--rate", type=float, default=50.0)
    ap.add_argument("--out", default="/tmp/qd_dashboard.png")
    args = ap.parse_args()

    from ndp_nmpc_qd_tpu.runtime import bus as qb

    odom = qb.Topic(f"{args.ns}/odom", qb.ODOMETRY)
    att = qb.Topic(f"{args.ns}/attitude_target", qb.ATTITUDE_TARGET)
    ref = qb.Topic(f"{args.ns}/ref_x_u", qb.PRED_XU)

    rows = []
    rate = qb.Rate(1.0 / args.rate)
    t_end = qb.now() + args.secs
    while qb.now() < t_end:
        rate.sleep()
        so, mo = odom.read_latest()
        sa, ma = att.read_latest()
        sr, mr = ref.read_latest()
        if so <= 0:
            continue
        ref_pos = mr["x"][0, 0:3] if sr > 0 else np.full(3, np.nan)
        body_rate = ma["body_rate"] if sa > 0 else np.full(3, np.nan)
        thrust = float(ma["thrust"]) if sa > 0 else np.nan
        rows.append(
            np.concatenate([[qb.now()], mo["pos"], mo["vel"], ref_pos, body_rate, [thrust]])
        )

    if not rows:
        print(f"no odometry seen on {args.ns} — are serve/simnode running?")
        raise SystemExit(1)

    a = np.asarray(rows)
    t = a[:, 0] - a[0, 0]
    fig, axes = plt.subplots(3, 1, figsize=(9, 8), sharex=True)
    for k, lbl in enumerate("xyz"):
        axes[0].plot(t, a[:, 1 + k], label=f"pos {lbl}")
        axes[0].plot(t, a[:, 7 + k], "--", label=f"ref {lbl}")
    axes[0].legend(fontsize=7, ncol=3)
    axes[0].set_ylabel("position [m]")
    for k, lbl in enumerate("xyz"):
        axes[1].plot(t, a[:, 4 + k], label=f"v{lbl}")
    axes[1].legend(fontsize=7)
    axes[1].set_ylabel("velocity [m/s]")
    for k, lbl in enumerate("xyz"):
        axes[2].plot(t, a[:, 10 + k], label=f"w{lbl}")
    axes[2].plot(t, a[:, 13], "k", label="thrust")
    axes[2].legend(fontsize=7, ncol=4)
    axes[2].set_ylabel("cmd")
    axes[2].set_xlabel("t [s]")
    fig.suptitle(f"live: /{args.ns}  ({len(rows)} samples)")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
