"""Closed-loop cross-backend validation: the BASELINE deviation metric.

BASELINE.json's acceptance is "max control deviation < 1e-3 vs the acados
control sequence" on the flight trajectories. acados cannot run in this
environment, so the strongest equivalent is a full-mission comparison
between this framework's two INDEPENDENT solver implementations:

- scan backend: jnp Riccati scans + vmapped IPM (f32-precision-pinned XLA)
- pallas backend: packed batch-on-lanes kernels + packed IPM

Same episode, same dtype, same ticks; reports the max absolute control
deviation and the trajectory divergence over the whole figure-eight mission.
Run on TPU (the pallas path); takes a few minutes of compiles.

  python tools/validate_backends.py [--ticks 500]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=500)
    ap.add_argument("--hold-ticks", type=int, default=100)
    args = ap.parse_args()

    from ndp_nmpc_qd_tpu.cli import build_eight
    from ndp_nmpc_qd_tpu.params import NdpNmpcConfig, SimParams
    from ndp_nmpc_qd_tpu.sim.closed_loop import make_episode

    cfg = NdpNmpcConfig(sim=SimParams(k_throttle_true=50.0))
    traj = build_eight()

    traces = {}
    for backend in ("jax", "pallas"):
        init_fn, _, run_fn = make_episode(
            cfg, traj, n_drones=1, hold_ticks=args.hold_ticks,
            record_traces=True, solver_backend=backend,
        )
        st = init_fn(dtype=jnp.float32)
        st, metrics, (xs, u0s, th) = jax.jit(
            lambda s: run_fn(s, args.ticks)
        )(st)
        jax.block_until_ready(u0s)
        traces[backend] = (np.asarray(xs), np.asarray(u0s), metrics)
        print(
            f"{backend:7s}: pos_rmse {float(metrics.pos_rmse[0]):.5f} "
            f"ok={bool(metrics.ok[0])}", file=sys.stderr,
        )

    xs_j, u_j, _ = traces["jax"]
    xs_p, u_p, _ = traces["pallas"]
    du = np.abs(u_j - u_p)
    dpos = np.linalg.norm(xs_j[:, 0, 0:3] - xs_p[:, 0, 0:3], axis=-1)
    import json

    print(
        json.dumps(
            {
                "ticks": args.ticks,
                "max_control_deviation": float(du.max()),
                "mean_control_deviation": float(du.mean()),
                "max_traj_divergence_m": float(dpos.max()),
                "final_traj_divergence_m": float(dpos[-1]),
                "tolerance": 1e-3,
                "pass": bool(du.max() < 1e-3),
            }
        )
    )


if __name__ == "__main__":
    main()
