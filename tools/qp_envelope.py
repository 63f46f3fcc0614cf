"""Far-regime QP envelope sweep: single RTI update from a hover state offset
by d meters toward a hover reference, reporting the largest d with info.ok.

The reference's HPIPM solve is robust at any offset (adaptive iterations);
our fixed-iteration IPM historically lost the planned-velocity box beyond
~18 m (ROADMAP item 4). This sweep is the acceptance harness for warm-start/
corrector work: run on CPU (scan backend) or TPU (pallas).

Usage: python tools/qp_envelope.py [--iters 8] [--max-d 100] [--backend jax]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--max-d", type=float, default=100.0)
    ap.add_argument("--step", type=float, default=1.0)
    ap.add_argument("--backend", default="jax", choices=["jax", "pallas"])
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--tpu", dest="cpu", action="store_false")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--warm", action="store_true")
    ap.add_argument("--mehrotra", action="store_true")
    ap.add_argument(
        "--no-lqr-start", action="store_true",
        help="zero-control-rollout start only (pallas backend)",
    )
    ap.add_argument(
        "--whole-ipm", action="store_true",
        help="whole-solve persistent-VMEM IPM kernel (pallas backend; "
        "implies the zero-control start)",
    )
    ap.add_argument(
        "--bf16", action="store_true",
        help="split-precision bf16 stage payload (pallas backend)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if not args.f32:
            jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from ndp_nmpc_qd_tpu.models.quadrotor import hover_input, hover_state
    from ndp_nmpc_qd_tpu.params import NdpNmpcConfig
    from ndp_nmpc_qd_tpu.solver.rti import make_batched_rti_controller

    cfg = NdpNmpcConfig()
    ocp, veh = cfg.ocp, cfg.vehicle
    N = ocp.N_node
    ctl = make_batched_rti_controller(
        ocp, veh, with_disturbance=True, qp_iters=args.iters,
        backend=args.backend, warm_start=args.warm, mehrotra=args.mehrotra,
        lqr_start=not (args.no_lqr_start or args.whole_ipm),
        whole_ipm=args.whole_ipm, jac_bf16=args.bf16,
    )

    ds = np.arange(args.step, args.max_d + 1e-9, args.step)
    B = len(ds)
    dtype = jnp.float32 if args.f32 else jnp.float64

    # reference: hover at origin; initial state offset by d along a diagonal
    dirs = np.tile(np.array([[1.0, 0.0, 0.0]]), (B, 1))
    x0 = hover_state(jnp.asarray(dirs * ds[:, None], dtype))
    xr = jnp.tile(
        hover_state(jnp.zeros((B, 3), dtype))[:, None, :], (1, N + 1, 1)
    )
    ur = jnp.tile(hover_input(veh, (B,), dtype)[:, None, :], (1, N, 1))
    f = jnp.zeros((B, N + 1, 3), dtype)

    st = ctl.reset(xr, ur)
    upd = jax.jit(ctl.update)
    u0, st1, info = upd(st, x0, xr, ur, f)
    ok = np.asarray(info.ok)
    eq = np.asarray(info.eq_res)

    first_bad = None
    for d, o in zip(ds, ok):
        if not o and first_bad is None:
            first_bad = float(d)
    n_ok = int(ok.sum())
    print(
        json.dumps(
            {
                "iters": args.iters,
                "backend": args.backend,
                "warm": args.warm,
                "lqr_start": not (args.no_lqr_start or args.whole_ipm),
                "whole_ipm": args.whole_ipm,
                "bf16": args.bf16,
                "mehrotra": args.mehrotra,
                "dtype": str(dtype.__name__),
                "n_ok": n_ok,
                "n": B,
                "first_not_ok_m": first_bad,
                "max_eq_res": float(eq.max()),
            }
        )
    )
    # detail around the boundary
    if first_bad is not None:
        i = int(first_bad / args.step) - 1
        lo, hi = max(0, i - 3), min(B, i + 4)
        for k in range(lo, hi):
            print(
                f"  d={ds[k]:6.1f} ok={bool(ok[k])} eq_res={eq[k]:.3e} "
                f"mu={float(np.asarray(info.mu)[k]):.3e}"
            )


if __name__ == "__main__":
    main()
