"""Downwash force-field visualization: the reference `nn_test.py` role.

Renders predicted fz over xy-grids at several vertical offsets for one or
more trained nets (and the analytic plant-truth model for comparison).

Usage:
  python tools/nn_field_viz.py [--nets assets/downwash_analytic_sn4.npz ...]
                               [--out figs_out/]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nets", nargs="*", default=None)
    ap.add_argument("--out", default="figs_out")
    ap.add_argument("--dzs", nargs="*", type=float, default=[0.4, 0.8, 1.5])
    args = ap.parse_args()

    from ndp_nmpc_qd_tpu.models.downwash_mlp import load_npz, mlp_forward
    from ndp_nmpc_qd_tpu.sim.downwash_truth import analytic_downwash

    root = os.path.join(os.path.dirname(__file__), "..", "assets")
    nets = args.nets or [
        os.path.join(root, "downwash_analytic_sn4.npz"),
        os.path.join(root, "downwash_sn4.npz"),
    ]

    n = 61
    xy = np.linspace(-1.2, 1.2, n)
    gx, gy = np.meshgrid(xy, xy)

    models = [("analytic truth", None)] + [
        (os.path.basename(p), load_npz(p)) for p in nets
    ]
    fig, axes = plt.subplots(
        len(models), len(args.dzs), figsize=(4 * len(args.dzs), 3.2 * len(models)),
        squeeze=False,
    )
    for i, (name, params) in enumerate(models):
        for j, dz in enumerate(args.dzs):
            rel = np.zeros((n * n, 6))
            rel[:, 0] = gx.ravel()
            rel[:, 1] = gy.ravel()
            rel[:, 2] = dz
            if params is None:
                f = np.asarray(analytic_downwash(jnp.asarray(rel)))
            else:
                f = np.asarray(mlp_forward(params, jnp.asarray(rel)))
            fz = f[:, 2].reshape(n, n)
            ax = axes[i][j]
            im = ax.pcolormesh(gx, gy, fz, cmap="viridis", shading="auto")
            fig.colorbar(im, ax=ax, label="fz [N]")
            ax.set_title(f"{name}\ndz={dz} m", fontsize=8)
            ax.set_aspect("equal")
    fig.tight_layout()
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "downwash_fields.pdf")
    fig.savefig(path)
    print("wrote", path)


if __name__ == "__main__":
    main()
