"""Offline downwash-NN training: the reference's `nn_train.py` pipeline,
re-done in JAX.

The reference trains 6->128->64->128->3 on CSV pairs (relative state ->
measured force) with full-batch Adam lr=1e-4, MSE, 10k-20k epochs, and a
post-step spectral-norm projection (`dnwash_nn_est/nn_train.py:84-172`).
Here the dataset is sampled from the in-graph plant's ground-truth coupling
(`sim/downwash_truth.analytic_downwash` — the dop_sim role), and training is
one jitted step in a Python loop.

Data in: either synthetic samples of the analytic wake truth (default), or
the reference's flight-log CSV format via --input-csv/--output-csv
(`nn_train.py:96-104`: input rows x,y,z,vx,vy,vz = relative state other-ego;
output rows fx,fy,fz = measured disturbance force; 75/25 train/test split).
--curves saves the train/test loss-curve figure (`figs/draw_training_fig.py`
role).

Usage: python tools/train_downwash.py [--sn 4] [--epochs 4000]
       [--input-csv downwash_input.csv --output-csv downwash_output.csv]
       [--curves figs/training.png] [--out assets/downwash_analytic_sn4.npz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ndp_nmpc_qd_tpu.models.downwash_mlp import (
    init_mlp,
    make_trainer,
    mlp_forward,
    save_npz,
)
from ndp_nmpc_qd_tpu.sim.downwash_truth import analytic_downwash


def sample_dataset(n: int, seed: int = 0):
    """Relative states covering the interaction envelope (the reference's
    data comes from flight logs inside the r_horiz cylinder)."""
    rng = np.random.default_rng(seed)
    rel = np.zeros((n, 6))
    rel[:, 0:2] = rng.uniform(-1.2, 1.2, (n, 2))  # horizontal offset
    rel[:, 2] = rng.uniform(-0.5, 3.0, n)  # vertical offset (other above)
    rel[:, 3:6] = rng.uniform(-1.0, 1.0, (n, 3))  # relative velocity
    y = np.asarray(analytic_downwash(jnp.asarray(rel)))
    # measurement noise comparable to the reference's force-residual data
    y = y + 0.05 * rng.standard_normal(y.shape)
    return rel.astype(np.float32), y.astype(np.float32)


def load_csv_dataset(input_csv: str, output_csv: str, seed: int = 0):
    """The reference's flight-log ingestion (`nn_train.py:96-104`): CSV
    pairs -> shuffled 75/25 train/test split (sklearn train_test_split
    role, random split as in the reference)."""
    x = np.loadtxt(input_csv, delimiter=",", dtype=np.float64, ndmin=2)
    y = np.loadtxt(output_csv, delimiter=",", dtype=np.float64, ndmin=2)
    assert x.shape[1] == 6, f"input CSV must be x,y,z,vx,vy,vz; got {x.shape}"
    assert y.shape[1] == 3, f"output CSV must be fx,fy,fz; got {y.shape}"
    assert x.shape[0] == y.shape[0], (x.shape, y.shape)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(x.shape[0])
    n_tr = int(0.75 * x.shape[0])
    tr, te = perm[:n_tr], perm[n_tr:]
    return (
        x[tr].astype(np.float32), y[tr].astype(np.float32),
        x[te].astype(np.float32), y[te].astype(np.float32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sn", type=float, default=4.0)
    ap.add_argument(
        "--sn-sweep", nargs="*", type=float, default=None,
        help="train one model per SN value (train_model_multiple_times.sh role)",
    )
    ap.add_argument("--epochs", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n-train", type=int, default=16384)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--input-csv", default=None,
        help="flight-log relative states x,y,z,vx,vy,vz (nn_train.py:96)",
    )
    ap.add_argument(
        "--output-csv", default=None,
        help="flight-log measured forces fx,fy,fz (nn_train.py:100)",
    )
    ap.add_argument(
        "--curves", default=None,
        help="save the train/test loss-curve figure here "
        "(draw_training_fig.py role)",
    )
    args = ap.parse_args()
    assert (args.input_csv is None) == (args.output_csv is None), (
        "--input-csv and --output-csv go together"
    )

    if args.sn_sweep is not None:
        # the zsh sweep over SN in {0,2,4,8} (train_model_multiple_times.sh)
        for sn in args.sn_sweep:
            sub = argparse.Namespace(**vars(args))
            sub.sn, sub.sn_sweep, sub.out = sn, None, None
            print(f"=== SN = {sn} ===")
            _train_one(sub)
        return
    _train_one(args)


def _train_one(args):
    if args.input_csv is not None:
        x_tr, y_tr, x_te, y_te = load_csv_dataset(
            args.input_csv, args.output_csv
        )
        tag = "csv"
    else:
        x_tr, y_tr = sample_dataset(args.n_train, seed=0)
        x_te, y_te = sample_dataset(4096, seed=1)
        tag = "analytic"

    params = init_mlp(jax.random.PRNGKey(0))
    init_opt, train_step, loss_fn = make_trainer(sn=args.sn, lr=args.lr)
    opt_state = init_opt(params)

    xj, yj = jnp.asarray(x_tr), jnp.asarray(y_tr)
    xe, ye = jnp.asarray(x_te), jnp.asarray(y_te)
    curve = []  # (epoch, train, test)
    log_every = max(1, min(500, args.epochs // 20))
    for epoch in range(args.epochs):
        params, opt_state, loss = train_step(params, opt_state, xj, yj)
        if epoch % log_every == 0 or epoch == args.epochs - 1:
            te = float(loss_fn(params, xe, ye))
            curve.append((epoch, float(loss), te))
            if epoch % 500 == 0 or epoch == args.epochs - 1:
                print(f"epoch {epoch}: train {float(loss):.4f} test {te:.4f}")

    test_loss = float(loss_fn(params, xe, ye))
    out = args.out or f"assets/downwash_{tag}_sn{int(args.sn)}.npz"
    save_npz(params, out)
    print(f"saved {out} (test MSE {test_loss:.4f})")

    if args.curves:
        # the reference's training-curve figure (draw_training_fig.py)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        c = np.asarray(curve)
        fig, ax = plt.subplots(figsize=(5, 3.2))
        ax.plot(c[:, 0], c[:, 1], label="train MSE")
        ax.plot(c[:, 0], c[:, 2], label="test MSE")
        ax.set_xlabel("epoch")
        ax.set_ylabel("MSE")
        ax.set_title(f"downwash MLP (SN={args.sn:g}, {tag} data)")
        ax.legend()
        fig.tight_layout()
        os.makedirs(os.path.dirname(args.curves) or ".", exist_ok=True)
        fig.savefig(args.curves, dpi=120)
        print(f"saved curves to {args.curves}")


if __name__ == "__main__":
    main()
