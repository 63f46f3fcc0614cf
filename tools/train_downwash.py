"""Offline downwash-NN training: the reference's `nn_train.py` pipeline,
re-done in JAX.

The reference trains 6->128->64->128->3 on CSV pairs (relative state ->
measured force) with full-batch Adam lr=1e-4, MSE, 10k-20k epochs, and a
post-step spectral-norm projection (`dnwash_nn_est/nn_train.py:84-172`).
Here the dataset is sampled from the in-graph plant's ground-truth coupling
(`sim/downwash_truth.analytic_downwash` — the dop_sim role), and training is
one jitted step in a Python loop.

Usage: python tools/train_downwash.py [--sn 4] [--epochs 4000] [--out assets/downwash_analytic_sn4.npz]
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
    args = ap.parse_args()

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
    x_tr, y_tr = sample_dataset(args.n_train, seed=0)
    x_te, y_te = sample_dataset(4096, seed=1)

    params = init_mlp(jax.random.PRNGKey(0))
    init_opt, train_step, loss_fn = make_trainer(sn=args.sn, lr=args.lr)
    opt_state = init_opt(params)

    xj, yj = jnp.asarray(x_tr), jnp.asarray(y_tr)
    for epoch in range(args.epochs):
        params, opt_state, loss = train_step(params, opt_state, xj, yj)
        if epoch % 500 == 0 or epoch == args.epochs - 1:
            te = float(loss_fn(params, jnp.asarray(x_te), jnp.asarray(y_te)))
            print(f"epoch {epoch}: train {float(loss):.4f} test {te:.4f}")

    test_loss = float(loss_fn(params, jnp.asarray(x_te), jnp.asarray(y_te)))
    out = args.out or f"assets/downwash_analytic_sn{int(args.sn)}.npz"
    save_npz(params, out)
    print(f"saved {out} (test MSE {test_loss:.4f})")


if __name__ == "__main__":
    main()
