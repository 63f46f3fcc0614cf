"""Downwash MLP tests: converted weights reproduce the torch forward pass
bit-for-bit (within f32), the activation gate matches the reference node
logic, and the spectral-norm trainer actually constrains singular values."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndp_nmpc_qd_tpu.models.downwash_mlp import (
    init_mlp,
    load_npz,
    make_trainer,
    mlp_forward,
    predict_downwash,
    spectral_normalize,
)

ASSET = os.path.join(os.path.dirname(__file__), "..", "assets", "downwash_sn4.npz")
REF_PKL = (
    "/root/reference/ndp_nmpc/scripts/dnwash_nn_est/nn_model/"
    "128-64-128_WBias_SN=4_epoch=20000_test_loss=1.0221.pkl"
)


def test_forward_matches_torch(rng):
    torch = pytest.importorskip("torch")
    if not os.path.exists(REF_PKL):
        pytest.skip("reference checkpoint unavailable")
    import torch.nn as nn

    net = nn.Sequential(
        nn.Linear(6, 128), nn.ReLU(), nn.Linear(128, 64), nn.ReLU(),
        nn.Linear(64, 128), nn.ReLU(), nn.Linear(128, 3),
    )
    net.load_state_dict(torch.load(REF_PKL, map_location="cpu"))
    net.eval()

    params = load_npz(ASSET)
    x = rng.standard_normal((21, 6)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(mlp_forward(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gate_inside_outside():
    params = load_npz(ASSET)
    ego = jnp.zeros((21, 10))
    other = jnp.zeros((21, 10)).at[:, 2].set(1.0)  # directly above
    f_inside = predict_downwash(params, other, ego, r_horiz=1.0)
    assert float(jnp.max(jnp.abs(f_inside))) > 0

    other_far = other.at[:, 0].set(5.0)  # 5 m horizontal offset
    f_outside = predict_downwash(params, other_far, ego, r_horiz=1.0)
    np.testing.assert_allclose(np.asarray(f_outside), 0.0)


def test_gate_uses_first_node_only():
    """The reference gates on msg.x[0] only (`ndp_nmpc_leader_node.py:66`)."""
    params = load_npz(ASSET)
    ego = jnp.zeros((21, 10))
    other = jnp.zeros((21, 10)).at[:, 2].set(1.0)
    other = other.at[5:, 0].set(50.0)  # later nodes far away; node 0 inside
    f = predict_downwash(params, other, ego, r_horiz=1.0)
    assert float(jnp.max(jnp.abs(f))) > 0  # still active


def test_downwash_force_is_downward_above():
    """Physically: a drone hovering directly above pushes the ego DOWN
    (negative z force) — sanity check on the trained model."""
    params = load_npz(ASSET)
    rel = jnp.asarray([[0.0, 0.0, 0.8, 0.0, 0.0, 0.0]])  # other 0.8 m above
    f = mlp_forward(params, rel)
    assert float(f[0, 2]) < 0.0, np.asarray(f)


def test_spectral_normalize_projects():
    key = jax.random.PRNGKey(0)
    params = init_mlp(key)
    params = jax.tree.map(lambda a: a * 10.0, params)
    proj = spectral_normalize(params, 4.0)
    for w in proj.weights:
        assert float(jnp.linalg.norm(w, ord=2)) <= 4.0 + 1e-4


def test_trainer_fits_toy_function(rng):
    """Train on a simple linear-ish target; loss must drop and SN hold."""
    key = jax.random.PRNGKey(1)
    params = init_mlp(key)
    init_opt, train_step, loss_fn = make_trainer(sn=4.0, lr=1e-3)
    opt_state = init_opt(params)

    x = jnp.asarray(rng.standard_normal((256, 6)), jnp.float32)
    y = jnp.stack([x[:, 2] * 0.5, -x[:, 0], x[:, 1] * 0.2], axis=-1)

    l0 = float(loss_fn(params, x, y))
    for _ in range(300):
        params, opt_state, loss = train_step(params, opt_state, x, y)
    assert float(loss) < 0.3 * l0
    for w in params.weights:
        assert float(jnp.linalg.norm(w, ord=2)) <= 4.0 + 1e-3


def test_csv_ingestion_roundtrip(tmp_path, rng):
    """The flight-log CSV path (`nn_train.py:96-104` format): 6-col input /
    3-col output, shuffled 75/25 split, trainable end to end."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "train_downwash",
        os.path.join(os.path.dirname(__file__), "..", "tools", "train_downwash.py"),
    )
    td = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(td)

    n = 100
    x = rng.standard_normal((n, 6))
    y = rng.standard_normal((n, 3))
    np.savetxt(tmp_path / "in.csv", x, delimiter=",")
    np.savetxt(tmp_path / "out.csv", y, delimiter=",")
    x_tr, y_tr, x_te, y_te = td.load_csv_dataset(
        str(tmp_path / "in.csv"), str(tmp_path / "out.csv")
    )
    assert x_tr.shape == (75, 6) and y_tr.shape == (75, 3)
    assert x_te.shape == (25, 6) and y_te.shape == (25, 3)
    # split is a permutation: together they recover the full set
    all_rows = np.concatenate([x_tr, x_te])
    assert np.allclose(
        np.sort(all_rows, axis=0), np.sort(x.astype(np.float32), axis=0)
    )
    # trainable on the ingested data
    params = init_mlp(jax.random.PRNGKey(0))
    init_opt, train_step, loss_fn = make_trainer(sn=0.0, lr=1e-3)
    opt_state = init_opt(params)
    l0 = float(loss_fn(params, jnp.asarray(x_tr), jnp.asarray(y_tr)))
    for _ in range(5):
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(x_tr), jnp.asarray(y_tr)
        )
    assert np.isfinite(float(loss)) and float(loss) <= l0 * 1.5


def test_mlp_bf16_compute_close_to_f32(rng):
    """bf16 MXU compute path: forecast within ~1% of the f32 forward on the
    interaction envelope (the force scale is 0-3 N; the validated bench
    config pairs this with the bf16 stage payload)."""
    import os

    params = load_npz(
        os.path.join(
            os.path.dirname(__file__), "..", "assets",
            "downwash_analytic_sn4.npz",
        )
    )
    x = np.zeros((512, 6), np.float32)
    x[:, 0:2] = rng.uniform(-1.2, 1.2, (512, 2))
    x[:, 2] = rng.uniform(-0.5, 3.0, 512)
    x[:, 3:6] = rng.uniform(-1.0, 1.0, (512, 3))
    f32 = np.asarray(mlp_forward(params, jnp.asarray(x)))
    bf16 = np.asarray(
        mlp_forward(params, jnp.asarray(x), compute_dtype=jnp.bfloat16)
    )
    assert bf16.dtype == np.float32
    scale = max(np.abs(f32).max(), 1.0)
    assert np.max(np.abs(bf16 - f32)) < 0.02 * scale, (
        np.max(np.abs(bf16 - f32)), scale
    )
