"""Downwash-force MLP: 6 -> 128 -> 64 -> 128 -> 3 ReLU network.

The reference runs this net in PyTorch on CUDA with a host<->GPU round-trip
per control step (`dnwash_nn_est/downwash_nn.py:21-28`, architecture at
`dnwash_nn_est/nn_net.py:7-18`). Here it is a pure-jnp function over a pytree
of weights so inference FUSES into the same XLA program as the NMPC solve —
zero host round-trips — and batches over (swarm, horizon) for free.

Includes:
- `load_torch_checkpoint`: converts the reference's trained `state_dict`
  pickles (keys `0.weight`, `0.bias`, ... `6.bias`) to the jnp pytree.
- `predict_downwash`: the gated per-horizon inference of
  `NDPLeaderNode.sub_xf_pred_callback` (`ndp_nmpc_leader_node.py:60-76`):
  input = (other - ego)[:, 0:6], zeroed outside the r_horiz cylinder.
- `train_step` / `spectral_normalize`: the JAX trainer matching
  `nn_train.py` (full-batch Adam + MSE + post-step spectral-norm projection,
  `nn_train.py:138-157`).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class MlpParams(NamedTuple):
    weights: tuple  # tuple of (out, in) matrices, torch layout
    biases: tuple  # tuple of (out,) vectors


LAYER_SIZES = (6, 128, 64, 128, 3)


def init_mlp(key, sizes: Sequence[int] = LAYER_SIZES, dtype=jnp.float32) -> MlpParams:
    """Kaiming-uniform init (torch nn.Linear default)."""
    ws, bs = [], []
    for i in range(len(sizes) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        # torch Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
        bound = 1.0 / np.sqrt(sizes[i])
        ws.append(jax.random.uniform(k1, (sizes[i + 1], sizes[i]), dtype, -bound, bound))
        bs.append(jax.random.uniform(k2, (sizes[i + 1],), dtype, -bound, bound))
    return MlpParams(tuple(ws), tuple(bs))


def mlp_forward(
    params: MlpParams, x: jnp.ndarray, compute_dtype=None
) -> jnp.ndarray:
    """x (..., 6) -> force (..., 3). ReLU between layers, linear head.

    `compute_dtype=bfloat16` runs the matmuls AND hidden activations in
    bf16 (MXU accumulates f32 internally; the head layer emits f32).
    Forecast error ~0.3% of the 0-3 N force scale — see
    tests/test_downwash.py bf16 bound.

    Cost model (profiled at B=65536, r5): the four dots measure ~0.99
    ms/tick, within ~8% of their PADDED-MXU floor (~0.92 ms): every layer
    occupies exactly one 128x128 K-tile x N-tile per row block because the
    net's dims (6 in, 64 mid, 3 out) pad to 128 — so each layer costs
    M*128*128 MACs regardless of packing (block-diagonal stacking
    multiplies the same zeros; dense-MXU cost is padded KxN, always).
    There is no kernel that beats this without changing the architecture;
    further fusion would only shave the ~8% scheduling overhead."""
    acc = x.dtype
    h = x if compute_dtype is None else x.astype(compute_dtype)
    n = len(params.weights)
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        w = w if compute_dtype is None else w.astype(compute_dtype)
        last = i == n - 1
        out_dt = acc if (compute_dtype is None or last) else compute_dtype
        h = jnp.dot(h, w.T, preferred_element_type=out_dt) + b.astype(out_dt)
        if not last:
            h = jax.nn.relu(h)
    return h.astype(acc)


def load_torch_checkpoint(path: str, dtype=jnp.float32) -> MlpParams:
    """Convert a reference `state_dict` pickle (torch) to MlpParams.

    The deployed model is `128-64-128_WBias_SN=4_epoch=20000_test_loss=1.0221`
    (`downwash_nn.py:15`).
    """
    import torch  # local import: only needed for conversion

    sd = torch.load(path, map_location="cpu")
    idx = sorted({int(k.split(".")[0]) for k in sd.keys()})
    ws = tuple(jnp.asarray(sd[f"{i}.weight"].numpy(), dtype) for i in idx)
    bs = tuple(jnp.asarray(sd[f"{i}.bias"].numpy(), dtype) for i in idx)
    return MlpParams(ws, bs)


def save_npz(params: MlpParams, path: str) -> None:
    arrays = {}
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        arrays[f"w{i}"] = np.asarray(w)
        arrays[f"b{i}"] = np.asarray(b)
    np.savez(path, **arrays)


def load_npz(path: str, dtype=jnp.float32) -> MlpParams:
    data = np.load(path)
    n = len([k for k in data.files if k.startswith("w")])
    ws = tuple(jnp.asarray(data[f"w{i}"], dtype) for i in range(n))
    bs = tuple(jnp.asarray(data[f"b{i}"], dtype) for i in range(n))
    return MlpParams(ws, bs)


def predict_downwash(
    params: MlpParams,
    other_pred_x: jnp.ndarray,
    ego_pred_x: jnp.ndarray,
    *,
    r_horiz: float,
    ego_gate_pos: jnp.ndarray | None = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Per-horizon downwash forces with the reference's activation gate.

    other_pred_x/ego_pred_x: (..., N+1, 10) predicted horizons.
    Gate (`ndp_nmpc_leader_node.py:66-68`): the NN runs only when the other
    horizon's FIRST node is within r_horiz horizontally of the ego's actual
    position (`ego_gate_pos`, defaulting to the ego horizon's first node);
    otherwise zero forces. The NN always evaluates (fixed-shape graph) and
    jnp.where selects.
    """
    rel = (other_pred_x - ego_pred_x)[..., 0:6]
    forces = mlp_forward(params, rel, compute_dtype)  # (..., N+1, 3)
    if ego_gate_pos is None:
        ego_gate_pos = ego_pred_x[..., 0, 0:2]
    else:
        ego_gate_pos = ego_gate_pos[..., 0:2]
    d0 = other_pred_x[..., 0, 0:2] - ego_gate_pos
    inside = jnp.sum(d0 * d0, axis=-1) < r_horiz**2
    return jnp.where(inside[..., None, None], forces, 0.0)


def spectral_normalize(params: MlpParams, sn: float) -> MlpParams:
    """Project every weight matrix with sigma_max > sn onto the sn-ball
    (exact SVD projection, as in `nn_train.py:150-157`)."""
    if sn <= 0:
        return params
    ws = []
    for w in params.weights:
        sigma = jnp.linalg.norm(w, ord=2)
        scale = jnp.where(sigma > sn, sn / sigma, 1.0)
        ws.append(w * scale)
    return MlpParams(tuple(ws), params.biases)


def make_trainer(sn: float = 4.0, lr: float = 1e-4):
    """Full-batch Adam + MSE + spectral-norm projection, matching
    `nn_train.py:84,138-157` (Adam lr=1e-4, MSELoss, projection after every
    step). Returns (init_opt, train_step, loss_fn)."""
    import optax

    opt = optax.adam(lr)

    def loss_fn(params, x, y):
        pred = mlp_forward(params, x)
        return jnp.mean((pred - y) ** 2)

    @jax.jit
    def train_step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        params = spectral_normalize(params, sn)
        return params, opt_state, loss

    return opt.init, train_step, jax.jit(loss_fn)
