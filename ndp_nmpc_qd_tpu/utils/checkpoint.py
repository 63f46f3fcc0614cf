"""Checkpoint / resume for long batch runs.

The reference checkpoints only NN weights (torch pickles,
`nn_train.py:170-172`); the controller deliberately resets across
trajectories. For swarm-scale batch episodes we additionally persist the
full episode pytree (plant + solver iterates + estimator + metrics) so
multi-hour runs survive preemption.

Backend policy: orbax when importable, npz otherwise — decided by the
IMPORT only. A real save/restore failure (corrupt dir, bad perms, schema
mismatch) RAISES; it must never silently fall through to a stale npz from
an earlier run. Restore picks the backend from what is actually on disk
(an orbax checkpoint is a directory; the npz fallback is `<path>.npz`),
so save and restore always agree.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _sub_lanes() -> int:
    # packed-kernel-layout leaves (kernel-resident RtiState) have shapes
    # that depend on the QD_TPU_SUB tile configuration chosen at import
    from ..ops.pallas.riccati import SUB

    return int(SUB)


def _meta_path(path: str) -> str:
    return path + ".meta.json"


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except ImportError:
        return None


def _npz_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save_pytree(path: str, tree) -> None:
    # sidecar layout metadata (ADVICE r4): a checkpoint saved under
    # QD_TPU_SUB=16 (the shipped bench/mission config) holds packed-layout
    # leaves a SUB=8 process cannot legally reinterpret — record the tile
    # config so restore fails loudly instead of shape-mismatching later
    with open(_meta_path(path), "w") as f:
        json.dump({"sub_lanes": _sub_lanes()}, f)
    ocp = _orbax()
    if ocp is not None:
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.abspath(path), tree, force=True)
        ckpt.wait_until_finished()
        return
    leaves, _ = jax.tree.flatten(tree)
    np.savez(_npz_path(path), *[np.asarray(l) for l in leaves])


def restore_pytree(path: str, like):
    """Restore into the structure of `like` (a template pytree).

    Backend is chosen by what exists on disk: an orbax directory at `path`
    wins over a sibling npz; neither existing raises FileNotFoundError.
    """
    apath = os.path.abspath(path)
    # validate the tile configuration before touching leaf data (sidecar
    # written by save_pytree; absent for pre-round-5 checkpoints, whose
    # shape mismatch the leaf check below still catches on the npz path)
    mpath = _meta_path(path)
    if os.path.exists(mpath):
        with open(mpath) as f:
            meta = json.load(f)
        saved_sub = int(meta.get("sub_lanes", -1))
        if saved_sub != _sub_lanes():
            raise ValueError(
                f"checkpoint {path} was saved with QD_TPU_SUB={saved_sub} "
                f"but this process runs SUB={_sub_lanes()}; packed-layout "
                "leaves are not interchangeable across tile configs — set "
                "QD_TPU_SUB before importing ndp_nmpc_qd_tpu to restore"
            )
    ocp = _orbax()
    if os.path.isdir(apath):
        if ocp is None:
            raise RuntimeError(
                f"checkpoint {path} is an orbax directory but orbax is not "
                "importable in this environment"
            )
        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(apath, target=like)
    npz = _npz_path(path)
    if not os.path.exists(npz):
        raise FileNotFoundError(f"no checkpoint at {path} (dir) or {npz}")
    data = np.load(npz)
    leaves, treedef = jax.tree.flatten(like)
    new_leaves = []
    for i, tmpl in enumerate(leaves):
        a = data[f"arr_{i}"]
        want = tuple(getattr(tmpl, "shape", ()))
        if tuple(a.shape) != want:
            raise ValueError(
                f"checkpoint {npz} leaf {i} has shape {tuple(a.shape)}, "
                f"template expects {want} (different episode config or "
                "packed-layout tile size)"
            )
        new_leaves.append(jax.numpy.asarray(a))
    return jax.tree.unflatten(treedef, new_leaves)
