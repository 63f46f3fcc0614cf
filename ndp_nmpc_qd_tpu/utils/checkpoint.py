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

import os

import jax
import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except ImportError:
        return None


def _npz_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save_pytree(path: str, tree) -> None:
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
    new_leaves = [
        jax.numpy.asarray(data[f"arr_{i}"]) for i in range(len(leaves))
    ]
    return jax.tree.unflatten(treedef, new_leaves)
