"""Checkpoint / resume for long batch runs.

The reference checkpoints only NN weights (torch pickles,
`nn_train.py:170-172`); the controller deliberately resets across
trajectories. For swarm-scale batch episodes we additionally persist the
full episode pytree (plant + solver iterates + estimator + metrics) so
multi-hour runs survive preemption. Orbax if available, npz fallback.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.abspath(path), tree, force=True)
        ckpt.wait_until_finished()
        return
    except Exception:
        pass
    leaves, treedef = jax.tree.flatten(tree)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        *[np.asarray(l) for l in leaves],
    )


def restore_pytree(path: str, like):
    """Restore into the structure of `like` (a template pytree)."""
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(os.path.abspath(path), target=like)
    except Exception:
        pass
    npz = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz)
    leaves, treedef = jax.tree.flatten(like)
    new_leaves = [
        jax.numpy.asarray(data[f"arr_{i}"]) for i in range(len(leaves))
    ]
    return jax.tree.unflatten(treedef, new_leaves)
