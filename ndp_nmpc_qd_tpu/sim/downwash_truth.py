"""Ground-truth downwash coupling for the in-graph plant.

The reference's simulator (`dop_sim`, empty submodule) supplies the "real"
rotor-wake interaction the NDP pipeline is supposed to predict. For the
benchmark episodes we provide an analytic axisymmetric jet model — distinct
from the learned MLP so the prediction problem stays non-trivial:

  f(rel) = -A * exp(-r^2 / (2 sigma(z)^2)) * clip(-z/z0, 0, 1) * e_z-ish

with the wake widening below the emitting drone. The shape constants are
chosen so force magnitudes match the trained networks' output scale (~1-4 N
inside the r_horiz = 1 m cylinder).

`pairwise_downwash` sums the coupling over all ordered drone pairs — a dense
(D, D) interaction evaluated as one batched op along the swarm axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def analytic_downwash(rel: jnp.ndarray) -> jnp.ndarray:
    """Force [N] on the EGO drone from one OTHER drone.

    rel: (..., 6) = other_state - ego_state (position and velocity deltas),
    matching the MLP input convention. Positive rel_z means the other drone
    is ABOVE the ego -> ego gets pushed down.
    """
    dx, dy, dz = rel[..., 0], rel[..., 1], rel[..., 2]
    r2 = dx * dx + dy * dy
    # wake widens with distance below the source: sigma 0.25 m near, +0.1/m
    sigma = 0.25 + 0.1 * jnp.clip(dz, 0.0, 3.0)
    radial = jnp.exp(-r2 / (2.0 * sigma * sigma))
    # axial profile: zero at the source plane, peak ~0.8 m below, decays by 3 m
    zprof = jnp.clip(dz / 0.8, 0.0, 1.0) * jnp.exp(-jnp.maximum(dz - 0.8, 0.0) / 1.2)
    fz = -4.0 * radial * zprof  # ~ -4 N directly underneath at 0.8 m
    # small lateral entrainment toward the wake axis
    fx = -0.4 * radial * zprof * dx / (sigma + 1e-6) * 0.25
    fy = -0.4 * radial * zprof * dy / (sigma + 1e-6) * 0.25
    return jnp.stack([fx, fy, fz], axis=-1)


def pairwise_downwash(xs: jnp.ndarray, model=analytic_downwash) -> jnp.ndarray:
    """Total external force on every drone from every other drone.

    xs: (..., D, 10) plant states -> (..., D, 3) forces.
    """
    D = xs.shape[-2]
    idx = jnp.arange(D)
    return downwash_on_locals(xs, xs, idx, model=model)


def downwash_on_locals(
    x_local: jnp.ndarray,
    x_all: jnp.ndarray,
    local_gidx: jnp.ndarray,
    model=analytic_downwash,
) -> jnp.ndarray:
    """Total external force on a LOCAL block of drones from ALL drones.

    The sharded form of `pairwise_downwash`: x_local (..., Dl, 10) is this
    shard's drones, x_all (..., D, 10) the all_gathered swarm, local_gidx
    (Dl,) the local drones' global indices (masks self-interaction).
    Unsharded (x_local = x_all, gidx = arange) this reduces to the dense
    (D, D) pairwise sum.
    """
    ego = x_local[..., :, None, 0:6]  # (..., Dl, 1, 6)
    other = x_all[..., None, :, 0:6]  # (..., 1, D, 6)
    rel = other - ego  # (..., Dl, D, 6) [i=ego, j=other]
    f = model(rel)  # (..., Dl, D, 3)
    D = x_all.shape[-2]
    self_mask = local_gidx[:, None] == jnp.arange(D)[None, :]  # (Dl, D)
    f = jnp.where(self_mask[..., None], 0.0, f)
    return jnp.sum(f, axis=-2)
