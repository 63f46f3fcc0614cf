"""Formation semantics: leader/follower offsets + low-pass filtering.

Replaces the reference's ROS pub/sub formation machinery with pure array ops
along the swarm axis:

- the leader's 20 Hz position-switched offset rule
  (`nmpc_leader_node.py:37-46` / `ndp_nmpc_leader_node.py:49-58`),
- the followers' per-message alpha filtering (alpha = 0.8 at 20 Hz,
  `nmpc_follower_node.py:33,44-56`), rate-converted to the control period via
  an equivalent time constant,
- the PredXU reference-horizon offsetting (`nmpc_follower_node.py:58-75`).
"""

from __future__ import annotations

import jax.numpy as jnp


def reference_formation_offsets(leader_x: jnp.ndarray, n_drones: int) -> jnp.ndarray:
    """The reference's switching offsets, generalized to D drones.

    Drone 0 is the leader (offset 0). For the 3-drone launch configs drones 1
    ("xiao_feng") and 2 ("smile_boy") reproduce `pub_formation_ref_callback`:
    when |leader_x - 1| > 2: xf=(0,0,0.5), sb=(0,-1,0); else xf=(0,1,0),
    sb=(0,-1,0). Additional drones stack in -y.
    """
    far = jnp.abs(leader_x[..., 0] - 1.0) > 2.0  # (...,)
    xf = jnp.where(
        far[..., None],
        jnp.asarray([0.0, 0.0, 0.5], leader_x.dtype),
        jnp.asarray([0.0, 1.0, 0.0], leader_x.dtype),
    )
    rows = [jnp.zeros_like(xf), xf]
    for k in range(2, n_drones):
        rows.append(
            jnp.broadcast_to(
                jnp.asarray([0.0, -(k - 1.0), 0.0], leader_x.dtype), xf.shape
            )
        )
    return jnp.stack(rows[:n_drones], axis=-2)  # (..., D, 3)


def rate_converted_alpha(alpha_src: float, ts_src: float, ts_dst: float) -> float:
    """Map a first-order filter coefficient between update rates by matching
    the continuous time constant: tau = -ts/ln(alpha)."""
    import math

    return float(math.exp(math.log(alpha_src) * ts_dst / ts_src))


def offset_references(
    leader_xr: jnp.ndarray,  # (N+1, 10) leader's published reference horizon
    leader_ur: jnp.ndarray,  # (N, 4)
    offsets: jnp.ndarray,  # (D, 3) filtered formation offsets
):
    """Follower references: leader horizon + position offset
    (`nmpc_follower_node.py:63-71`); controls copied verbatim."""
    D = offsets.shape[0]
    xr = jnp.broadcast_to(leader_xr, (D,) + leader_xr.shape)
    xr = xr.at[..., 0:3].add(offsets[:, None, :])
    ur = jnp.broadcast_to(leader_ur, (D,) + leader_ur.shape)
    return xr, ur
