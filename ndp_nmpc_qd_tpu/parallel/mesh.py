"""Multi-chip scale-out: scenario/swarm sharding over a device mesh.

This replaces the reference's distribution story — one OS process per drone
exchanging horizons over TCPROS (`launch/three_qd_nmpc_formation.launch`,
`nmpc_node.py:109`) — with GSPMD sharding:

- axis "data": independent NMPC scenarios (swarm instance x disturbance
  sample), the primary scale-out dimension (pure data parallel over ICI/DCN).
- axis "swarm": drones within one swarm instance. The cross-drone state
  exchange (the PredXU topic) becomes an `all_gather` along this axis inside
  `shard_map`; XLA lowers it onto ICI neighbors.

`make_sharded_swarm_step` builds the fully-sharded per-tick function for
`dryrun_multichip` and pod-scale benchmarks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, swarm_axis: int = 1) -> Mesh:
    """Mesh over (data, swarm). swarm_axis devices cooperate on one swarm
    instance; the rest scale out scenarios."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % swarm_axis == 0, (n, swarm_axis)
    devs = np.asarray(devs[:n]).reshape(n // swarm_axis, swarm_axis)
    return Mesh(devs, ("data", "swarm"))


def shard_scenarios(mesh: Mesh, tree):
    """Place a pytree with a leading scenario axis: sharded over 'data',
    replicated over 'swarm'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if getattr(x, "ndim", 0) >= 1 else x,
        tree,
    )


def make_sharded_swarm_step(cfg, ctl, mesh: Mesh, downwash_params=None):
    """One swarm control tick with drones sharded over 'swarm' and scenarios
    over 'data'.

    Each device owns a (scenario-shard, drone-shard) block. Per tick:
    1. `all_gather` every drone's current state along the swarm axis — the
       collective analog of the PredXU pub/sub hop (`nmpc_node.py:116-133`),
    2. each shard computes the downwash forces its LOCAL drones receive from
       ALL drones (gathered states; NN if params given, else analytic model),
    3. follower references = leader horizon (replicated input) + offsets,
    4. one vmapped RTI solve for the local drones,
    5. `psum` of solver-health across the swarm for a per-scenario flag.

    Returns step(rti_state, x0, leader_xr, leader_ur, offsets) ->
    (u0, new_state, n_ok) with global shapes:
      rti_state: (S, D, ...), x0: (S, D, 10), leader_xr: (S, N+1, 10),
      leader_ur: (S, N, 4), offsets: (S, D, 3).
    """
    from jax import shard_map

    from ..models.downwash_mlp import mlp_forward
    from ..sim.downwash_truth import analytic_downwash

    N = cfg.ocp.N_node

    def local_step(rti, x0, xr_lead, ur_lead, offsets):
        S, Dl = x0.shape[:2]

        # 1. PredXU hop as a collective: gather all drones' states
        x_all = jax.lax.all_gather(x0, "swarm", axis=1, tiled=True)  # (S, D, 10)

        # 2. downwash on local drones from every gathered drone
        rel = x_all[:, None, :, 0:6] - x0[:, :, None, 0:6]  # (S, Dl, D, 6)
        if downwash_params is not None:
            f_pair = mlp_forward(downwash_params, rel)
        else:
            f_pair = analytic_downwash(rel)
        # zero self-interaction (rel == 0 rows)
        self_mask = jnp.all(rel == 0.0, axis=-1, keepdims=True)
        f_pair = jnp.where(self_mask, 0.0, f_pair)
        f_now = jnp.sum(f_pair, axis=2)  # (S, Dl, 3)
        f_dist = jnp.broadcast_to(
            f_now[:, :, None, :], (S, Dl, N + 1, 3)
        )

        # 3. follower references from the (replicated) leader horizon
        xr = jnp.broadcast_to(
            xr_lead[:, None], (S, Dl) + xr_lead.shape[1:]
        ).at[..., 0:3].add(offsets[:, :, None, :])
        ur = jnp.broadcast_to(ur_lead[:, None], (S, Dl) + ur_lead.shape[1:])

        # 4. local RTI solves
        upd = jax.vmap(jax.vmap(ctl.update))
        u0, rti, info = upd(rti, x0, xr, ur, f_dist)

        # 5. swarm-wide health
        n_ok = jax.lax.psum(
            jnp.sum(info.ok.astype(jnp.int32), axis=1), axis_name="swarm"
        )
        return u0, rti, n_ok

    spec_state = P("data", "swarm")
    spec_lead = P("data")

    step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec_state, spec_state, spec_lead, spec_lead, spec_state),
        out_specs=(spec_state, spec_state, P("data")),
        check_vma=False,
    )
    return jax.jit(step)
