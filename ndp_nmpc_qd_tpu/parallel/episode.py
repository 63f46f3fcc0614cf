"""Shard the REAL closed-loop episode over a (data, swarm) device mesh.

`sim/closed_loop.py` is the product: controller + estimator + plant +
one-tick-delayed PredXU exchange + r_horiz-gated NDP forecast per 50 Hz
tick. This module runs THAT program multi-chip — not a simplified stand-in:

- mesh axis "data": independent scenarios (per-scenario episode instances),
  pure data parallel.
- mesh axis "swarm": the drone axis WITHIN one episode. `make_episode` is
  built with `swarm_axis_name="swarm"`, so every cross-drone dependency —
  the leader's state/previous horizon (the PredXU pub/sub hop,
  `nmpc_node.py:116-133`), the NDP companion horizon
  (`ndp_nmpc_leader_node.py:60-76`), and the plant-side wake coupling —
  becomes an `all_gather` along the mesh axis inside the jitted scan.

The asynchrony semantics of the reference (followers consume the leader's
PREVIOUS published horizon; the estimator freezes while tracking) are
preserved verbatim because the sharded step IS the unsharded step — the
gathers replace in-array indexing one-for-one.
`tests/test_sharded_episode.py` asserts sharded == unsharded episode
metrics/state over a full mission on the virtual CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sim.closed_loop import make_episode


def _state_spec(leaf) -> P:
    """Spec for one UNTILED EpisodeState leaf: scalars replicate over swarm
    and shard over data (after the scenario tiling); per-drone arrays shard
    their leading drone axis over swarm."""
    return P("data") if getattr(leaf, "ndim", 0) == 0 else P("data", "swarm")


def make_sharded_episode(
    cfg,
    traj,
    mesh: Mesh,
    *,
    n_drones: int,
    scenario_batch: int,
    record_traces: bool = False,
    **episode_kwargs,
):
    """Build (init_fn, run_fn) for the full episode sharded over `mesh`.

    init_fn(dtype, perturb=None) -> EpisodeState with leaves
      (S, D, ...) sharded P("data", "swarm") / (S,) sharded P("data").
      `perturb`: optional (S, D, 3) position offsets added to the initial
      plant positions so scenarios differ.
    run_fn(state, n_ticks) -> (state, metrics, traces): one jitted
      shard_map'd scan of the full mission.
    """
    n_sw = mesh.shape["swarm"]
    n_data = mesh.shape["data"]
    assert n_drones % n_sw == 0, (n_drones, n_sw)
    assert scenario_batch % n_data == 0, (scenario_batch, n_data)
    S = scenario_batch

    init_fn, step_fn, run_fn = make_episode(
        cfg,
        traj,
        n_drones=n_drones,
        record_traces=record_traces,
        swarm_axis_name="swarm",
        swarm_shards=n_sw,
        **episode_kwargs,
    )
    # unsharded twin (identical output STRUCTURE/ranks) for abstract shape
    # derivation — the sharded step can only be traced under shard_map
    _, _, run_unsharded = make_episode(
        cfg,
        traj,
        n_drones=n_drones,
        record_traces=record_traces,
        **episode_kwargs,
    )

    def init_sharded(dtype=jnp.float32, perturb=None):
        st = init_fn(dtype=dtype)  # global drone axis, no scenario axis
        specs = jax.tree.map(_state_spec, st)  # specs from UNTILED leaves
        st = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (S,) + a.shape), st
        )
        if perturb is not None:
            st = st._replace(
                plant=st.plant._replace(
                    x=st.plant.x.at[..., 0:3].add(
                        jnp.asarray(perturb, st.plant.x.dtype)
                    )
                )
            )
        return jax.tree.map(
            lambda a, sp: jax.device_put(a, NamedSharding(mesh, sp)), st, specs
        )

    # spec trees from abstract evaluation (no device memory touched)
    st_shape = jax.eval_shape(lambda: init_fn(dtype=jnp.float32))
    state_specs = jax.tree.map(_state_spec, st_shape)

    def run_sharded(state, n_ticks: int):
        from jax import shard_map

        _, metrics_shape, traces_shape = jax.eval_shape(
            lambda s: run_unsharded(s, n_ticks), st_shape
        )
        # per-drone metric leaves shard over swarm; scalar leaves (e.g. the
        # `recovered` re-seed counter, replicated by psum) only over data
        metric_specs = jax.tree.map(_state_spec, metrics_shape)
        # traces stack ticks ahead of the drone axis: (T, D, ...)
        trace_specs = jax.tree.map(
            lambda _: P("data", None, "swarm"), traces_shape
        )

        local = jax.vmap(lambda s: run_fn(s, n_ticks))
        f = shard_map(
            local,
            mesh=mesh,
            in_specs=(state_specs,),
            out_specs=(state_specs, metric_specs, trace_specs),
            check_vma=False,
        )
        return jax.jit(f)(state)

    return init_sharded, run_sharded
