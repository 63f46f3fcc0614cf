"""Failure detection and in-batch recovery.

The reference's failure story is crash-and-restart: acados status != 0
raises, killing the ROS node (`nmpc_body_rate_ctl.py:109-110`), and the
launch file's respawn="true" restarts it (`launch/one_qd_nmpc.launch:4`),
after which `__init__` re-seeds the controller from a hold-point reference.

In a batched SPMD program a host exception for one scenario would kill all
of them, so recovery is data: `recover_rti` rebuilds the solver iterates of
every unhealthy scenario from its reference trajectory (exactly the
`reset()` semantics, `nmpc_body_rate_ctl.py:86-91`) while leaving healthy
scenarios' warm starts untouched. `screen_nan` extends the health flag with
non-finite screens on arbitrary pytrees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..solver.rti import RtiState


def screen_nan(tree, ok: jnp.ndarray) -> jnp.ndarray:
    """AND per-scenario finiteness of every leaf into ok.

    Leaves must have a leading scenario axis matching ok's shape.
    """

    def leaf_ok(x):
        axes = tuple(range(ok.ndim, x.ndim))
        return jnp.all(jnp.isfinite(x), axis=axes)

    flags = [leaf_ok(x) for x in jax.tree.leaves(tree)]
    for f in flags:
        ok = ok & f
    return ok


def pack_ok(ok: jnp.ndarray) -> jnp.ndarray:
    """(B,) health flags -> packed (nb, SUB, 128) lane flags (padding lanes
    healthy), for the kernel-layout-resident RtiState mode."""
    from ..ops.pallas.riccati import BLOCK, pack

    pad = (-ok.shape[0]) % BLOCK
    if pad:
        ok = jnp.concatenate([ok, jnp.ones((pad,), bool)])
    return pack(ok[:, None, None])[0, 0]


def screen_nan_packed(tree, okp: jnp.ndarray) -> jnp.ndarray:
    """`screen_nan` for kernel-layout leaves: the scenario axes are the
    TRAILING (nb, SUB, 128); okp is packed lane flags from `pack_ok`."""

    def leaf_ok(x):
        axes = tuple(range(0, x.ndim - 3))
        return jnp.all(jnp.isfinite(x), axis=axes)

    for f in [leaf_ok(x) for x in jax.tree.leaves(tree)]:
        okp = okp & f
    return okp


def recover_rti_packed(
    state: RtiState, okp: jnp.ndarray, xr_p: jnp.ndarray, ur_p: jnp.ndarray
) -> RtiState:
    """`recover_rti` for the kernel-layout-resident state: okp packed lane
    flags; xr_p/ur_p the reset targets ALREADY in kernel layout."""
    ipm = state.ipm
    if ipm is not None:
        lul, luu, lxl, lxu, mu = ipm
        ipm = (
            jnp.where(okp, lul, 0.0), jnp.where(okp, luu, 0.0),
            jnp.where(okp, lxl, 0.0), jnp.where(okp, lxu, 0.0),
            jnp.where(okp, mu, -1.0),  # cold sentinel
        )
    return RtiState(
        x_bar=jnp.where(okp, state.x_bar, xr_p),
        u_bar=jnp.where(okp, state.u_bar, ur_p),
        ipm=ipm,
    )


def recover_rti(
    state: RtiState, ok: jnp.ndarray, xr: jnp.ndarray, ur: jnp.ndarray
) -> RtiState:
    """Re-seed unhealthy scenarios' iterates from the reference.

    state: batched RtiState (B, ...); ok: (B,) health flags;
    xr (B, N+1, nx), ur (B, N, nu): the reset targets.
    """
    m = ok[:, None, None]
    ipm = state.ipm
    if ipm is not None:
        # re-seeded scenarios also drop their QP warm start: zero the carried
        # multipliers and set the cold sentinel mu = -1 (see RtiState.ipm)
        lul, luu, lxl, lxu, mu = ipm
        mk = ok[:, None, None]
        ipm = (
            jnp.where(mk, lul, 0.0), jnp.where(mk, luu, 0.0),
            jnp.where(mk, lxl, 0.0), jnp.where(mk, lxu, 0.0),
            jnp.where(ok, mu, -1.0),
        )
    return RtiState(
        x_bar=jnp.where(m, state.x_bar, xr),
        u_bar=jnp.where(m, state.u_bar, ur),
        ipm=ipm,
    )
