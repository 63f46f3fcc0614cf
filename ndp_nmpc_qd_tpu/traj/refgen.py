"""NMPC reference generation: the TPU-native `NMPCRefPublisher`.

The reference maintains a 101-point "long list" it pops/appends each control
tick and strides by 5 to get the N+1 = 21 shooting-node references
(`pt_pub/pt_publisher.py:62-103`, `params/nmpc_params.py:40-43`) — a cache it
needs only because per-point Python evaluation is slow. Here each control
step directly evaluates the trajectory at t + j*th_pred for j = 0..N in one
vectorized, jit-fused call, which is the ideal-timing limit of the long-list
scheme.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..params import OcpParams, VehicleParams
from .flatness import diff_flatness
from .polyopt import PiecewisePoly, eval_traj


def gen_fix_pt_ref(x_now: jnp.ndarray, ocp: OcpParams, vehicle: VehicleParams):
    """Hold-position reference from the current state.

    Matches `NMPCRefPublisher.gen_fix_pt_ref` (`pt_publisher.py:40-55`)
    including its quirk: every node's state reference is the CURRENT odom
    state (velocity and attitude included), and the control reference's
    collective term is mass*gravity — dimensionally a force, used where the
    model expects an acceleration. Reproduced bit-for-bit for parity.
    """
    batch = x_now.shape[:-1]
    xr = jnp.broadcast_to(
        x_now[..., None, :], batch + (ocp.N_node + 1, 10)
    )
    u_fix = jnp.zeros(batch + (4,), x_now.dtype).at[..., 3].set(
        vehicle.mass * vehicle.gravity
    )
    ur = jnp.broadcast_to(u_fix[..., None, :], batch + (ocp.N_node, 4))
    return xr, ur


def nmpc_refs(
    traj: PiecewisePoly,
    t: jnp.ndarray,
    ocp: OcpParams,
    vehicle: VehicleParams,
):
    """References for all shooting nodes at controller time t.

    Evaluates flat outputs at t + j*th_pred (j = 0..N), runs differential
    flatness, and returns (xr (..., N+1, 10), ur (..., N, 4)) — the strided
    view the reference assembles at `pt_publisher.py:78-103` under ideal
    timing.
    `t` may carry a batch shape (per-drone clocks).
    """
    t = jnp.asarray(t, traj.t_seg.dtype)
    offsets = jnp.arange(ocp.N_node + 1, dtype=t.dtype) * ocp.th_pred
    t_nodes = t[..., None] + offsets  # (..., N+1)
    fo = eval_traj(traj, t_nodes)
    fs = diff_flatness(fo, mass=vehicle.mass, gravity=vehicle.gravity)
    return fs.x, fs.u[..., : ocp.N_node, :]


def traj_progress(traj: PiecewisePoly, t: jnp.ndarray):
    """(percent_complete, finished) — the action-feedback quantities
    (`nmpc_node.py:174-181`, finish detection `base_pt_publisher.py:93-96`)."""
    t_all = traj.t_cum[-1]
    return jnp.clip(t / t_all, 0.0, 1.0), t >= t_all
