"""Closed-form minimum-snap/jerk/accel/vel piecewise-polynomial fitting.

TPU-native redesign of the reference's `pt_pub/polym_optimizer.py`: the same
constraint system (per-segment normalized time in [0,1]; waypoint
interpolation at both segment ends, zero boundary derivatives 1..Nd-1 at the
trajectory ends, derivative continuity 1..n-1 at interior waypoints), but

- assembled vectorized (one `np.linalg.solve`, not a dense inverse — the
  reference inverts at `polym_optimizer.py:102`),
- producing a `PiecewisePoly` array container whose *evaluation* is a pure
  jnp function over query times (the hot path on device), replacing the
  reference's pop/append "long list" cache (`pt_publisher.py:62-103`) with
  direct evaluation at all shooting nodes per step.

Fitting runs on host in float64 at mission-setup time (it is not a hot path);
the resulting coefficients are cast to the compute dtype.
"""

from __future__ import annotations

from enum import Enum
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class MinMethod(Enum):
    SNAP = "snap"  # ord_deriv 4 -> degree-7 polynomials
    JERK = "jerk"
    ACCEL = "acceleration"
    VEL = "velocity"


_ORD_DERIV = {
    MinMethod.SNAP: 4,
    MinMethod.JERK: 3,
    MinMethod.ACCEL: 2,
    MinMethod.VEL: 1,
}


def basis_row(order: int, deriv: int, t: float | np.ndarray) -> np.ndarray:
    """Row of the k-th-derivative monomial basis [d^k/dt^k t^j]_{j=0..order}.

    Same quantity as the reference's `get_poly_params`
    (`polym_optimizer.py:104-139`), computed without loops.
    """
    j = np.arange(order + 1)
    # falling factorial j (j-1) ... (j-deriv+1)
    coef = np.ones(order + 1)
    for d in range(deriv):
        coef *= np.maximum(j - d, 0)
    expo = np.maximum(j - deriv, 0)
    return coef * np.power(float(t), expo) * (coef > 0)


def fit_1d(wpts: np.ndarray, method: MinMethod) -> np.ndarray:
    """Fit one channel through waypoints; returns (M, order+1) coefficients.

    The constraint system is square (fully determined), matching the
    reference's construction at `polym_optimizer.py:39-102`.
    """
    wpts = np.asarray(wpts, dtype=np.float64)
    nd = _ORD_DERIV[method]
    n = 2 * nd - 1  # polynomial order
    m = len(wpts) - 1  # segments
    if m < 1:
        raise ValueError("need at least two waypoints")

    size = m * (n + 1)
    a = np.zeros((size, size))
    b = np.zeros(size)
    row = 0
    # p_i(0) = w_i, p_i(1) = w_{i+1}
    for i in range(m):
        c = i * (n + 1)
        a[row, c : c + n + 1] = basis_row(n, 0, 0.0)
        b[row] = wpts[i]
        row += 1
    for i in range(m):
        c = i * (n + 1)
        a[row, c : c + n + 1] = basis_row(n, 0, 1.0)
        b[row] = wpts[i + 1]
        row += 1
    # zero boundary derivatives 1..nd-1 at start and end
    for k in range(1, nd):
        a[row, 0 : n + 1] = basis_row(n, k, 0.0)
        row += 1
    for k in range(1, nd):
        c = (n + 1) * (m - 1)
        a[row, c : c + n + 1] = basis_row(n, k, 1.0)
        row += 1
    # derivative continuity 1..n-1 at interior waypoints
    for i in range(m - 1):
        c = i * (n + 1)
        for k in range(1, n):
            a[row, c : c + n + 1] = basis_row(n, k, 1.0)
            a[row, c + n + 1 : c + 2 * (n + 1)] = -basis_row(n, k, 0.0)
            row += 1
    assert row == size, (row, size)
    coeff = np.linalg.solve(a, b)
    return coeff.reshape(m, n + 1)


class PiecewisePoly(NamedTuple):
    """Piecewise polynomial trajectory (per-segment normalized time).

    Array fields so the whole object is a jit-friendly pytree. Mirrors the
    reference `TrajCoefficients` message (`msg/TrajCoefficients.msg`).
    """

    coeff_xyz: jnp.ndarray  # (M, 8, 3) degree-7 per axis
    coeff_yaw: jnp.ndarray  # (M, 4) degree-3
    t_seg: jnp.ndarray  # (M,)
    t_cum: jnp.ndarray  # (M+1,) cumulative times, t_cum[0] = 0
    final_pt: jnp.ndarray  # (3,) hover point after the trajectory ends


def fit_waypoints(
    wpts_xyz: np.ndarray,
    t_seg: np.ndarray,
    wpts_yaw: np.ndarray | None = None,
    *,
    xyz_method: MinMethod = MinMethod.SNAP,
    yaw_method: MinMethod = MinMethod.ACCEL,
    dtype=None,
) -> PiecewisePoly:
    """Fit xyz (min-snap) + yaw (min-accel) through waypoints.

    Defaults match `BasePtPublisher.__init__` (`base_pt_publisher.py:22-26`).
    """
    if dtype is None:
        import jax

        # widest available float: f64 under x64, f32 otherwise (no warning)
        dtype = jax.dtypes.canonicalize_dtype(jnp.float64)
    wpts_xyz = np.asarray(wpts_xyz, dtype=np.float64)
    t_seg = np.asarray(t_seg, dtype=np.float64)
    m = len(t_seg)
    assert wpts_xyz.shape == (m + 1, 3)
    if wpts_yaw is None:
        wpts_yaw = np.zeros(m + 1)

    cx = np.stack([fit_1d(wpts_xyz[:, k], xyz_method) for k in range(3)], axis=-1)
    cyaw = fit_1d(wpts_yaw, yaw_method)
    t_cum = np.concatenate([[0.0], np.cumsum(t_seg)])
    return PiecewisePoly(
        coeff_xyz=jnp.asarray(cx, dtype),
        coeff_yaw=jnp.asarray(cyaw, dtype),
        t_seg=jnp.asarray(t_seg, dtype),
        t_cum=jnp.asarray(t_cum, dtype),
        final_pt=jnp.asarray(wpts_xyz[-1], dtype),
    )


def pad_traj(traj: PiecewisePoly, n_seg: int) -> PiecewisePoly:
    """Pad to `n_seg` segments with zero-length tail segments (the same
    static-shape device used by the runtime's MAX_SEG goal padding —
    `eval_traj` guards the zero-length division and any query landing there
    is already in the hover-at-final regime)."""
    m = traj.t_seg.shape[0]
    assert n_seg >= m, (n_seg, m)
    if n_seg == m:
        return traj
    pad = n_seg - m
    return PiecewisePoly(
        coeff_xyz=jnp.concatenate(
            [traj.coeff_xyz, jnp.zeros((pad,) + traj.coeff_xyz.shape[1:],
                                       traj.coeff_xyz.dtype)]
        ),
        coeff_yaw=jnp.concatenate(
            [traj.coeff_yaw, jnp.zeros((pad,) + traj.coeff_yaw.shape[1:],
                                       traj.coeff_yaw.dtype)]
        ),
        t_seg=jnp.concatenate([traj.t_seg, jnp.zeros(pad, traj.t_seg.dtype)]),
        t_cum=jnp.concatenate(
            [traj.t_cum, jnp.broadcast_to(traj.t_cum[-1], (pad,))]
        ),
        final_pt=traj.final_pt,
    )


def stack_trajs(trajs) -> PiecewisePoly:
    """Stack trajectories along a leading axis (padding all to the longest
    segment count), so a batch of missions is one vmappable pytree — the
    per-drone-trajectory form of `launch/four_qd_nmpc.launch:1-25`, where
    each namespaced node receives its own cmd_pc goal."""
    n_seg = max(int(t.t_seg.shape[0]) for t in trajs)
    padded = [pad_traj(t, n_seg) for t in trajs]
    import jax

    return jax.tree.map(lambda *ls: jnp.stack(ls), *padded)


class FlatOutputs(NamedTuple):
    """Flat outputs at query times: the reference's `TrajPt`
    (`msg/TrajPt.msg`), batched."""

    pos: jnp.ndarray  # (..., 3)
    vel: jnp.ndarray
    acc: jnp.ndarray
    jerk: jnp.ndarray
    yaw: jnp.ndarray  # (...,)
    yaw_dot: jnp.ndarray


def eval_traj(traj: PiecewisePoly, t: jnp.ndarray) -> FlatOutputs:
    """Evaluate flat outputs at times t (any batch shape), clamping past the
    end to the reference's hover-at-final-point behavior: position=final_pt,
    vel/acc/jerk = 0, yaw = 0 (`base_pt_publisher.py:93-96` — a fresh TrajPt
    carries yaw 0).
    """
    t = jnp.asarray(t, traj.t_seg.dtype)
    t_all = traj.t_cum[-1]
    finished = t >= t_all
    t_q = jnp.clip(t, 0.0, t_all)

    # segment index: last i with t_cum[i] <= t, clamped to M-1
    idx = jnp.clip(
        jnp.searchsorted(traj.t_cum, t_q, side="right") - 1, 0, traj.t_seg.shape[0] - 1
    )
    # zero-length segments only occur as MAX_SEG padding past the real end
    # (runtime/bus.py static-shape goals); any query landing there has
    # finished=True and is overridden below — guard the division anyway
    ts = jnp.where(traj.t_seg[idx] > 0, traj.t_seg[idx], 1.0)  # (...,)
    tau = (t_q - traj.t_cum[idx]) / ts

    cxyz = traj.coeff_xyz[idx]  # (..., 8, 3)
    cyaw = traj.coeff_yaw[idx]  # (..., 4)

    def poly_derivs(c, tau, n_deriv):
        """c: (..., n+1) coefficients; returns [d0, d1, ..., d_{n_deriv}]
        at normalized tau (before 1/ts^k rescale)."""
        order = c.shape[-1] - 1
        j = jnp.arange(order + 1, dtype=c.dtype)
        outs = []
        fall = jnp.ones(order + 1, dtype=c.dtype)  # falling factorial j!/(j-k)!
        for k in range(n_deriv + 1):
            expo = jnp.maximum(j - k, 0)
            term = c * fall * jnp.power(tau[..., None], expo)
            outs.append(jnp.sum(term, axis=-1))
            fall = fall * jnp.maximum(j - k, 0)
        return outs

    # xyz: derivatives 0..3 (pos/vel/acc/jerk); yaw: 0..1
    d_xyz = poly_derivs(jnp.moveaxis(cxyz, -1, 0), tau, 3)  # each (3, ...)
    d_yaw = poly_derivs(cyaw, tau, 1)

    inv_ts = 1.0 / ts
    pos = jnp.moveaxis(d_xyz[0], 0, -1)
    vel = jnp.moveaxis(d_xyz[1], 0, -1) * inv_ts[..., None]
    acc = jnp.moveaxis(d_xyz[2], 0, -1) * (inv_ts**2)[..., None]
    jerk = jnp.moveaxis(d_xyz[3], 0, -1) * (inv_ts**3)[..., None]
    yaw = d_yaw[0]
    yaw_dot = d_yaw[1] * inv_ts

    fin = finished[..., None]
    pos = jnp.where(fin, traj.final_pt, pos)
    vel = jnp.where(fin, 0.0, vel)
    acc = jnp.where(fin, 0.0, acc)
    jerk = jnp.where(fin, 0.0, jerk)
    yaw = jnp.where(finished, 0.0, yaw)
    yaw_dot = jnp.where(finished, 0.0, yaw_dot)

    return FlatOutputs(pos, vel, acc, jerk, yaw, yaw_dot)
