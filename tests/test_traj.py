"""Trajectory layer tests: min-snap fitting properties, piecewise evaluation,
differential-flatness consistency (feed-forward rollout follows the flat
state), and reference generation."""

import jax
import jax.numpy as jnp
import numpy as np

from ndp_nmpc_qd_tpu.models.quadrotor import body_rate_dynamics
from ndp_nmpc_qd_tpu.ops.integrators import rk4_step
from ndp_nmpc_qd_tpu.params import OcpParams, VehicleParams
from ndp_nmpc_qd_tpu.traj.flatness import diff_flatness
from ndp_nmpc_qd_tpu.traj.polyopt import (
    MinMethod,
    eval_traj,
    fit_1d,
    fit_waypoints,
)
from ndp_nmpc_qd_tpu.traj.refgen import gen_fix_pt_ref, nmpc_refs
import pytest

# fast tier (VERDICT r4 item 7): this whole file is in the <5 min smoke set
pytestmark = pytest.mark.smoke

VEH = VehicleParams()
OCP = OcpParams()


def eight_trajectory():
    """Figure-eight waypoints (the eight_high_dyn.yaml role)."""
    t = np.linspace(0, 2 * np.pi, 9)
    wpts = np.stack(
        [2.0 * np.sin(t), 1.0 * np.sin(2 * t), 1.0 + 0.3 * np.sin(t)], axis=-1
    )
    yaw = 0.3 * np.sin(t)
    t_seg = np.full(8, 1.5)
    return fit_waypoints(wpts, t_seg, yaw), wpts, yaw, t_seg


def test_fit_interpolates_waypoints(rng):
    wpts = rng.standard_normal(6)
    c = fit_1d(wpts, MinMethod.SNAP)
    assert c.shape == (5, 8)
    for i in range(5):
        np.testing.assert_allclose(np.polyval(c[i][::-1], 0.0), wpts[i], atol=1e-8)
        np.testing.assert_allclose(np.polyval(c[i][::-1], 1.0), wpts[i + 1], atol=1e-8)


def test_fit_boundary_derivatives_zero(rng):
    wpts = rng.standard_normal(5)
    c = fit_1d(wpts, MinMethod.SNAP)
    for k in range(1, 4):
        d0 = np.polyder(np.poly1d(c[0][::-1]), k)(0.0)
        d1 = np.polyder(np.poly1d(c[-1][::-1]), k)(1.0)
        assert abs(d0) < 1e-7 and abs(d1) < 1e-7


def test_fit_continuity(rng):
    wpts = rng.standard_normal(5)
    c = fit_1d(wpts, MinMethod.SNAP)
    for i in range(3):
        for k in range(1, 7):
            end = np.polyder(np.poly1d(c[i][::-1]), k)(1.0)
            start = np.polyder(np.poly1d(c[i + 1][::-1]), k)(0.0)
            np.testing.assert_allclose(end, start, atol=1e-6 * max(1, abs(end)))


def test_eval_traj_matches_numpy_reference():
    traj, wpts, yaw, t_seg = eight_trajectory()
    t_cum = np.concatenate([[0.0], np.cumsum(t_seg)])
    ts = np.linspace(0.0, t_cum[-1] - 1e-9, 57)
    fo = eval_traj(traj, jnp.asarray(ts))

    cx = np.asarray(traj.coeff_xyz)
    for j, t in enumerate(ts):
        i = int(np.searchsorted(t_cum, t, side="right") - 1)
        i = min(i, len(t_seg) - 1)
        tau = (t - t_cum[i]) / t_seg[i]
        for ax in range(3):
            poly = np.poly1d(cx[i, :, ax][::-1])
            np.testing.assert_allclose(
                float(fo.pos[j, ax]), poly(tau), atol=1e-9
            )
            np.testing.assert_allclose(
                float(fo.vel[j, ax]), np.polyder(poly, 1)(tau) / t_seg[i], atol=1e-8
            )
            np.testing.assert_allclose(
                float(fo.jerk[j, ax]),
                np.polyder(poly, 3)(tau) / t_seg[i] ** 3,
                atol=1e-7,
            )


def test_eval_traj_waypoint_hits_and_finish():
    traj, wpts, yaw, t_seg = eight_trajectory()
    t_cum = np.concatenate([[0.0], np.cumsum(t_seg)])
    fo = eval_traj(traj, jnp.asarray(t_cum[:-1]))
    np.testing.assert_allclose(np.asarray(fo.pos), wpts[:-1], atol=1e-7)

    # beyond the end: hover at final_pt with zero derivatives and yaw 0
    fo_end = eval_traj(traj, jnp.asarray([t_cum[-1] + 0.5]))
    np.testing.assert_allclose(np.asarray(fo_end.pos[0]), wpts[-1], atol=1e-9)
    assert float(jnp.abs(fo_end.vel).max()) == 0.0
    assert float(fo_end.yaw[0]) == 0.0


def test_flatness_hover():
    """Zero acc/jerk/yaw -> identity attitude, u = [0,0,0,g]."""
    from ndp_nmpc_qd_tpu.traj.polyopt import FlatOutputs

    z = jnp.zeros(3)
    fo = FlatOutputs(jnp.asarray([1.0, 2.0, 3.0]), z, z, z, jnp.asarray(0.0), jnp.asarray(0.0))
    fs = diff_flatness(fo, mass=VEH.mass, gravity=VEH.gravity)
    np.testing.assert_allclose(np.asarray(fs.x[6:10]), [1, 0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(fs.u), [0, 0, 0, VEH.gravity], atol=1e-12)


def test_flatness_instantaneous_consistency():
    """The flat (x, u) must satisfy the model exactly wherever the flat map
    is exact: velocity rows, acceleration rows (thrust direction), and the
    tilt components of the attitude kinematics (d/dt z_b == h_omega). The
    yaw body-rate r is approximate BY DESIGN in the reference
    (`pt_publisher.py:231`), so it is excluded here — closed-loop tests carry
    that burden."""
    traj, *_ = eight_trajectory()
    ts = np.linspace(0.05, 11.9, 41)
    fo = eval_traj(traj, jnp.asarray(ts))
    fs = diff_flatness(fo, mass=VEH.mass, gravity=VEH.gravity)

    ds = body_rate_dynamics(fs.x, fs.u, mass=VEH.mass, gravity=VEH.gravity)
    # velocity and acceleration rows match the flat outputs exactly
    np.testing.assert_allclose(np.asarray(ds[:, 0:3]), np.asarray(fo.vel), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ds[:, 3:6]), np.asarray(fo.acc), atol=1e-9)

    # d/dt z_b from quaternion kinematics == h_omega (numerical derivative)
    eps = 1e-5
    fo_p = eval_traj(traj, jnp.asarray(ts + eps))
    fo_m = eval_traj(traj, jnp.asarray(ts - eps))
    fs_p = diff_flatness(fo_p, mass=VEH.mass, gravity=VEH.gravity)
    fs_m = diff_flatness(fo_m, mass=VEH.mass, gravity=VEH.gravity)
    from ndp_nmpc_qd_tpu.ops import quat

    zb = quat.rotate(fs.x[:, 6:10], jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (41, 3)))
    zb_p = quat.rotate(fs_p.x[:, 6:10], jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (41, 3)))
    zb_m = quat.rotate(fs_m.x[:, 6:10], jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (41, 3)))
    zb_dot_num = (np.asarray(zb_p) - np.asarray(zb_m)) / (2 * eps)
    u1 = np.linalg.norm(np.asarray(fo.acc) + np.asarray([0, 0, VEH.gravity]), axis=-1)
    h_w = (np.asarray(fo.jerk) - np.sum(np.asarray(zb) * np.asarray(fo.jerk), -1, keepdims=True) * np.asarray(zb)) / u1[:, None]
    np.testing.assert_allclose(zb_dot_num, h_w, atol=1e-5)


def test_flatness_feedforward_rollout_gentle_trajectory():
    """On a gentle trajectory the approximate-r error is negligible, so the
    feed-forward rollout must track the flat state closely."""
    wpts = np.stack(
        [np.linspace(0, 2, 5), np.zeros(5), 1.0 + 0.1 * np.arange(5) % 2], axis=-1
    )
    traj = fit_waypoints(wpts, np.full(4, 4.0))
    dt = 0.005
    n = int(10.0 / dt)
    ts = np.arange(n + 1) * dt
    fo = eval_traj(traj, jnp.asarray(ts))
    fs = diff_flatness(fo, mass=VEH.mass, gravity=VEH.gravity)

    def f(x, u):
        return body_rate_dynamics(x, u, mass=VEH.mass, gravity=VEH.gravity)

    def step(x, u):
        x2 = rk4_step(f, x, u, dt)
        return x2, x2

    _, xs = jax.lax.scan(step, fs.x[0], fs.u[:-1])
    err = float(jnp.max(jnp.linalg.norm(xs[:, :3] - fs.x[1:, :3], axis=-1)))
    assert err < 5e-3, err


def test_gen_fix_pt_ref_matches_reference_quirk():
    x_now = jnp.asarray([1.0, 2.0, 3.0, 0.1, 0.2, 0.3, 0.9, 0.1, 0.2, 0.3])
    xr, ur = gen_fix_pt_ref(x_now, OCP, VEH)
    assert xr.shape == (21, 10) and ur.shape == (20, 4)
    np.testing.assert_allclose(np.asarray(xr[7]), np.asarray(x_now))
    # the reference packs mass*gravity (a force) into the accel slot
    np.testing.assert_allclose(
        np.asarray(ur[:, 3]), VEH.mass * VEH.gravity, atol=1e-12
    )


def test_nmpc_refs_shapes_and_stride():
    traj, *_ = eight_trajectory()
    xr, ur = nmpc_refs(traj, jnp.asarray(1.0), OCP, VEH)
    assert xr.shape == (21, 10) and ur.shape == (20, 4)
    # node j corresponds to t + j*th_pred
    fo = eval_traj(traj, jnp.asarray(1.0 + 3 * OCP.th_pred))
    np.testing.assert_allclose(np.asarray(xr[3, :3]), np.asarray(fo.pos), atol=1e-9)

    # batched time
    xr_b, ur_b = nmpc_refs(traj, jnp.asarray([0.5, 1.0]), OCP, VEH)
    assert xr_b.shape == (2, 21, 10) and ur_b.shape == (2, 20, 4)
    np.testing.assert_allclose(np.asarray(xr_b[1]), np.asarray(xr), atol=1e-12)
