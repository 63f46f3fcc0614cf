"""SQP-RTI controller: the TPU-native equivalent of the reference's
`NMPCBodyRateController` / `NDPNMPCBodyRateController`.

Semantics mirrored from the reference exactly:

- `reset(xr, ur)` seeds every shooting-node iterate with the reference,
  deliberately killing warm starts across trajectories
  (`nmpc_ctl/nmpc_body_rate_ctl.py:86-91`).
- `update(state, x0, xr, ur, f_dist)` performs ONE real-time iteration:
  linearize the horizon at the current iterates, solve the Gauss-Newton QP
  with the initial state pinned to x0 (acados `solve_for_x0`,
  `nmpc_body_rate_ctl.py:93-112`), take the full Newton step, and return
  u0 = the first control of the updated iterate. Warm starting *within* a
  trajectory is implicit: the updated iterates carry to the next call.
- The NDP variant threads per-stage disturbance forces through the dynamics
  parameter exactly like `ndp_nmpc_ctl/ndp_nmpc_body_rate_ctl.py:91-112`.

Unlike the reference there are no host exceptions: solver health (final
complementarity, equality residual) is carried in `RtiInfo` as batched arrays
(see SURVEY §5 failure-detection notes).

Everything is a pure function: `jax.vmap(update)` solves a swarm/scenario
batch per call, `jax.jit` fuses reference packing + linearization + QP into a
single device program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..params import OcpParams, VehicleParams
from .ocp import make_ocp_functions
from .qp_ipm import solve_qp


class RtiState(NamedTuple):
    """Shooting-node iterates (the acados solver's internal x/u trajectories).

    `ipm` (batched pallas controller with warm_start=True only) carries the
    QP multipliers + barrier weight across control ticks in batch-first
    layout: (lu_lo, lu_up (B,N,nu), lx_lo, lx_up (B,N+1,3), mu (B,)); mu < 0
    marks a scenario as cold (fresh reset — reproducing the reference's
    warm-start kill, `nmpc_body_rate_ctl.py:86-91`, at the QP level too).
    """

    x_bar: jnp.ndarray  # (N+1, nx)
    u_bar: jnp.ndarray  # (N, nu)
    ipm: tuple | None = None


class RtiInfo(NamedTuple):
    mu: jnp.ndarray  # final IPM complementarity (scalar per scenario)
    eq_res: jnp.ndarray  # final QP equality residual norm
    ok: jnp.ndarray  # bool health flag


class RtiController(NamedTuple):
    """Bundle of pure functions (closures over static config).

    `layout` is the memory layout of `RtiState.x_bar`/`u_bar`: "batch" =
    batch-first (B, s, d); "kernel" = packed batch-on-lanes
    ((s, d, nb, SUB, 128), `packed_state=True`) — use `unpack_iterates` to
    read iterates at consumer boundaries.
    """

    reset: callable
    update: callable
    ocp: OcpParams
    vehicle: VehicleParams
    with_disturbance: bool
    layout: str = "batch"


def unpack_iterates(state: RtiState, B: int):
    """Kernel-layout RtiState -> batch-first (x_bar (B,N+1,10), u_bar)."""
    from ..ops.pallas.riccati import unpack

    return (
        unpack(state.x_bar, (state.x_bar.shape[1],))[:B],
        unpack(state.u_bar, (state.u_bar.shape[1],))[:B],
    )


def make_rti_controller(
    ocp: OcpParams,
    vehicle: VehicleParams,
    *,
    with_disturbance: bool = False,
    qp_iters: int = 12,
    eq_tol: float = 1e-3,
    mehrotra: bool = False,
) -> RtiController:
    linearize_horizon, _phi = make_ocp_functions(ocp, vehicle, with_disturbance)

    def reset(xr: jnp.ndarray, ur: jnp.ndarray) -> RtiState:
        return RtiState(jnp.asarray(xr), jnp.asarray(ur))

    def update(
        state: RtiState,
        x0: jnp.ndarray,
        xr: jnp.ndarray,
        ur: jnp.ndarray,
        f_dist: jnp.ndarray | None = None,
    ):
        if not with_disturbance:
            f_dist = None
        qp = linearize_horizon(state.x_bar, state.u_bar, xr, ur, f_dist)
        dx0 = x0.astype(state.x_bar.dtype) - state.x_bar[0]
        sol = solve_qp(qp, dx0, num_iters=qp_iters, mehrotra=mehrotra)
        new_state = RtiState(state.x_bar + sol.dx, state.u_bar + sol.du)
        u_lo = jnp.asarray(ocp.u_lower(), state.u_bar.dtype)
        u_hi = jnp.asarray(ocp.u_upper(), state.u_bar.dtype)
        # actuator envelope: the EXECUTED command always respects the
        # hardware box even when an unconverged far-regime solve (flagged
        # not-ok below) returns an out-of-box first stage; identity in the
        # nominal regime
        u0 = jnp.clip(new_state.u_bar[0], u_lo, u_hi)
        bound_tol = 1e-4 * (u_hi - u_lo)
        in_box = jnp.all(
            (new_state.u_bar >= u_lo - bound_tol)
            & (new_state.u_bar <= u_hi + bound_tol)
        )
        # planned velocities at intermediate nodes must respect the state box
        v_lo = jnp.asarray(ocp.v_lower(), u0.dtype)
        v_hi = jnp.asarray(ocp.v_upper(), u0.dtype)
        v_tol = 1e-3 * (v_hi - v_lo)
        v_plan = new_state.x_bar[1 : ocp.N_node, 3:6]
        in_box &= jnp.all((v_plan >= v_lo - v_tol) & (v_plan <= v_hi + v_tol))
        info = RtiInfo(
            mu=sol.mu,
            eq_res=sol.eq_res,
            ok=jnp.isfinite(sol.eq_res) & (sol.eq_res < eq_tol) & in_box,
        )
        return u0, new_state, info

    return RtiController(reset, update, ocp, vehicle, with_disturbance)


def make_batched_rti_controller(
    ocp: OcpParams,
    vehicle: VehicleParams,
    *,
    with_disturbance: bool = False,
    qp_iters: int = 12,
    eq_tol: float = 1e-3,
    backend: str = "auto",
    interpret: bool = False,
    warm_start: bool = False,
    jac_bf16: bool = False,
    mehrotra: bool = False,
    fused_lin: bool = True,
    lqr_start: bool = True,
    whole_ipm: bool = False,
    packed_state: bool = False,
    whole_step: bool = False,
) -> RtiController:
    """Batch-first RTI controller: all arguments carry a leading scenario
    axis B and the QP batch is solved by the structure-sparse fused Pallas
    IPM (`solver/qp_ipm_sparse.py`) — the production TPU path. With
    backend="jax" it falls back to `jax.vmap` over the scan-based solver
    (used on CPU and for tiny batches where padding to the SUB*128-lane
    block would waste the chip); backend="pallas_packed" selects the legacy dense
    packed kernels (kept for cross-validation).

    `warm_start=True` (pallas backend only) carries the QP multipliers and
    barrier weight across control ticks in `RtiState.ipm` — the steady-state
    solve then converges in fewer interior-point iterations, so pair it with
    a reduced `qp_iters` (6-8; accuracy validated in
    `tests/test_warm_start.py` and closed loop by tools/validate_backends).
    `reset()` marks every scenario cold, reproducing the reference's
    warm-start kill on new trajectories at the QP level too.

    `jac_bf16=True` stores the curvature payloads (ERK sensitivities + the
    quaternion Hessian block) in bfloat16 — inexact-Jacobian Gauss-Newton
    with full-precision gradients/defects, so the RTI fixed point is
    unchanged. Measured 2026-08-18 on the figure-eight mission: closed-loop
    tracking identical (2.82 mm RMSE, 2.3e-5 m trajectory divergence) but
    instantaneous control deviation 4.9e-3 vs the f32 reference — OUTSIDE
    the 1e-3 golden tolerance, so this stays opt-in (experimental).

    `fused_lin=True` (default, pallas backend) computes the linearization in
    a Pallas kernel as well (`ops/pallas/linearize.py`) — RK4 tangents + GN
    terms emitted directly in kernel layout, no intermediate HBM tensors.

    `whole_ipm=True` (pallas backend) runs the ENTIRE interior-point solve
    in one persistent-VMEM Pallas launch (`ops/pallas/ipm_whole.py`): the
    stage payload streams from HBM once per solve instead of once per
    iteration. Implies the zero-control start (`lqr_start` is ignored on
    that path); pair with `warm_start=True` — the production bench
    configuration.

    `packed_state=True` (pallas backend) keeps the RTI iterates AND the
    carried QP multipliers in KERNEL layout ((s, d, nb, SUB, 128),
    batch-on-lanes) across control ticks: the per-tick pack transposes of
    x_bar/u_bar and the five warm-dual arrays disappear, the RTI axpy runs
    in kernel layout, and with `whole_ipm=True` it is folded INTO the
    kernel (the solve emits the UPDATED iterates directly — zero
    solution-delta round trip through HBM). Only the per-tick INPUTS
    (x0/xr/ur/f_dist) and the tiny outputs (u0, health flags) cross
    layouts. State is padded to the SUB*128-lane block internally; `update`
    recovers B from x0. Consumers that poke `RtiState.x_bar` directly must
    use the layout helpers exported here (`pack_iterates`/
    `unpack_iterates`). This is the production bench configuration
    (VERDICT r3 item 2).

    `whole_step=True` (requires packed_state) goes one further: the
    linearization, the entire IPM, and the SQP axpy run in ONE Pallas
    launch (`ops/pallas/step_whole.py`) — the stage QP payload never
    exists in HBM. Same numerics as packed_state + whole_ipm
    (tests/test_step_whole.py).

    Semantics are otherwise identical to `make_rti_controller` + outer vmap.
    """
    import jax

    if backend == "auto":
        # Pallas kernels lower for TPU only (incl. the axon tunnel backend);
        # CPU runs the scan path (or interpret mode when requested).
        backend = (
            "pallas"
            if (interpret or jax.default_backend() not in ("cpu",))
            else "jax"
        )

    per_scenario = make_rti_controller(
        ocp, vehicle, with_disturbance=with_disturbance, qp_iters=qp_iters,
        eq_tol=eq_tol, mehrotra=mehrotra,
    )

    def reset(xr: jnp.ndarray, ur: jnp.ndarray) -> RtiState:
        return RtiState(jnp.asarray(xr), jnp.asarray(ur))

    if backend == "jax":

        def update(state, x0, xr, ur, f_dist=None):
            if with_disturbance and f_dist is None:
                f_dist = jnp.zeros(xr.shape[:-1] + (3,), xr.dtype)
            if with_disturbance:
                return jax.vmap(per_scenario.update)(state, x0, xr, ur, f_dist)
            return jax.vmap(
                lambda s, x, xr_, ur_: per_scenario.update(s, x, xr_, ur_)
            )(state, x0, xr, ur)

        return RtiController(reset, update, ocp, vehicle, with_disturbance)

    from ..ops.pallas.riccati import BLOCK, pack, unpack

    if backend == "pallas_packed":
        # legacy dense-packed kernels (kept for cross-validation)
        from .ocp_packed import make_ocp_functions_packed
        from .qp_ipm_packed import ipm_packed

        linearize_packed, _ = make_ocp_functions_packed(
            ocp, vehicle, with_disturbance
        )

        def solve_packed(qp, dx0_p, warm):
            return ipm_packed(
                qp, dx0_p, num_iters=qp_iters, interpret=interpret
            ) + (None,)
    else:
        # production path: structure-sparse fused kernels; the linearization
        # itself is a Pallas kernel too (`ops/pallas/linearize.py`) unless
        # fused_lin=False falls back to the jnp batch-last path
        from .ocp_sparse import (
            make_linearizer_pallas,
            make_ocp_functions_sparse,
        )
        from .qp_ipm_sparse import ipm_sparse

        if fused_lin:
            linearize_sparse, sp_consts, _ = make_linearizer_pallas(
                ocp, vehicle, with_disturbance,
                jac_dtype=jnp.bfloat16 if jac_bf16 else None,
                interpret=interpret,
            )
        else:
            linearize_sparse, sp_consts, _ = make_ocp_functions_sparse(
                ocp, vehicle, with_disturbance,
                jac_dtype=jnp.bfloat16 if jac_bf16 else None,
            )
        linearize_packed = linearize_sparse

        def solve_packed(qp, dx0_p, warm, xu_bar=None):
            return ipm_sparse(
                qp, sp_consts, dx0_p, num_iters=qp_iters,
                interpret=interpret, warm=warm, lqr_start=lqr_start,
                whole_kernel=whole_ipm, xu_bar=xu_bar,
            )

    use_warm = warm_start and backend == "pallas"
    N = ocp.N_node

    if packed_state:
        assert backend == "pallas" and fused_lin, (
            "packed_state requires the fused pallas linearizer path"
        )
        from ..ops.pallas.riccati import LANE, SUB

        step_whole_fn = None
        if whole_step:
            from .ocp_sparse import make_whole_step

            step_whole_fn = make_whole_step(
                ocp, vehicle, with_disturbance,
                jac_dtype=jnp.bfloat16 if jac_bf16 else None,
                interpret=interpret, num_iters=qp_iters,
            )

        def padb_to_block(a):
            if a is None:
                return a
            pad = (-a.shape[0]) % BLOCK
            if pad == 0:
                return a
            return jnp.concatenate(
                [a, jnp.tile(a[:1], (pad,) + (1,) * (a.ndim - 1))]
            )

        def reset_packed(xr: jnp.ndarray, ur: jnp.ndarray) -> RtiState:
            xr_p = pack(padb_to_block(jnp.asarray(xr)))
            ur_p = pack(padb_to_block(jnp.asarray(ur)))
            dt = xr_p.dtype
            tail = (xr_p.shape[2], SUB, LANE)
            ipm0 = None
            if use_warm:
                ipm0 = (
                    jnp.zeros((N, 4) + tail, dt), jnp.zeros((N, 4) + tail, dt),
                    jnp.zeros((N + 1, 3) + tail, dt),
                    jnp.zeros((N + 1, 3) + tail, dt),
                    jnp.full(tail, -1.0, dt),
                )
            return RtiState(xr_p, ur_p, ipm0)

        def update_packed(state, x0, xr, ur, f_dist=None):
            if not with_disturbance:
                f_dist = None
            B = x0.shape[0]
            if whole_step:
                from .qp_ipm_sparse import IpmWarm

                N_ = ocp.N_node
                dt = state.x_bar.dtype
                tail = state.x_bar.shape[2:]
                if use_warm:
                    warm = IpmWarm(*state.ipm)
                else:
                    warm = IpmWarm(
                        lu_lo=jnp.zeros((N_, 4) + tail, dt),
                        lu_up=jnp.zeros((N_, 4) + tail, dt),
                        lx_lo=jnp.zeros((N_ + 1, 3) + tail, dt),
                        lx_up=jnp.zeros((N_ + 1, 3) + tail, dt),
                        mu=jnp.full(tail, -1.0, dt),
                    )
                if f_dist is None:
                    f_dist = jnp.zeros(
                        (x0.shape[0], N_ + 1, 3), state.x_bar.dtype
                    )
                (
                    xb_new, ub_new, lul, luu, lxl, lxu, mu5, eq5
                ) = step_whole_fn(
                    state.x_bar, state.u_bar,
                    pack(padb_to_block(xr)), pack(padb_to_block(ur)),
                    pack(padb_to_block(f_dist)),
                    pack(padb_to_block(x0)[:, None]),
                    warm,
                )
                mu_p, eq_p = mu5[0, 0], eq5[0, 0]
                ipm_new = (
                    (lul, luu, lxl, lxu, mu_p) if use_warm else state.ipm
                )
            else:
                qp, dx0_p = linearize_packed(
                    state.x_bar, state.u_bar,
                    padb_to_block(xr), padb_to_block(ur),
                    padb_to_block(f_dist), padb_to_block(x0),
                    packed_xu=True,
                )
                warm = None
                if use_warm:
                    from .qp_ipm_sparse import IpmWarm

                    warm = IpmWarm(*state.ipm)
                xb_new, ub_new, mu_p, eq_p, new_warm = solve_packed(
                    qp, dx0_p, warm, xu_bar=(state.x_bar, state.u_bar)
                )
                ipm_new = tuple(new_warm) if use_warm else state.ipm
            new_state = RtiState(xb_new, ub_new, ipm_new)

            # tiny layout crossings: first-stage control + per-lane health
            u0 = unpack(ub_new[:1], (4,))[:B, 0]
            u_lo = jnp.asarray(ocp.u_lower(), u0.dtype)
            u_hi = jnp.asarray(ocp.u_upper(), u0.dtype)
            u0 = jnp.clip(u0, u_lo, u_hi)
            bound_tol = 1e-4 * (u_hi - u_lo)
            lo5 = (u_lo - bound_tol).reshape(1, 4, 1, 1, 1)
            hi5 = (u_hi + bound_tol).reshape(1, 4, 1, 1, 1)
            in_box = jnp.all((ub_new >= lo5) & (ub_new <= hi5), axis=(0, 1))
            v_lo = jnp.asarray(ocp.v_lower(), u0.dtype)
            v_hi = jnp.asarray(ocp.v_upper(), u0.dtype)
            v_tol = 1e-3 * (v_hi - v_lo)
            vlo5 = (v_lo - v_tol).reshape(1, 3, 1, 1, 1)
            vhi5 = (v_hi + v_tol).reshape(1, 3, 1, 1, 1)
            v_plan = xb_new[1:N, 3:6]
            in_box &= jnp.all((v_plan >= vlo5) & (v_plan <= vhi5), axis=(0, 1))
            sol_mu = mu_p.reshape(-1)[:B]
            sol_eq = eq_p.reshape(-1)[:B]
            info = RtiInfo(
                mu=sol_mu,
                eq_res=sol_eq,
                ok=jnp.isfinite(sol_eq)
                & (sol_eq < eq_tol)
                & in_box.reshape(-1)[:B],
            )
            return u0, new_state, info

        return RtiController(
            reset_packed, update_packed, ocp, vehicle, with_disturbance,
            layout="kernel",
        )

    if use_warm:
        from .qp_ipm_sparse import IpmWarm

        def reset(xr: jnp.ndarray, ur: jnp.ndarray) -> RtiState:
            xr = jnp.asarray(xr)
            B = xr.shape[0]
            dt = xr.dtype
            ipm0 = (
                jnp.zeros((B, N, 4), dt), jnp.zeros((B, N, 4), dt),
                jnp.zeros((B, N + 1, 3), dt), jnp.zeros((B, N + 1, 3), dt),
                jnp.full((B,), -1.0, dt),
            )
            return RtiState(xr, jnp.asarray(ur), ipm0)

    def update(state, x0, xr, ur, f_dist=None):
        if not with_disturbance:
            f_dist = None
        B = x0.shape[0]
        pad = (-B) % BLOCK

        def padb(a):
            if pad == 0 or a is None:
                return a
            return jnp.concatenate(
                [a, jnp.tile(a[:1], (pad,) + (1,) * (a.ndim - 1))]
            )

        qp, dx0_p = linearize_packed(
            padb(state.x_bar), padb(state.u_bar), padb(xr), padb(ur),
            padb(f_dist), padb(x0),
        )
        if use_warm:
            lul, luu, lxl, lxu, mu_c = state.ipm
            warm = IpmWarm(
                lu_lo=pack(padb(lul)), lu_up=pack(padb(luu)),
                lx_lo=pack(padb(lxl)), lx_up=pack(padb(lxu)),
                mu=pack(padb(mu_c[:, None, None]))[0, 0],
            )
        else:
            warm = None
        zx, zu, mu_p, eq_p, new_warm = solve_packed(qp, dx0_p, warm)
        dx = unpack(zx, (state.x_bar.shape[-1],))[:B]
        du = unpack(zu, (state.u_bar.shape[-1],))[:B]
        sol_mu = mu_p.reshape(-1)[:B]
        sol_eq = eq_p.reshape(-1)[:B]
        if use_warm:
            ipm_new = (
                unpack(new_warm.lu_lo, (4,))[:B],
                unpack(new_warm.lu_up, (4,))[:B],
                unpack(new_warm.lx_lo, (3,))[:B],
                unpack(new_warm.lx_up, (3,))[:B],
                unpack(new_warm.mu[None, None], ())[:B, 0],
            )
        else:
            ipm_new = state.ipm
        new_state = RtiState(state.x_bar + dx, state.u_bar + du, ipm_new)
        u_lo = jnp.asarray(ocp.u_lower(), state.u_bar.dtype)
        u_hi = jnp.asarray(ocp.u_upper(), state.u_bar.dtype)
        # actuator envelope (see make_rti_controller): executed command
        # clipped to the hardware box; identity in the nominal regime
        u0 = jnp.clip(new_state.u_bar[:, 0], u_lo, u_hi)
        bound_tol = 1e-4 * (u_hi - u_lo)
        in_box = jnp.all(
            (new_state.u_bar >= u_lo - bound_tol)
            & (new_state.u_bar <= u_hi + bound_tol),
            axis=(1, 2),
        )
        v_lo = jnp.asarray(ocp.v_lower(), u0.dtype)
        v_hi = jnp.asarray(ocp.v_upper(), u0.dtype)
        v_tol = 1e-3 * (v_hi - v_lo)
        v_plan = new_state.x_bar[:, 1 : ocp.N_node, 3:6]
        in_box &= jnp.all(
            (v_plan >= v_lo - v_tol) & (v_plan <= v_hi + v_tol), axis=(1, 2)
        )
        info = RtiInfo(
            mu=sol_mu,
            eq_res=sol_eq,
            ok=jnp.isfinite(sol_eq) & (sol_eq < eq_tol) & in_box,
        )
        return u0, new_state, info

    return RtiController(reset, update, ocp, vehicle, with_disturbance)
