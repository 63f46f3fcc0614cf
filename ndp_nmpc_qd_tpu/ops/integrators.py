"""Explicit Runge-Kutta integration matching acados' ERK discretization.

The reference OCP selects `integrator_type = "ERK"` with acados defaults
(4 Butcher stages, 1 step per shooting interval) at
`nmpc_ctl/nmpc_body_rate_ctl.py:74`. `rk4_step` reproduces that map
x_{k+1} = Phi(x_k, u_k); sensitivities d Phi/d(x,u) come from `jax.jacfwd`
over this function — XLA traces the unrolled 4-stage graph once, so the
Jacobian is the exact discrete sensitivity acados propagates via ERK
forward-sensitivity equations.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def rk4_step(
    f: Callable, x: jnp.ndarray, u: jnp.ndarray, dt: float, substeps: int = 1
) -> jnp.ndarray:
    """Classic RK4 over one interval of length dt, optionally in substeps.

    `f(x, u) -> xdot` with control held constant across the interval
    (zero-order hold, as in direct multiple shooting).
    """
    h = dt / substeps
    for _ in range(substeps):  # static unroll: substeps is a Python int
        k1 = f(x, u)
        k2 = f(x + 0.5 * h * k1, u)
        k3 = f(x + 0.5 * h * k2, u)
        k4 = f(x + h * k3, u)
        x = x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    return x


def make_discrete_dynamics(f: Callable, dt: float, substeps: int = 1):
    """Bind (f, dt) -> Phi(x, u, *args)."""

    def phi(x, u, *args):
        return rk4_step(lambda xx, uu: f(xx, uu, *args), x, u, dt, substeps)

    return phi


def linearize(phi: Callable, x: jnp.ndarray, u: jnp.ndarray, *args):
    """One-stage linearization: returns (x_next, A, B).

    A = dPhi/dx (nx,nx), B = dPhi/du (nx,nu) — the discrete sensitivities the
    acados ERK integrator feeds the Gauss-Newton QP.
    """
    x_next = phi(x, u, *args)
    A = jax.jacfwd(lambda xx: phi(xx, u, *args))(x)
    B = jax.jacfwd(lambda uu: phi(x, uu, *args))(u)
    return x_next, A, B
