"""Small stateful filters as pure (state, u) -> (state, y) functions.

TPU-native forms of the reference's host-side filter classes — pure pytree
state so they scan over time and vmap over swarms:

- AlphaFilter: y[k] = a*y[k-1] + (1-a)*u[k] (`hv_throttle_est/alpha_filter.py`)
- Differentiator: Tustin dirty derivative, tau = 0.05
  (`hv_throttle_est/differentiator.py`)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class AlphaFilterState(NamedTuple):
    y: jnp.ndarray


def alpha_filter_init(y0) -> AlphaFilterState:
    return AlphaFilterState(jnp.asarray(y0))


def alpha_filter_update(state: AlphaFilterState, u, alpha: float):
    y = alpha * state.y + (1.0 - alpha) * u
    return AlphaFilterState(y), y


class DifferentiatorState(NamedTuple):
    x_prev: jnp.ndarray
    xdot_prev: jnp.ndarray


def differentiator_init(shape=(), dtype=jnp.float32) -> DifferentiatorState:
    z = jnp.zeros(shape, dtype)
    return DifferentiatorState(z, z)


def differentiator_update(
    state: DifferentiatorState, x, ts: float, tau: float = 0.05
):
    """Tustin-discretized dirty derivative (`differentiator.py:14-23`)."""
    a1 = (2.0 * tau - ts) / (2.0 * tau + ts)
    a2 = 2.0 / (2.0 * tau + ts)
    xdot = a1 * state.xdot_prev + a2 * (x - state.x_prev)
    return DifferentiatorState(jnp.asarray(x), xdot), xdot
