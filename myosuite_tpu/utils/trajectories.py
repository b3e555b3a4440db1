"""Trajectory generation utilities: minimum-jerk and cyclic gait refs.

Role-equivalents of the reference's min_jerk generator
(/root/reference/myosuite/utils/min_jerk.py:27) and the goal trajectories
used by Baoding/MyoDM tasks — pure jnp so they compose into jitted resets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def min_jerk(x0: jax.Array, xf: jax.Array, horizon: int) -> jax.Array:
  """Minimum-jerk interpolation from x0 to xf over `horizon` samples.

  Returns (horizon, dim) positions following the quintic
  10t^3 - 15t^4 + 6t^5 profile (zero boundary vel/acc).
  """
  t = jnp.linspace(0.0, 1.0, horizon)[:, None]
  s = 10 * t ** 3 - 15 * t ** 4 + 6 * t ** 5
  return x0[None, :] + s * (xf - x0)[None, :]


def min_jerk_vel(x0: jax.Array, xf: jax.Array, horizon: int,
                 duration: float) -> jax.Array:
  """Velocities of the minimum-jerk profile."""
  t = jnp.linspace(0.0, 1.0, horizon)[:, None]
  ds = (30 * t ** 2 - 60 * t ** 3 + 30 * t ** 4) / duration
  return ds * (xf - x0)[None, :]


def cyclic(amplitude: jax.Array, period: float, phase: jax.Array,
           t: jax.Array) -> jax.Array:
  """Sinusoidal cyclic reference (gait/baoding target generator)."""
  return amplitude * jnp.sin(2 * jnp.pi * t / period + phase)
