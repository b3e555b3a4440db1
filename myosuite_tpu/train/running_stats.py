"""Running observation statistics for normalization (Welford, pytree-pure).

Equivalent role to brax's running_statistics used by the reference's PPO
(normalize_observations=True in
/root/reference/myosuite/envs/myo/mjx/__init__.py:59). Cross-device
aggregation uses psum when an axis_name is given, so the same code runs
single-chip and mesh-sharded.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningStats:
  count: jax.Array
  mean: jax.Array
  m2: jax.Array

  @property
  def std(self):
    var = self.m2 / jnp.maximum(self.count, 2.0)
    # identity normalization until real data arrives: with the m2=0 init a
    # tiny count would give std~1e-3 and the first rollout's normalized
    # obs would saturate the +-5 clip (observed destabilizing PPO iter 0)
    return jnp.where(self.count > 1.0,
                     jnp.sqrt(jnp.maximum(var, 1e-6)),
                     jnp.ones_like(self.m2))


def init(dim: int) -> RunningStats:
  return RunningStats(count=jnp.float32(1e-4),
                      mean=jnp.zeros(dim, dtype=jnp.float32),
                      m2=jnp.zeros(dim, dtype=jnp.float32))


def update(stats: RunningStats, batch: jax.Array,
           axis_name: Optional[str] = None) -> RunningStats:
  """Update from a (..., dim) batch; optionally psum across `axis_name`."""
  flat = batch.reshape(-1, batch.shape[-1])
  n = jnp.float32(flat.shape[0])
  bmean = jnp.mean(flat, axis=0)
  bm2 = jnp.sum((flat - bmean) ** 2, axis=0)
  if axis_name is not None:
    nd = jax.lax.psum(n, axis_name)
    gmean = jax.lax.psum(bmean * n, axis_name) / nd
    bm2 = jax.lax.psum(bm2 + n * (bmean - gmean) ** 2, axis_name)
    bmean, n = gmean, nd

  delta = bmean - stats.mean
  count = stats.count + n
  mean = stats.mean + delta * n / count
  m2 = stats.m2 + bm2 + delta ** 2 * stats.count * n / count
  return RunningStats(count=count, mean=mean, m2=m2)


def normalize(stats: RunningStats, x: jax.Array) -> jax.Array:
  return jnp.clip((x - stats.mean) / stats.std, -5.0, 5.0)
