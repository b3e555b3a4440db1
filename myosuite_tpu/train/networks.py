"""Policy/value networks for PPO (flax.linen).

Sizes anchor to the reference's network factory: 3x64 MLPs for policy and
value (/root/reference/myosuite/envs/myo/mjx/__init__.py:62-63). The policy
is a tanh-squashed diagonal Gaussian over [-1, 1]^nu; envs map actions into
muscle space with the sigmoid projection (envs/base.py norm_actions).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_LOG_STD_MIN = -5.0
_LOG_STD_MAX = 2.0
_EPS = 1e-6


class MLP(nn.Module):
  features: Sequence[int]
  activation: str = "swish"

  @nn.compact
  def __call__(self, x):
    act = getattr(nn, self.activation)
    for i, f in enumerate(self.features[:-1]):
      x = act(nn.Dense(f, name=f"dense_{i}")(x))
    return nn.Dense(self.features[-1], name="out")(x)


class PolicyNet(nn.Module):
  action_size: int
  hidden: Sequence[int] = (64, 64, 64)

  @nn.compact
  def __call__(self, obs):
    out = MLP(features=(*self.hidden, 2 * self.action_size))(obs)
    mean, log_std = jnp.split(out, 2, axis=-1)
    log_std = jnp.clip(log_std, _LOG_STD_MIN, _LOG_STD_MAX)
    return mean, log_std


class ValueNet(nn.Module):
  hidden: Sequence[int] = (64, 64, 64)

  @nn.compact
  def __call__(self, obs):
    return MLP(features=(*self.hidden, 1))(obs).squeeze(-1)


def sample_action(mean: jax.Array, log_std: jax.Array,
                  rng: jax.Array) -> Tuple[jax.Array, jax.Array]:
  """Sample tanh-squashed action; returns (action, log_prob)."""
  action, _, logp = sample_action_raw(mean, log_std, rng)
  return action, logp


def sample_action_raw(mean: jax.Array, log_std: jax.Array, rng: jax.Array):
  """(action, raw, log_prob). Store RAW for PPO: atanh(tanh(raw)) clips at
  ~7.25 in float32, so a reconstructed raw diverges from the sampled one
  exactly when the policy saturates — corrupting the importance ratio."""
  std = jnp.exp(log_std)
  raw = mean + std * jax.random.normal(rng, mean.shape)
  action = jnp.tanh(raw)
  logp = gaussian_tanh_log_prob(mean, log_std, raw)
  return action, raw, logp


def gaussian_tanh_log_prob(mean, log_std, raw):
  std = jnp.exp(log_std)
  base = -0.5 * (((raw - mean) / std) ** 2 + 2 * log_std
                 + jnp.log(2 * jnp.pi))
  # tanh change of variables
  corr = 2.0 * (jnp.log(2.0) - raw - jax.nn.softplus(-2.0 * raw))
  return jnp.sum(base + corr, axis=-1)


def atanh(x):
  x = jnp.clip(x, -1 + _EPS, 1 - _EPS)
  return 0.5 * (jnp.log1p(x) - jnp.log1p(-x))


def entropy_estimate(mean, log_std, raw):
  """Base Gaussian entropy (pre-squash), the quantity the PPO bonus should
  maximize. The tanh-corrected sample estimate (base - corr) grows
  LINEARLY in |raw|, so using it as a bonus rewards saturating the policy
  — observed driving |raw| past the atanh clip and collapsing training.
  (Brax's PPO likewise regularizes the underlying Gaussian's entropy.)"""
  del mean, raw
  return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)

def deterministic_action(mean: jax.Array) -> jax.Array:
  return jnp.tanh(mean)
