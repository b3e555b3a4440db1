"""Gymnasium adapter: classic single-env API over the functional stack.

The reference exposes every task through gym/gymnasium
(/root/reference/myosuite/utils/__init__.py:5-22 shim + registration); this
build is functional-first, with this thin adapter at the edge for
single-env debugging and for users migrating classic-API code (SURVEY.md
section 7 architecture stance). The adapter jits reset/step once and keeps
State host-side between calls.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

try:
  import gymnasium as gym
  _BASE = gym.Env
except Exception:  # pragma: no cover
  gym = None
  _BASE = object


class GymEnv(_BASE):
  """gymnasium.Env over a MyoEnv (single env, host-driven)."""

  metadata = {"render_modes": ["rgb_array"]}

  def __init__(self, env_or_name, seed: int = 0,
               render_mode: Optional[str] = None):
    import jax

    import myosuite_tpu

    self._env = (myosuite_tpu.make(env_or_name)
                 if isinstance(env_or_name, str) else env_or_name)
    self._jit_reset = jax.jit(self._env.reset)
    self._jit_step = jax.jit(self._env.step)
    self._rng = jax.random.PRNGKey(seed)
    self._state = None
    self._renderer = None
    self.render_mode = render_mode

    obs_dim = int(np.asarray(
        self._jit_reset(self._rng).obs["state"]).shape[-1])
    if gym is not None:
      self.observation_space = gym.spaces.Box(-np.inf, np.inf, (obs_dim,),
                                              dtype=np.float32)
      self.action_space = gym.spaces.Box(-1.0, 1.0,
                                         (self._env.action_size,),
                                         dtype=np.float32)

  @property
  def unwrapped_env(self):
    return self._env

  def reset(self, *, seed: Optional[int] = None,
            options: Optional[Dict] = None) -> Tuple[np.ndarray, Dict]:
    import jax
    if seed is not None:
      self._rng = jax.random.PRNGKey(seed)
    self._rng, sub = jax.random.split(self._rng)
    self._state = self._jit_reset(sub)
    return np.asarray(self._state.obs["state"]), {}

  def step(self, action) -> Tuple[np.ndarray, float, bool, bool, Dict]:
    import jax.numpy as jnp
    self._state = self._jit_step(self._state,
                                 jnp.asarray(action, dtype=jnp.float32))
    obs = np.asarray(self._state.obs["state"])
    reward = float(self._state.reward)
    terminated = bool(self._state.done > 0)
    truncated = bool(float(self._state.info.get("truncation", 0.0)) > 0)
    info = {k: np.asarray(v) for k, v in self._state.metrics.items()}
    return obs, reward, terminated, truncated, info

  def render(self):
    if self._renderer is None:
      from myosuite_tpu.renderer import Renderer
      self._renderer = Renderer(self._env)
    return self._renderer.render(self._state.data)

  def close(self):
    if self._renderer is not None:
      self._renderer.close()
