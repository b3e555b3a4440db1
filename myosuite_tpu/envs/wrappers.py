"""Env wrappers: episode bookkeeping + in-graph auto-reset.

Equivalent of the brax/playground training wrappers the reference relies on
(wrap_env_fn in /root/reference/myosuite/envs/myo/mjx/train_jax_ppo.py:29),
implemented natively: on done-or-truncation the physics state is replaced
by a fresh reset drawn from the env's own reset distribution — entirely
inside the jitted graph, no host round-trip (SURVEY.md section 7 hard part
#4).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from myosuite_tpu.envs.base import MyoEnv, State


class AutoResetWrapper:
  """Wraps MyoEnv with episode truncation + in-graph auto-reset.

  step() returns a state whose `info["terminal_obs"]` holds the pre-reset
  observation at episode boundaries (needed for correct GAE bootstrapping
  on truncation) and whose obs/data are post-reset when an episode ended.
  """

  def __init__(self, env: MyoEnv):
    self._env = env

  def __getattr__(self, name):
    return getattr(self._env, name)

  def reset(self, rng: jax.Array) -> State:
    rng, sub = jax.random.split(rng)
    state = self._env.reset(sub)
    info = {**state.info,
            "reset_rng": rng,
            "truncation": jnp.float32(0.0),
            "terminal_obs": state.obs["state"],
            "episode_return": jnp.float32(0.0),
            "returned_episode_return": jnp.float32(0.0)}
    return state.replace(info=info)

  def step(self, state: State, action: jax.Array) -> State:
    state = self._env.step(state, action)
    truncation = state.info.get("truncation", jnp.float32(0.0))
    # a diverged env (NaN/inf physics, e.g. from an extreme exploratory
    # action) can never recover on its own — NaN propagates through every
    # subsequent substep and would poison the whole batch's statistics for
    # the rest of training. Treat non-finiteness as a terminal and reset;
    # zero the reward so the learner never consumes the NaN.
    blown = jnp.logical_or(
        ~jnp.all(jnp.isfinite(state.obs["state"])),
        ~jnp.isfinite(state.reward))
    state = state.replace(
        reward=jnp.where(blown, 0.0, state.reward),
        obs=jax.tree.map(jnp.nan_to_num, state.obs),
        done=jnp.maximum(state.done, blown.astype(state.done.dtype)))
    boundary = jnp.logical_or(state.done > 0, truncation > 0)

    # fresh reset state (traced unconditionally; selected by mask)
    rng, sub = jax.random.split(state.info["reset_rng"])
    reset_state = self._env.reset(sub)

    def pick(new, old):
      # wrapper composes under vmap, so boundary is a scalar here
      return jnp.where(boundary, new, old)

    data = jax.tree.map(pick, reset_state.data, state.data)
    obs = jax.tree.map(pick, reset_state.obs, state.obs)

    # carry env-specific info (targets etc.) from the reset branch too
    new_info = {"rng": state.info["rng"]}
    for k, v in state.info.items():
      if k in ("rng", "reset_rng", "truncation", "terminal_obs",
               "episode_return", "returned_episode_return"):
        continue
      rv = reset_state.info.get(k)
      new_info[k] = jax.tree.map(pick, rv, v) if rv is not None else v

    ep_ret = state.info["episode_return"] + state.reward
    new_info.update(
        reset_rng=rng,
        truncation=truncation,
        terminal_obs=state.obs["state"],
        episode_return=jnp.where(boundary, 0.0, ep_ret),
        returned_episode_return=jnp.where(
            boundary, ep_ret, state.info["returned_episode_return"]),
    )
    return state.replace(data=data, obs=obs, info=new_info)
