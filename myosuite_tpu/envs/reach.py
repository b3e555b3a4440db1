"""Reach tasks: drive fingertip site(s) to Cartesian targets.

Behavioral contract from the reference (ReachEnvV0
/root/reference/myosuite/envs/myo/myobase/reach_v0.py:17-22 and MJX twin
playground_reach_v0.py): obs = [qpos, qvel*dt, act, tip_pos, reach_err];
rewards reach/bonus/penalty (1.0/4.0/50); far_th is infinite for the first
two control steps of an episode (reach_v0.py:126-130); bonus uses near_th
and 2*near_th shells; targets resampled in-graph on episode boundary.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from myosuite_tpu.envs.base import MyoEnv, State
from myosuite_tpu.physics.types import Data


class ReachEnv(MyoEnv):
  """Cartesian site-reaching task over any muscle model."""

  def __init__(self, config, config_overrides=None):
    super().__init__(config, config_overrides)
    self._tip_sids = []
    for site in self._config.target_sites:
      sid = mujoco.mj_name2id(self._mj_model, mujoco.mjtObj.mjOBJ_SITE.value,
                              site)
      assert sid >= 0, f"site {site} not in model"
      self._tip_sids.append(sid)
    self._tip_sids = np.array(self._tip_sids)
    self.n_targets = len(self._tip_sids)
    self.near_th = self.n_targets * 0.0125

  def _make_xml(self) -> str:
    return self._config.model_xml

  def _sample_targets(self, rng: jax.Array) -> jax.Array:
    lo = jnp.asarray(self._config.target_lo, dtype=jnp.float32)  # (n, 3)
    hi = jnp.asarray(self._config.target_hi, dtype=jnp.float32)
    if self._config.get("fixed_target", False):
      return 0.5 * (lo + hi)
    return jax.random.uniform(rng, lo.shape, minval=lo, maxval=hi)

  def reset(self, rng: jax.Array) -> State:
    rng, rng1 = jax.random.split(rng)
    m = self._model
    qpos = jnp.asarray(m.qpos0)
    qvel = jnp.zeros(m.nv)
    targets = self._sample_targets(rng1)
    info = {"rng": rng, "step_count": jnp.int32(0), "targets": targets,
            "truncation": jnp.float32(0.0)}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    metrics = {"reach_reward": zero, "bonus_reward": zero,
               "penalty_reward": zero, "solved": zero}
    return State(data=data, obs=obs, reward=zero, done=zero,
                 metrics=metrics, info=info)

  def _reach_err(self, data: Data, info: Dict) -> jax.Array:
    tip = data.site_xpos[self._tip_sids]
    return (info["targets"] - tip).ravel()

  def _far_th(self, data: Data) -> jax.Array:
    # infinite during the first two control steps (reference semantics)
    warmup = 2.0 * self._config.ctrl_dt
    return jnp.where(data.time > warmup,
                     jnp.float32(self._config.far_th * self.n_targets),
                     jnp.float32(jnp.inf))

  def _get_obs(self, data: Data, info: Dict) -> Dict[str, jax.Array]:
    tip = data.site_xpos[self._tip_sids]
    err = (info["targets"] - tip).ravel()
    obs = jnp.concatenate([
        data.qpos, data.qvel * self._config.sim_dt, data.act,
        tip.ravel(), err,
    ])
    return {"state": obs}

  def _get_rewards(self, data: Data, info: Dict) -> Dict[str, jax.Array]:
    dist = jnp.linalg.norm(self._reach_err(data, info))
    far_th = self._far_th(data)
    return {
        "reach": -dist,
        "bonus": 1.0 * (dist < 2 * self.near_th) + 1.0 * (dist < self.near_th),
        "penalty": -1.0 * (dist > far_th),
    }

  def _get_done(self, state: State) -> jax.Array:
    dist = jnp.linalg.norm(self._reach_err(state.data, state.info))
    return jnp.float32(dist > self._far_th(state.data))

  def _get_metrics(self, state, rewards):
    dist = jnp.linalg.norm(self._reach_err(state.data, state.info))
    return {
        "reach_reward": rewards["reach"],
        "bonus_reward": rewards["bonus"],
        "penalty_reward": rewards["penalty"],
        "solved": jnp.float32(dist < self.near_th),
    }

  def _get_info(self, state: State) -> Dict:
    truncation, boundary = self._episode_boundary(state)
    rng, rng1 = jax.random.split(state.info["rng"])
    targets = jnp.where(boundary, self._sample_targets(rng1),
                        state.info["targets"])
    step_count = jnp.where(boundary, jnp.int32(0), state.info["step_count"])
    return {**state.info, "rng": rng, "step_count": step_count,
            "targets": targets, "truncation": truncation}
