"""Pose-matching tasks: drive joints to target angles.

Behavioral contract from the reference (SURVEY.md Appendix A, PoseEnvV0
/root/reference/myosuite/envs/myo/myobase/pose_v0.py:17-23 and the MJX twin
playground_pose_v0.py): obs = [qpos, qvel*dt, act, pose_err]; rewards
pose/bonus/act_reg/penalty with weights 1.0/4.0/1.0/50; done when pose_dist
exceeds far_th; targets resampled in-graph on episode boundary.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from myosuite_tpu.envs.base import MyoEnv, State
from myosuite_tpu.physics.types import Data


class PoseEnv(MyoEnv):
  """Target-angle pose task over any muscle model."""

  def _make_xml(self) -> str:
    return self._config.model_xml

  def _sample_target(self, rng: jax.Array) -> jax.Array:
    lo = jnp.asarray(self._config.target_jnt_lo, dtype=jnp.float32)
    hi = jnp.asarray(self._config.target_jnt_hi, dtype=jnp.float32)
    if self._config.get("fixed_target", False):
      # explicit fixed posture (e.g. ASL hand signs,
      # reference pose_v0 hand envs myobase/__init__.py:327-394)
      explicit = self._config.get("target_jnt_value", None)
      if explicit is not None:
        return jnp.asarray(explicit, dtype=jnp.float32)
      return 0.5 * (lo + hi)
    return jax.random.uniform(rng, lo.shape, minval=lo, maxval=hi)

  def reset(self, rng: jax.Array) -> State:
    rng, rng1, rng2 = jax.random.split(rng, 3)
    m = self._model
    reset_type = self._config.get("reset_type", "random")
    if reset_type == "random":
      qpos = jax.random.uniform(rng1, (m.nq,),
                                minval=m.jnt_range[:, 0],
                                maxval=m.jnt_range[:, 1])
    else:
      qpos = jnp.asarray(m.qpos0)
    qvel = jnp.zeros(m.nv)
    target = self._sample_target(rng2)

    info = {
        "rng": rng,
        "step_count": jnp.int32(0),
        "target_angles": target,
        "truncation": jnp.float32(0.0),
    }
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    metrics = {
        "pose_reward": zero, "bonus_reward": zero, "act_reg_reward": zero,
        "penalty_reward": zero, "solved": zero,
    }
    return State(data=data, obs=obs, reward=zero, done=zero,
                 metrics=metrics, info=info)

  def _pose_dist(self, data: Data, info: Dict) -> jax.Array:
    return jnp.linalg.norm(info["target_angles"] - data.qpos, axis=-1)

  def _get_obs(self, data: Data, info: Dict) -> Dict[str, jax.Array]:
    obs = jnp.concatenate([
        data.qpos,
        data.qvel * self._config.sim_dt,
        data.act,
        info["target_angles"] - data.qpos,
    ])
    return {"state": obs}

  def _get_rewards(self, data: Data, info: Dict) -> Dict[str, jax.Array]:
    cfg = self._config
    pose_dist = self._pose_dist(data, info)
    act_mag = jnp.linalg.norm(data.act, axis=-1)
    pose_thd = cfg.pose_thd
    far_th = cfg.far_th
    return {
        "pose": -pose_dist,
        "act_reg": -act_mag,
        "bonus": 1.0 * (pose_dist < pose_thd) + 1.0 * (pose_dist < 1.5 * pose_thd),
        "penalty": -1.0 * (pose_dist > far_th),
    }

  def _get_done(self, state: State) -> jax.Array:
    pose_dist = self._pose_dist(state.data, state.info)
    return jnp.float32(pose_dist > self._config.far_th)

  def _get_metrics(self, state, rewards):
    pose_dist = self._pose_dist(state.data, state.info)
    return {
        "pose_reward": rewards["pose"],
        "bonus_reward": rewards["bonus"],
        "act_reg_reward": rewards["act_reg"],
        "penalty_reward": rewards["penalty"],
        "solved": jnp.float32(pose_dist < self._config.pose_thd),
    }

  def _get_info(self, state: State) -> Dict:
    truncation, boundary = self._episode_boundary(state)
    rng, rng1 = jax.random.split(state.info["rng"])
    target = jnp.where(boundary, self._sample_target(rng1),
                       state.info["target_angles"])
    step_count = jnp.where(boundary, jnp.int32(0),
                           state.info["step_count"])
    return {**state.info, "rng": rng, "step_count": step_count,
            "target_angles": target, "truncation": truncation}
