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


class ElbowExoPoseEnv(PoseEnv):
  """Elbow pose with per-episode payload-weight randomization and an
  exoskeleton assist torque.

  Reference role: the myoElbowPose1D6M exo variants with hand-weight
  randomization (/root/reference/myosuite/envs/myo/myobase/pose_v0.py
  weight randomization in reset, and the *_2dofexo model envs registered
  in myobase/__init__.py). The payload is randomized in-graph via the
  _model_for_step hook; the exo contributes a constant fraction of the
  gravity torque at the elbow dof.
  """

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    import mujoco
    self._payload_body = mujoco.mj_name2id(
        self._mj_model, mujoco.mjtObj.mjOBJ_BODY.value, "forearm")
    assert self._payload_body >= 0

  def _model_for_step(self, info):
    m = self._model
    extra = info["payload_mass"]
    return m.replace(
        body_mass=m.body_mass.at[self._payload_body].add(extra),
        body_inertia=m.body_inertia.at[self._payload_body].mul(
            1.0 + extra / m.body_mass[self._payload_body]))

  def _sample_payload(self, rng):
    lo, hi = self._config.weight_range
    return jax.random.uniform(rng, minval=lo, maxval=hi)

  def reset(self, rng: jax.Array) -> State:
    rng, r1 = jax.random.split(rng)
    state = super().reset(rng)
    info = {**state.info, "payload_mass": self._sample_payload(r1)}
    # rebuild obs now that the payload is known (the base reset built it
    # with the 0.0 placeholder)
    return state.replace(info=info, obs=self._get_obs(state.data, info))

  def _step_simulation(self, state: State, ctrl: jax.Array) -> State:
    # exo assist: gravity-compensating elbow torque (assist_fraction of the
    # payload-dependent static gravity load)
    assist = self._config.get("exo_assist", 0.0)
    if assist:
      tau = assist * state.data.qfrc_bias
      state = state.replace(
          data=state.data.replace(qfrc_applied=tau))
    return super()._step_simulation(state, ctrl)

  def _get_obs(self, data: Data, info: Dict) -> Dict[str, jax.Array]:
    base = super()._get_obs(data, info)
    payload = jnp.asarray(info.get("payload_mass", 0.0), dtype=jnp.float32)
    return {"state": jnp.concatenate([base["state"], payload[None]])}

  def _get_info(self, state: State) -> Dict:
    info = super()._get_info(state)
    _, boundary = self._episode_boundary(state)
    rng, r1 = jax.random.split(info["rng"])
    info["rng"] = rng
    info["payload_mass"] = jnp.where(
        boundary, self._sample_payload(r1), state.info["payload_mass"])
    return info
