"""In-hand object manipulation tasks: hold, die reorient, pen twirl,
baoding balls, key turn.

MDP contracts follow SURVEY.md Appendix A:
  * ObjHold  (obj_hold_v0.py):  goal_dist 100, bonus 4, penalty 10
  * Reorient (reorient_v0.py):  pos_dist 100, rot_dist 1
  * PenTwirl (pen_v0.py):       pos_align 1, rot_align 1, act_reg 5,
                                drop 5, bonus 10
  * Baoding  (baoding_v1.py):   pos_dist_1 5, pos_dist_2 5; targets advance
                                along an elliptic goal trajectory each step
  * KeyTurn  (key_turn_v0.py):  key_turn 1, IFtip_approach 10,
                                THtip_approach 10, act_reg 1, bonus 4,
                                penalty 25
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from myosuite_tpu.envs.base import MyoEnv, State
from myosuite_tpu.physics import math as pmath
from myosuite_tpu.physics.types import Data


class _HandObjectEnv(MyoEnv):
  """Shared plumbing for hand+object scenes."""

  def _make_xml(self) -> str:
    return self._config.model_xml

  def _ids(self):
    mj = self._mj_model
    def site(name):
      sid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_SITE.value, name)
      assert sid >= 0, name
      return sid
    def jnt_qadr(name):
      j = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT.value, name)
      assert j >= 0, name
      return int(mj.jnt_qposadr[j]), int(mj.jnt_dofadr[j])
    return site, jnt_qadr

  def _reset_state(self, rng):
    m = self._model
    qpos = jnp.asarray(m.qpos0)
    qvel = jnp.zeros(m.nv)
    return qpos, qvel

  def _base_metrics(self):
    zero = jnp.float32(0.0)
    return {"solved": zero}

  def _get_metrics(self, state, rewards):
    return {"solved": self._solved(state)}

  def _solved(self, state) -> jax.Array:
    return jnp.float32(0.0)

  def _standard_info_update(self, state: State, resample) -> Dict:
    truncation, boundary = self._episode_boundary(state)
    rng, rng1 = jax.random.split(state.info["rng"])
    info = {**state.info, "rng": rng, "truncation": truncation,
            "step_count": jnp.where(boundary, jnp.int32(0),
                                    state.info["step_count"])}
    return resample(info, boundary, rng1)


class ObjHoldEnv(_HandObjectEnv):
  """Hold a ball at a goal position above the palm (ObjHoldRandom-v0)."""

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    site, jq = self._ids()
    self._obj_site = site("object_site")
    self._obj_qadr, self._obj_dadr = jq("object_free")

  def _sample_goal(self, rng):
    base = jnp.asarray(self._config.goal_center, dtype=jnp.float32)
    if self._config.get("fixed_target", False):
      return base
    span = jnp.asarray(self._config.goal_span, dtype=jnp.float32)
    return base + jax.random.uniform(rng, (3,), minval=-span, maxval=span)

  def reset(self, rng: jax.Array) -> State:
    rng, r1 = jax.random.split(rng)
    qpos, qvel = self._reset_state(rng)
    goal = self._sample_goal(r1)
    info = {"rng": rng, "step_count": jnp.int32(0), "goal_pos": goal,
            "truncation": jnp.float32(0.0)}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    return State(data, obs, zero, zero, self._base_metrics(), info)

  def _obj_err(self, data, info):
    return info["goal_pos"] - data.site_xpos[self._obj_site]

  def _get_obs(self, data: Data, info) -> Dict[str, jax.Array]:
    # hand_qpos, hand_qvel, obj_pos, obj_err (+act), Appendix A ObjHold
    obj_pos = data.site_xpos[self._obj_site]
    return {"state": jnp.concatenate([
        data.qpos[:self._obj_qadr], data.qvel[:self._obj_dadr] * self._config.sim_dt,
        data.act, obj_pos, self._obj_err(data, info)])}

  def _get_rewards(self, data, info):
    dist = jnp.linalg.norm(self._obj_err(data, info))
    drop = data.site_xpos[self._obj_site][2] < self._config.drop_th
    return {
        "goal_dist": -dist,
        "bonus": 1.0 * (dist < 0.04) + 1.0 * (dist < 0.02),
        "penalty": -1.0 * drop,
    }

  def _get_done(self, state):
    return jnp.float32(
        state.data.site_xpos[self._obj_site][2] < self._config.drop_th)

  def _solved(self, state):
    dist = jnp.linalg.norm(self._obj_err(state.data, state.info))
    return jnp.float32(dist < 0.02)

  def _get_info(self, state):
    def resample(info, boundary, rng1):
      goal = jnp.where(boundary, self._sample_goal(rng1), info["goal_pos"])
      return {**info, "goal_pos": goal}
    return self._standard_info_update(state, resample)


class ReorientEnv(_HandObjectEnv):
  """Die reorientation to a goal orientation (MyoChallenge'22 die task)."""

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    site, jq = self._ids()
    self._obj_site = site("object_site")
    self._obj_qadr, self._obj_dadr = jq("object_free")

  def _sample_goal_rot(self, rng):
    if self._config.get("fixed_target", False):
      return jnp.array([1.0, 0.0, 0.0, 0.0])
    lim = self._config.goal_rot_limit
    euler = jax.random.uniform(rng, (3,), minval=-lim, maxval=lim)
    return pmath.euler_to_quat(euler)

  def reset(self, rng: jax.Array) -> State:
    rng, r1 = jax.random.split(rng)
    qpos, qvel = self._reset_state(rng)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "goal_quat": self._sample_goal_rot(r1),
            "goal_pos": jnp.asarray(self._config.goal_center,
                                    dtype=jnp.float32),
            "truncation": jnp.float32(0.0)}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    return State(data, obs, zero, zero, self._base_metrics(), info)

  def _errs(self, data, info):
    pos_err = info["goal_pos"] - data.site_xpos[self._obj_site]
    obj_quat = data.qpos[self._obj_qadr + 3:self._obj_qadr + 7]
    rot_err = pmath.quat_diff_vel(pmath.normalize(obj_quat),
                                  info["goal_quat"])
    return pos_err, rot_err

  def _get_obs(self, data, info):
    pos_err, rot_err = self._errs(data, info)
    obj_q = data.qpos[self._obj_qadr:self._obj_qadr + 7]
    return {"state": jnp.concatenate([
        data.qpos[:self._obj_qadr], data.qvel[:self._obj_dadr] * self._config.sim_dt,
        data.act, obj_q, info["goal_quat"], pos_err, rot_err])}

  def _get_rewards(self, data, info):
    pos_err, rot_err = self._errs(data, info)
    pos_dist = jnp.linalg.norm(pos_err)
    rot_dist = jnp.linalg.norm(rot_err)
    drop = data.site_xpos[self._obj_site][2] < self._config.drop_th
    return {"pos_dist": -pos_dist, "rot_dist": -rot_dist,
            "bonus": 1.0 * ((pos_dist < 0.02) & (rot_dist < 0.3)),
            "penalty": -1.0 * drop}

  def _get_done(self, state):
    return jnp.float32(
        state.data.site_xpos[self._obj_site][2] < self._config.drop_th)

  def _solved(self, state):
    pos_err, rot_err = self._errs(state.data, state.info)
    return jnp.float32((jnp.linalg.norm(pos_err) < 0.02)
                       & (jnp.linalg.norm(rot_err) < 0.3))

  def _get_info(self, state):
    def resample(info, boundary, rng1):
      goal = jnp.where(boundary, self._sample_goal_rot(rng1),
                       info["goal_quat"])
      return {**info, "goal_quat": goal}
    return self._standard_info_update(state, resample)


class PenTwirlEnv(_HandObjectEnv):
  """Rotate a pen in-hand to a target orientation (pen_v0 contract)."""

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    site, jq = self._ids()
    self._obj_site = site("object_site")
    self._top_site = site("object_top")
    self._obj_qadr, self._obj_dadr = jq("object_free")

  def _sample_goal_dir(self, rng):
    if self._config.get("fixed_target", False):
      return jnp.array([1.0, 0.0, 0.0])
    u = jax.random.uniform(rng, (2,), minval=-1.0, maxval=1.0)
    yaw = u[0] * jnp.pi
    pitch = u[1] * self._config.goal_pitch_limit
    return jnp.stack([jnp.cos(yaw) * jnp.cos(pitch),
                      jnp.sin(yaw) * jnp.cos(pitch),
                      jnp.sin(pitch)])

  def reset(self, rng: jax.Array) -> State:
    rng, r1 = jax.random.split(rng)
    qpos, qvel = self._reset_state(rng)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "goal_dir": self._sample_goal_dir(r1),
            "goal_pos": jnp.asarray(self._config.goal_center,
                                    dtype=jnp.float32),
            "truncation": jnp.float32(0.0)}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    return State(data, obs, zero, zero, self._base_metrics(), info)

  def _dirs(self, data, info):
    axis = data.site_xpos[self._top_site] - data.site_xpos[self._obj_site]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-9)
    return axis, info["goal_dir"]

  def _get_obs(self, data, info):
    axis, goal = self._dirs(data, info)
    pos_err = info["goal_pos"] - data.site_xpos[self._obj_site]
    obj_vel = data.qvel[self._obj_dadr:self._obj_dadr + 6]
    return {"state": jnp.concatenate([
        data.qpos[:self._obj_qadr], data.act,
        data.site_xpos[self._obj_site], obj_vel * self._config.sim_dt,
        axis, goal, pos_err, axis - goal])}

  def _get_rewards(self, data, info):
    axis, goal = self._dirs(data, info)
    pos_err = info["goal_pos"] - data.site_xpos[self._obj_site]
    pos_align = -jnp.linalg.norm(pos_err)
    rot_align = jnp.dot(axis, goal)
    act_mag = jnp.linalg.norm(data.act) / jnp.maximum(self._model.na, 1)
    dropped = data.site_xpos[self._obj_site][2] < self._config.drop_th
    return {"pos_align": pos_align, "rot_align": rot_align,
            "act_reg": -act_mag, "drop": -1.0 * dropped,
            "bonus": 1.0 * ((rot_align > 0.9)
                            & (jnp.linalg.norm(pos_err) < 0.075))}

  def _get_done(self, state):
    return jnp.float32(
        state.data.site_xpos[self._obj_site][2] < self._config.drop_th)

  def _solved(self, state):
    axis, goal = self._dirs(state.data, state.info)
    return jnp.float32(jnp.dot(axis, goal) > 0.9)

  def _get_info(self, state):
    def resample(info, boundary, rng1):
      goal = jnp.where(boundary, self._sample_goal_dir(rng1),
                       info["goal_dir"])
      return {**info, "goal_dir": goal}
    return self._standard_info_update(state, resample)


class BaodingEnv(_HandObjectEnv):
  """Two baoding balls tracking rotating targets (baoding_v1 contract)."""

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    site, jq = self._ids()
    self._b1_site = site("ball1_site")
    self._b2_site = site("ball2_site")
    self._b1_qadr, self._b1_dadr = jq("ball1_free")
    self._b2_qadr, self._b2_dadr = jq("ball2_free")

  def _target(self, phase):
    cfg = self._config
    center = jnp.asarray(cfg.goal_center, dtype=jnp.float32)
    rx, ry = cfg.goal_radius_x, cfg.goal_radius_y
    t1 = center + jnp.stack([rx * jnp.cos(phase), ry * jnp.sin(phase),
                             jnp.float32(0.0)])
    t2 = center + jnp.stack([rx * jnp.cos(phase + jnp.pi),
                             ry * jnp.sin(phase + jnp.pi),
                             jnp.float32(0.0)])
    return t1, t2

  def reset(self, rng: jax.Array) -> State:
    rng, r1 = jax.random.split(rng)
    qpos, qvel = self._reset_state(rng)
    phase0 = jnp.where(self._config.get("fixed_target", False),
                       jnp.float32(jnp.pi / 2),
                       jax.random.uniform(r1, minval=0.0,
                                          maxval=2 * jnp.pi))
    info = {"rng": rng, "step_count": jnp.int32(0), "phase": phase0,
            "truncation": jnp.float32(0.0)}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    return State(data, obs, zero, zero, self._base_metrics(), info)

  def _get_obs(self, data, info):
    t1, t2 = self._target(info["phase"])
    p1 = data.site_xpos[self._b1_site]
    p2 = data.site_xpos[self._b2_site]
    v1 = data.qvel[self._b1_dadr:self._b1_dadr + 3]
    v2 = data.qvel[self._b2_dadr:self._b2_dadr + 3]
    dt = self._config.sim_dt
    return {"state": jnp.concatenate([
        data.qpos[:self._b1_qadr], data.act, p1, v1 * dt, p2, v2 * dt,
        t1, t2, t1 - p1, t2 - p2])}

  def _get_rewards(self, data, info):
    t1, t2 = self._target(info["phase"])
    d1 = jnp.linalg.norm(t1 - data.site_xpos[self._b1_site])
    d2 = jnp.linalg.norm(t2 - data.site_xpos[self._b2_site])
    dropped = ((data.site_xpos[self._b1_site][2] < self._config.drop_th)
               | (data.site_xpos[self._b2_site][2] < self._config.drop_th))
    return {"pos_dist_1": -d1, "pos_dist_2": -d2, "drop": -1.0 * dropped}

  def _get_done(self, state):
    d = state.data
    return jnp.float32(
        (d.site_xpos[self._b1_site][2] < self._config.drop_th)
        | (d.site_xpos[self._b2_site][2] < self._config.drop_th))

  def _solved(self, state):
    t1, t2 = self._target(state.info["phase"])
    d1 = jnp.linalg.norm(t1 - state.data.site_xpos[self._b1_site])
    d2 = jnp.linalg.norm(t2 - state.data.site_xpos[self._b2_site])
    return jnp.float32((d1 < 0.03) & (d2 < 0.03))

  def _get_info(self, state):
    def resample(info, boundary, rng1):
      # targets advance along the goal trajectory every control step
      phase = info["phase"] + self._config.goal_speed
      new_phase = jax.random.uniform(rng1, minval=0.0, maxval=2 * jnp.pi)
      phase = jnp.where(boundary, new_phase, phase)
      return {**info, "phase": phase}
    return self._standard_info_update(state, resample)


class KeyTurnEnv(_HandObjectEnv):
  """Turn a key with index finger and thumb (key_turn_v0 contract)."""

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    site, jq = self._ids()
    self._key_site = site("key_site")
    self._if_site = site("IFtip")
    self._th_site = site("THtip")
    self._key_qadr, self._key_dadr = jq("key_joint")

  def reset(self, rng: jax.Array) -> State:
    rng, r1 = jax.random.split(rng)
    qpos, qvel = self._reset_state(rng)
    if not self._config.get("fixed_target", False):
      delta = jax.random.uniform(r1, minval=-0.1, maxval=0.1)
      qpos = qpos.at[self._key_qadr].add(delta)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "truncation": jnp.float32(0.0),
            "init_key": qpos[self._key_qadr]}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    return State(data, obs, zero, zero, self._base_metrics(), info)

  def _get_obs(self, data, info):
    dt = self._config.sim_dt
    if_err = data.site_xpos[self._key_site] - data.site_xpos[self._if_site]
    th_err = data.site_xpos[self._key_site] - data.site_xpos[self._th_site]
    return {"state": jnp.concatenate([
        data.qpos[:self._key_qadr], data.act,
        data.qpos[self._key_qadr][None],
        data.qvel[self._key_dadr][None] * dt, if_err, th_err])}

  def _get_rewards(self, data, info):
    key_pos = data.qpos[self._key_qadr]
    key_vel = data.qvel[self._key_dadr]
    if_dist = jnp.linalg.norm(
        data.site_xpos[self._key_site] - data.site_xpos[self._if_site])
    th_dist = jnp.linalg.norm(
        data.site_xpos[self._th_site] - data.site_xpos[self._key_site])
    act_mag = jnp.linalg.norm(data.act) / jnp.maximum(self._model.na, 1)
    turned = info["init_key"] - key_pos   # negative hinge = turning
    return {
        "key_turn": -key_vel,  # reward turning rate (negative direction)
        "IFtip_approach": -if_dist,
        "THtip_approach": -th_dist,
        "act_reg": -act_mag,
        "bonus": 1.0 * (turned > jnp.pi) + 1.0 * (turned > 2 * jnp.pi),
        "penalty": -1.0 * ((if_dist > 0.1) | (th_dist > 0.15)),
    }

  def _solved(self, state):
    turned = state.info["init_key"] - state.data.qpos[self._key_qadr]
    return jnp.float32(turned > 2 * jnp.pi)

  def _get_info(self, state):
    def resample(info, boundary, rng1):
      return info
    return self._standard_info_update(state, resample)
