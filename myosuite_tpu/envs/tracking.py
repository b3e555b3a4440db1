"""Reference-motion tracking tasks (MyoDM role).

Behavioral contract from the reference's TrackEnv
(/root/reference/myosuite/envs/myo/myodm/myodm_v0.py:24-312): track a
time-indexed reference motion with DeepMimic-style exponential rewards —
obs = qp, qv, hand_qpos_err, hand_qvel_err, obj_com_err; reward keys
pose 0.0, object 1.0, bonus 1.0, penalty -2; episode terminates on large
tracking error.

The reference ships 97 GRAB mocap .npz files (not in-repo here); this
build generates synthetic reference motions procedurally (cyclic curls,
min-jerk pose sequences) and accepts any ReferenceMotion
(myosuite_tpu.logger.reference_motion), including ones loaded from npz
files with the same schema.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_tpu.envs.base import MyoEnv, State
from myosuite_tpu.logger.reference_motion import ReferenceMotion
from myosuite_tpu.physics.types import Data


class TrackEnv(MyoEnv):
  """Track a joint-space reference motion with a muscle model."""

  def __init__(self, config, overrides=None, reference: ReferenceMotion = None):
    super().__init__(config, overrides)
    assert reference is not None
    self._ref = reference

  def _make_xml(self) -> str:
    return self._config.model_xml

  def reset(self, rng: jax.Array) -> State:
    rng, _ = jax.random.split(rng)
    init = self._ref.get_init()
    qpos = init["robot"]
    qvel = jnp.zeros(self._model.nv)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "truncation": jnp.float32(0.0),
            "motion_time": jnp.float32(0.0)}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    metrics = {"pose_err": zero, "solved": zero}
    return State(data, obs, zero, zero, metrics, info)

  def _ref_at(self, info):
    return self._ref.get_reference(info["motion_time"])

  def _get_obs(self, data: Data, info) -> Dict[str, jax.Array]:
    ref = self._ref_at(info)
    dt = self._config.sim_dt
    qpos_err = ref["robot"] - data.qpos
    qvel_err = ref["robot_vel"] - data.qvel
    return {"state": jnp.concatenate([
        data.qpos, data.qvel * dt, data.act, qpos_err, qvel_err * dt])}

  def _get_rewards(self, data: Data, info) -> Dict[str, jax.Array]:
    ref = self._ref_at(info)
    pose_dist = jnp.linalg.norm(ref["robot"] - data.qpos)
    vel_dist = jnp.linalg.norm(ref["robot_vel"] - data.qvel)
    # DeepMimic-style exp shaping (myodm_v0.py:254-312)
    pose = jnp.exp(-2.0 * pose_dist)
    vel = jnp.exp(-0.1 * vel_dist)
    big_err = pose_dist > self._config.far_th
    return {"pose": pose, "vel": vel,
            "bonus": 1.0 * (pose_dist < self._config.pose_thd),
            "penalty": -1.0 * big_err}

  def _get_done(self, state: State) -> jax.Array:
    ref = self._ref_at(state.info)
    pose_dist = jnp.linalg.norm(ref["robot"] - state.data.qpos)
    ended = state.info["motion_time"] >= self._ref.horizon
    return jnp.float32((pose_dist > self._config.far_th) | ended)

  def _get_metrics(self, state, rewards):
    ref = self._ref_at(state.info)
    pose_dist = jnp.linalg.norm(ref["robot"] - state.data.qpos)
    return {"pose_err": pose_dist,
            "solved": jnp.float32(pose_dist < self._config.pose_thd)}

  def _get_info(self, state: State) -> Dict:
    truncation, boundary = self._episode_boundary(state)
    rng, _ = jax.random.split(state.info["rng"])
    mtime = jnp.where(boundary, jnp.float32(0.0),
                      state.info["motion_time"] + self._config.ctrl_dt)
    return {**state.info, "rng": rng, "truncation": truncation,
            "motion_time": mtime,
            "step_count": jnp.where(boundary, jnp.int32(0),
                                    state.info["step_count"])}


class ObjTrackEnv(MyoEnv):
  """Track a hand + free-object reference motion (MyoDM contract).

  Behavioral contract from the reference's TrackEnv over GRAB mocap
  (/root/reference/myosuite/envs/myo/myodm/myodm_v0.py:24-312): the scene
  is a myoHand plus one free object; obs = qp, qv, hand_qpos_err,
  hand_qvel_err, obj_com_err; DeepMimic-style exponential rewards with
  weights pose 0.0, object 1.0, bonus 1.0, penalty -2. Reference type is
  inferred from the motion's leading dim (FIXED/RANDOM/TRACK,
  reference_motion.py:59-66): TRACK plays the trajectory over time, FIXED
  holds a single object target, RANDOM resamples an object target between
  the two rows at each episode boundary.
  """

  def __init__(self, config, overrides=None, reference: ReferenceMotion = None):
    super().__init__(config, overrides)
    assert reference is not None
    self._ref = reference
    self._nq_hand = self._model.nq - 7
    self._nv_hand = self._model.nv - 6
    import mujoco
    sid = mujoco.mj_name2id(self._mj_model, mujoco.mjtObj.mjOBJ_SITE.value,
                            "object_site")
    assert sid >= 0
    self._obj_site = sid

  def _make_xml(self) -> str:
    return self._config.model_xml

  @property
  def _is_track(self) -> bool:
    from myosuite_tpu.logger.reference_motion import RefType
    return self._ref.ref_type == RefType.TRACK

  @property
  def _is_random(self) -> bool:
    from myosuite_tpu.logger.reference_motion import RefType
    return self._ref.ref_type == RefType.RANDOM

  def _sample_obj_target(self, rng) -> jax.Array:
    """RANDOM refs: uniform object pose between the two reference rows
    (semantics of reference_motion.py RANDOM + myodm/__init__.py:158-180)."""
    lo, hi = self._ref.object[0], self._ref.object[-1]
    pose = jax.random.uniform(rng, lo.shape, minval=jnp.minimum(lo, hi),
                              maxval=jnp.maximum(lo, hi))
    quat = pose[3:7] / jnp.maximum(jnp.linalg.norm(pose[3:7]), 1e-8)
    return jnp.concatenate([pose[:3], quat])

  def reset(self, rng: jax.Array) -> State:
    rng, r1 = jax.random.split(rng)
    init_obj = jnp.asarray(self._config.object_init, dtype=jnp.float32)
    qpos = jnp.concatenate([self._ref.robot[0, :self._nq_hand], init_obj])
    qvel = jnp.zeros(self._model.nv)
    obj_target = (self._sample_obj_target(r1) if self._is_random
                  else self._ref.object[-1])
    info = {"rng": rng, "step_count": jnp.int32(0),
            "truncation": jnp.float32(0.0),
            "motion_time": jnp.float32(0.0),
            "obj_target": obj_target}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    metrics = {"pose_err": zero, "obj_err": zero, "solved": zero}
    return State(data, obs, zero, zero, metrics, info)

  def _ref_at(self, info):
    if self._is_track:
      ref = self._ref.get_reference(info["motion_time"])
      return ref["robot"][:self._nq_hand], ref["robot_vel"][:self._nv_hand], \
          ref["object"]
    # FIXED / RANDOM: hold the (possibly resampled) object target
    return (self._ref.robot[0, :self._nq_hand],
            self._ref.robot_vel[0, :self._nv_hand], info["obj_target"])

  def _errs(self, data, info):
    ref_q, ref_v, ref_obj = self._ref_at(info)
    qpos_err = ref_q - data.qpos[:self._nq_hand]
    qvel_err = ref_v - data.qvel[:self._nv_hand]
    obj_err = ref_obj[:3] - data.site_xpos[self._obj_site]
    return qpos_err, qvel_err, obj_err

  def _get_obs(self, data: Data, info) -> Dict[str, jax.Array]:
    dt = self._config.sim_dt
    qpos_err, qvel_err, obj_err = self._errs(data, info)
    # qp, qv, hand_qpos_err, hand_qvel_err, obj_com_err (myodm_v0.py:32-38)
    return {"state": jnp.concatenate([
        data.qpos, data.qvel * dt, data.act,
        qpos_err, qvel_err * dt, obj_err])}

  def _get_rewards(self, data: Data, info) -> Dict[str, jax.Array]:
    qpos_err, _, obj_err = self._errs(data, info)
    pose_dist = jnp.linalg.norm(qpos_err)
    obj_dist = jnp.linalg.norm(obj_err)
    lifted = data.site_xpos[self._obj_site][2] > self._config.lift_z
    big_err = obj_dist > self._config.far_th
    return {"pose": jnp.exp(-2.0 * pose_dist),
            "object": jnp.exp(-10.0 * obj_dist),
            "bonus": 1.0 * (obj_dist < 0.1) + 1.0 * lifted,
            "penalty": -1.0 * big_err}

  def _get_done(self, state: State) -> jax.Array:
    _, _, obj_err = self._errs(state.data, state.info)
    dropped = (state.data.site_xpos[self._obj_site][2]
               < self._config.drop_th)
    far = jnp.linalg.norm(obj_err) > self._config.far_th
    done = far | dropped
    if self._is_track:
      done = done | (state.info["motion_time"] >= self._ref.horizon)
    return jnp.float32(done)

  def _get_metrics(self, state, rewards):
    qpos_err, _, obj_err = self._errs(state.data, state.info)
    obj_dist = jnp.linalg.norm(obj_err)
    return {"pose_err": jnp.linalg.norm(qpos_err), "obj_err": obj_dist,
            "solved": jnp.float32(obj_dist < 0.05)}

  def _get_info(self, state: State) -> Dict:
    truncation, boundary = self._episode_boundary(state)
    rng, r1 = jax.random.split(state.info["rng"])
    mtime = jnp.where(boundary, jnp.float32(0.0),
                      state.info["motion_time"] + self._config.ctrl_dt)
    obj_target = state.info["obj_target"]
    if self._is_random:
      obj_target = jnp.where(boundary, self._sample_obj_target(r1),
                             obj_target)
    return {**state.info, "rng": rng, "truncation": truncation,
            "motion_time": mtime, "obj_target": obj_target,
            "step_count": jnp.where(boundary, jnp.int32(0),
                                    state.info["step_count"])}


def make_cyclic_reference(mj_model, period: float = 2.0,
                          horizon: float = 4.0,
                          dt: float = 0.02) -> ReferenceMotion:
  """Synthetic cyclic curl: joints oscillate within their ranges."""
  nq = mj_model.nq
  t = np.arange(0.0, horizon + dt, dt)
  lo = mj_model.jnt_range[:, 0]
  hi = mj_model.jnt_range[:, 1]
  mid = 0.5 * (lo + hi)
  amp = 0.35 * (hi - lo)
  phase = np.linspace(0, np.pi / 2, nq)
  qpos = mid[None, :] + amp[None, :] * np.sin(
      2 * np.pi * t[:, None] / period + phase[None, :])
  return ReferenceMotion.from_arrays(t, qpos)
