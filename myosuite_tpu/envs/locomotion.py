"""Locomotion tasks on the myoLeg model: walk, stand-reach.

WalkEnv reproduces the reference's gait MDP (walk_v0.py:191-211 contract):
obs = qpos_without_xy, qvel*dt, com_vel, torso_angle, feet heights,
height, feet rel positions, phase_var, muscle length/velocity/force;
rewards vel_reward 5.0, done -100, cyclic_hip -10, ref_rot 10.0,
joint_angle_rew 5.0; done on min-height / max-rotation
(walk_v0.py:367-373,661-669).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from myosuite_tpu.envs import heightfields
from myosuite_tpu.envs.base import MyoEnv, State
from myosuite_tpu.physics import math as pmath
from myosuite_tpu.physics.types import Data


class WalkEnv(MyoEnv):
  """Muscle-driven bipedal walking at a target velocity."""

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    mj = self._mj_model
    def site(name):
      sid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_SITE.value, name)
      assert sid >= 0, name
      return sid
    self._pelvis_site = site("pelvis_site")
    self._torso_site = site("torso_site")
    self._rfoot_site = site("r_foot_site")
    self._lfoot_site = site("l_foot_site")
    def jadr(name):
      j = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT.value, name)
      return int(mj.jnt_qposadr[j])
    self._rhip_adr = jadr("r_hip_flexion")
    self._lhip_adr = jadr("l_hip_flexion")
    self._init_height = float(mj.qpos0[2]) if mj.jnt_type[0] == 0 else 0.96

  def _make_xml(self) -> str:
    return self._config.model_xml

  def reset(self, rng: jax.Array) -> State:
    rng, r1 = jax.random.split(rng)
    m = self._model
    qpos = jnp.asarray(m.qpos0)
    if self._config.get("reset_type", "init") == "random":
      noise = jax.random.uniform(r1, (m.nq,), minval=-0.02, maxval=0.02)
      qpos = qpos + noise.at[:7].set(0.0)
    qvel = jnp.zeros(m.nv)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "truncation": jnp.float32(0.0)}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    metrics = {"vel_reward": zero, "cyclic_hip": zero, "ref_rot": zero,
               "joint_angle_rew": zero, "solved": zero}
    return State(data, obs, zero, zero, metrics, info)

  # -- gait quantities (walk_v0.py:268-287 semantics) ----------------------
  def _phase(self, data: Data) -> jax.Array:
    period = self._config.gait_period
    return jnp.mod(data.time, period) / period

  def _torso_angle(self, data: Data) -> jax.Array:
    # pelvis quaternion deviation from upright as a rotation vector
    quat = data.qpos[3:7]
    return pmath.quat_to_vel(pmath.normalize(quat))

  def _com_vel(self, data: Data) -> jax.Array:
    return data.qvel[0:3]

  def _get_obs(self, data: Data, info) -> Dict[str, jax.Array]:
    dt = self._config.sim_dt
    qpos_without_xy = data.qpos[2:]
    feet_h = jnp.stack([data.site_xpos[self._rfoot_site][2],
                        data.site_xpos[self._lfoot_site][2]])
    pelvis = data.site_xpos[self._pelvis_site]
    feet_rel = jnp.concatenate([
        data.site_xpos[self._rfoot_site] - pelvis,
        data.site_xpos[self._lfoot_site] - pelvis])
    phase = self._phase(data)
    obs = jnp.concatenate([
        qpos_without_xy,
        data.qvel * dt,
        self._com_vel(data),
        self._torso_angle(data),
        feet_h,
        pelvis[2][None],
        feet_rel,
        jnp.stack([jnp.sin(2 * jnp.pi * phase),
                   jnp.cos(2 * jnp.pi * phase)]),
        data.ten_length,
        data.ten_velocity * dt,
        data.actuator_force * 1e-3,
        data.act,
    ])
    return {"state": obs}

  def _get_rewards(self, data: Data, info) -> Dict[str, jax.Array]:
    cfg = self._config
    # gaussian forward-velocity tracking (walk_v0.py:411)
    vel_err = self._com_vel(data)[0] - cfg.target_velocity
    vel_reward = jnp.exp(-jnp.square(vel_err) / 0.16)
    # cyclic hip phasing (walk_v0.py:421): hips out of phase by pi
    phase = self._phase(data)
    amp = cfg.hip_amplitude
    r_target = amp * jnp.sin(2 * jnp.pi * phase)
    l_target = amp * jnp.sin(2 * jnp.pi * phase + jnp.pi)
    cyclic_hip = (jnp.abs(data.qpos[self._rhip_adr] - r_target)
                  + jnp.abs(data.qpos[self._lhip_adr] - l_target))
    # upright pelvis (walk_v0.py:436)
    rot_mag = jnp.linalg.norm(self._torso_angle(data))
    ref_rot = jnp.exp(-jnp.square(rot_mag) / 0.1)
    # stay near default joint angles (walk_v0.py:375)
    jerr = jnp.linalg.norm(data.qpos[7:] - self._model.qpos0[7:])
    joint_angle_rew = jnp.exp(-jnp.square(jerr) / 2.0)
    return {
        "vel_reward": vel_reward,
        "done": -1.0 * self._fallen(data),
        "cyclic_hip": cyclic_hip,
        "ref_rot": ref_rot,
        "joint_angle_rew": joint_angle_rew,
        "act_reg": -jnp.mean(jnp.square(data.act)),
    }

  def _fallen(self, data: Data) -> jax.Array:
    height = data.site_xpos[self._pelvis_site][2]
    rot = jnp.linalg.norm(self._torso_angle(data))
    return jnp.float32((height < self._config.min_height)
                       | (rot > self._config.max_rot))

  def _get_done(self, state: State) -> jax.Array:
    return self._fallen(state.data)

  def _get_metrics(self, state, rewards):
    return {
        "vel_reward": rewards["vel_reward"],
        "cyclic_hip": rewards["cyclic_hip"],
        "ref_rot": rewards["ref_rot"],
        "joint_angle_rew": rewards["joint_angle_rew"],
        "solved": rewards["vel_reward"] * (1.0 - self._fallen(state.data)),
    }

  def _get_info(self, state: State) -> Dict:
    truncation, boundary = self._episode_boundary(state)
    rng, _ = jax.random.split(state.info["rng"])
    return {**state.info, "rng": rng, "truncation": truncation,
            "step_count": jnp.where(boundary, jnp.int32(0),
                                    state.info["step_count"])}


class TerrainWalkEnv(WalkEnv):
  """Walking over procedural terrain (reference TerrainEnvV0 role,
  /root/reference/myosuite/envs/myo/myobase/walk_v0.py:497-647: regenerate
  the heightfield in place at every reset — here the terrain grid is
  per-env Data regenerated inside the jitted reset, so rough/hilly/stairs
  variation costs no host round-trip).

  Adds an egocentric 10x10 heightmap observation (heightfields.py:109-153
  semantics: probe grid rotated by root yaw, bilinear terrain sampling).
  """

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    mj = self._mj_model
    gid = int(self._model.hfield_geomid)
    assert gid >= 0, "TerrainWalkEnv needs an hfield geom"
    self._hf_base = tuple(np.asarray(mj.geom_pos[gid][:2], dtype=float))
    sz = np.asarray(mj.hfield_size[0], dtype=float)
    self._hf_extent = (2.0 * sz[0], 2.0 * sz[1])
    self._hf_shape = (self._model.hfield_nrow, self._model.hfield_ncol)

  def _terrain(self, rng: jax.Array) -> jax.Array:
    kind = self._config.get("terrain_type", "random")
    shape = self._hf_shape
    if kind == "random":
      rng, sub = jax.random.split(rng)
      code = jax.random.randint(sub, (), 1, 4)  # rough/hilly/stairs
      hf = heightfields.generate(rng, code, shape)
    else:
      code = int(heightfields.TerrainType[kind.upper()])
      hf = heightfields.generate(rng, jnp.int32(code), shape)
    # flat spawn pad: ramp terrain in over [0.5 m, 2 m] ahead of the start
    ncol = shape[1]
    x = (self._hf_base[0]
         + (jnp.arange(ncol) / (ncol - 1) - 0.5) * self._hf_extent[0])
    fade = jnp.clip((x - 0.5) / 1.5, 0.0, 1.0)
    return hf * fade[None, :]

  def reset(self, rng: jax.Array) -> State:
    rng, r1, r2 = jax.random.split(rng, 3)
    m = self._model
    qpos = jnp.asarray(m.qpos0)
    if self._config.get("reset_type", "init") == "random":
      noise = jax.random.uniform(r1, (m.nq,), minval=-0.02, maxval=0.02)
      qpos = qpos + noise.at[:7].set(0.0)
    qvel = jnp.zeros(m.nv)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "truncation": jnp.float32(0.0)}
    data = self._make_data(qpos, qvel, hfield=self._terrain(r2))
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    metrics = {"vel_reward": zero, "cyclic_hip": zero, "ref_rot": zero,
               "joint_angle_rew": zero, "solved": zero}
    return State(data, obs, zero, zero, metrics, info)

  def _root_yaw(self, data: Data) -> jax.Array:
    q = data.qpos[3:7]
    return jnp.arctan2(2 * (q[0] * q[3] + q[1] * q[2]),
                       1 - 2 * (q[2] ** 2 + q[3] ** 2))

  def _ground_height(self, data: Data) -> jax.Array:
    return heightfields.sample_height(
        data.hfield_data, data.qpos[0:2], self._hf_extent, self._hf_base)

  def _get_obs(self, data: Data, info) -> Dict[str, jax.Array]:
    obs = super()._get_obs(data, info)
    hmap = heightfields.egocentric_heightmap(
        data.hfield_data, data.qpos[0:2], self._root_yaw(data),
        self._hf_extent, base=self._hf_base)
    rel = hmap - data.qpos[2]   # heights relative to pelvis, reference
    return {"state": jnp.concatenate([obs["state"], rel.ravel()])}

  def _fallen(self, data: Data) -> jax.Array:
    height = (data.site_xpos[self._pelvis_site][2]
              - self._ground_height(data))
    rot = jnp.linalg.norm(self._torso_angle(data))
    return jnp.float32((height < self._config.min_height)
                       | (rot > self._config.max_rot))


class StandEnv(WalkEnv):
  """Leg stand / balance recovery (walk_v0.ReachEnvV0 role: reach term
  10 - dist - 10*|qvel|, walk_v0.py:122)."""

  def _get_rewards(self, data: Data, info) -> Dict[str, jax.Array]:
    height_err = jnp.abs(
        data.site_xpos[self._pelvis_site][2] - self._config.stand_height)
    vel_mag = jnp.linalg.norm(data.qvel)
    reach = 10.0 - height_err - 0.1 * vel_mag
    return {
        "reach": reach,
        "bonus": 1.0 * (height_err < 0.1) + 1.0 * (height_err < 0.05),
        "penalty": -1.0 * self._fallen(data),
        "act_reg": -jnp.linalg.norm(data.act),
    }

  def _get_metrics(self, state, rewards):
    height_err = jnp.abs(
        state.data.site_xpos[self._pelvis_site][2]
        - self._config.stand_height)
    return {"vel_reward": rewards["reach"],
            "cyclic_hip": jnp.float32(0.0),
            "ref_rot": jnp.float32(0.0),
            "joint_angle_rew": jnp.float32(0.0),
            "solved": jnp.float32(height_err < 0.05)}
