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
    self._init_height = float(mj.qpos0[2]) if mj.jnt_type[0] == 0 else 0.93
    self._gait_qpos, self._gait_qvel = self._make_gait_keyframes(mj, jadr)

  def _make_gait_keyframes(self, mj, jadr):
    """Two mid-gait keyframes (right/left leg in swing) with forward
    velocity — the role of the reference model's key_qpos[2]/[3] walk
    keyframes (walk_v0.py:320-351: reset_type 'init' starts from key 2,
    'random' picks 2 or 3 plus noise). The reference myoLeg ships these
    in its MJCF; this procedural model derives them from its own joint
    conventions (hip: negative = anatomical flexion/forward swing,
    knee: negative lifts the foot forward-up — see assets/leg.py)."""
    qpos = np.array(mj.qpos0, dtype=np.float64)
    qvel = np.zeros(mj.nv)
    qvel[0] = float(self._config.target_velocity)   # forward com velocity
    frames_q, frames_v = [], []
    for swing, stance in (("r", "l"), ("l", "r")):
      q = qpos.copy()
      q[jadr(f"{swing}_hip_flexion")] = -0.30    # swing thigh forward
      q[jadr(f"{swing}_knee")] = -0.25           # swing foot clears ground
      q[jadr(f"{swing}_ankle")] = 0.05
      q[jadr(f"{stance}_hip_flexion")] = 0.18    # stance thigh behind
      q[jadr(f"{stance}_knee")] = -0.05
      q[jadr(f"{stance}_ankle")] = -0.08         # push-off
      v = qvel.copy()
      # hips mid-swing: swing leg still rotating forward, stance leg
      # rotating backward relative to the pelvis (≈2 rad/s at a 1 Hz
      # gait) — zero joint velocities with a 1.2 m/s root make an
      # unphysical "shoved mannequin" start
      dof = lambda name: int(mj.jnt_dofadr[mujoco.mj_name2id(
          mj, mujoco.mjtObj.mjOBJ_JOINT.value, name)])
      v[dof(f"{swing}_hip_flexion")] = -2.0
      v[dof(f"{stance}_hip_flexion")] = 2.0
      frames_q.append(q)
      frames_v.append(v)
    # Bent joints shorten the legs' vertical reach, so a fixed pelvis
    # height leaves both feet airborne — the model free-falls at reset and
    # the impact makes the state unrecoverable (observed: every policy
    # falls ~0.4 s after reset). Solve the pelvis height per frame with
    # host-side forward kinematics: keep the lowest foot sole exactly
    # where the calibrated default pose puts it (on the floor).
    mjd = mujoco.MjData(mj)
    def lowest_foot(q):
      mjd.qpos[:] = q
      mujoco.mj_forward(mj, mjd)
      zs = []
      for name in ("r_foot_site", "l_foot_site"):
        sid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_SITE.value, name)
        zs.append(float(mjd.site_xpos[sid][2]))
      return min(zs)
    z_ref = lowest_foot(qpos)
    for q in frames_q:
      q[2] -= lowest_foot(q) - z_ref
    return (jnp.asarray(np.stack(frames_q)),
            jnp.asarray(np.stack(frames_v)))

  def _make_xml(self) -> str:
    return self._config.model_xml

  def _reset_pose(self, rng: jax.Array):
    """Initial (qpos, qvel) per reset_type (walk_v0.py:343-351):
    'none' -> standing still; 'init' -> walk keyframe (with forward
    velocity); 'random' -> random walk keyframe + qpos noise that leaves
    height and root orientation untouched."""
    m = self._model
    kind = self._config.get("reset_type", "init")
    if kind == "none":
      return jnp.asarray(m.qpos0), jnp.zeros(m.nv)
    if kind == "init":
      return self._gait_qpos[0], self._gait_qvel[0]
    r1, r2 = jax.random.split(rng)
    k = jax.random.bernoulli(r1).astype(jnp.int32)
    qpos = self._gait_qpos[k]
    noise = 0.02 * jax.random.normal(r2, (m.nq,))
    noise = noise.at[2:7].set(0.0)   # keep height + root quat exact
    return qpos + noise, self._gait_qvel[k]

  def reset(self, rng: jax.Array) -> State:
    rng, r1 = jax.random.split(rng)
    qpos, qvel = self._reset_pose(r1)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "truncation": jnp.float32(0.0)}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    metrics = {"vel_reward": zero, "cyclic_hip": zero, "ref_rot": zero,
               "joint_angle_rew": zero, "solved": zero, "distance": zero}
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
    # two-gaussian velocity tracking, exactly walk_v0.py:411-419:
    # exp(-(vy_target - vy)^2) + exp(-(vx_target - vx)^2); forward is +x
    # here, lateral +y, so targets are (target_velocity, 0). Max 2.0;
    # >= 1.0 is the reference's strict `solved` criterion.
    vel = self._com_vel(data)
    vel_reward = (jnp.exp(-jnp.square(vel[0] - cfg.target_velocity))
                  + jnp.exp(-jnp.square(vel[1])))
    # cyclic hip phasing (walk_v0.py:421-434): desired angles are
    # 0.8*cos(2*pi*phase + pi) / 0.8*cos(2*pi*phase) for the two hips,
    # cost = norm(desired - actual)
    phase = self._phase(data)
    amp = cfg.hip_amplitude
    r_target = amp * jnp.cos(2 * jnp.pi * phase)
    l_target = amp * jnp.cos(2 * jnp.pi * phase + jnp.pi)
    cyclic_hip = jnp.sqrt(
        jnp.square(data.qpos[self._rhip_adr] - r_target)
        + jnp.square(data.qpos[self._lhip_adr] - l_target) + 1e-12)
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
        # raw forward velocity: 0-weighted by default (the reference's
        # reward contract has no such term, walk_v0.py:205-211) but
        # exposed for curriculum shaping — the gaussian vel_reward has a
        # weak gradient around v=0, which traps PPO in the standing
        # optimum; a linear progress term breaks the trap
        "progress": vel[0],
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
        # strict reference criterion (walk_v0.py:312): the two-gaussian
        # velocity reward must reach 1.0 — actual velocity tracking, not
        # merely "hasn't fallen"
        "solved": jnp.float32(rewards["vel_reward"] >= 1.0),
        "distance": state.data.qpos[0],
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
    qpos, qvel = self._reset_pose(r1)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "truncation": jnp.float32(0.0)}
    data = self._make_data(qpos, qvel, hfield=self._terrain(r2))
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    metrics = {"vel_reward": zero, "cyclic_hip": zero, "ref_rot": zero,
               "joint_angle_rew": zero, "solved": zero, "distance": zero}
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
            "solved": jnp.float32(height_err < 0.05),
            "distance": state.data.qpos[0]}
