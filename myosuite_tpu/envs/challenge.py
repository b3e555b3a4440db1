"""MyoChallenge competition envs: Relocate, ChaseTag, Soccer, OSL RunTrack.

MDP contracts follow SURVEY.md Appendix A:
  * Relocate (relocate_v0.py):   pos_dist 100, rot_dist 1; object geom/
    mass/friction randomized per episode (here: in-graph via the
    _model_for_step domain-randomization hook).
  * ChaseTag (chasetag_v0.py):   distance -0.1, lose -1000; sparse =
    time-based score on win; scripted opponent (static/random/chase or
    evade) over a patch-based arena.
  * Soccer   (soccer_v0.py):     goal_scored 1000, time_cost -0.01,
    act_reg -100, pain -10; scripted GoalKeeper.
  * RunTrack (run_track_v0.py):  sparse 1, solved +10; 56-muscle amputee
    leg; prosthetic knee/ankle driven by the OSL FSM internally — the
    controller's actions are appended inside step and NOT exposed in the
    action space (run_track_v0.py:265-275, _append_osl_actions:871).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from myosuite_tpu.envs import heightfields, opponents, osl
from myosuite_tpu.envs.base import MyoEnv, State
from myosuite_tpu.envs.locomotion import WalkEnv
from myosuite_tpu.physics import math as pmath
from myosuite_tpu.physics.types import Data


def contact_slot_mask(model, geom_ids) -> jnp.ndarray:
  """(ncon_max,) 1.0 where the contact slot involves any of geom_ids.

  Static: slot->geom assignment is fixed at build time (io.make_data's
  pair-table expansion), so GRF extraction is one masked dot product."""
  ids = set(int(g) for g in geom_ids)
  mask = []
  for p in np.asarray(model.collision_pairs.arr):
    hit = 1.0 if (int(p[0]) in ids or int(p[1]) in ids) else 0.0
    mask.extend([hit] * int(p[2]))
  return jnp.asarray(np.array(mask, dtype=np.float32))


def _geom_ids(mj_model, names):
  out = []
  for n in names:
    gid = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_GEOM.value, n)
    assert gid >= 0, n
    out.append(gid)
  return out


class _LegChallengeEnv(WalkEnv):
  """Shared plumbing for leg-based challenge tasks: GRF observations and
  the reference's internal_qpos/qvel + muscle-state obs block
  (chasetag_v0.py:441-459, run_track_v0.py:33-49)."""

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    mj = self._mj_model
    self._body_weight = float(np.sum(mj.body_mass)) * 9.81
    r_feet = ["r_heel_geom", "r_foot_geom", "r_toes_geom"]
    l_feet = ["l_heel_geom", "l_foot_geom", "l_toes_geom"]
    self._grf_mask_r = contact_slot_mask(self._model, _geom_ids(mj, r_feet))
    self._grf_mask_l = contact_slot_mask(self._model, _geom_ids(mj, l_feet))

  def _grf(self, data: Data) -> jax.Array:
    """(2,) right/left vertical ground reaction force / body weight."""
    r = jnp.dot(self._grf_mask_r, data.contact_force)
    l = jnp.dot(self._grf_mask_l, data.contact_force)
    return jnp.stack([r, l]) / self._body_weight

  def _body_obs(self, data: Data) -> jax.Array:
    dt = self._config.sim_dt
    return jnp.concatenate([
        data.qpos[2:],                       # internal_qpos (no world xy)
        data.qvel * dt,                      # internal_qvel
        self._grf(data),                     # grf
        self._torso_angle(data),             # torso_angle
        data.qpos[0:3],                      # model_root_pos
        data.qvel[0:3],                      # model_root_vel
        data.ten_length,                     # muscle_length
        data.ten_velocity * dt,              # muscle_velocity
        data.actuator_force * 1e-3,          # muscle_force
        data.act,
    ])


class ChaseTagEnv(_LegChallengeEnv):
  """Chase (or evade) a scripted opponent over a patch-terrain arena
  (MyoChallenge'23 ChaseTagEnvV0, chasetag_v0.py:439)."""

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    mj = self._mj_model
    gid = int(self._model.hfield_geomid)
    assert gid >= 0, "ChaseTagEnv needs an hfield arena"
    self._hf_base = tuple(np.asarray(mj.geom_pos[gid][:2], dtype=float))
    sz = np.asarray(mj.hfield_size[0], dtype=float)
    self._hf_extent = (2.0 * sz[0], 2.0 * sz[1])
    self._hf_shape = (self._model.hfield_nrow, self._model.hfield_ncol)

  @property
  def _role_mode(self):
    return (opponents.EVADE
            if self._config.get("agent_role", "chase") == "chase"
            else opponents.CHASE)

  def reset(self, rng: jax.Array) -> State:
    rng, r1, r2, r3 = jax.random.split(rng, 4)
    m = self._model
    qpos = jnp.asarray(m.qpos0)
    # random spawn inside the arena
    xy = jax.random.uniform(r1, (2,), minval=-self._config.arena_half * 0.6,
                            maxval=self._config.arena_half * 0.6)
    qpos = qpos.at[0:2].set(xy)
    qvel = jnp.zeros(m.nv)
    opp = opponents.reset_opponent(
        r2, horizon=self.max_episode_steps,
        arena_half=self._config.arena_half, mode=self._role_mode)
    hfield = heightfields.chasetag_arena(r3, self._hf_shape)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "truncation": jnp.float32(0.0), "opponent": opp}
    data = self._make_data(qpos, qvel, hfield=hfield)
    data = self._place_opponent(data, opp)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    metrics = {"solved": zero, "win": zero, "score": zero}
    return State(data, obs, zero, zero, metrics, info)

  def _place_opponent(self, data: Data, opp) -> Data:
    if self._model.nmocap < 1:
      return data
    pos = jnp.concatenate([opp.pose[:2], jnp.float32(0.5)[None]])
    half = jnp.cos(opp.pose[2] / 2)
    quat = jnp.stack([half, 0.0 * half, 0.0 * half, jnp.sin(opp.pose[2] / 2)])
    return data.replace(mocap_pos=data.mocap_pos.at[0].set(pos),
                        mocap_quat=data.mocap_quat.at[0].set(quat))

  def _step_simulation(self, state: State, ctrl: jax.Array) -> State:
    state = super()._step_simulation(state, ctrl)
    opp = opponents.step_opponent(
        state.info["opponent"], state.data.qpos[0:2], self.dt,
        arena_half=self._config.arena_half)
    data = self._place_opponent(state.data, opp)
    return state.replace(data=data,
                         info={**state.info, "opponent": opp})

  def _opp_dist(self, data: Data, info) -> jax.Array:
    return jnp.linalg.norm(info["opponent"].pose[:2] - data.qpos[0:2])

  def _get_obs(self, data: Data, info) -> Dict[str, jax.Array]:
    opp = info["opponent"]
    hmap = heightfields.egocentric_heightmap(
        data.hfield_data, data.qpos[0:2], self._root_yaw(data),
        self._hf_extent, base=self._hf_base)
    return {"state": jnp.concatenate([
        self._body_obs(data),
        opp.pose,                            # opponent_pose
        opp.vel,                             # opponent_vel
        (hmap - data.qpos[2]).ravel(),
    ])}

  def _root_yaw(self, data: Data) -> jax.Array:
    q = data.qpos[3:7]
    return jnp.arctan2(2 * (q[0] * q[3] + q[1] * q[2]),
                       1 - 2 * (q[2] ** 2 + q[3] ** 2))

  def _out_of_bounds(self, data: Data) -> jax.Array:
    half = self._config.arena_half
    return (jnp.abs(data.qpos[0]) > half) | (jnp.abs(data.qpos[1]) > half)

  def _lose(self, data: Data) -> jax.Array:
    # _fallen is float32 (locomotion.py contract); combine as max, not |
    return jnp.maximum(self._fallen(data),
                       jnp.float32(self._out_of_bounds(data)))

  def _win(self, state: State) -> jax.Array:
    dist = self._opp_dist(state.data, state.info)
    caught = dist < self._config.tag_radius
    if self._config.get("agent_role", "chase") == "chase":
      return jnp.float32(caught)
    # evader wins by surviving to the horizon
    return jnp.float32(
        (state.info["step_count"] >= self.max_episode_steps)
        & (self._lose(state.data) == 0.0))

  def _get_rewards(self, data: Data, info) -> Dict[str, jax.Array]:
    return {"distance": self._opp_dist(data, info),
            "lose": -self._lose(data),
            "act_reg": -jnp.mean(jnp.square(data.act))}

  def _get_done(self, state: State) -> jax.Array:
    return jnp.maximum(self._lose(state.data), self._win(state))

  def _get_metrics(self, state, rewards):
    win = self._win(state)
    # time-based score on win (chasetag_v0.py:627-683: earlier tag ->
    # higher score)
    frac = state.info["step_count"].astype(jnp.float32) / self.max_episode_steps
    return {"solved": win, "win": win,
            "score": win * jnp.maximum(1.0 - frac, 0.0)}

  def _get_info(self, state: State) -> Dict:
    truncation, boundary = self._episode_boundary(state)
    rng, r1, r2 = jax.random.split(state.info["rng"], 3)
    new_opp = opponents.reset_opponent(
        r1, horizon=self.max_episode_steps,
        arena_half=self._config.arena_half, mode=self._role_mode)
    opp = jax.tree.map(
        lambda new, old: jnp.where(boundary, new, old),
        new_opp, state.info["opponent"])
    return {**state.info, "rng": rng, "truncation": truncation,
            "opponent": opp,
            "step_count": jnp.where(boundary, jnp.int32(0),
                                    state.info["step_count"])}


class SoccerEnv(_LegChallengeEnv):
  """Kick a ball past a scripted goalkeeper (MyoChallenge'25 SoccerEnvV0,
  soccer_v0.py:204-223 contract)."""

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    mj = self._mj_model
    j = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT.value, "ball_free")
    self._ball_qadr = int(mj.jnt_qposadr[j])
    self._ball_dadr = int(mj.jnt_dofadr[j])

  def reset(self, rng: jax.Array) -> State:
    rng, r1, r2 = jax.random.split(rng, 3)
    m = self._model
    qpos = jnp.asarray(m.qpos0)
    # randomize ball position in front of the agent
    dxy = jax.random.uniform(r1, (2,), minval=-0.2, maxval=0.2)
    qpos = qpos.at[self._ball_qadr:self._ball_qadr + 2].add(dxy)
    qvel = jnp.zeros(m.nv)
    keeper = opponents.reset_keeper(r2, horizon=self.max_episode_steps)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "truncation": jnp.float32(0.0), "keeper": keeper,
            "scored": jnp.float32(0.0)}
    data = self._make_data(qpos, qvel)
    data = self._place_keeper(data, keeper)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    return State(data, obs, zero, zero,
                 {"solved": zero, "score": zero}, info)

  def _place_keeper(self, data: Data, keeper) -> Data:
    if self._model.nmocap < 1:
      return data
    gx = self._config.goal_x
    pos = jnp.stack([jnp.float32(gx - 0.3), keeper.pose[0],
                     jnp.float32(0.9)])
    return data.replace(mocap_pos=data.mocap_pos.at[0].set(pos))

  def _ball_xy(self, data: Data) -> jax.Array:
    return data.qpos[self._ball_qadr:self._ball_qadr + 2]

  def _step_simulation(self, state: State, ctrl: jax.Array) -> State:
    state = super()._step_simulation(state, ctrl)
    keeper = opponents.step_keeper(
        state.info["keeper"], self._ball_xy(state.data), self.dt,
        goal_half_width=self._config.goal_half_width)
    data = self._place_keeper(state.data, keeper)
    # sticky goal flag: once scored, stays scored for the episode
    scored = jnp.maximum(state.info["scored"], self._goal_scored(data,
                                                                 keeper))
    return state.replace(
        data=data, info={**state.info, "keeper": keeper, "scored": scored})

  def _goal_scored(self, data: Data, keeper) -> jax.Array:
    cfg = self._config
    bx, by = self._ball_xy(data)[0], self._ball_xy(data)[1]
    in_goal_y = jnp.abs(by) < cfg.goal_half_width
    past_line = bx > cfg.goal_x
    # keeper blocks a ball entering within its reach
    blocked = jnp.abs(by - keeper.pose[0]) < cfg.keeper_reach
    return jnp.float32(past_line & in_goal_y & (~blocked))

  def _get_obs(self, data: Data, info) -> Dict[str, jax.Array]:
    dt = self._config.sim_dt
    ball = data.qpos[self._ball_qadr:self._ball_qadr + 3]
    ball_vel = data.qvel[self._ball_dadr:self._ball_dadr + 3]
    return {"state": jnp.concatenate([
        self._body_obs(data), ball, ball_vel * dt,
        info["keeper"].pose,
    ])}

  def _get_rewards(self, data: Data, info) -> Dict[str, jax.Array]:
    pain = self._fallen(data)
    return {
        "goal_scored": info["scored"],
        "time_cost": -jnp.float32(1.0),
        "act_reg": -jnp.mean(jnp.square(data.act)),
        "pain": -pain,
        # shaping: agent->ball and ball->goal progress
        "ball_dist": -jnp.linalg.norm(self._ball_xy(data) - data.qpos[0:2]),
        "goal_dist": -jnp.linalg.norm(
            self._ball_xy(data)
            - jnp.array([self._config.goal_x, 0.0])),
    }

  def _get_done(self, state: State) -> jax.Array:
    return jnp.maximum(jnp.float32(self._fallen(state.data)),
                       state.info["scored"])

  def _get_metrics(self, state, rewards):
    return {"solved": state.info["scored"], "score": state.info["scored"]}

  def _get_info(self, state: State) -> Dict:
    truncation, boundary = self._episode_boundary(state)
    rng, r1 = jax.random.split(state.info["rng"])
    new_keeper = opponents.reset_keeper(r1, horizon=self.max_episode_steps)
    keeper = jax.tree.map(
        lambda new, old: jnp.where(boundary, new, old),
        new_keeper, state.info["keeper"])
    scored = jnp.where(boundary, 0.0, state.info["scored"])
    return {**state.info, "rng": rng, "truncation": truncation,
            "keeper": keeper, "scored": scored,
            "step_count": jnp.where(boundary, jnp.int32(0),
                                    state.info["step_count"])}


class RunTrackEnv(_LegChallengeEnv):
  """Run down a track on a 56-muscle amputee leg with an OSL prosthetic
  (MyoChallenge'24 RunTrack, run_track_v0.py:31). The OSL FSM drives the
  prosthetic knee/ankle motors internally at control rate; the policy only
  commands the remaining muscles."""

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    mj = self._mj_model
    def jadr(name):
      j = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT.value, name)
      return int(mj.jnt_qposadr[j]), int(mj.jnt_dofadr[j])
    self._knee_q, self._knee_d = jadr("r_knee")
    self._ankle_q, self._ankle_d = jadr("r_ankle")
    self._osl_params = osl.make_osl_params(float(np.sum(mj.body_mass)))
    # last two actuators are the prosthetic motors (build_leg osl=True)
    names = [mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_ACTUATOR.value, i)
             for i in range(mj.nu)]
    assert names[-2:] == ["osl_knee", "osl_ankle"], names[-2:]

  @property
  def action_size(self) -> int:
    # OSL actions are appended internally, not exposed
    # (run_track_v0.py:265-275)
    return self._model.nu - 2

  def step(self, state: State, action: jax.Array) -> State:
    muscles = self.norm_actions(action)
    d = state.data
    # prosthetic (right) side load in Newtons: params were built with
    # body_mass, so thresholds are absolute (reference initDefaults)
    load = self._grf(d)[0] * self._body_weight
    phase, knee_tau, ankle_tau = osl.osl_step(
        state.info["osl_phase"], self._osl_params,
        d.qpos[self._knee_q], d.qvel[self._knee_d],
        d.qpos[self._ankle_q], d.qvel[self._ankle_d], load)
    ctrl = jnp.concatenate([muscles, knee_tau[None], ankle_tau[None]])
    state = state.replace(info={**state.info, "osl_phase": phase})
    return self.step_ctrl(state, ctrl)

  def reset(self, rng: jax.Array) -> State:
    rng, r1 = jax.random.split(rng)
    m = self._model
    qpos = jnp.asarray(m.qpos0)
    if self._config.get("reset_type", "init") == "random":
      noise = jax.random.uniform(r1, (m.nq,), minval=-0.02, maxval=0.02)
      qpos = qpos + noise.at[:7].set(0.0)
    qvel = jnp.zeros(m.nv)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "truncation": jnp.float32(0.0),
            "osl_phase": jnp.int32(osl.E_STANCE)}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    return State(data, obs, zero, zero,
                 {"solved": zero, "distance": zero}, info)

  def _get_obs(self, data: Data, info) -> Dict[str, jax.Array]:
    return {"state": self._body_obs(data)}

  def _get_rewards(self, data: Data, info) -> Dict[str, jax.Array]:
    vel = data.qvel[0]
    # sparse forward-progress band (run_track_v0.py:315-353: sparse 1 while
    # moving down the track upright)
    upright = 1.0 - self._fallen(data)
    sparse = jnp.float32(vel > self._config.min_velocity) * upright
    pain = self._fallen(data)
    return {"sparse": sparse,
            "solved": jnp.float32(
                data.qpos[0] > self._config.finish_x) * upright,
            "act_reg": -jnp.mean(jnp.square(data.act)),
            "pain": -pain,
            "vel_reward": jnp.exp(
                -jnp.square(vel - self._config.target_velocity) / 0.16)}

  def _get_done(self, state: State) -> jax.Array:
    finished = state.data.qpos[0] > self._config.finish_x
    return jnp.maximum(self._fallen(state.data), jnp.float32(finished))

  def _get_metrics(self, state, rewards):
    return {"solved": rewards["solved"],
            "distance": state.data.qpos[0]}

  def _get_info(self, state: State) -> Dict:
    truncation, boundary = self._episode_boundary(state)
    rng, _ = jax.random.split(state.info["rng"])
    phase = jnp.where(boundary, jnp.int32(osl.E_STANCE),
                      state.info["osl_phase"])
    return {**state.info, "rng": rng, "truncation": truncation,
            "osl_phase": phase,
            "step_count": jnp.where(boundary, jnp.int32(0),
                                    state.info["step_count"])}


class RelocateEnv(MyoEnv):
  """Lift an object from a pedestal to an in-air goal (MyoChallenge'23
  RelocateEnvV0, relocate_v0.py:16-31 contract) on the full myoArm.

  Per-episode object randomization (geom size / mass / friction,
  relocate_v0.py object randomization) runs in-graph through the
  _model_for_step hook: every env in the batch simulates its own physics
  parameters."""

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    mj = self._mj_model
    self._obj_site = mujoco.mj_name2id(
        mj, mujoco.mjtObj.mjOBJ_SITE.value, "object_site")
    self._obj_geom = mujoco.mj_name2id(
        mj, mujoco.mjtObj.mjOBJ_GEOM.value, "object_geom")
    self._obj_body = int(mj.geom_bodyid[self._obj_geom])
    j = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT.value, "object_free")
    self._obj_qadr = int(mj.jnt_qposadr[j])
    self._obj_dadr = int(mj.jnt_dofadr[j])

  def _make_xml(self) -> str:
    return self._config.model_xml

  def _model_for_step(self, info):
    m = self._model
    s = info["obj_scale"]
    mass = info["obj_mass_scale"]
    fr = info["obj_friction_scale"]
    return m.replace(
        geom_size=m.geom_size.at[self._obj_geom].multiply(s),
        geom_friction=m.geom_friction.at[self._obj_geom, 0].multiply(fr),
        body_mass=m.body_mass.at[self._obj_body].multiply(mass),
        body_inertia=m.body_inertia.at[self._obj_body].multiply(
            mass * s * s))

  def _sample_randomization(self, rng):
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    cfg = self._config
    lo, hi = cfg.obj_scale_range
    goal = (jnp.asarray(cfg.goal_center, dtype=jnp.float32)
            + jax.random.uniform(r4, (3,),
                                 minval=-jnp.asarray(cfg.goal_span),
                                 maxval=jnp.asarray(cfg.goal_span)))
    return {
        "obj_scale": jax.random.uniform(r1, minval=lo, maxval=hi),
        "obj_mass_scale": jax.random.uniform(r2, minval=0.5, maxval=1.5),
        "obj_friction_scale": jax.random.uniform(r3, minval=0.7, maxval=1.3),
        "goal_pos": goal,
    }

  def reset(self, rng: jax.Array) -> State:
    rng, r1 = jax.random.split(rng)
    m = self._model
    qpos = jnp.asarray(m.qpos0)
    qvel = jnp.zeros(m.nv)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "truncation": jnp.float32(0.0),
            **self._sample_randomization(r1)}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    return State(data, obs, zero, zero, {"solved": zero}, info)

  def _pos_err(self, data, info):
    return info["goal_pos"] - data.site_xpos[self._obj_site]

  def _get_obs(self, data: Data, info) -> Dict[str, jax.Array]:
    dt = self._config.sim_dt
    obj_q = data.qpos[self._obj_qadr:self._obj_qadr + 7]
    return {"state": jnp.concatenate([
        data.qpos[:self._obj_qadr],                 # hand_qpos
        data.qvel[:self._obj_dadr] * dt,            # hand_qvel
        data.act,
        obj_q[:3], obj_q[3:],                       # obj_pos, obj_rot
        info["goal_pos"],                           # goal_pos
        self._pos_err(data, info),                  # pos_err
        jnp.stack([info["obj_scale"], info["obj_mass_scale"],
                   info["obj_friction_scale"]]),
    ])}

  def _get_rewards(self, data, info):
    dist = jnp.linalg.norm(self._pos_err(data, info))
    lifted = data.site_xpos[self._obj_site][2] > self._config.lift_th
    return {"pos_dist": -dist,
            "lift_bonus": 1.0 * lifted,
            "bonus": 1.0 * (dist < 0.1) + 1.0 * (dist < 0.05),
            "act_reg": -jnp.mean(jnp.square(data.act))}

  def _get_done(self, state):
    # dropped off the workspace
    return jnp.float32(
        state.data.site_xpos[self._obj_site][2] < self._config.drop_th)

  def _get_metrics(self, state, rewards):
    dist = jnp.linalg.norm(self._pos_err(state.data, state.info))
    return {"solved": jnp.float32(dist < 0.05)}

  def _get_info(self, state: State) -> Dict:
    truncation, boundary = self._episode_boundary(state)
    rng, r1 = jax.random.split(state.info["rng"])
    fresh = self._sample_randomization(r1)
    info = {**state.info, "rng": rng, "truncation": truncation,
            "step_count": jnp.where(boundary, jnp.int32(0),
                                    state.info["step_count"])}
    for k, v in fresh.items():
      info[k] = jnp.where(boundary, v, state.info[k])
    return info


class BimanualEnv(MyoEnv):
  """Pass an object from a start pillar to a prosthetic gripper / goal
  pillar (MyoChallenge'24 BimanualEnvV1,
  /root/reference/myosuite/envs/myo/myochallenge/bimanual_v0.py:24).

  TPU-native redesign: the full myoArm (63 muscles) reaches for a box on
  the start pillar while the policy simultaneously drives a simplified
  position-actuated prosthetic gripper (the reference's MPL role) to
  receive it over the goal pillar. The reference's contact-label
  observation `touching_body` (bimanual_v0.py:173 one-hot over
  MYO/PROSTH/START/GOAL/ENV) is computed from static contact-slot masks.
  Reward contract (bimanual_v0.py:36-44): reach_dist -0.1, act 0,
  fin_dis -0.5, pass_err -1.
  """

  FIN_SITES = ("THtip", "IFtip", "MFtip", "RFtip", "LFtip")

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    mj = self._mj_model

    def sid(name):
      s = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_SITE.value, name)
      assert s >= 0, name
      return s

    self._rpalm_site = sid("pros_palm")
    self._obj_site = sid("object_site")
    self._fin_sites = [sid(n) for n in self.FIN_SITES]
    # myo-hand grasp point (reference S_grasp site role): the palm body
    self._palm_body = mujoco.mj_name2id(
        mj, mujoco.mjtObj.mjOBJ_BODY.value, "palm")

    j = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT.value, "object_free")
    self._obj_qadr = int(mj.jnt_qposadr[j])
    self._obj_dadr = int(mj.jnt_dofadr[j])
    jp = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT.value, "pros_x")
    self._pros_qadr = int(mj.jnt_qposadr[jp])
    self._pros_dadr = int(mj.jnt_dofadr[jp])

    # contact-label masks: object vs {myo hand, prosthesis, start, goal}
    obj_geom = _geom_ids(mj, ["object_geom"])[0]
    names = [mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_GEOM.value, g) or ""
             for g in range(mj.ngeom)]
    pros = [g for g, n in enumerate(names) if n.startswith("pros_")]
    start = _geom_ids(mj, ["start_pillar"])
    goal = _geom_ids(mj, ["goal_pillar"])
    # myo = hand geoms (non-world bodies that aren't prosthesis/object);
    # env = static world geoms (table/floor) minus the labeled pillars, so
    # the env channel stays object-centric (reference touching_body labels,
    # bimanual_v0.py:173) instead of absorbing non-object contacts.
    myo = [g for g in range(mj.ngeom)
           if g != obj_geom and g not in pros + start + goal
           and int(mj.geom_bodyid[g]) != 0]
    env_grp = [g for g in range(mj.ngeom)
               if g != obj_geom and g not in pros + start + goal
               and int(mj.geom_bodyid[g]) == 0]

    def obj_vs(group):
      ids = set(group)
      mask = []
      for p in np.asarray(self._model.collision_pairs.arr):
        g1, g2 = int(p[0]), int(p[1])
        pair_hit = ((g1 == obj_geom and g2 in ids)
                    or (g2 == obj_geom and g1 in ids))
        mask.extend([1.0 if pair_hit else 0.0] * int(p[2]))
      return jnp.asarray(np.array(mask, dtype=np.float32))

    self._touch_masks = [obj_vs(g) for g in (myo, pros, start, goal, env_grp)]
    # robotic (non-muscle) actuators get a linear ctrlrange map instead of
    # the muscle sigmoid (reference tabletennis_v0.py step(); MPL analog)
    self._robotic = jnp.asarray(
        np.asarray(mj.actuator_dyntype) != 4)  # mjDYN_MUSCLE

  def _make_xml(self) -> str:
    return self._config.model_xml

  def step(self, state: State, action: jax.Array) -> State:
    m = self._model
    lo = m.actuator_ctrlrange[:, 0]
    hi = m.actuator_ctrlrange[:, 1]
    linear = 0.5 * (lo + hi) + action * 0.5 * (hi - lo)
    ctrl = jnp.where(self._robotic, linear, self.norm_actions(action))
    return self.step_ctrl(state, ctrl)

  def reset(self, rng: jax.Array) -> State:
    rng, r1, r2 = jax.random.split(rng, 3)
    m = self._model
    cfg = self._config
    qpos = jnp.asarray(m.qpos0)
    # start/goal shifts (bimanual_v0.py start_shifts/goal_shifts: xy jitter)
    start_shift = jax.random.uniform(r1, (2,), minval=-0.04, maxval=0.04)
    goal_shift = jax.random.uniform(r2, (2,), minval=-0.05, maxval=0.05)
    qpos = qpos.at[self._obj_qadr:self._obj_qadr + 2].add(start_shift)
    goal_pos = (jnp.asarray(cfg.goal_center, dtype=jnp.float32)
                .at[:2].add(goal_shift))
    qvel = jnp.zeros(m.nv)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "truncation": jnp.float32(0.0), "goal_pos": goal_pos}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    return State(data, obs, zero, zero,
                 {"solved": zero, "lifted": zero}, info)

  def _touching_body(self, data: Data) -> jax.Array:
    """5-dim contact-label vector [myo, prosth, start, goal, env]; every
    channel counts contacts of the *object* vs that group (object-centric,
    like the reference's touching_body, bimanual_v0.py:173)."""
    active = (data.contact_force > 0.0).astype(jnp.float32)
    return jnp.stack([jnp.dot(mask, active) for mask in self._touch_masks])

  def _get_obs(self, data: Data, info) -> Dict[str, jax.Array]:
    dt = self._config.sim_dt
    obj_q = data.qpos[self._obj_qadr:self._obj_qadr + 7]
    obj_v = data.qvel[self._obj_dadr:self._obj_dadr + 6]
    palm = data.xpos[self._palm_body]
    rpalm = data.site_xpos[self._rpalm_site]
    obj = data.site_xpos[self._obj_site]
    return {"state": jnp.concatenate([
        data.time[None] if data.time.ndim == 0 else data.time,  # time
        data.qpos[:self._pros_qadr],                 # myohand_qpos
        data.qvel[:self._pros_dadr] * dt,            # myohand_qvel
        data.qpos[self._pros_qadr:self._obj_qadr],   # pros_hand_qpos
        data.qvel[self._pros_dadr:self._obj_dadr] * dt,  # pros_hand_qvel
        obj_q, obj_v * dt,                           # object_qpos/qvel
        self._touching_body(data),                   # touching_body
        palm - obj,                                  # reach_err
        rpalm - obj,                                 # pass_err
        info["goal_pos"] - obj,
        data.act,
    ])}

  def _get_rewards(self, data: Data, info) -> Dict[str, jax.Array]:
    palm = data.xpos[self._palm_body]
    rpalm = data.site_xpos[self._rpalm_site]
    obj = data.site_xpos[self._obj_site]
    fin_dis = sum(jnp.linalg.norm(data.site_xpos[s] - obj)
                  for s in self._fin_sites)
    return {"reach_dist": jnp.linalg.norm(palm - obj),
            "act": jnp.linalg.norm(data.act) / jnp.maximum(self._model.na, 1),
            "fin_dis": fin_dis,
            "pass_err": jnp.linalg.norm(rpalm - obj)}

  def _solved(self, data: Data, info) -> jax.Array:
    dist = jnp.linalg.norm(
        data.site_xpos[self._obj_site] - info["goal_pos"])
    return jnp.float32(dist < self._config.proximity_th)

  def _get_done(self, state: State) -> jax.Array:
    dropped = state.data.site_xpos[self._obj_site][2] < self._config.drop_th
    return jnp.maximum(jnp.float32(dropped),
                       self._solved(state.data, state.info))

  def _get_metrics(self, state, rewards):
    lifted = jnp.float32(
        state.data.site_xpos[self._obj_site][2] > self._config.lift_th)
    return {"solved": self._solved(state.data, state.info),
            "lifted": lifted}

  def _get_info(self, state: State) -> Dict:
    truncation, boundary = self._episode_boundary(state)
    rng, r2 = jax.random.split(state.info["rng"])
    goal_shift = jax.random.uniform(r2, (2,), minval=-0.05, maxval=0.05)
    fresh_goal = (jnp.asarray(self._config.goal_center, dtype=jnp.float32)
                  .at[:2].add(goal_shift))
    return {**state.info, "rng": rng, "truncation": truncation,
            "goal_pos": jnp.where(boundary, fresh_goal,
                                  state.info["goal_pos"]),
            "step_count": jnp.where(boundary, jnp.int32(0),
                                    state.info["step_count"])}


class TableTennisEnv(MyoEnv):
  """Return a served ping-pong ball with a paddle welded to the myoArm hand
  (MyoChallenge'25 TableTennisEnvV0,
  /root/reference/myosuite/envs/myo/myochallenge/tabletennis_v0.py:28).

  Obs contract (tabletennis_v0.py:30-41): pelvis_pos, body_qpos, body_qvel,
  ball_pos, ball_vel, paddle_pos, paddle_vel, paddle_ori, reach_err,
  touching_info. Reward contract (tabletennis_v0.py:42-53): reach_dist 1,
  palm_dist 1, paddle_quat 2, act_reg 0.5, torso_up 2, sparse 100,
  solved 1000, done -10. The serve relaunches through the in-graph
  auto-reset (the reference relaunches in-place, relaunch_ball:420).
  """

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    mj = self._mj_model

    def sid(name):
      s = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_SITE.value, name)
      assert s >= 0, name
      return s

    self._paddle_site = sid("paddle_center")
    self._ball_site = sid("ball_site")
    self._palm_body = mujoco.mj_name2id(
        mj, mujoco.mjtObj.mjOBJ_BODY.value, "palm")
    self._thorax_body = mujoco.mj_name2id(
        mj, mujoco.mjtObj.mjOBJ_BODY.value, "thorax")
    j = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT.value, "ball_free")
    self._ball_qadr = int(mj.jnt_qposadr[j])
    self._ball_dadr = int(mj.jnt_dofadr[j])
    paddle_geom = _geom_ids(mj, ["paddle_geom"])[0]
    table_geom = _geom_ids(mj, ["table_geom"])[0]
    ball_geom = _geom_ids(mj, ["ball_geom"])[0]

    def pair_mask(a, b):
      mask = []
      for p in np.asarray(self._model.collision_pairs.arr):
        g1, g2 = int(p[0]), int(p[1])
        hit = {g1, g2} == {a, b}
        mask.extend([1.0 if hit else 0.0] * int(p[2]))
      return jnp.asarray(np.array(mask, dtype=np.float32))

    self._paddle_ball = pair_mask(paddle_geom, ball_geom)
    self._table_ball = pair_mask(table_geom, ball_geom)

  def _make_xml(self) -> str:
    return self._config.model_xml

  def _launch_ball(self, rng: jax.Array):
    """Serve position + velocity toward the paddle workspace
    (reference relaunch_ball / cal_ball_qvel semantics)."""
    r1, r2, r3 = jax.random.split(rng, 3)
    pos = jnp.asarray([-2.0, 0.0, 1.25], dtype=jnp.float32)
    pos = pos.at[1].add(jax.random.uniform(r1, minval=-0.25, maxval=0.25))
    vx = jax.random.uniform(r2, minval=2.4, maxval=3.2)
    vy = -pos[1] * jax.random.uniform(r3, minval=0.3, maxval=0.8)
    vel = jnp.stack([vx, vy, jnp.float32(0.8)])
    return pos, vel

  def reset(self, rng: jax.Array) -> State:
    rng, r1 = jax.random.split(rng)
    m = self._model
    qpos = jnp.asarray(m.qpos0)
    qvel = jnp.zeros(m.nv)
    pos, vel = self._launch_ball(r1)
    qpos = qpos.at[self._ball_qadr:self._ball_qadr + 3].set(pos)
    qvel = qvel.at[self._ball_dadr:self._ball_dadr + 3].set(vel)
    info = {"rng": rng, "step_count": jnp.int32(0),
            "truncation": jnp.float32(0.0),
            "paddle_hit": jnp.float32(0.0)}
    data = self._make_data(qpos, qvel)
    obs = self._get_obs(data, info)
    zero = jnp.float32(0.0)
    return State(data, obs, zero, zero,
                 {"solved": zero, "hit": zero}, info)

  def _ball_pos(self, data: Data) -> jax.Array:
    return data.qpos[self._ball_qadr:self._ball_qadr + 3]

  def _ball_vel(self, data: Data) -> jax.Array:
    return data.qvel[self._ball_dadr:self._ball_dadr + 3]

  def _paddle_touch(self, data: Data) -> jax.Array:
    active = (data.contact_force > 0.0).astype(jnp.float32)
    return jnp.float32(jnp.dot(self._paddle_ball, active) > 0)

  def _step_simulation(self, state: State, ctrl: jax.Array) -> State:
    state = super()._step_simulation(state, ctrl)
    hit = jnp.maximum(state.info["paddle_hit"],
                      self._paddle_touch(state.data))
    return state.replace(info={**state.info, "paddle_hit": hit})

  def _get_obs(self, data: Data, info) -> Dict[str, jax.Array]:
    dt = self._config.sim_dt
    paddle = data.site_xpos[self._paddle_site]
    ball = self._ball_pos(data)
    face = data.site_xmat[self._paddle_site][:, 0]   # paddle face normal
    active = (data.contact_force > 0.0).astype(jnp.float32)
    touching = jnp.stack([jnp.dot(self._paddle_ball, active),
                          jnp.dot(self._table_ball, active)])
    return {"state": jnp.concatenate([
        data.xpos[self._thorax_body],                 # pelvis_pos role
        data.qpos[:self._ball_qadr],                  # body_qpos
        data.qvel[:self._ball_dadr] * dt,             # body_qvel
        ball, self._ball_vel(data) * dt,              # ball_pos, ball_vel
        paddle,                                       # paddle_pos
        data.cvel[self._palm_body] * dt,              # paddle_vel
        face,                                         # paddle_ori
        paddle - ball,                                # reach_err
        touching,                                     # touching_info
        info["paddle_hit"][None],
        data.act,
    ])}

  def _get_rewards(self, data: Data, info) -> Dict[str, jax.Array]:
    paddle = data.site_xpos[self._paddle_site]
    palm = data.xpos[self._palm_body]
    ball = self._ball_pos(data)
    reach = jnp.linalg.norm(paddle - ball)
    palm_d = jnp.linalg.norm(palm - ball)
    # face the serve: paddle normal toward -x (the reference's fixed
    # target orientation, tabletennis_v0.py padde_ori_err role)
    face = data.site_xmat[self._paddle_site][:, 0]
    ori_err = jnp.linalg.norm(face - jnp.asarray([-1.0, 0.0, 0.0]))
    # posture regularizer: the torso joint of the reference model maps to
    # shoulder internal rotation here (our arm has a welded thorax)
    torso_err = jnp.abs(data.qpos[2])
    return {"reach_dist": jnp.exp(-1.0 * reach),
            "palm_dist": jnp.exp(-5.0 * palm_d),
            "paddle_quat": jnp.exp(-5.0 * ori_err),
            "torso_up": jnp.exp(-5.0 * torso_err),
            "act_reg": -jnp.linalg.norm(data.act)
            / jnp.maximum(self._model.na, 1),
            "sparse": self._paddle_touch(data),
            "solved": self._solved(data, info),
            "done_pen": -self._lost(data)}

  def _solved(self, data: Data, info) -> jax.Array:
    """Rally success: ball was returned over the net onto the far side."""
    ball = self._ball_pos(data)
    vel = self._ball_vel(data)
    returned = (ball[0] < -1.4) & (vel[0] < 0) & (ball[2] > 0.86)
    return info["paddle_hit"] * jnp.float32(returned)

  def _lost(self, data: Data) -> jax.Array:
    ball = self._ball_pos(data)
    return jnp.float32((ball[2] < 0.5) | (ball[0] > 0.4))

  def _get_done(self, state: State) -> jax.Array:
    return jnp.maximum(self._lost(state.data),
                       self._solved(state.data, state.info))

  def _get_metrics(self, state, rewards):
    return {"solved": self._solved(state.data, state.info),
            "hit": state.info["paddle_hit"]}

  def _get_info(self, state: State) -> Dict:
    truncation, boundary = self._episode_boundary(state)
    rng, _ = jax.random.split(state.info["rng"])
    return {**state.info, "rng": rng, "truncation": truncation,
            "paddle_hit": jnp.where(boundary, 0.0,
                                    state.info["paddle_hit"]),
            "step_count": jnp.where(boundary, jnp.int32(0),
                                    state.info["step_count"])}
