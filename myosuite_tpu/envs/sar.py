"""SAR multi-geometry in-hand reorientation suite (role of the reference's
ProprioceptiveEnvV0 / Geometries8 / Geometries100 / InDistribution /
OutofDistribution, /root/reference/myosuite/envs/myo/myobase/
reorient_sar_v0.py:16,177,265,440,1517).

The reference mutates mj_model.geom_type/geom_size per reset to present one
of 8 or 100 parametric objects (capsules/ellipsoids/cylinders/boxes). A
geom-type switch changes the collision program, so the TPU-native design
keeps one capsule proxy and randomizes its *extents and mass* per episode
in-graph through the `_model_for_step` hook — each env in a vmapped batch
simulates its own geometry from a static per-variant geometry table, with
zero host round-trips. The 8/100/ID/OOD split is preserved as the size of
the table and whether its rows fall inside or outside the training range.

MDP contract (SURVEY.md Appendix A, reorient_sar_v0.py:24-44,139-176):
obs = hand_jnt, obj_pos, obj_vel, obj_rot, obj_des_rot, obj_err_pos,
obj_err_rot, act, mlen, mvel, mforce; rewards pos_align 1, rot_align 1,
act_reg 5, drop 5, bonus 10; solved = rot_align > 0.95 and not dropped.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from myosuite_tpu.envs.base import MyoEnv, State
from myosuite_tpu.physics.types import Data


def geometry_table(variant: str) -> np.ndarray:
  """(n, 3) rows of [radius, half_length, mass_scale] per variant.

  Deterministic (fixed seed) so every process sees the same object sets,
  mirroring the reference's fixed 8/100-geometry lists
  (reorient_sar_v0.py:177-440)."""
  rng = np.random.RandomState(17)
  def rows(n, r_lo, r_hi, h_lo, h_hi):
    return np.stack([
        rng.uniform(r_lo, r_hi, n),
        rng.uniform(h_lo, h_hi, n),
        rng.uniform(0.6, 1.6, n)], axis=-1)
  if variant == "8":
    return rows(8, 0.008, 0.012, 0.050, 0.070)
  if variant == "100":
    return rows(100, 0.007, 0.014, 0.045, 0.080)
  if variant == "id":       # in-distribution eval: training range
    return rows(100, 0.007, 0.014, 0.045, 0.080)
  if variant == "ood":      # out-of-distribution eval: outside it
    half = rows(50, 0.0045, 0.0068, 0.030, 0.044)
    big = rows(50, 0.0142, 0.018, 0.081, 0.095)
    return np.concatenate([half, big], axis=0)
  raise ValueError(variant)


class ReorientSAREnv(MyoEnv):
  """In-hand reorient of per-episode-randomized geometry (SAR suite)."""

  def __init__(self, config, overrides=None):
    super().__init__(config, overrides)
    mj = self._mj_model
    self._obj_site = mujoco.mj_name2id(
        mj, mujoco.mjtObj.mjOBJ_SITE.value, "object_site")
    self._top_site = mujoco.mj_name2id(
        mj, mujoco.mjtObj.mjOBJ_SITE.value, "object_top")
    self._obj_geom = mujoco.mj_name2id(
        mj, mujoco.mjtObj.mjOBJ_GEOM.value, "object_geom")
    self._obj_body = int(mj.geom_bodyid[self._obj_geom])
    j = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT.value, "object_free")
    self._obj_qadr = int(mj.jnt_qposadr[j])
    self._obj_dadr = int(mj.jnt_dofadr[j])
    self._geoms = jnp.asarray(geometry_table(self._config.geom_variant),
                              dtype=jnp.float32)
    self._base_size = jnp.asarray(
        np.array(mj.geom_size[self._obj_geom]), dtype=jnp.float32)

  def _make_xml(self) -> str:
    return self._config.model_xml

  def _model_for_step(self, info):
    m = self._model
    row = self._geoms[info["geom_idx"]]
    mass = row[2]
    return m.replace(
        geom_size=m.geom_size.at[self._obj_geom, 0].set(row[0])
                             .at[self._obj_geom, 1].set(row[1]),
        body_mass=m.body_mass.at[self._obj_body].multiply(mass),
        body_inertia=m.body_inertia.at[self._obj_body].multiply(mass))

  def _sample_randomization(self, rng):
    r1, r2 = jax.random.split(rng)
    idx = jax.random.randint(r1, (), 0, self._geoms.shape[0])
    u = jax.random.uniform(r2, (2,), minval=jnp.array([-1.0, -0.8]),
                           maxval=jnp.array([1.0, 1.2]))
    yaw, pitch = u[0] * jnp.pi, u[1]
    goal_dir = jnp.stack([jnp.cos(yaw) * jnp.cos(pitch),
                          jnp.sin(yaw) * jnp.cos(pitch),
                          jnp.sin(pitch)])
    return {"geom_idx": idx, "goal_dir": goal_dir}

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

  def _axes(self, data, info):
    axis = data.site_xpos[self._top_site] - data.site_xpos[self._obj_site]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-9)
    return axis, info["goal_dir"]

  def _get_obs(self, data: Data, info) -> Dict[str, jax.Array]:
    dt = self._config.sim_dt
    axis, goal = self._axes(data, info)
    obj_pos = data.site_xpos[self._obj_site]
    pos_err = jnp.asarray(self._config.goal_center,
                          dtype=jnp.float32) - obj_pos
    # hand_jnt, obj_pos, obj_vel, obj_rot, obj_des_rot, errs, act,
    # mlen, mvel, mforce (reorient_sar_v0.py:116-137)
    return {"state": jnp.concatenate([
        data.qpos[:self._obj_qadr],
        obj_pos,
        data.qvel[self._obj_dadr:self._obj_dadr + 6] * dt,
        axis, goal, pos_err, axis - goal,
        data.act,
        data.actuator_length,
        data.actuator_velocity * dt,
        data.actuator_force * 1e-3,
        self._geoms[info["geom_idx"]],
    ])}

  def _get_rewards(self, data, info):
    axis, goal = self._axes(data, info)
    obj_pos = data.site_xpos[self._obj_site]
    pos_align = jnp.linalg.norm(
        jnp.asarray(self._config.goal_center, dtype=jnp.float32) - obj_pos)
    rot_align = jnp.dot(axis, goal)
    dropped = pos_align > 0.075
    act_mag = jnp.linalg.norm(data.act) / jnp.maximum(self._model.na, 1)
    return {
        "pos_align": -pos_align,
        "rot_align": rot_align,
        "act_reg": -act_mag,
        "drop": -1.0 * dropped,
        "bonus": 1.0 * ((rot_align > 0.9) & (pos_align < 0.075))
        + 5.0 * ((rot_align > 0.95) & (pos_align < 0.075)),
    }

  def _get_done(self, state):
    obj_pos = state.data.site_xpos[self._obj_site]
    pos_align = jnp.linalg.norm(
        jnp.asarray(self._config.goal_center, dtype=jnp.float32) - obj_pos)
    return jnp.float32(pos_align > 0.075)

  def _get_metrics(self, state, rewards):
    axis, goal = self._axes(state.data, state.info)
    return {"solved": jnp.float32((jnp.dot(axis, goal) > 0.95)
                                  & (state.done == 0.0))}

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
