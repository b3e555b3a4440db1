"""Forward dynamics pipeline and integrators — the engine's `step`.

Mirrors the stage ordering of MuJoCo's mj_forward / mj_step (the kernel the
reference invokes via mjx_env.step,
/root/reference/myosuite/envs/myo/mjx/mjx_base_env.py:88-92), as pure
functions Model x Data -> Data. Batch with jax.vmap, roll out with
jax.lax.scan, shard the batch axis with shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_tpu.physics import (actuation, collision, constraint,
                                  kinematics, linalg, smooth, solver, tendon)
from myosuite_tpu.physics import math
from myosuite_tpu.physics.types import Data, IntegratorType, JointType, Model


def fwd_position(m: Model, d: Data) -> Data:
  d = kinematics.kinematics(m, d)
  d = kinematics.com_pos(m, d)
  d = tendon.tendon(m, d)
  d = actuation.transmission(m, d)
  d = smooth.crb(m, d)
  if not solver.fused_path(m):
    # fused path: the Pallas solver factorizes qM in-kernel; the XLA-side
    # unrolled Cholesky (~nv scatter-broken fusions) is dead weight there
    d = smooth.factor_m(m, d)
  d = collision.collision(m, d)
  return d


def fwd_velocity(m: Model, d: Data) -> Data:
  d = kinematics.com_vel(m, d)
  d = tendon.tendon_velocity(m, d)
  d = actuation.actuator_velocity(m, d)
  d = smooth.rne(m, d)
  d = smooth.passive(m, d)
  return d


def fwd_actuation(m: Model, d: Data) -> Data:
  return actuation.actuation(m, d)


def fwd_acceleration(m: Model, d: Data) -> Data:
  qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
                 + d.qfrc_applied + xfrc_projection(m, d))
  if solver.fused_path(m):
    # qacc_smooth comes out of the fused solver kernel in fwd_constraint
    return d.replace(qfrc_smooth=qfrc_smooth)
  qacc_smooth = smooth.solve_m(d, qfrc_smooth)
  return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)


def xfrc_projection(m: Model, d: Data) -> jax.Array:
  """Project Cartesian body wrenches xfrc_applied into dof space."""
  # cheap check: most envs never use xfrc — still traced, XLA folds zeros.
  from myosuite_tpu.physics.tendon import _body_dof_mask
  dof_mask = jnp.asarray(_body_dof_mask(m))
  com_root = d.subtree_com[m.body_rootid.arr]

  qfrc = jnp.zeros(m.nv, dtype=d.qpos.dtype)
  for b in range(1, m.nbody):
    offset = d.xipos[b] - com_root[b]
    # force at body CoM -> CoM-frame force vector
    frc = d.xfrc_applied[b]
    cfrc = jnp.concatenate(
        [frc[3:] + jnp.cross(offset, frc[:3]), frc[:3]])
    qfrc = qfrc + (math.mm(d.cdof, cfrc)) * dof_mask[b]
  return qfrc


def fwd_constraint(m: Model, d: Data) -> Data:
  efc = constraint.make_efc(m, d)
  qacc, qfrc_constraint, efc_force, a_smooth, qacc_euler = solver.solve(
      m, d, efc)
  if a_smooth is not None:
    d = d.replace(qacc_smooth=a_smooth, qacc_euler=qacc_euler)
  # per-contact normal force (pyramidal edge forces of one contact sum to
  # its normal component) — feeds GRF observations and the OSL load input
  if m.ncon_max and efc_force.shape[0]:
    slots = constraint._efc_plan(m).con_slots
    con_rows = np.nonzero(slots >= 0)[0]
    contact_force = jax.ops.segment_sum(
        efc_force[jnp.asarray(con_rows)],
        jnp.asarray(slots[con_rows]), num_segments=m.ncon_max)
  else:
    contact_force = d.contact_force
  return d.replace(qacc=qacc, qfrc_constraint=qfrc_constraint,
                   contact_force=contact_force)


def forward(m: Model, d: Data) -> Data:
  d = fwd_position(m, d)
  d = fwd_velocity(m, d)
  d = fwd_actuation(m, d)
  d = fwd_acceleration(m, d)
  d = fwd_constraint(m, d)
  return d


# ---------------------------------------------------------------------------
# integration
# ---------------------------------------------------------------------------


def _integrate_act(m: Model, d: Data, h: float) -> jax.Array:
  if m.na == 0:
    return d.act
  act = d.act + h * d.act_dot
  # muscles stay in [0, 1]; explicit actrange clamps apply when limited.
  # Index tables are static topology; clamp VALUES gather from the jnp
  # actrange so the path stays valid when it is a tracer (vmapped
  # domain randomization).
  dyntypes = np.asarray(m.actuator_dyntype)
  actadr = np.asarray(m.actuator_actadr)
  is_muscle_act = np.zeros(m.na, dtype=bool)
  limited = np.asarray(m.actuator_actlimited)
  lim_acts, lim_us = [], []
  for i in range(m.nu):
    adr = int(actadr[i])
    if adr < 0:
      continue
    if dyntypes[i] == 4:  # MUSCLE
      is_muscle_act[adr] = True
    if limited[i]:
      lim_acts.append(adr)
      lim_us.append(i)
  act = jnp.where(jnp.asarray(is_muscle_act), jnp.clip(act, 0.0, 1.0), act)
  if lim_acts:
    rng = m.actuator_actrange[jnp.asarray(lim_us, dtype=jnp.int32)]
    idx = jnp.asarray(lim_acts, dtype=jnp.int32)
    act = act.at[idx].set(jnp.clip(act[idx], rng[:, 0], rng[:, 1]))
  return act


def _qpos_plan(m: Model):
  """Static index tables for position integration: all linear qpos entries
  (hinge/slide + free-joint translations) integrate in ONE vectorized
  scatter; only quaternion entries (ball / free rotation) need per-joint
  manifold treatment. myo models are all-hinge/slide plus a few free object
  joints, so the python loop below is O(#quats), not O(njnt)."""
  def build():
    lin_q, lin_v, quats = [], [], []
    for j in range(m.njnt):
      jtype = int(m.jnt_type[j])
      qadr = int(m.jnt_qposadr[j])
      vadr = int(m.jnt_dofadr[j])
      if jtype == JointType.FREE:
        lin_q += [qadr, qadr + 1, qadr + 2]
        lin_v += [vadr, vadr + 1, vadr + 2]
        quats.append((qadr + 3, vadr + 3))
      elif jtype == JointType.BALL:
        quats.append((qadr, vadr))
      else:
        lin_q.append(qadr)
        lin_v.append(vadr)
    return (np.asarray(lin_q, dtype=np.int32),
            np.asarray(lin_v, dtype=np.int32), tuple(quats))
  from myosuite_tpu.physics.types import plan_cache
  return plan_cache(m.jnt_type, "qpos", build)


def _integrate_qpos(m: Model, qpos: jax.Array, qvel: jax.Array,
                    h: float) -> jax.Array:
  """Position integration respecting quaternion manifolds."""
  lin_q, lin_v, quats = _qpos_plan(m)
  out = qpos
  if len(lin_q) == m.nq and not quats:
    out = qpos + h * qvel[lin_v]
  elif len(lin_q):
    out = out.at[lin_q].set(qpos[lin_q] + h * qvel[lin_v])
  for qadr, vadr in quats:
    q = math.quat_integrate(qpos[qadr:qadr + 4], qvel[vadr:vadr + 3], h)
    out = out.at[qadr:qadr + 4].set(q)
  return out


def euler(m: Model, d: Data) -> Data:
  """Semi-implicit Euler with implicit joint damping (mj_Euler)."""
  h = m.opt.timestep
  act = _integrate_act(m, d, h)

  if solver.fused_path(m):
    # the fused Pallas solver already solved (qM + h diag(damping)) qacc =
    # qfrc_smooth + qfrc_constraint in-kernel
    qacc = d.qacc_euler
  else:
    # static pruning only when damping is concrete; under vmapped domain
    # randomization it is a tracer and the implicit branch must always run
    if isinstance(m.dof_damping, jax.core.Tracer):
      use_implicit = True
    else:
      use_implicit = bool(
          (np.asarray(jax.device_get(m.dof_damping)) > 0).any())
    if use_implicit:
      mh = d.qM + h * jnp.diag(m.dof_damping)
      rhs = d.qfrc_smooth + d.qfrc_constraint
      qacc = linalg.solve_pd(mh, rhs)
    else:
      qacc = d.qacc

  qvel = d.qvel + h * qacc
  qpos = _integrate_qpos(m, d.qpos, qvel, h)
  return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def step(m: Model, d: Data) -> Data:
  """One physics step: forward dynamics + integration."""
  d = forward(m, d)
  if m.opt.integrator in (IntegratorType.EULER, IntegratorType.IMPLICITFAST,
                          IntegratorType.IMPLICIT):
    return euler(m, d)
  raise NotImplementedError(f"integrator {m.opt.integrator}")


def step_n(m: Model, d: Data, n: int) -> Data:
  """n physics substeps under one control (ctrl_dt / sim_dt pattern)."""
  def body(dd, _):
    return step(m, dd), None
  d, _ = jax.lax.scan(body, d, None, length=n)
  return d
