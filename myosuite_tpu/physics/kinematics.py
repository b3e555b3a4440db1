"""Forward kinematics and CoM-frame quantities.

Semantics mirror MuJoCo's mj_kinematics / mj_comPos / mj_comVel (the engine
stage the reference reaches through mjx_env.step,
/root/reference/myosuite/envs/myo/mjx/mjx_base_env.py:88-92), implemented
TPU-first:
  * the kinematic tree is unrolled at trace time (body ids are topologically
    sorted, so a single Python loop suffices; XLA sees straight-line code
    with static shapes),
  * subtree aggregations (subtree_com, CRB accumulation) are dense matmuls
    against a precomputed (nbody, nbody) subtree mask — MXU work instead of
    a sequential tree walk,
  * everything is single-env; batching comes from jax.vmap at the call site.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from myosuite_tpu.physics import math
from myosuite_tpu.physics.types import Data, JointType, Model


def kinematics(m: Model, d: Data) -> Data:
  """Body/geom/site poses from qpos (mj_kinematics semantics)."""
  qpos = d.qpos

  xpos = [jnp.zeros(3, dtype=qpos.dtype)]
  xquat = [jnp.array([1.0, 0, 0, 0], dtype=qpos.dtype)]
  xanchor = [None] * m.njnt
  xaxis = [None] * m.njnt

  for b in range(1, m.nbody):
    p = int(m.body_parentid[b])
    pos = xpos[p] + math.rotate(m.body_pos[b], xquat[p])
    quat = math.mul_quat(xquat[p], m.body_quat[b])

    mid = int(m.body_mocapid[b])
    if mid >= 0:
      pos = d.mocap_pos[mid]
      quat = d.mocap_quat[mid]

    jadr = int(m.body_jntadr[b])
    for ji in range(int(m.body_jntnum[b])):
      j = jadr + ji
      jtype = int(m.jnt_type[j])
      qadr = int(m.jnt_qposadr[j])
      if jtype == JointType.FREE:
        pos = qpos[qadr:qadr + 3]
        quat = math.normalize(qpos[qadr + 3:qadr + 7])
        xanchor[j] = pos
        xaxis[j] = m.jnt_axis[j]  # mujoco leaves free-joint axis unrotated
        break  # free joint owns the body frame entirely
      anchor = math.rotate(m.jnt_pos[j], quat) + pos
      axis = math.rotate(m.jnt_axis[j], quat)
      xanchor[j] = anchor
      xaxis[j] = axis
      if jtype == JointType.SLIDE:
        pos = pos + axis * (qpos[qadr] - m.qpos0[qadr])
      elif jtype == JointType.HINGE:
        qloc = math.axis_angle_to_quat(m.jnt_axis[j],
                                       qpos[qadr] - m.qpos0[qadr])
        quat = math.mul_quat(quat, qloc)
        pos = anchor - math.rotate(m.jnt_pos[j], quat)
      elif jtype == JointType.BALL:
        qloc = math.normalize(qpos[qadr:qadr + 4])
        quat = math.mul_quat(quat, qloc)
        pos = anchor - math.rotate(m.jnt_pos[j], quat)

    xpos.append(pos)
    xquat.append(quat)

  xpos = jnp.stack(xpos)
  xquat = jnp.stack(xquat)
  xmat = jax.vmap(math.quat_to_mat)(xquat)

  # inertial frames
  xipos = xpos + jax.vmap(math.rotate)(m.body_ipos, xquat)
  ximat = jax.vmap(math.quat_to_mat)(
      jax.vmap(math.mul_quat)(xquat, m.body_iquat))

  # geoms / sites (vectorized gathers)
  if m.ngeom:
    gb = m.geom_bodyid.arr
    geom_xpos = xpos[gb] + jax.vmap(math.rotate)(m.geom_pos, xquat[gb])
    geom_xmat = jax.vmap(math.quat_to_mat)(
        jax.vmap(math.mul_quat)(xquat[gb], m.geom_quat))
  else:
    geom_xpos, geom_xmat = d.geom_xpos, d.geom_xmat
  if m.nsite:
    sb = m.site_bodyid.arr
    site_xpos = xpos[sb] + jax.vmap(math.rotate)(m.site_pos, xquat[sb])
    site_xmat = jax.vmap(math.quat_to_mat)(
        jax.vmap(math.mul_quat)(xquat[sb], m.site_quat))
  else:
    site_xpos, site_xmat = d.site_xpos, d.site_xmat

  if m.njnt:
    xanchor = jnp.stack(xanchor)
    xaxis = jnp.stack(xaxis)
  else:
    xanchor, xaxis = d.xanchor, d.xaxis

  return d.replace(
      xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
      xanchor=xanchor, xaxis=xaxis,
      geom_xpos=geom_xpos, geom_xmat=geom_xmat,
      site_xpos=site_xpos, site_xmat=site_xmat)


def com_pos(m: Model, d: Data) -> Data:
  """Subtree CoM, CoM-frame inertia (cinert) and dof axes (cdof)."""
  # subtree com via dense subtree-mask matmul (MXU)
  wmass = m.body_mass[:, None] * d.xipos                    # (nbody, 3)
  subtree_mass = math.mm(m.body_subtreemask, m.body_mass)           # (nbody,)
  subtree_com = math.mm(m.body_subtreemask, wmass) / jnp.maximum(
      subtree_mass, 1e-12)[:, None]

  # cinert: spatial inertia of each body in the frame centered at the
  # subtree com of its kinematic root, world orientation.
  root_com = subtree_com[m.body_rootid.arr]                 # (nbody, 3)

  def one_cinert(ximat, xipos, inertia, mass, off_origin):
    # R diag(i) R^T = sum_k i_k R[:,k] R[:,k]^T as broadcast-multiply-reduce:
    # a batched (3,3) dot_general here lowers to a conv emitter + layout
    # copies on TPU (~0.6 ms/substep at batch 2048); elementwise stays on
    # the VPU and fuses with the surrounding ops.
    imat_w = jnp.sum(ximat[:, None, :] * ximat[None, :, :]
                     * inertia[None, None, :], axis=-1)
    dvec = xipos - off_origin
    # parallel axis: I_origin = I_com + m (|d|^2 I - d d^T)
    i_off = imat_w + mass * (jnp.dot(dvec, dvec) * jnp.eye(3, dtype=dvec.dtype)
                             - jnp.outer(dvec, dvec))
    return jnp.concatenate([
        jnp.stack([i_off[0, 0], i_off[1, 1], i_off[2, 2],
                   i_off[0, 1], i_off[0, 2], i_off[1, 2]]),
        mass * dvec,
        mass[None],
    ])

  cinert = jax.vmap(one_cinert)(d.ximat, d.xipos, m.body_inertia,
                                m.body_mass, root_com)

  # cdof per dof
  cdof = [None] * m.nv
  for j in range(m.njnt):
    jtype = int(m.jnt_type[j])
    vadr = int(m.jnt_dofadr[j])
    b = int(m.jnt_bodyid[j])
    com = subtree_com[int(m.body_rootid[b])]
    if jtype == JointType.FREE:
      for i in range(3):
        e = jnp.zeros(3, dtype=d.qpos.dtype).at[i].set(1.0)
        cdof[vadr + i] = jnp.concatenate([jnp.zeros(3, dtype=e.dtype), e])
      offset = d.xpos[b] - com
      for i in range(3):
        ang = d.xmat[b][:, i]  # body-local axes in world
        cdof[vadr + 3 + i] = jnp.concatenate(
            [ang, jnp.cross(ang, -offset)])
    elif jtype == JointType.BALL:
      offset = d.xanchor[j] - com
      for i in range(3):
        ang = d.xmat[b][:, i]
        cdof[vadr + i] = jnp.concatenate([ang, jnp.cross(ang, -offset)])
    elif jtype == JointType.SLIDE:
      cdof[vadr] = jnp.concatenate(
          [jnp.zeros(3, dtype=d.qpos.dtype), d.xaxis[j]])
    else:  # HINGE
      offset = d.xanchor[j] - com
      ang = d.xaxis[j]
      cdof[vadr] = jnp.concatenate([ang, jnp.cross(ang, -offset)])

  cdof = jnp.stack(cdof) if m.nv else d.cdof
  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(m: Model, d: Data) -> Data:
  """Body spatial velocities cvel and cdof time-derivatives (mj_comVel)."""
  cvel = [jnp.zeros(6, dtype=d.qpos.dtype)]
  cdof_dot = [None] * m.nv

  for b in range(1, m.nbody):
    p = int(m.body_parentid[b])
    v = cvel[p]
    jadr = int(m.body_jntadr[b])
    for ji in range(int(m.body_jntnum[b])):
      j = jadr + ji
      jtype = int(m.jnt_type[j])
      vadr = int(m.jnt_dofadr[j])
      if jtype == JointType.FREE:
        for i in range(3):
          cdof_dot[vadr + i] = jnp.zeros(6, dtype=d.qpos.dtype)
        v = v + d.cdof[vadr:vadr + 3].T @ d.qvel[vadr:vadr + 3]
        # rotational dofs see the translational velocity added above
        for i in range(3, 6):
          cdof_dot[vadr + i] = math.motion_cross(v, d.cdof[vadr + i])
        v = v + d.cdof[vadr + 3:vadr + 6].T @ d.qvel[vadr + 3:vadr + 6]
      elif jtype == JointType.BALL:
        for i in range(3):
          cdof_dot[vadr + i] = math.motion_cross(v, d.cdof[vadr + i])
        v = v + d.cdof[vadr:vadr + 3].T @ d.qvel[vadr:vadr + 3]
      else:
        cdof_dot[vadr] = math.motion_cross(v, d.cdof[vadr])
        v = v + d.cdof[vadr] * d.qvel[vadr]
    cvel.append(v)

  cvel = jnp.stack(cvel)
  cdof_dot = jnp.stack(cdof_dot) if m.nv else d.cdof_dot
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)
