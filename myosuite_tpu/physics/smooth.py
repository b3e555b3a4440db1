"""Smooth (unconstrained) dynamics: mass matrix, bias forces, passive forces.

Equivalent engine stages to MuJoCo's mj_crb / mj_factorM / mj_rne /
mj_passive, reached by the reference through mjx_env.step
(/root/reference/myosuite/envs/myo/mjx/mjx_base_env.py:88-92). TPU-first
choices:
  * qM is DENSE (nv x nv). myo models have nv <= ~60; a batched dense
    Cholesky + triangular solve vectorizes across thousands of envs and maps
    onto the MXU, unlike MuJoCo's sparse LTDL recursion.
  * CRB subtree accumulation and RNE backward pass are dense matmuls against
    the static subtree mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_tpu.physics import linalg, math
from myosuite_tpu.physics.types import Data, Model


def _ancestor_mask(m: Model) -> np.ndarray:
  """(nv, nv) lower-tri mask: mask[i, j]=1 iff dof j is i or an ancestor."""
  mask = np.zeros((m.nv, m.nv), dtype=np.float32)
  par = m.dof_parentid.arr
  for i in range(m.nv):
    j = i
    while j >= 0:
      mask[i, j] = 1.0
      j = int(par[j])
  return mask


def crb(m: Model, d: Data) -> Data:
  """Composite-rigid-body dense mass matrix."""
  crb_inert = math.mm(m.body_subtreemask, d.cinert)          # (nbody, 10)
  body_of_dof = m.dof_bodyid.arr
  f = jax.vmap(math.inert_vec)(crb_inert[body_of_dof], d.cdof)  # (nv, 6)
  # (nv,6)@(6,nv) per env: as a dot_general the vmapped batch lowers to a
  # conv emitter + layout copies on TPU (~0.08 ms/substep); the k=6
  # broadcast-multiply-reduce stays in one VPU loop fusion.
  m1 = jnp.sum(f[:, None, :] * d.cdof[None, :, :], axis=-1)  # (nv, nv)
  mask = jnp.asarray(_ancestor_mask(m))
  lower = m1 * mask
  qm = lower + lower.T - jnp.diag(jnp.diag(lower))
  qm = qm + jnp.diag(m.dof_armature)
  return d.replace(qM=qm)


def factor_m(m: Model, d: Data) -> Data:
  """Cholesky factorization of qM (unrolled; see physics/linalg.py)."""
  return d.replace(qLD=linalg.chol_factor(d.qM))


def solve_m(d: Data, y: jax.Array) -> jax.Array:
  """Solve qM x = y using the cached Cholesky factor."""
  return linalg.chol_solve(d.qLD, y)


def mul_m(d: Data, v: jax.Array) -> jax.Array:
  return d.qM @ v


def rne(m: Model, d: Data) -> Data:
  """Bias forces C(q, v) via recursive Newton-Euler (zero acceleration)."""
  dtype = d.qpos.dtype
  # base "acceleration" encoding gravity
  cacc0 = jnp.concatenate(
      [jnp.zeros(3, dtype=dtype), -m.opt.gravity.astype(dtype)])

  cacc = [cacc0]
  for b in range(1, m.nbody):
    p = int(m.body_parentid[b])
    a = cacc[p]
    dadr = int(m.body_dofadr[b])
    dnum = int(m.body_dofnum[b])
    if dnum:
      a = a + d.cdof_dot[dadr:dadr + dnum].T @ d.qvel[dadr:dadr + dnum]
    cacc.append(a)
  cacc = jnp.stack(cacc)

  def body_frc(cin, acc, vel):
    fa = math.inert_vec(cin, acc)
    fv = math.motion_cross_force(vel, math.inert_vec(cin, vel))
    return fa + fv

  cfrc = jax.vmap(body_frc)(d.cinert, cacc, d.cvel)   # (nbody, 6)
  cfrc_total = math.mm(m.body_subtreemask, cfrc)              # subtree accumulate

  qfrc_bias = jnp.einsum("ij,ij->i", d.cdof,
                         cfrc_total[m.dof_bodyid.arr])
  return d.replace(qfrc_bias=qfrc_bias)


def passive(m: Model, d: Data) -> Data:
  """Passive spring/damper forces on dofs and tendons (mj_passive subset).

  dof frictionloss is handled as a constraint row (like MuJoCo), not here.
  """
  dtype = d.qpos.dtype
  qfrc = -m.dof_damping * d.qvel

  # joint springs: generalized per joint type. Joints with zero stiffness
  # are skipped statically — most myo models have none, so the per-joint
  # loop usually traces to nothing. When jnt_stiffness is a tracer (vmapped
  # domain randomization), no static pruning: every joint gets a spring term.
  if isinstance(m.jnt_stiffness, jax.core.Tracer):
    stiffness_np = None
  else:
    stiffness_np = np.asarray(jax.device_get(m.jnt_stiffness))
  spring = jnp.zeros(m.nv, dtype=dtype)
  for j in range(m.njnt):
    if stiffness_np is not None and stiffness_np[j] == 0.0:
      continue
    stiff = m.jnt_stiffness[j]
    qadr = int(m.jnt_qposadr[j])
    vadr = int(m.jnt_dofadr[j])
    jtype = int(m.jnt_type[j])
    if jtype in (2, 3):  # slide / hinge
      spring = spring.at[vadr].set(
          -stiff * (d.qpos[qadr] - m.qpos_spring[qadr]))
    elif jtype == 1:  # ball: quaternion difference as 3-vector
      dif = math.quat_diff_vel(m.qpos_spring[qadr:qadr + 4],
                               d.qpos[qadr:qadr + 4])
      spring = spring.at[vadr:vadr + 3].set(-stiff * dif)
    else:  # free: translation springs + rotation
      dif = d.qpos[qadr:qadr + 3] - m.qpos_spring[qadr:qadr + 3]
      spring = spring.at[vadr:vadr + 3].set(-stiff * dif)
      difq = math.quat_diff_vel(m.qpos_spring[qadr + 3:qadr + 7],
                                d.qpos[qadr + 3:qadr + 7])
      spring = spring.at[vadr + 3:vadr + 6].set(-stiff * difq)
  qfrc = qfrc + spring

  # tendon spring (deadband) + damping, projected through tendon jacobian
  if m.ntendon:
    lo = m.tendon_lengthspring[:, 0]
    hi = m.tendon_lengthspring[:, 1]
    displ = jnp.where(d.ten_length < lo, lo - d.ten_length,
                      jnp.where(d.ten_length > hi, hi - d.ten_length, 0.0))
    frc = m.tendon_stiffness * displ - m.tendon_damping * d.ten_velocity
    qfrc = qfrc + math.mm(d.ten_J.T, frc)

  return d.replace(qfrc_passive=qfrc)
