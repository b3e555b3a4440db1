"""Inverse kinematics: damped-least-squares site posing, pure JAX.

Role-equivalent of the reference's IK util
(/root/reference/myosuite/utils/inverse_kinematics.py:39-243,
dm_control-lineage qpos_from_site_pose): iteratively solve for qpos that
places a site at a target position (and optionally orientation), with
Tikhonov damping and per-step norm clamping. Runs jitted and vmaps over
batches of targets — useful for reset-state generation on device.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from myosuite_tpu.physics import forward, io, kinematics, math
from myosuite_tpu.physics import tendon as tendon_mod
from myosuite_tpu.physics.types import Data, Model


class IKResult(NamedTuple):
  qpos: jax.Array
  err_norm: jax.Array
  steps: jax.Array


def qpos_from_site_pose(m: Model, d: Data, site_id: int,
                        target_pos: jax.Array,
                        target_quat: Optional[jax.Array] = None,
                        max_steps: int = 50,
                        damping: float = 0.05,
                        max_update_norm: float = 2.0,
                        tol: float = 1e-5) -> IKResult:
  """Solve joint angles placing `site_id` at target_pos (and quat).

  Fixed-iteration loop (lax.while with step cap) — jit/vmap safe.
  """
  nv = m.nv

  def site_err_and_jac(qpos):
    dd = d.replace(qpos=qpos)
    dd = kinematics.kinematics(m, dd)
    dd = kinematics.com_pos(m, dd)
    bodyid = int(m.site_bodyid[site_id])
    pos = dd.site_xpos[site_id]
    jacp = tendon_mod.point_jacobian(m, dd, pos, bodyid)   # (3, nv)
    err = target_pos - pos
    if target_quat is not None:
      cur_quat = math.mat_to_quat(dd.site_xmat[site_id])
      rot_err = math.quat_diff_vel(cur_quat, target_quat)
      # rotational jacobian: cdof angular part masked to the body chain
      from myosuite_tpu.physics.tendon import _body_dof_mask
      import numpy as np
      mask = jnp.asarray(_body_dof_mask(m))[bodyid]
      jacr = (dd.cdof[:, :3] * mask[:, None]).T             # (3, nv)
      err = jnp.concatenate([err, rot_err])
      jac = jnp.concatenate([jacp, jacr], axis=0)
    else:
      jac = jacp
    return err, jac

  def cond(carry):
    qpos, err_norm, step = carry
    return (err_norm > tol) & (step < max_steps)

  def body(carry):
    qpos, _, step = carry
    err, jac = site_err_and_jac(qpos)
    # damped least squares: dq = J^T (J J^T + lambda I)^-1 err
    jjt = math.mm(jac, jac.T) + damping * jnp.eye(jac.shape[0])
    dq = math.mm(jac.T, jnp.linalg.solve(jjt, err))
    norm = math.norm_safe(dq)
    dq = jnp.where(norm > max_update_norm, dq * max_update_norm / norm, dq)
    qpos = qpos + dq  # hinge/slide models: qpos and qvel aligned
    qpos = jnp.clip(qpos, m.jnt_range[:, 0], m.jnt_range[:, 1])
    err_new, _ = site_err_and_jac(qpos)
    return qpos, math.norm_safe(err_new), step + 1

  err0, _ = site_err_and_jac(d.qpos)
  qpos, err_norm, steps = jax.lax.while_loop(
      cond, body, (d.qpos, math.norm_safe(err0), jnp.int32(0)))
  return IKResult(qpos=qpos, err_norm=err_norm, steps=steps)
