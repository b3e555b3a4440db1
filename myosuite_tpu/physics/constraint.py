"""Constraint assembly: joint/tendon limits, dof friction loss, contacts.

Builds a dense, static-shape efc system (J, aref, R, type masks) following
MuJoCo's soft-constraint model (solref/solimp impedances), consumed by the
Newton solver in solver.py. Row capacity is static: one row per limited
joint/tendon, one per frictional dof, and 2*(condim-1) pyramidal rows (or 1
for frictionless) per contact slot; activity is a mask, not a shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_tpu.physics import math
from myosuite_tpu.physics.types import Data, JointType, Model

_MINVAL = 1e-15


class EfcType:
  FRICTION = 0   # two-sided, bounded by frictionloss
  LIMIT = 1      # one-sided (includes contacts)


class Efc(NamedTuple):
  """Dense constraint system with static shape."""
  J: jax.Array          # (nefc, nv)
  aref: jax.Array       # (nefc,)
  R: jax.Array          # (nefc,) regularization
  floss: jax.Array      # (nefc,) frictionloss bound (friction rows)
  active: jax.Array     # (nefc,) bool: row participates (pre-jar gating)
  is_friction: jax.Array  # (nefc,) bool static mask


def _impedance(solimp: jax.Array, pos: jax.Array) -> jax.Array:
  """Position-dependent constraint impedance d(x) (MuJoCo solimp)."""
  dmin, dmax, width, mid, power = (solimp[0], solimp[1], solimp[2],
                                   solimp[3], solimp[4])
  x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, _MINVAL), 0.0, 1.0)
  mid = jnp.clip(mid, 1e-4, 1.0 - 1e-4)
  power = jnp.maximum(power, 1.0)
  y_low = jnp.power(x / mid, power) * mid
  y_high = 1.0 - jnp.power((1.0 - x) / (1.0 - mid), power) * (1.0 - mid)
  y = jnp.where(x < mid, y_low, y_high)
  return jnp.clip(dmin + y * (dmax - dmin), 1e-5, 1.0 - 1e-5)


def _kbi(solref: jax.Array, solimp: jax.Array, pos: jax.Array):
  """Stiffness/damping from solref (standard or direct) + impedance."""
  imp = _impedance(solimp, pos)
  dmax = jnp.maximum(solimp[1], 1e-5)
  timeconst, dampratio = solref[0], solref[1]
  standard = timeconst > 0
  k_std = 1.0 / jnp.maximum(dmax * dmax * timeconst * timeconst *
                            dampratio * dampratio, _MINVAL)
  b_std = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
  k = jnp.where(standard, k_std, -solref[0] / jnp.maximum(dmax * dmax, _MINVAL))
  b = jnp.where(standard, b_std, -solref[1] / jnp.maximum(dmax, _MINVAL))
  return k, b, imp


def make_efc(m: Model, d: Data) -> Efc:
  """Assemble the full constraint system for the current state."""
  dtype = d.qpos.dtype
  rows_J, rows_aref, rows_R, rows_fl, rows_act, rows_isfr = \
      [], [], [], [], [], []

  def add(J, aref, R, floss, active, is_friction):
    rows_J.append(J)
    rows_aref.append(aref)
    rows_R.append(jnp.maximum(R, _MINVAL))
    rows_fl.append(floss)
    rows_act.append(active)
    rows_isfr.append(is_friction)

  # ---- dof friction loss ----
  floss_np = np.asarray(m.dof_frictionloss)
  for i in range(m.nv):
    if floss_np[i] <= 0:
      continue
    J = jnp.zeros(m.nv, dtype=dtype).at[i].set(1.0)
    jid = int(m.dof_jntid[i])
    k, b, imp = _kbi(m.jnt_solref[jid], m.jnt_solimp[jid],
                     jnp.float32(0.0))
    aref = -b * d.qvel[i]
    R = (1.0 - imp) / jnp.maximum(imp, _MINVAL) * m.dof_invweight0[i]
    add(J, aref, R, m.dof_frictionloss[i], jnp.bool_(True), True)

  # ---- joint limits (hinge/slide; nearest side per joint) ----
  limited = np.asarray(m.jnt_limited)
  for j in range(m.njnt):
    jtype = int(m.jnt_type[j])
    if not limited[j] or jtype not in (JointType.SLIDE, JointType.HINGE):
      continue
    qadr = int(m.jnt_qposadr[j])
    vadr = int(m.jnt_dofadr[j])
    lo, hi = m.jnt_range[j][0], m.jnt_range[j][1]
    dist_lo = d.qpos[qadr] - lo
    dist_hi = hi - d.qpos[qadr]
    use_lo = dist_lo < dist_hi
    dist = jnp.minimum(dist_lo, dist_hi)
    sign = jnp.where(use_lo, 1.0, -1.0)
    margin = m.jnt_margin[j]
    pos = dist - margin
    active = dist < margin
    J = jnp.zeros(m.nv, dtype=dtype).at[vadr].set(1.0) * sign
    k, b, imp = _kbi(m.jnt_solref[j], m.jnt_solimp[j], pos)
    aref = -b * (sign * d.qvel[vadr]) - k * imp * pos
    R = (1.0 - imp) / jnp.maximum(imp, _MINVAL) * m.dof_invweight0[vadr]
    add(J, aref, R, jnp.float32(0.0), active, False)

  # ---- tendon limits ----
  ten_limited = np.asarray(m.tendon_limited)
  for t in range(m.ntendon):
    if not ten_limited[t]:
      continue
    lo, hi = m.tendon_range[t][0], m.tendon_range[t][1]
    dist_lo = d.ten_length[t] - lo
    dist_hi = hi - d.ten_length[t]
    use_lo = dist_lo < dist_hi
    dist = jnp.minimum(dist_lo, dist_hi)
    sign = jnp.where(use_lo, 1.0, -1.0)
    margin = m.tendon_margin[t]
    pos = dist - margin
    active = dist < margin
    J = sign * d.ten_J[t]
    k, b, imp = _kbi(m.tendon_solref_lim[t], m.tendon_solimp_lim[t], pos)
    aref = -b * (J @ d.qvel) - k * imp * pos
    R = (1.0 - imp) / jnp.maximum(imp, _MINVAL) * m.tendon_invweight0[t]
    add(J, aref, R, jnp.float32(0.0), active, False)

  # ---- contacts (pyramidal cone) ----
  if m.ncon_max:
    con = d.contact
    geom1 = con.geom1.arr
    geom2 = con.geom2.arr
    dims = con.dim.arr
    body1 = m.geom_bodyid.arr[geom1]
    body2 = m.geom_bodyid.arr[geom2]
    from myosuite_tpu.physics.tendon import _body_dof_mask
    dof_mask = jnp.asarray(_body_dof_mask(m))
    com_root = d.subtree_com[m.body_rootid.arr]

    def pt_jac(point, bodyid):
      offset = point - com_root[bodyid]
      jacp = jnp.cross(d.cdof[:, :3], offset[None, :]) + d.cdof[:, 3:]
      return jacp * dof_mask[bodyid][:, None]   # (nv, 3)

    for c in range(m.ncon_max):
      b1, b2 = int(body1[c]), int(body2[c])
      condim = int(dims[c])
      pos_err = con.dist[c] - con.includemargin[c]
      active = con.dist[c] < con.includemargin[c]
      jdiff = pt_jac(con.pos[c], b2) - pt_jac(con.pos[c], b1)  # (nv, 3)
      jc = math.mm(jdiff, con.frame[c].T).T    # (3, nv) rows n,t1,t2
      k, b, imp = _kbi(con.solref[c], con.solimp[c], pos_err)
      invweight = (m.body_invweight0[b1][0] + m.body_invweight0[b2][0])
      if condim == 1:
        J = jc[0]
        aref = -b * (J @ d.qvel) - k * imp * pos_err
        R = (1.0 - imp) / jnp.maximum(imp, _MINVAL) * invweight
        add(J, aref, R, jnp.float32(0.0), active, False)
      else:
        mu = con.friction[c][0]
        iw_pyr = invweight * 2.0 * mu * mu * (1.0 / m.opt.impratio)
        R_pyr = (1.0 - imp) / jnp.maximum(imp, _MINVAL) * iw_pyr
        for ax in range(1, condim):
          fr = con.friction[c][ax - 1]
          for sgn in (1.0, -1.0):
            J = jc[0] + sgn * fr * jc[ax] if ax < 3 else jc[0]
            aref = -b * (J @ d.qvel) - k * imp * pos_err
            add(J, aref, R_pyr, jnp.float32(0.0), active, False)

  if not rows_J:
    return Efc(J=jnp.zeros((0, m.nv), dtype=dtype),
               aref=jnp.zeros(0, dtype=dtype), R=jnp.ones(0, dtype=dtype),
               floss=jnp.zeros(0, dtype=dtype),
               active=jnp.zeros(0, dtype=bool),
               is_friction=jnp.zeros(0, dtype=bool))

  return Efc(J=jnp.stack(rows_J), aref=jnp.stack(rows_aref),
             R=jnp.stack(rows_R), floss=jnp.stack(rows_fl),
             active=jnp.stack(rows_act),
             is_friction=jnp.asarray(np.array(rows_isfr)))
