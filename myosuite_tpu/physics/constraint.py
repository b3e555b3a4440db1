"""Constraint assembly: joint/tendon limits, dof friction loss, contacts.

Builds a dense, static-shape efc system (J, aref, R, masks) following
MuJoCo's soft-constraint model (solref/solimp impedances), consumed by the
Newton solver in solver.py. Fully batched: the host precomputes static row
tables (which dof/joint/tendon/contact-slot owns each row), and each row
class is assembled with one vectorized op — no per-row Python unrolling,
so efc assembly stays O(1) in trace size as models grow.

Row layout: [dof friction] [joint limits] [tendon limits] [contact rows];
activity is a mask, not a shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_tpu.physics import math
from myosuite_tpu.physics.tendon import _body_dof_mask
from myosuite_tpu.physics.types import Data, JointType, Model

_MINVAL = 1e-15


class Efc(NamedTuple):
  """Dense constraint system with static shape."""
  J: jax.Array            # (nefc, nv)
  aref: jax.Array         # (nefc,)
  R: jax.Array            # (nefc,)
  floss: jax.Array        # (nefc,) frictionloss bound (friction rows)
  active: jax.Array       # (nefc,) row participates (pre-jar gating)
  is_friction: np.ndarray  # (nefc,) STATIC mask — stays host numpy so the
                           # pallas path can read it at trace time


def _impedance(solimp: jax.Array, pos: jax.Array) -> jax.Array:
  """Vectorized impedance d(x); solimp (..., 5), pos (...)."""
  dmin, dmax, width = solimp[..., 0], solimp[..., 1], solimp[..., 2]
  mid = jnp.clip(solimp[..., 3], 1e-4, 1.0 - 1e-4)
  power = jnp.maximum(solimp[..., 4], 1.0)
  x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, _MINVAL), 0.0, 1.0)
  y_low = jnp.power(x / mid, power) * mid
  y_high = 1.0 - jnp.power((1.0 - x) / (1.0 - mid), power) * (1.0 - mid)
  y = jnp.where(x < mid, y_low, y_high)
  return jnp.clip(dmin + y * (dmax - dmin), 1e-5, 1.0 - 1e-5)


def _kbi(solref: jax.Array, solimp: jax.Array, pos: jax.Array):
  """Vectorized stiffness/damping/impedance; solref (..., 2)."""
  imp = _impedance(solimp, pos)
  dmax = jnp.maximum(solimp[..., 1], 1e-5)
  timeconst, dampratio = solref[..., 0], solref[..., 1]
  standard = timeconst > 0
  k_std = 1.0 / jnp.maximum(dmax * dmax * timeconst * timeconst *
                            dampratio * dampratio, _MINVAL)
  b_std = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
  k = jnp.where(standard, k_std,
                -solref[..., 0] / jnp.maximum(dmax * dmax, _MINVAL))
  b = jnp.where(standard, b_std, -solref[..., 1] / jnp.maximum(dmax, _MINVAL))
  return k, b, imp


class _EfcPlan(NamedTuple):
  fr_dof: np.ndarray        # dofs with frictionloss
  fr_jnt: np.ndarray        # owning joint per friction row
  lim_jnt: np.ndarray       # limited slide/hinge joints
  lim_qadr: np.ndarray
  lim_vadr: np.ndarray
  lim_ten: np.ndarray       # limited tendons
  con_groups: tuple         # ((condim, slot_idx array), ...)
  con_slots: np.ndarray     # (nefc,) contact slot per row, -1 for non-contact
  nefc: int
  n_fr: int
  n_jlim: int
  n_tlim: int


_EFC_PLANS = {}


def _efc_plan(m: Model) -> _EfcPlan:
  # keyed on the static pair table (shared across replace()-randomized
  # Models, stable for the env's lifetime) — see collision._col_plan
  key = id(m.collision_pairs)
  # entries hold a strong ref to the keyed Static so its id cannot be
  # recycled by GC for a different model (see types.plan_cache rationale)
  hit = _EFC_PLANS.get(key)
  if hit is not None and hit[0] is m.collision_pairs:
    return hit[1]
  floss = np.asarray(jax.device_get(m.dof_frictionloss))
  fr_dof = np.nonzero(floss > 0)[0].astype(np.int32)
  fr_jnt = np.asarray(m.dof_jntid)[fr_dof].astype(np.int32)

  jtypes = np.asarray(m.jnt_type)
  limited = np.asarray(m.jnt_limited).astype(bool)
  is_lim = limited & ((jtypes == int(JointType.SLIDE))
                      | (jtypes == int(JointType.HINGE)))
  lim_jnt = np.nonzero(is_lim)[0].astype(np.int32)
  lim_qadr = np.asarray(m.jnt_qposadr)[lim_jnt].astype(np.int32)
  lim_vadr = np.asarray(m.jnt_dofadr)[lim_jnt].astype(np.int32)

  lim_ten = np.nonzero(np.asarray(m.tendon_limited))[0].astype(np.int32)

  dims = np.asarray(m.collision_pairs.arr)
  # expand to slots
  slot_dims = []
  for p in np.asarray(m.collision_pairs.arr):
    slot_dims += [int(p[3])] * int(p[2])
  slot_dims = np.array(slot_dims, dtype=np.int32)
  con_groups = []
  for c in sorted(set(slot_dims.tolist())):
    idx = np.nonzero(slot_dims == c)[0].astype(np.int32)
    con_groups.append((int(c), idx))

  n_fr = len(fr_dof)
  n_jlim = len(lim_jnt)
  n_tlim = len(lim_ten)
  n_con_rows = sum((1 if c == 1 else 2 * (c - 1)) * len(idx)
                   for c, idx in con_groups)
  # row -> contact-slot map, mirroring make_efc's row emission order
  # (pyramidal rows of one contact sum to its total normal force)
  slot_chunks = [-np.ones(n_fr + n_jlim + n_tlim, dtype=np.int32)]
  for c, idx in con_groups:
    nrep = 1 if c == 1 else 2 * (c - 1)
    slot_chunks.append(np.tile(idx, nrep).astype(np.int32))
  con_slots = np.concatenate(slot_chunks) if slot_chunks else np.zeros(
      0, dtype=np.int32)
  plan = _EfcPlan(fr_dof=fr_dof, fr_jnt=fr_jnt, lim_jnt=lim_jnt,
                  lim_qadr=lim_qadr, lim_vadr=lim_vadr, lim_ten=lim_ten,
                  con_groups=tuple(con_groups), con_slots=con_slots,
                  nefc=n_fr + n_jlim + n_tlim + n_con_rows,
                  n_fr=n_fr, n_jlim=n_jlim, n_tlim=n_tlim)
  _EFC_PLANS[key] = (m.collision_pairs, plan)
  return plan


def make_efc(m: Model, d: Data) -> Efc:
  """Assemble the full constraint system for the current state, batched."""
  plan = _efc_plan(m)
  dtype = d.qpos.dtype
  if plan.nefc == 0:
    z = jnp.zeros(0, dtype=dtype)
    return Efc(J=jnp.zeros((0, m.nv), dtype=dtype), aref=z, R=jnp.ones(0),
               floss=z, active=jnp.zeros(0, dtype=bool),
               is_friction=np.zeros(0, dtype=bool))

  Js, arefs, Rs, flosses, actives, isfrs = [], [], [], [], [], []

  # ---- dof friction loss (batched) ----
  if plan.n_fr:
    eye = np.zeros((plan.n_fr, m.nv), dtype=np.float32)
    eye[np.arange(plan.n_fr), plan.fr_dof] = 1.0
    k, b, imp = _kbi(m.jnt_solref[plan.fr_jnt], m.jnt_solimp[plan.fr_jnt],
                     jnp.zeros(plan.n_fr, dtype=dtype))
    Js.append(jnp.asarray(eye))
    arefs.append(-b * d.qvel[plan.fr_dof])
    Rs.append(jnp.maximum((1.0 - imp) / jnp.maximum(imp, _MINVAL)
                          * m.dof_invweight0[plan.fr_dof], _MINVAL))
    flosses.append(m.dof_frictionloss[plan.fr_dof])
    actives.append(jnp.ones(plan.n_fr, dtype=bool))
    isfrs.append(np.ones(plan.n_fr, dtype=bool))

  # ---- joint limits (nearest side per joint, batched) ----
  if plan.n_jlim:
    q = d.qpos[plan.lim_qadr]
    lo = m.jnt_range[plan.lim_jnt, 0]
    hi = m.jnt_range[plan.lim_jnt, 1]
    dist_lo = q - lo
    dist_hi = hi - q
    sign = jnp.where(dist_lo < dist_hi, 1.0, -1.0)
    dist = jnp.minimum(dist_lo, dist_hi)
    margin = m.jnt_margin[plan.lim_jnt]
    pos = dist - margin
    eye = np.zeros((plan.n_jlim, m.nv), dtype=np.float32)
    eye[np.arange(plan.n_jlim), plan.lim_vadr] = 1.0
    J = jnp.asarray(eye) * sign[:, None]
    k, b, imp = _kbi(m.jnt_solref[plan.lim_jnt], m.jnt_solimp[plan.lim_jnt],
                     pos)
    Js.append(J)
    arefs.append(-b * (sign * d.qvel[plan.lim_vadr]) - k * imp * pos)
    Rs.append(jnp.maximum((1.0 - imp) / jnp.maximum(imp, _MINVAL)
                          * m.dof_invweight0[plan.lim_vadr], _MINVAL))
    flosses.append(jnp.zeros(plan.n_jlim, dtype=dtype))
    actives.append(dist < margin)
    isfrs.append(np.zeros(plan.n_jlim, dtype=bool))

  # ---- tendon limits (batched) ----
  if plan.n_tlim:
    t = plan.lim_ten
    length = d.ten_length[t]
    lo = m.tendon_range[t, 0]
    hi = m.tendon_range[t, 1]
    dist_lo = length - lo
    dist_hi = hi - length
    sign = jnp.where(dist_lo < dist_hi, 1.0, -1.0)
    dist = jnp.minimum(dist_lo, dist_hi)
    margin = m.tendon_margin[t]
    pos = dist - margin
    J = sign[:, None] * d.ten_J[t]
    k, b, imp = _kbi(m.tendon_solref_lim[t], m.tendon_solimp_lim[t], pos)
    Js.append(J)
    arefs.append(-b * math.mm(J, d.qvel) - k * imp * pos)
    Rs.append(jnp.maximum((1.0 - imp) / jnp.maximum(imp, _MINVAL)
                          * m.tendon_invweight0[t], _MINVAL))
    flosses.append(jnp.zeros(plan.n_tlim, dtype=dtype))
    actives.append(dist < margin)
    isfrs.append(np.zeros(plan.n_tlim, dtype=bool))

  # ---- contacts (pyramidal cone, batched per condim group) ----
  if m.ncon_max:
    con = d.contact
    body1 = m.geom_bodyid.arr[con.geom1.arr]
    body2 = m.geom_bodyid.arr[con.geom2.arr]
    dof_mask = jnp.asarray(_body_dof_mask(m))
    com_root = d.subtree_com[m.body_rootid.arr]

    def pts_jac(pts, bodyids):
      offset = pts - com_root[bodyids]
      jacp = (jnp.cross(d.cdof[None, :, :3], offset[:, None, :])
              + d.cdof[None, :, 3:])                 # (N, nv, 3)
      return jacp * dof_mask[bodyids][:, :, None]

    jdiff = pts_jac(con.pos, body2) - pts_jac(con.pos, body1)  # (ncon,nv,3)
    # jc rows: frame axes; (ncon, 3, nv)
    jc = jnp.einsum("nak,nvk->nav", con.frame, jdiff)
    pos_err = con.dist - con.includemargin
    active = con.dist < con.includemargin
    k, b, imp = _kbi(con.solref, con.solimp, pos_err)
    invweight = (m.body_invweight0[body1][:, 0]
                 + m.body_invweight0[body2][:, 0])

    for condim, idx in plan.con_groups:
      if condim == 1:
        J = jc[idx, 0]
        aref = -b[idx] * math.mm(J, d.qvel) - k[idx] * imp[idx] * pos_err[idx]
        R = (1.0 - imp[idx]) / jnp.maximum(imp[idx], _MINVAL) * invweight[idx]
        Js.append(J)
        arefs.append(aref)
        Rs.append(jnp.maximum(R, _MINVAL))
        flosses.append(jnp.zeros(len(idx), dtype=dtype))
        actives.append(active[idx])
        isfrs.append(np.zeros(len(idx), dtype=bool))
      else:
        mu = con.friction[idx, 0]
        iw = (invweight[idx] * 2.0 * mu * mu) / m.opt.impratio
        R_row = (1.0 - imp[idx]) / jnp.maximum(imp[idx], _MINVAL) * iw
        rows = []
        for ax in range(1, condim):
          fr = con.friction[idx, ax - 1]
          for sgn in (1.0, -1.0):
            rows.append(jc[idx, 0] + sgn * fr[:, None] * jc[idx, ax])
        J = jnp.concatenate(rows)                    # (2(c-1)*n, nv)
        nrep = 2 * (condim - 1)
        rep = lambda x: jnp.tile(x, (nrep,))
        aref = (-rep(b[idx]) * math.mm(J, d.qvel)
                - rep(k[idx] * imp[idx] * pos_err[idx]))
        Js.append(J)
        arefs.append(aref)
        Rs.append(jnp.maximum(rep(R_row), _MINVAL))
        flosses.append(jnp.zeros(nrep * len(idx), dtype=dtype))
        actives.append(rep(active[idx]))
        isfrs.append(np.zeros(nrep * len(idx), dtype=bool))

  return Efc(J=jnp.concatenate(Js),
             aref=jnp.concatenate(arefs),
             R=jnp.concatenate(Rs),
             floss=jnp.concatenate(flosses),
             active=jnp.concatenate(actives),
             is_friction=np.concatenate(isfrs))
