"""Tendon paths: lengths and moment-arm Jacobians.

Covers MuJoCo fixed tendons (linear in qpos) and spatial tendons as
site-to-site polylines with pulley branches. Muscle moment arms — the
quantity the myo models live on — come out as dense (ntendon, nv) Jacobians,
computed from CoM-frame dof axes so the whole thing is a handful of fused
VPU ops per env under vmap.

Sphere/cylinder wrap geoms are handled in wrap.py and stitched into the
same segment accounting.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_tpu.physics import math
from myosuite_tpu.physics import wrap as wrap_mod
from myosuite_tpu.physics.types import Data, JointType, Model, WrapType


def _body_dof_mask(m: Model) -> np.ndarray:
  """(nbody, nv) mask: 1 iff dof j is an ancestor dof of body b."""
  mask = np.zeros((m.nbody, m.nv), dtype=np.float32)
  for b in range(m.nbody):
    # walk up the body tree collecting dofs
    body = b
    while body != 0:
      adr = int(m.body_dofadr[body])
      for i in range(int(m.body_dofnum[body])):
        mask[b, adr + i] = 1.0
      body = int(m.body_parentid[body])
  return mask


def point_jacobian(m: Model, d: Data, point: jax.Array,
                   bodyid: int) -> jax.Array:
  """Translational Jacobian (3, nv) of a world point attached to a body.

  Column i = cdof_ang_i x (point - com_root) + cdof_lin_i, masked to the
  body's ancestor dofs (mj_jac semantics in CoM frame).
  """
  com = d.subtree_com[int(m.body_rootid[bodyid])]
  offset = point - com
  jacp = jnp.cross(d.cdof[:, :3], offset[None, :]) + d.cdof[:, 3:]  # (nv, 3)
  mask = jnp.asarray(_body_dof_mask(m))[bodyid][:, None]
  return (jacp * mask).T


def tendon(m: Model, d: Data) -> Data:
  """Compute ten_length and ten_J for all tendons (mj_tendon semantics)."""
  if m.ntendon == 0:
    return d

  dof_mask = jnp.asarray(_body_dof_mask(m))
  com_root = d.subtree_com[m.body_rootid.arr]  # (nbody, 3)

  def seg_jac(point, bodyid):
    offset = point - com_root[bodyid]
    jacp = jnp.cross(d.cdof[:, :3], offset[None, :]) + d.cdof[:, 3:]
    return jacp * dof_mask[bodyid][:, None]  # (nv, 3)

  lengths = []
  jacs = []
  for t in range(m.ntendon):
    adr = int(m.tendon_adr[t])
    num = int(m.tendon_num[t])
    wtypes = [int(m.wrap_type[adr + k]) for k in range(num)]
    objids = [int(m.wrap_objid[adr + k]) for k in range(num)]

    if all(wt == WrapType.JOINT for wt in wtypes):
      # fixed tendon: L = sum coef * qpos[jnt]
      length = jnp.float32(0.0)
      jac = jnp.zeros(m.nv, dtype=d.qpos.dtype)
      for k in range(num):
        j = objids[k]
        coef = m.wrap_prm[adr + k]
        qadr = int(m.jnt_qposadr[j])
        vadr = int(m.jnt_dofadr[j])
        length = length + coef * d.qpos[qadr]
        jac = jac.at[vadr].add(coef)
      lengths.append(length)
      jacs.append(jac)
      continue

    # spatial tendon: segmentize the wrap chain on the host, then evaluate
    segs = []  # ('straight', div, sidA, sidB) | ('wrap', div, sidA, gid, sideid, sidB, is_sphere)
    divisor = 1.0
    cur = None
    k = 0
    while k < num:
      wt = wtypes[k]
      if wt == WrapType.PULLEY:
        divisor = float(np.asarray(m.wrap_prm)[adr + k])
        cur = None
        k += 1
      elif wt == WrapType.SITE:
        if cur is not None:
          segs.append(("straight", divisor, cur, objids[k]))
        cur = objids[k]
        k += 1
      elif wt in (WrapType.SPHERE, WrapType.CYLINDER):
        assert cur is not None and k + 1 < num and \
            wtypes[k + 1] == WrapType.SITE, "wrap geom must join two sites"
        sideid = int(m.wrap_sidesite[adr + k])
        segs.append(("wrap", divisor, cur, objids[k], sideid,
                     objids[k + 1], wt == WrapType.SPHERE))
        cur = objids[k + 1]
        k += 2
      else:
        raise NotImplementedError(f"wrap type {wt} in tendon {t}")

    length = jnp.float32(0.0)
    jac = jnp.zeros(m.nv, dtype=d.qpos.dtype)
    for seg in segs:
      if seg[0] == "straight":
        _, div, sa, sb = seg
        dl, dj = _straight_segment(
            d.site_xpos[sa], int(m.site_bodyid[sa]),
            d.site_xpos[sb], int(m.site_bodyid[sb]), seg_jac)
      else:
        _, div, sa, gid, sideid, sb, is_sphere = seg
        pa, ba = d.site_xpos[sa], int(m.site_bodyid[sa])
        pb, bb = d.site_xpos[sb], int(m.site_bodyid[sb])
        gb = int(m.geom_bodyid[gid])
        side = d.site_xpos[sideid] if sideid >= 0 else None
        w1, w2, wlen = wrap_mod.wrap(
            pa, pb, d.geom_xpos[gid], d.geom_xmat[gid],
            m.geom_size[gid][0], side, is_sphere)
        l_a1, j_a1 = _straight_segment(pa, ba, w1, gb, seg_jac)
        l_a2, j_a2 = _straight_segment(w2, gb, pb, bb, seg_jac)
        l_s, j_s = _straight_segment(pa, ba, pb, bb, seg_jac)
        active = wlen >= 0.0
        dl = jnp.where(active, l_a1 + wlen + l_a2, l_s)
        dj = jnp.where(active, j_a1 + j_a2, j_s)
      length = length + dl / div
      jac = jac + dj / div

    lengths.append(length)
    jacs.append(jac)

  ten_length = jnp.stack(lengths)
  ten_j = jnp.stack(jacs)
  return d.replace(ten_length=ten_length, ten_J=ten_j)


def _straight_segment(p0, b0, p1, b1, seg_jac) -> Tuple[jax.Array, jax.Array]:
  """Length and dL/dq of a straight tendon segment between two bodies."""
  dif = p1 - p0
  length = math.norm_safe(dif)
  u = dif / jnp.maximum(length, 1e-9)
  dj = (seg_jac(p1, b1) - seg_jac(p0, b0)) @ u  # (nv,)
  return length, dj


def tendon_velocity(m: Model, d: Data) -> Data:
  if m.ntendon == 0:
    return d
  return d.replace(ten_velocity=d.ten_J @ d.qvel)
