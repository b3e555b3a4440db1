"""Narrow-phase collision: primitive pair functions over a static pair table.

TPU-first: there is no broadphase and no dynamic allocation — the host
precomputes every admissible geom pair (io._collision_pairs) and the device
evaluates all of them every step into fixed contact slots, masked by
penetration depth. This is the same static-capacity philosophy as the
reference's naconmax=75*num_envs preallocation
(/root/reference/myosuite/envs/myo/mjx/mjx_base_env.py:123-135), but exact:
capacity equals the number of candidate contacts.

Supported pair classes: plane-{sphere,capsule,ellipsoid,box},
sphere-{sphere,capsule,ellipsoid,box}, capsule-{capsule,box}, box-box
(8 corner probes). Mesh/hfield geoms are not yet supported.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_tpu.physics import math
from myosuite_tpu.physics.types import Contact, Data, GeomType, Model

_EPS = 1e-9


def _make_frame(n: jax.Array) -> jax.Array:
  """Orthonormal frame rows [normal, tan1, tan2] from a unit normal."""
  n = n / jnp.maximum(math.norm_safe(n), _EPS)
  # pick the world axis least aligned with n
  a = jnp.where(jnp.abs(n[0]) < 0.5,
                jnp.array([1.0, 0.0, 0.0], dtype=n.dtype),
                jnp.array([0.0, 1.0, 0.0], dtype=n.dtype))
  t1 = jnp.cross(n, a)
  t1 = t1 / jnp.maximum(math.norm_safe(t1), _EPS)
  t2 = jnp.cross(n, t1)
  return jnp.stack([n, t1, t2])


# Each primitive fn returns (dist, pos, normal) tuples; normal points from
# geom1 into geom2 (MuJoCo convention).


def _plane_sphere(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  dist = jnp.dot(n, p2 - p1) - s2[0]
  pos = p2 - n * (s2[0] + 0.5 * dist)
  return (dist, pos, n),


def _capsule_ends(p, mat, size):
  axis = mat[:, 2] * size[1]
  return p - axis, p + axis


def _plane_capsule(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  a, b = _capsule_ends(p2, m2, s2)
  out = []
  for e in (a, b):
    dist = jnp.dot(n, e - p1) - s2[0]
    pos = e - n * (s2[0] + 0.5 * dist)
    out.append((dist, pos, n))
  return tuple(out)


def _plane_ellipsoid(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  # support point of ellipsoid in -n direction
  nl = m2.T @ n
  denom = jnp.sqrt(jnp.maximum(jnp.sum((nl * s2[:3]) ** 2), _EPS))
  sp_l = -(s2[:3] ** 2 * nl) / denom
  sp = p2 + m2 @ sp_l
  dist = jnp.dot(n, sp - p1)
  pos = sp - 0.5 * dist * n
  return (dist, pos, n),


def _box_corners(p, mat, size):
  corners = []
  for sx in (-1, 1):
    for sy in (-1, 1):
      for sz in (-1, 1):
        loc = jnp.array([sx, sy, sz], dtype=p.dtype) * size[:3]
        corners.append(p + mat @ loc)
  return jnp.stack(corners)  # (8, 3)


def _plane_box(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  corners = _box_corners(p2, m2, s2)
  dists = corners @ n - jnp.dot(p1, n)          # (8,)
  # 4 deepest corners get slots
  _, idx = jax.lax.top_k(-dists, 4)
  out = []
  for k in range(4):
    c = corners[idx[k]]
    dist = dists[idx[k]]
    pos = c - 0.5 * dist * n
    out.append((dist, pos, n))
  return tuple(out)


def _sphere_sphere_pts(c1, r1, c2, r2):
  dif = c2 - c1
  dist_c = math.norm_safe(dif)
  n = dif / jnp.maximum(dist_c, _EPS)
  dist = dist_c - (r1 + r2)
  pos = c1 + n * (r1 + 0.5 * dist)
  return dist, pos, n


def _sphere_sphere(p1, m1, s1, p2, m2, s2):
  return _sphere_sphere_pts(p1, s1[0], p2, s2[0]),


def _closest_on_seg(pt, a, b):
  ab = b - a
  t = jnp.clip(jnp.dot(pt - a, ab) /
               jnp.maximum(jnp.dot(ab, ab), _EPS), 0.0, 1.0)
  return a + t * ab


def _sphere_capsule(p1, m1, s1, p2, m2, s2):
  a, b = _capsule_ends(p2, m2, s2)
  c = _closest_on_seg(p1, a, b)
  return _sphere_sphere_pts(p1, s1[0], c, s2[0]),


def _capsule_capsule(p1, m1, s1, p2, m2, s2):
  a1, b1 = _capsule_ends(p1, m1, s1)
  a2, b2 = _capsule_ends(p2, m2, s2)
  # closest points between segments (standard clamped solve)
  d1 = b1 - a1
  d2 = b2 - a2
  r = a1 - a2
  a = jnp.dot(d1, d1)
  e = jnp.dot(d2, d2)
  f = jnp.dot(d2, r)
  c = jnp.dot(d1, r)
  b = jnp.dot(d1, d2)
  denom = jnp.maximum(a * e - b * b, _EPS)
  s = jnp.clip((b * f - c * e) / denom, 0.0, 1.0)
  t = jnp.clip((b * s + f) / jnp.maximum(e, _EPS), 0.0, 1.0)
  s = jnp.clip((b * t - c) / jnp.maximum(a, _EPS), 0.0, 1.0)
  c1 = a1 + s * d1
  c2 = a2 + t * d2
  return _sphere_sphere_pts(c1, s1[0], c2, s2[0]),


def _sphere_box_pts(center, radius, pb, mb, sb):
  loc = mb.T @ (center - pb)
  clamped = jnp.clip(loc, -sb[:3], sb[:3])
  inside = jnp.all(jnp.abs(loc) < sb[:3])
  # if inside, push out through the nearest face
  gaps = sb[:3] - jnp.abs(loc)
  ax = jnp.argmin(gaps)
  face = jnp.zeros(3, dtype=loc.dtype).at[ax].set(
      jnp.sign(loc[ax]) * sb[ax])
  surf = jnp.where(inside,
                   jnp.where(jnp.arange(3) == ax, face, loc),
                   clamped)
  closest = pb + mb @ surf
  dif = closest - center
  dist_c = math.norm_safe(dif)
  n_out = dif / jnp.maximum(dist_c, _EPS)        # center -> box surface
  n = jnp.where(inside, -n_out, n_out)
  dist = jnp.where(inside, -dist_c - radius, dist_c - radius)
  pos = closest - 0.5 * (dist + radius) * n * jnp.sign(1.0)
  pos = center + n * (radius + 0.5 * dist)
  return dist, pos, n


def _sphere_box(p1, m1, s1, p2, m2, s2):
  return _sphere_box_pts(p1, s1[0], p2, m2, s2),


def _capsule_box(p1, m1, s1, p2, m2, s2):
  a, b = _capsule_ends(p1, m1, s1)
  # ternary search for deepest point along the capsule axis (unimodal dist)
  lo = jnp.float32(0.0)
  hi = jnp.float32(1.0)
  def depth(t):
    pt = a + t * (b - a)
    dist, _, _ = _sphere_box_pts(pt, s1[0], p2, m2, s2)
    return dist
  for _ in range(12):
    m1_ = lo + (hi - lo) / 3.0
    m2_ = hi - (hi - lo) / 3.0
    go_right = depth(m1_) > depth(m2_)
    lo = jnp.where(go_right, m1_, lo)
    hi = jnp.where(go_right, hi, m2_)
  tbest = 0.5 * (lo + hi)
  out = []
  for t in (tbest, jnp.where(tbest > 0.5, 0.0, 1.0)):
    pt = a + t * (b - a)
    out.append(_sphere_box_pts(pt, s1[0], p2, m2, s2))
  return tuple(out)


def _box_box(p1, m1, s1, p2, m2, s2):
  """Approximate: probe each box's corners against the other box."""
  out = []
  corners1 = _box_corners(p1, m1, s1)
  corners2 = _box_corners(p2, m2, s2)
  # 4 deepest corners of box2 inside box1's halfspace metric and vice versa
  def corner_depth(c, pb, mb, sb):
    loc = mb.T @ (c - pb)
    gaps = jnp.abs(loc) - sb[:3]
    return jnp.max(gaps)
  d2 = jax.vmap(lambda c: corner_depth(c, p1, m1, s1))(corners2)
  d1 = jax.vmap(lambda c: corner_depth(c, p2, m2, s2))(corners1)
  _, i2 = jax.lax.top_k(-d2, 4)
  _, i1 = jax.lax.top_k(-d1, 4)
  for k in range(4):
    dist, pos, n = _sphere_box_pts(corners2[i2[k]], 0.0, p1, m1, s1)
    out.append((dist, pos, -n))
  for k in range(4):
    out.append(_sphere_box_pts(corners1[i1[k]], 0.0, p2, m2, s2))
  return tuple(out)


_FNS = {
    (GeomType.PLANE, GeomType.SPHERE): _plane_sphere,
    (GeomType.PLANE, GeomType.CAPSULE): _plane_capsule,
    (GeomType.PLANE, GeomType.ELLIPSOID): _plane_ellipsoid,
    (GeomType.PLANE, GeomType.BOX): _plane_box,
    (GeomType.SPHERE, GeomType.SPHERE): _sphere_sphere,
    (GeomType.SPHERE, GeomType.CAPSULE): _sphere_capsule,
    (GeomType.SPHERE, GeomType.ELLIPSOID): _sphere_sphere,  # approx
    (GeomType.SPHERE, GeomType.BOX): _sphere_box,
    (GeomType.CAPSULE, GeomType.CAPSULE): _capsule_capsule,
    (GeomType.CAPSULE, GeomType.BOX): _capsule_box,
    (GeomType.BOX, GeomType.BOX): _box_box,
}


def _mix_params(m: Model, g1: int, g2: int):
  """Combine two geoms' solver params (mj_contactParam semantics)."""
  solmix1, solmix2 = m.geom_solmix[g1], m.geom_solmix[g2]
  mix = solmix1 / jnp.maximum(solmix1 + solmix2, 1e-12)
  mix = jnp.where((solmix1 < 1e-12) & (solmix2 < 1e-12), 0.5,
        jnp.where((solmix1 < 1e-12), 0.0,
        jnp.where((solmix2 < 1e-12), 1.0, mix)))
  p1, p2 = int(m.geom_priority[g1]), int(m.geom_priority[g2])
  if p1 > p2:
    mix = 1.0
  elif p2 > p1:
    mix = 0.0
  # solref: weighted average in standard mode, elementwise min in direct
  sr1, sr2 = m.geom_solref[g1], m.geom_solref[g2]
  direct = (sr1[0] <= 0) | (sr2[0] <= 0)
  solref = jnp.where(direct, jnp.minimum(sr1, sr2),
                     mix * sr1 + (1.0 - mix) * sr2)
  solimp = mix * m.geom_solimp[g1] + (1.0 - mix) * m.geom_solimp[g2]
  fr = jnp.maximum(m.geom_friction[g1], m.geom_friction[g2])
  friction = jnp.stack([fr[0], fr[0], fr[1], fr[2], fr[2]])
  margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])
  gap = jnp.maximum(m.geom_gap[g1], m.geom_gap[g2])
  return solref, solimp, friction, margin - gap


def collision(m: Model, d: Data) -> Data:
  """Fill the fixed-capacity contact set from the static pair table."""
  if m.ncon_max == 0:
    return d
  pairs = m.collision_pairs.arr
  dists, poss, frames = [], [], []
  solrefs, solimps, frictions, margins = [], [], [], []
  for p in pairs:
    g1, g2, nslots, _ = int(p[0]), int(p[1]), int(p[2]), int(p[3])
    t1, t2 = GeomType(int(m.geom_type[g1])), GeomType(int(m.geom_type[g2]))
    fn = _FNS[(t1, t2)]
    results = fn(d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1],
                 d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2])
    assert len(results) == nslots, (t1, t2, len(results), nslots)
    solref, solimp, friction, inclm = _mix_params(m, g1, g2)
    for dist, pos, n in results:
      dists.append(dist)
      poss.append(pos)
      frames.append(_make_frame(n))
      solrefs.append(solref)
      solimps.append(solimp)
      frictions.append(friction)
      margins.append(inclm)

  contact = Contact(
      dist=jnp.stack(dists),
      pos=jnp.stack(poss),
      frame=jnp.stack(frames),
      includemargin=jnp.stack(margins),
      friction=jnp.stack(frictions),
      solref=jnp.stack(solrefs),
      solimp=jnp.stack(solimps),
      geom1=d.contact.geom1,
      geom2=d.contact.geom2,
      dim=d.contact.dim,
  )
  ncon_active = jnp.sum(contact.dist < contact.includemargin).astype(jnp.int32)
  return d.replace(contact=contact, ncon_active=ncon_active)
