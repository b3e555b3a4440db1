"""Narrow-phase collision: batched primitive pair functions.

TPU-first: the host precomputes every admissible geom pair
(io._collision_pairs) grouped by (type1, type2) class; the device runs ONE
vmapped kernel per class into fixed contact slots masked by penetration.
Same static-capacity philosophy as the reference's naconmax preallocation
(/root/reference/myosuite/envs/myo/mjx/mjx_base_env.py:123-135), but exact
and with zero per-pair Python unrolling.

Supported classes: plane-{sphere,capsule,ellipsoid,box},
sphere-{sphere,capsule,ellipsoid,box}, capsule-{capsule,box}, box-box,
hfield-{sphere,capsule} (grid-local sampling kernels below, :361-433),
and mesh-{plane,sphere,capsule,box} via per-mesh triangle tables
(_mesh_factory below; tests/test_mesh_contacts.py checks settle heights
against MuJoCo).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_tpu.physics import math
from myosuite_tpu.physics.types import Contact, Data, GeomType, Model

_EPS = 1e-9


def _make_frame(n: jax.Array) -> jax.Array:
  n = n / jnp.maximum(math.norm_safe(n), _EPS)
  a = jnp.where(jnp.abs(n[0]) < 0.5,
                jnp.array([1.0, 0.0, 0.0], dtype=n.dtype),
                jnp.array([0.0, 1.0, 0.0], dtype=n.dtype))
  t1 = jnp.cross(n, a)
  t1 = t1 / jnp.maximum(math.norm_safe(t1), _EPS)
  t2 = jnp.cross(n, t1)
  return jnp.stack([n, t1, t2])


# Each primitive returns (dist (k,), pos (k,3), normal (k,3)); k static.


def _plane_sphere(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  dist = jnp.dot(n, p2 - p1) - s2[0]
  pos = p2 - n * (s2[0] + 0.5 * dist)
  return dist[None], pos[None], n[None]


def _capsule_ends(p, mat, size):
  axis = mat[:, 2] * size[1]
  return p - axis, p + axis


def _plane_capsule(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  a, b = _capsule_ends(p2, m2, s2)
  dists, poss = [], []
  for e in (a, b):
    dist = jnp.dot(n, e - p1) - s2[0]
    dists.append(dist)
    poss.append(e - n * (s2[0] + 0.5 * dist))
  return jnp.stack(dists), jnp.stack(poss), jnp.stack([n, n])


def _plane_ellipsoid(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  nl = m2.T @ n
  denom = jnp.sqrt(jnp.maximum(jnp.sum((nl * s2[:3]) ** 2), _EPS))
  sp = p2 + m2 @ (-(s2[:3] ** 2 * nl) / denom)
  dist = jnp.dot(n, sp - p1)
  pos = sp - 0.5 * dist * n
  return dist[None], pos[None], n[None]


def _box_corners(p, mat, size):
  signs = jnp.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                     for sz in (-1, 1)], dtype=p.dtype)
  return p + (signs * size[:3]) @ mat.T          # (8, 3)


def _plane_box(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  corners = _box_corners(p2, m2, s2)
  dists = corners @ n - jnp.dot(p1, n)
  _, idx = jax.lax.top_k(-dists, 4)
  c = corners[idx]
  dist = dists[idx]
  pos = c - 0.5 * dist[:, None] * n[None]
  return dist, pos, jnp.tile(n[None], (4, 1))


def _sphere_sphere_pts(c1, r1, c2, r2):
  dif = c2 - c1
  dc = math.norm_safe(dif)
  n = dif / jnp.maximum(dc, _EPS)
  dist = dc - (r1 + r2)
  pos = c1 + n * (r1 + 0.5 * dist)
  return dist, pos, n


def _sphere_sphere(p1, m1, s1, p2, m2, s2):
  dist, pos, n = _sphere_sphere_pts(p1, s1[0], p2, s2[0])
  return dist[None], pos[None], n[None]


def _closest_on_seg(pt, a, b):
  ab = b - a
  t = jnp.clip(jnp.dot(pt - a, ab) /
               jnp.maximum(jnp.dot(ab, ab), _EPS), 0.0, 1.0)
  return a + t * ab


def _sphere_capsule(p1, m1, s1, p2, m2, s2):
  a, b = _capsule_ends(p2, m2, s2)
  c = _closest_on_seg(p1, a, b)
  dist, pos, n = _sphere_sphere_pts(p1, s1[0], c, s2[0])
  return dist[None], pos[None], n[None]


def _capsule_capsule(p1, m1, s1, p2, m2, s2):
  a1, b1 = _capsule_ends(p1, m1, s1)
  a2, b2 = _capsule_ends(p2, m2, s2)
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
  dist, pos, n = _sphere_sphere_pts(a1 + s * d1, s1[0], a2 + t * d2, s2[0])
  return dist[None], pos[None], n[None]


def _sphere_box_pts(center, radius, pb, mb, sb):
  loc = mb.T @ (center - pb)
  clamped = jnp.clip(loc, -sb[:3], sb[:3])
  inside = jnp.all(jnp.abs(loc) < sb[:3])
  gaps = sb[:3] - jnp.abs(loc)
  ax = jnp.argmin(gaps)
  face = jnp.zeros(3, dtype=loc.dtype).at[ax].set(jnp.sign(loc[ax]) * sb[ax])
  surf = jnp.where(inside, jnp.where(jnp.arange(3) == ax, face, loc), clamped)
  closest = pb + mb @ surf
  dif = closest - center
  dc = math.norm_safe(dif)
  n_out = dif / jnp.maximum(dc, _EPS)
  n = jnp.where(inside, -n_out, n_out)
  dist = jnp.where(inside, -dc - radius, dc - radius)
  pos = center + n * (radius + 0.5 * dist)
  return dist, pos, n


def _sphere_box(p1, m1, s1, p2, m2, s2):
  dist, pos, n = _sphere_box_pts(p1, s1[0], p2, m2, s2)
  return dist[None], pos[None], n[None]


def _capsule_box(p1, m1, s1, p2, m2, s2):
  a, b = _capsule_ends(p1, m1, s1)
  lo = jnp.float32(0.0)
  hi = jnp.float32(1.0)
  def depth(t):
    return _sphere_box_pts(a + t * (b - a), s1[0], p2, m2, s2)[0]
  for _ in range(12):
    t1 = lo + (hi - lo) / 3.0
    t2 = hi - (hi - lo) / 3.0
    go_right = depth(t1) > depth(t2)
    lo = jnp.where(go_right, t1, lo)
    hi = jnp.where(go_right, hi, t2)
  tb = 0.5 * (lo + hi)
  t_other = jnp.where(tb > 0.5, 0.0, 1.0)
  out = [_sphere_box_pts(a + t * (b - a), s1[0], p2, m2, s2)
         for t in (tb, t_other)]
  return (jnp.stack([o[0] for o in out]), jnp.stack([o[1] for o in out]),
          jnp.stack([o[2] for o in out]))


def _box_box(p1, m1, s1, p2, m2, s2):
  corners1 = _box_corners(p1, m1, s1)
  corners2 = _box_corners(p2, m2, s2)
  def corner_depth(c, pb, mb, sb):
    return jnp.max(jnp.abs(mb.T @ (c - pb)) - sb[:3])
  d2 = jax.vmap(lambda c: corner_depth(c, p1, m1, s1))(corners2)
  d1 = jax.vmap(lambda c: corner_depth(c, p2, m2, s2))(corners1)
  _, i2 = jax.lax.top_k(-d2, 4)
  _, i1 = jax.lax.top_k(-d1, 4)
  o2 = jax.vmap(lambda c: _sphere_box_pts(c, 0.0, p1, m1, s1))(corners2[i2])
  o1 = jax.vmap(lambda c: _sphere_box_pts(c, 0.0, p2, m2, s2))(corners1[i1])
  dist = jnp.concatenate([o2[0], o1[0]])
  pos = jnp.concatenate([o2[1], o1[1]])
  n = jnp.concatenate([-o2[2], o1[2]])
  return dist, pos, n


# ---- convex mesh kernels -----------------------------------------------
# TPU-native mesh contacts (reference role: the die / GRAB objects are
# mesh geoms, /root/reference/myosuite/envs/myo/myochallenge/reorient_v0.py:15,
# myodm/__init__.py:49-70). Instead of MuJoCo's MPR/libccd (branchy,
# data-dependent iteration), every query reduces to closest-point-on-
# triangle evaluated over ALL faces in one vmapped batch — exact for
# convex meshes, static shapes, fuses across the env batch. Mesh topology
# is baked per kernel closure (like the hfield kernels), so each distinct
# mesh compiles one kernel class.


def _closest_on_tri(p, a, b, c):
  """Branchless closest point on triangle abc to p (Ericson 5.1.5)."""
  ab = b - a
  ac = c - a
  ap = p - a
  d1 = jnp.dot(ab, ap)
  d2 = jnp.dot(ac, ap)
  bp = p - b
  d3 = jnp.dot(ab, bp)
  d4 = jnp.dot(ac, bp)
  cp = p - c
  d5 = jnp.dot(ab, cp)
  d6 = jnp.dot(ac, cp)
  va = d3 * d6 - d5 * d4
  vb = d5 * d2 - d1 * d6
  vc = d1 * d4 - d3 * d2

  # face interior
  denom = jnp.maximum(va + vb + vc, _EPS)
  pt = a + (vb / denom) * ab + (vc / denom) * ac
  # edge BC
  t_bc = (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), _EPS)
  on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
  pt = jnp.where(on_bc, b + t_bc * (c - b), pt)
  # edge AC
  t_ac = d2 / jnp.maximum(d2 - d6, _EPS)
  on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
  pt = jnp.where(on_ac, a + t_ac * ac, pt)
  # edge AB
  t_ab = d1 / jnp.maximum(d1 - d3, _EPS)
  on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
  pt = jnp.where(on_ab, a + t_ab * ab, pt)
  # vertices
  pt = jnp.where((d6 >= 0) & (d5 <= d6), c, pt)
  pt = jnp.where((d3 >= 0) & (d4 <= d3), b, pt)
  pt = jnp.where((d1 <= 0) & (d2 <= 0), a, pt)
  return pt


def _mesh_tables(verts_np: np.ndarray, faces_np: np.ndarray):
  """(tri (F,3,3), outward face normals (F,3), offsets (F,)).

  Kept as NUMPY constants: the factory output is cached across traces
  (plan_cache), and a jnp array materialized inside one jit trace is a
  tracer that must not leak into the next. Numpy consts bind fresh at
  each op site."""
  tri = np.asarray(verts_np)[np.asarray(faces_np)]
  n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
  n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
  d = np.einsum("fi,fi->f", n, tri[:, 0])
  return (tri.astype(np.float32), n.astype(np.float32),
          d.astype(np.float32))


def _point_mesh_local(tri, fnorm, foff, c, radius):
  """Sphere(center c, radius) vs mesh, all in MESH-LOCAL coordinates.
  Returns (dist, pos, n) with _sphere_box_pts sign conventions (n from the
  sphere toward the mesh; dist < 0 when penetrating)."""
  tri = jnp.asarray(tri)
  fnorm = jnp.asarray(fnorm)
  foff = jnp.asarray(foff)
  cp = jax.vmap(_closest_on_tri, in_axes=(None, 0, 0, 0))(
      c, tri[:, 0], tri[:, 1], tri[:, 2])             # (F, 3)
  d2 = jnp.sum((cp - c) ** 2, axis=-1)
  i = jnp.argmin(d2)
  closest = cp[i]
  dc = jnp.sqrt(jnp.maximum(d2[i], _EPS))
  inside = jnp.all(math.mm(fnorm, c) - foff < 0.0)
  dif = closest - c
  n_out = dif / jnp.maximum(dc, _EPS)
  n = jnp.where(inside, -n_out, n_out)
  dist = jnp.where(inside, -dc - radius, dc - radius)
  pos = c + n * (radius + 0.5 * dist)
  return dist, pos, n


def _mesh_factory(verts_np, faces_np):
  tri, fnorm, foff = _mesh_tables(verts_np, faces_np)
  verts = np.asarray(verts_np, dtype=np.float32)

  def point_world(pm, mm, point, radius):
    """World-frame sphere query against the mesh at pose (pm, mm)."""
    c = mm.T @ (point - pm)
    dist, pos_l, n_l = _point_mesh_local(tri, fnorm, foff, c, radius)
    return dist, pm + mm @ pos_l, mm @ n_l

  def plane_mesh(p1, m1, s1, p2, m2, s2):
    n = m1[:, 2]
    vw = p2 + jnp.asarray(verts) @ m2.T        # (V, 3) world verts
    dists = vw @ n - jnp.dot(p1, n)
    _, idx = jax.lax.top_k(-dists, 4)
    d = dists[idx]
    pos = vw[idx] - 0.5 * d[:, None] * n[None]
    return d, pos, jnp.tile(n[None], (4, 1))

  def sphere_mesh(p1, m1, s1, p2, m2, s2):
    dist, pos, n = point_world(p2, m2, p1, s1[0])
    return dist[None], pos[None], n[None]

  def capsule_mesh(p1, m1, s1, p2, m2, s2):
    a, b = _capsule_ends(p1, m1, s1)
    lo = jnp.float32(0.0)
    hi = jnp.float32(1.0)
    def depth(t):
      return point_world(p2, m2, a + t * (b - a), s1[0])[0]
    for _ in range(10):
      t1 = lo + (hi - lo) / 3.0
      t2 = hi - (hi - lo) / 3.0
      go_right = depth(t1) > depth(t2)
      lo = jnp.where(go_right, t1, lo)
      hi = jnp.where(go_right, hi, t2)
    tb = 0.5 * (lo + hi)
    t_other = jnp.where(tb > 0.5, 0.0, 1.0)
    out = [point_world(p2, m2, a + t * (b - a), s1[0])
           for t in (tb, t_other)]
    return (jnp.stack([o[0] for o in out]),
            jnp.stack([o[1] for o in out]),
            jnp.stack([o[2] for o in out]))

  def box_mesh(p1, m1, s1, p2, m2, s2):
    # mesh verts into the box + box corners into the mesh (box_box pattern)
    vw = p2 + jnp.asarray(verts) @ m2.T
    o2 = jax.vmap(lambda v: _sphere_box_pts(v, 0.0, p1, m1, s1))(vw)
    _, i2 = jax.lax.top_k(-o2[0], 2)
    corners = _box_corners(p1, m1, s1)
    o1 = jax.vmap(lambda c: point_world(p2, m2, c, 0.0))(corners)
    _, i1 = jax.lax.top_k(-o1[0], 2)
    dist = jnp.concatenate([o2[0][i2], o1[0][i1]])
    pos = jnp.concatenate([o2[1][i2], o1[1][i1]])
    n = jnp.concatenate([-o2[2][i2], o1[2][i1]])
    return dist, pos, n

  return {
      (GeomType.PLANE, GeomType.MESH): plane_mesh,
      (GeomType.SPHERE, GeomType.MESH): sphere_mesh,
      (GeomType.CAPSULE, GeomType.MESH): capsule_mesh,
      (GeomType.BOX, GeomType.MESH): box_mesh,
  }


# ---- heightfield kernels -----------------------------------------------
# TPU-native terrain contacts: instead of MuJoCo's prism decomposition
# (branchy, data-dependent), sample the height grid under the moving geom and
# collide against the local tangent plane (height + finite-difference
# normal). Exact for terrain whose curvature is below the geom radius —
# true for the walkable ROUGH/HILLY/STAIRS families
# (/root/reference/myosuite/envs/heightfields.py:374-409).


def _hf_height(hdata: jax.Array, size: jax.Array, xy: jax.Array):
  """Bilinear height (meters) at hfield-local (x, y)."""
  nrow, ncol = hdata.shape
  cx = jnp.clip((xy[0] / size[0] + 1.0) * 0.5 * (ncol - 1), 0.0, ncol - 1.001)
  cy = jnp.clip((xy[1] / size[1] + 1.0) * 0.5 * (nrow - 1), 0.0, nrow - 1.001)
  x0 = jnp.floor(cx).astype(jnp.int32)
  y0 = jnp.floor(cy).astype(jnp.int32)
  fx, fy = cx - x0, cy - y0
  h00 = hdata[y0, x0]
  h01 = hdata[y0, x0 + 1]
  h10 = hdata[y0 + 1, x0]
  h11 = hdata[y0 + 1, x0 + 1]
  return ((1 - fy) * ((1 - fx) * h00 + fx * h01)
          + fy * ((1 - fx) * h10 + fx * h11))


def _hf_surface(hdata, size, loc):
  """(surface point, outward normal) in hfield-local frame under `loc`."""
  nrow, ncol = hdata.shape
  ex = size[0] / (ncol - 1)
  ey = size[1] / (nrow - 1)
  xy = loc[:2]
  h = _hf_height(hdata, size, xy)
  gx = (_hf_height(hdata, size, xy + jnp.array([ex, 0.0]))
        - _hf_height(hdata, size, xy - jnp.array([ex, 0.0]))) / (2 * ex)
  gy = (_hf_height(hdata, size, xy + jnp.array([0.0, ey]))
        - _hf_height(hdata, size, xy - jnp.array([0.0, ey]))) / (2 * ey)
  n = jnp.array([-gx, -gy, 1.0])
  n = n / jnp.maximum(math.norm_safe(n), _EPS)
  return jnp.array([xy[0], xy[1], h]), n


def _hf_point(hdata, size, p1, m1, point, radius):
  """Contact of a sphere(point, radius) against the heightfield."""
  loc = m1.T @ (point - p1)
  surf_l, n_l = _hf_surface(hdata, size, loc)
  n = m1 @ n_l
  surf = p1 + m1 @ surf_l
  dist = jnp.dot(n, point - surf) - radius
  pos = point - n * (radius + 0.5 * dist)
  return dist, pos, n


def _hfield_sphere(hdata, size):
  def fn(p1, m1, s1, p2, m2, s2):
    dist, pos, n = _hf_point(hdata, size, p1, m1, p2, s2[0])
    return dist[None], pos[None], n[None]
  return fn


def _hfield_capsule(hdata, size):
  def fn(p1, m1, s1, p2, m2, s2):
    a, b = _capsule_ends(p2, m2, s2)
    out = [_hf_point(hdata, size, p1, m1, e, s2[0]) for e in (a, b)]
    return (jnp.stack([o[0] for o in out]), jnp.stack([o[1] for o in out]),
            jnp.stack([o[2] for o in out]))
  return fn


def _hfield_box(hdata, size):
  def fn(p1, m1, s1, p2, m2, s2):
    corners = _box_corners(p2, m2, s2)
    d_all = jax.vmap(
        lambda c: _hf_point(hdata, size, p1, m1, c, 0.0)[0])(corners)
    _, idx = jax.lax.top_k(-d_all, 4)
    return jax.vmap(
        lambda c: _hf_point(hdata, size, p1, m1, c, 0.0))(corners[idx])
  return fn


_HF_FNS = {
    (GeomType.HFIELD, GeomType.SPHERE): _hfield_sphere,
    (GeomType.HFIELD, GeomType.CAPSULE): _hfield_capsule,
    (GeomType.HFIELD, GeomType.BOX): _hfield_box,
}


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

_COL_PLANS = {}


def _col_plan(m: Model):
  """Group pair table by class; compute static slot offsets + mixed params.

  Solver params (solref/solimp/friction/margin) depend only on the model,
  so they are combined ON THE HOST (mj_contactParam semantics) and baked
  as constants.
  """
  # key on the static pair table, not the Model object: envs doing in-graph
  # domain randomization pass step-time Models whose dynamic arrays are
  # tracers, but replace() shares the same Static collision_pairs object
  key = id(m.collision_pairs)
  # entries hold a strong ref to the keyed Static so its id cannot be
  # recycled by GC for a different model (see types.plan_cache rationale)
  hit = _COL_PLANS.get(key)
  if hit is not None and hit[0] is m.collision_pairs:
    return hit[1]

  pairs = m.collision_pairs.arr
  geom_solref = np.asarray(jax.device_get(m.geom_solref))
  geom_solimp = np.asarray(jax.device_get(m.geom_solimp))
  geom_solmix = np.asarray(jax.device_get(m.geom_solmix))
  geom_friction = np.asarray(jax.device_get(m.geom_friction))
  geom_margin = np.asarray(jax.device_get(m.geom_margin))
  geom_gap = np.asarray(jax.device_get(m.geom_gap))

  groups: Dict[Tuple[int, int], List] = {}
  slot = 0
  slot_meta = []  # per-slot (solref, solimp, friction, includemargin)
  for p in pairs:
    g1, g2, nslots, condim = int(p[0]), int(p[1]), int(p[2]), int(p[3])
    t1, t2 = int(m.geom_type[g1]), int(m.geom_type[g2])
    # mesh pairs group per mesh asset: each mesh bakes its own kernel
    did = int(m.geom_dataid[g2]) if t2 == int(GeomType.MESH) else -1
    groups.setdefault((t1, t2, did), []).append(
        (g1, g2, slot, nslots, condim))

    # host-side param mix
    sm1, sm2 = geom_solmix[g1], geom_solmix[g2]
    mix = sm1 / max(sm1 + sm2, 1e-12)
    if sm1 < 1e-12 and sm2 < 1e-12:
      mix = 0.5
    elif sm1 < 1e-12:
      mix = 0.0
    elif sm2 < 1e-12:
      mix = 1.0
    p1, p2 = int(m.geom_priority[g1]), int(m.geom_priority[g2])
    if p1 != p2:
      mix = 1.0 if p1 > p2 else 0.0
    sr1, sr2 = geom_solref[g1], geom_solref[g2]
    if sr1[0] <= 0 or sr2[0] <= 0:
      solref = np.minimum(sr1, sr2)
    else:
      solref = mix * sr1 + (1 - mix) * sr2
    solimp = mix * geom_solimp[g1] + (1 - mix) * geom_solimp[g2]
    for _ in range(nslots):
      slot_meta.append((solref, solimp, g1, g2))
    slot += nslots

  ncon = slot
  meta = dict(
      solref=np.array([x[0] for x in slot_meta], dtype=np.float32)
      .reshape(ncon, 2),
      solimp=np.array([x[1] for x in slot_meta], dtype=np.float32)
      .reshape(ncon, 5),
      # friction/margin are gathered from the (possibly randomized) Model
      # at trace time — see collision(); only the slot->geom map is baked
      slot_g1=np.array([x[2] for x in slot_meta], dtype=np.int32),
      slot_g2=np.array([x[3] for x in slot_meta], dtype=np.int32),
  )
  plan = (groups, meta, ncon)
  _COL_PLANS[key] = (m.collision_pairs, plan)
  return plan


def collision(m: Model, d: Data) -> Data:
  """Fill the fixed-capacity contact set, one vmapped kernel per class."""
  if m.ncon_max == 0:
    return d
  groups, meta, ncon = _col_plan(m)
  dtype = d.qpos.dtype

  dist = jnp.zeros(ncon, dtype=dtype)
  pos = jnp.zeros((ncon, 3), dtype=dtype)
  frame = jnp.zeros((ncon, 3, 3), dtype=dtype)

  for (t1, t2, did), entries in groups.items():
    key = (GeomType(t1), GeomType(t2))
    if t2 == int(GeomType.MESH):
      from myosuite_tpu.physics.types import plan_cache
      vs = m.mesh_vert[did]
      fns = plan_cache(vs, "mesh_kernels",
                       lambda: _mesh_factory(vs.arr, m.mesh_face[did].arr))
      fn = fns[key]
    elif key in _HF_FNS:
      fn = _HF_FNS[key](d.hfield_data, m.hfield_size)
    else:
      fn = _FNS[key]
    g1 = np.array([e[0] for e in entries])
    g2 = np.array([e[1] for e in entries])
    nslots = entries[0][3]
    slots = np.concatenate(
        [np.arange(e[2], e[2] + e[3]) for e in entries])
    dd, pp, nn = jax.vmap(fn)(
        d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1],
        d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2])
    ff = jax.vmap(jax.vmap(_make_frame))(nn)
    dist = dist.at[slots].set(dd.reshape(-1))
    pos = pos.at[slots].set(pp.reshape(-1, 3))
    frame = frame.at[slots].set(ff.reshape(-1, 3, 3))

  # dynamic contact params: sliding/torsional/rolling friction and margin
  # follow the Model arrays, so per-episode randomization flows through
  sg1, sg2 = jnp.asarray(meta["slot_g1"]), jnp.asarray(meta["slot_g2"])
  fr = jnp.maximum(m.geom_friction[sg1], m.geom_friction[sg2])  # (ncon, 3)
  friction = jnp.stack([fr[:, 0], fr[:, 0], fr[:, 1], fr[:, 2], fr[:, 2]],
                       axis=1)
  margin = jnp.maximum(m.geom_margin[sg1], m.geom_margin[sg2])
  gap = jnp.maximum(m.geom_gap[sg1], m.geom_gap[sg2])
  contact = Contact(
      dist=dist, pos=pos, frame=frame,
      includemargin=margin - gap,
      friction=friction,
      solref=jnp.asarray(meta["solref"]),
      solimp=jnp.asarray(meta["solimp"]),
      geom1=d.contact.geom1, geom2=d.contact.geom2, dim=d.contact.dim,
  )
  ncon_active = jnp.sum(contact.dist < contact.includemargin).astype(jnp.int32)
  return d.replace(contact=contact, ncon_active=ncon_active)
