"""Tendon wrapping over sphere / cylinder geoms (mju_wrap semantics).

Muscle paths in musculoskeletal models route over joints via wrap geoms;
this computes the taut-path tangent points and arc length, branch-free
(jnp.where masks) so vmapped env batches stay dense.

Sidesite-inside-geom ("wrap_inside") routing is not supported yet; such
segments fall back to straight lines (flagged at load time).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from myosuite_tpu.physics import math

_EPS = 1e-9


def _wrap2d(a: jax.Array, b: jax.Array, r: jax.Array,
            sd: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """2D circle wrap. Returns (t1, t2, arclen) with arclen < 0 if no wrap.

  a, b: 2D endpoints in circle-centered coords; sd: optional 2D side point.
  """
  da = math.norm_safe(a)
  db = math.norm_safe(b)
  inside = (da <= r) | (db <= r)

  # segment-circle intersection
  dif = b - a
  dd = jnp.maximum(jnp.dot(dif, dif), _EPS)
  t = jnp.clip(-jnp.dot(a, dif) / dd, 0.0, 1.0)
  closest = a + t * dif
  intersects = jnp.dot(closest, closest) <= r * r

  phi_a = jnp.arctan2(a[1], a[0])
  phi_b = jnp.arctan2(b[1], b[0])
  alpha_a = jnp.arccos(jnp.clip(r / jnp.maximum(da, _EPS), -1.0, 1.0))
  alpha_b = jnp.arccos(jnp.clip(r / jnp.maximum(db, _EPS), -1.0, 1.0))

  two_pi = 2.0 * jnp.pi

  # clockwise candidate (theta decreasing from t1 to t2)
  th1_cw = phi_a - alpha_a
  th2_cw = phi_b + alpha_b
  arc_cw = jnp.mod(th1_cw - th2_cw, two_pi)
  # counter-clockwise candidate
  th1_ccw = phi_a + alpha_a
  th2_ccw = phi_b - alpha_b
  arc_ccw = jnp.mod(th2_ccw - th1_ccw, two_pi)

  def cross2(u, v):
    return u[0] * v[1] - u[1] * v[0]

  chord = b - a
  if sd is not None:
    # Wrap on the side of the sidesite. The side of a candidate arc is the
    # side of its midpoint w.r.t. the chord; match it to the sidesite's side.
    s_side = jnp.sign(cross2(chord, sd - a))
    mid_cw_ang = th1_cw - 0.5 * arc_cw
    mid_cw = r * jnp.stack([jnp.cos(mid_cw_ang), jnp.sin(mid_cw_ang)])
    use_cw = jnp.sign(cross2(chord, mid_cw - a)) == s_side
    # A sidesite also forces the wrap when the segment passes on the
    # opposite side of the circle center from the sidesite (the tendon is
    # retained against the bone) — verified against MuJoCo wrap_xpos paths.
    opposite = jnp.dot(closest, sd) < 0.0
    valid = ~inside & (intersects | opposite)
  else:
    use_cw = arc_cw <= arc_ccw
    # without a side preference, arcs beyond pi are not taut-path solutions
    valid = ~inside & intersects & (jnp.minimum(arc_cw, arc_ccw) <= jnp.pi)

  th1 = jnp.where(use_cw, th1_cw, th1_ccw)
  th2 = jnp.where(use_cw, th2_cw, th2_ccw)
  arc = jnp.where(use_cw, arc_cw, arc_ccw)

  t1 = r * jnp.stack([jnp.cos(th1), jnp.sin(th1)])
  t2 = r * jnp.stack([jnp.cos(th2), jnp.sin(th2)])

  arclen = jnp.where(valid, r * arc, -1.0)
  return t1, t2, arclen


def wrap(x0: jax.Array, x1: jax.Array, gpos: jax.Array, gmat: jax.Array,
         radius: jax.Array, side: Optional[jax.Array],
         is_sphere: bool) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """Wrap a tendon segment around a sphere or cylinder geom.

  Returns (w1_world, w2_world, wlen); wlen < 0 means no wrap (straight).
  """
  # to local frame
  p0 = gmat.T @ (x0 - gpos)
  p1 = gmat.T @ (x1 - gpos)
  sd = None if side is None else gmat.T @ (side - gpos)

  if is_sphere:
    # basis of the plane through p0, p1, origin
    e1 = p0 / jnp.maximum(math.norm_safe(p0), _EPS)
    n = jnp.cross(p0, p1)
    # degenerate (collinear) planes: pick any perpendicular
    n_ok = math.norm_safe(n) > 1e-7
    alt = jnp.cross(p0, jnp.array([1.0, 0.0, 0.0], dtype=p0.dtype))
    alt = jnp.where(math.norm_safe(alt) > 1e-7, alt,
                    jnp.cross(p0, jnp.array([0.0, 1.0, 0.0], dtype=p0.dtype)))
    n = jnp.where(n_ok, n, alt)
    n = n / jnp.maximum(math.norm_safe(n), _EPS)
    e2 = jnp.cross(n, e1)
    to2d = jnp.stack([e1, e2])            # (2, 3)
    a2, b2 = to2d @ p0, to2d @ p1
    s2 = None if sd is None else to2d @ sd
    t1, t2, arclen = _wrap2d(a2, b2, radius, s2)
    w1l = to2d.T @ t1
    w2l = to2d.T @ t2
    wlen = arclen
  else:
    # cylinder: 2D wrap in the xy cross-section; z interpolates by length
    a2, b2 = p0[:2], p1[:2]
    s2 = None if sd is None else sd[:2]
    t1, t2, arclen = _wrap2d(a2, b2, radius, s2)
    la = math.norm_safe(a2 - t1)
    lb = math.norm_safe(b2 - t2)
    total = jnp.maximum(la + arclen + lb, _EPS)
    z1 = p0[2] + (p1[2] - p0[2]) * la / total
    z2 = p0[2] + (p1[2] - p0[2]) * (la + arclen) / total
    w1l = jnp.concatenate([t1, z1[None]])
    w2l = jnp.concatenate([t2, z2[None]])
    # curved length includes the z advance along the arc
    dz = z2 - z1
    wlen = jnp.where(arclen >= 0,
                     jnp.sqrt(jnp.maximum(arclen * arclen + dz * dz, 0.0)),
                     -1.0)

  w1 = gmat @ w1l + gpos
  w2 = gmat @ w2l + gpos
  return w1, w2, wlen
