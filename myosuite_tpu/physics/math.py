"""Quaternion / spatial-algebra math for the TPU-native physics engine.

Semantics match MuJoCo's conventions (quaternions are [w, x, y, z]) and the
reference's quaternion utilities (/root/reference/myosuite/utils/quat_math.py and
quat_math_jax.py), re-derived from first principles as pure jax functions so they
trace cleanly under jit/vmap and stay on the VPU.

All functions are single-example; batching is done with jax.vmap at call sites.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Minimum-norm guard used throughout (float32-safe).
_EPS = 1e-12


def mm(a: jax.Array, b: jax.Array) -> jax.Array:
  """Matmul at full float32 precision.

  The default matmul precision can lower small physics matmuls to bf16 on
  TPU, which is catastrophic for mass matrices and CoM aggregation; these
  matrices are tiny (nv, nbody <= ~60) so HIGHEST costs nothing.
  """
  return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def normalize(v: jax.Array, axis: int = -1) -> jax.Array:
  """Safe normalization; returns v unchanged direction, unit length."""
  n = jnp.linalg.norm(v, axis=axis, keepdims=True)
  return v / jnp.maximum(n, _EPS)


def norm_safe(v: jax.Array, axis: int = -1) -> jax.Array:
  """Norm with a safe gradient at zero."""
  sq = jnp.sum(v * v, axis=axis)
  return jnp.sqrt(jnp.maximum(sq, _EPS))


# ---------------------------------------------------------------------------
# Quaternions ([w, x, y, z], Hamilton product, active rotations)
# ---------------------------------------------------------------------------


def mul_quat(a: jax.Array, b: jax.Array) -> jax.Array:
  """Hamilton product a*b (reference semantics: quat_math.mulQuat)."""
  aw, ax, ay, az = a[0], a[1], a[2], a[3]
  bw, bx, by, bz = b[0], b[1], b[2], b[3]
  return jnp.stack([
      aw * bw - ax * bx - ay * by - az * bz,
      aw * bx + ax * bw + ay * bz - az * by,
      aw * by - ax * bz + ay * bw + az * bx,
      aw * bz + ax * by - ay * bx + az * bw,
  ])


def neg_quat(q: jax.Array) -> jax.Array:
  """Conjugate (inverse for unit quats); reference quat_math.negQuat."""
  return jnp.stack([q[0], -q[1], -q[2], -q[3]])


def rotate(vec: jax.Array, q: jax.Array) -> jax.Array:
  """Rotate a 3-vector by unit quaternion q (world = R(q) @ local)."""
  # v' = v + 2*w*(u x v) + 2*(u x (u x v)), u = q[1:4]
  u = q[1:4]
  w = q[0]
  uv = jnp.cross(u, vec)
  uuv = jnp.cross(u, uv)
  return vec + 2.0 * (w * uv + uuv)


def rotate_inv(vec: jax.Array, q: jax.Array) -> jax.Array:
  """Rotate by the inverse of q."""
  return rotate(vec, neg_quat(q))


def quat_to_mat(q: jax.Array) -> jax.Array:
  """Unit quaternion -> 3x3 rotation matrix (column-major world axes)."""
  w, x, y, z = q[0], q[1], q[2], q[3]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  return jnp.array([
      [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
      [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
      [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
  ])


def mat_to_quat(m: jax.Array) -> jax.Array:
  """3x3 rotation matrix -> unit quaternion, branch-free for jit.

  Replaces the lax.switch ladder used by the reference's
  quat_math_jax.mat2quat with a select over all four Shepperd cases,
  which vectorizes better on the VPU.
  """
  tr = m[0, 0] + m[1, 1] + m[2, 2]

  # Four candidate constructions; pick the numerically safest.
  def case_w():
    s = jnp.sqrt(jnp.maximum(tr + 1.0, _EPS)) * 2.0  # s = 4w
    return jnp.stack([
        0.25 * s,
        (m[2, 1] - m[1, 2]) / s,
        (m[0, 2] - m[2, 0]) / s,
        (m[1, 0] - m[0, 1]) / s,
    ])

  def case_x():
    s = jnp.sqrt(jnp.maximum(1.0 + m[0, 0] - m[1, 1] - m[2, 2], _EPS)) * 2.0
    return jnp.stack([
        (m[2, 1] - m[1, 2]) / s,
        0.25 * s,
        (m[0, 1] + m[1, 0]) / s,
        (m[0, 2] + m[2, 0]) / s,
    ])

  def case_y():
    s = jnp.sqrt(jnp.maximum(1.0 - m[0, 0] + m[1, 1] - m[2, 2], _EPS)) * 2.0
    return jnp.stack([
        (m[0, 2] - m[2, 0]) / s,
        (m[0, 1] + m[1, 0]) / s,
        0.25 * s,
        (m[1, 2] + m[2, 1]) / s,
    ])

  def case_z():
    s = jnp.sqrt(jnp.maximum(1.0 - m[0, 0] - m[1, 1] + m[2, 2], _EPS)) * 2.0
    return jnp.stack([
        (m[1, 0] - m[0, 1]) / s,
        (m[0, 2] + m[2, 0]) / s,
        (m[1, 2] + m[2, 1]) / s,
        0.25 * s,
    ])

  cond0 = tr > 0.0
  cond1 = (m[0, 0] > m[1, 1]) & (m[0, 0] > m[2, 2])
  cond2 = m[1, 1] > m[2, 2]

  q = jnp.where(
      cond0,
      case_w(),
      jnp.where(cond1, case_x(), jnp.where(cond2, case_y(), case_z())),
  )
  # Canonical sign (w >= 0) and renormalize.
  q = jnp.where(q[0] < 0, -q, q)
  return normalize(q)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
  """(unit axis, angle) -> quaternion; reference quat_math.axis_angle2quat."""
  half = 0.5 * angle
  return jnp.concatenate([jnp.cos(half)[None], axis * jnp.sin(half)])


def quat_to_vel(q: jax.Array, dt: float = 1.0) -> jax.Array:
  """Quaternion -> angular velocity over dt (reference quat2Vel semantics)."""
  sin_half = norm_safe(q[1:4])
  axis = q[1:4] / jnp.maximum(sin_half, _EPS)
  angle = 2.0 * jnp.arctan2(sin_half, q[0])
  # shortest path
  angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
  return axis * angle / dt


def quat_diff(a: jax.Array, b: jax.Array) -> jax.Array:
  """Relative rotation taking a to b: a^-1 * b (reference quatDiff2Vel base)."""
  return mul_quat(neg_quat(a), b)


def quat_diff_vel(a: jax.Array, b: jax.Array, dt: float = 1.0) -> jax.Array:
  """Angular velocity that rotates a into b over dt."""
  return quat_to_vel(quat_diff(a, b), dt)


def quat_integrate(q: jax.Array, omega: jax.Array, dt: jax.Array) -> jax.Array:
  """Integrate unit quaternion by body-frame angular velocity omega*dt.

  Matches MuJoCo's mju_quatIntegrate: q' = q * exp(0.5 * omega * dt).
  """
  angle = norm_safe(omega) * dt
  axis = omega / jnp.maximum(norm_safe(omega), _EPS)
  dq = axis_angle_to_quat(axis, angle)
  return normalize(mul_quat(q, dq))


def euler_to_quat(euler: jax.Array) -> jax.Array:
  """XYZ-intrinsic Euler angles -> quaternion (MuJoCo 'xyz' eulerseq)."""
  ax = jnp.array([1.0, 0.0, 0.0])
  ay = jnp.array([0.0, 1.0, 0.0])
  az = jnp.array([0.0, 0.0, 1.0])
  qx = axis_angle_to_quat(ax, euler[0])
  qy = axis_angle_to_quat(ay, euler[1])
  qz = axis_angle_to_quat(az, euler[2])
  return mul_quat(mul_quat(qx, qy), qz)


# ---------------------------------------------------------------------------
# Spatial algebra (6-vectors: [angular(3); linear(3)], MuJoCo layout)
# ---------------------------------------------------------------------------


def motion_cross(v: jax.Array, u: jax.Array) -> jax.Array:
  """Spatial motion cross product v x u for motion vectors."""
  ang = jnp.cross(v[:3], u[:3])
  lin = jnp.cross(v[3:], u[:3]) + jnp.cross(v[:3], u[3:])
  return jnp.concatenate([ang, lin])


def motion_cross_force(v: jax.Array, f: jax.Array) -> jax.Array:
  """Spatial cross product v x* f for force vectors."""
  ang = jnp.cross(v[:3], f[:3]) + jnp.cross(v[3:], f[3:])
  lin = jnp.cross(v[:3], f[3:])
  return jnp.concatenate([ang, lin])


def transform_motion(vec: jax.Array, offset: jax.Array) -> jax.Array:
  """Shift a motion 6-vector to a frame displaced by `offset` (same orient).

  new_lin = lin - offset x ang  (MuJoCo mju_transformSpatial with rotation=I)
  """
  ang, lin = vec[:3], vec[3:]
  return jnp.concatenate([ang, lin - jnp.cross(offset, ang)])


def transform_force(vec: jax.Array, offset: jax.Array) -> jax.Array:
  """Shift a force 6-vector to a frame displaced by `offset`."""
  ang, lin = vec[:3], vec[3:]
  return jnp.concatenate([ang - jnp.cross(offset, lin), lin])


def inert_vec(inert10: jax.Array, v: jax.Array) -> jax.Array:
  """Multiply a 10-parameter spatial inertia by a motion vector.

  inert10 layout (MuJoCo cinert): [I00 I11 I22 I01 I02 I12, m*c(3), m].
  Returns the spatial force I @ v.
  """
  imat = jnp.array([
      [inert10[0], inert10[3], inert10[4]],
      [inert10[3], inert10[1], inert10[5]],
      [inert10[4], inert10[5], inert10[2]],
  ])
  h = inert10[6:9]  # m * com offset
  m = inert10[9]
  ang = imat @ v[:3] + jnp.cross(h, v[3:])
  lin = m * v[3:] - jnp.cross(h, v[:3])
  return jnp.concatenate([ang, lin])
