"""Public quaternion math API (reference utils/quat_math.py surface).

Function names and semantics match the reference's numpy/jax twin modules
(/root/reference/myosuite/utils/quat_math.py:13-256 and quat_math_jax.py):
quaternions are [w, x, y, z]. One implementation built on the engine's
math core serves both numpy and jax inputs (outputs are jax arrays; wrap
with np.asarray for host code).
"""

from __future__ import annotations

import jax.numpy as jnp

from myosuite_tpu.physics import math as _m

# direct re-exports under reference names
mulQuat = _m.mul_quat
negQuat = _m.neg_quat
quat2Vel = _m.quat_to_vel
diffQuat = _m.quat_diff
quatDiff2Vel = _m.quat_diff_vel
axis_angle2quat = _m.axis_angle_to_quat
euler2quat = _m.euler_to_quat
quat2mat = _m.quat_to_mat
mat2quat = _m.mat_to_quat
rotVecQuat = _m.rotate
quatIntegrate = _m.quat_integrate


def quat2euler(quat):
  """Quaternion -> intrinsic XYZ euler angles (reference quat2euler)."""
  mat = _m.quat_to_mat(jnp.asarray(quat))
  return mat2euler(mat)


def mat2euler(mat):
  """Rotation matrix -> intrinsic XYZ euler angles."""
  mat = jnp.asarray(mat)
  sy = jnp.sqrt(mat[0, 0] ** 2 + mat[1, 0] ** 2)
  singular = sy < 1e-6
  x = jnp.where(singular,
                jnp.arctan2(-mat[1, 2], mat[1, 1]),
                jnp.arctan2(mat[2, 1], mat[2, 2]))
  y = jnp.arctan2(-mat[2, 0], sy)
  z = jnp.where(singular, 0.0, jnp.arctan2(mat[1, 0], mat[0, 0]))
  return jnp.stack([x, y, z])


def euler2mat(euler):
  return _m.quat_to_mat(_m.euler_to_quat(jnp.asarray(euler)))
