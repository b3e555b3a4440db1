"""Reference motion container for tracking tasks (MyoDM role).

Semantics follow the reference's ReferenceMotion
(/root/reference/myosuite/logger/reference_motion.py:32 and its JAX twin
reference_motion_jax.py:37): a reference is FIXED (single frame), RANDOM
(a range of poses), or TRACK (a time-indexed trajectory, inferred from the
leading dimension: 1 / 2 / >2). TRACK lookups interpolate linearly between
frames — implemented branch-free with searchsorted so it jits and vmaps.
"""

from __future__ import annotations

import enum
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class RefType(enum.IntEnum):
  FIXED = 0
  RANDOM = 1
  TRACK = 2


@struct.dataclass
class ReferenceMotion:
  """Immutable reference-motion data + query ops (pure)."""
  time: jax.Array        # (T,)
  robot: jax.Array       # (T, nq_robot)  joint-space reference
  object: jax.Array      # (T, 7) object pose reference (pos + quat)
  robot_vel: jax.Array   # (T, nq_robot)
  robot_init: jax.Array  # (nq_robot,) initial pose (reference schema key;
                         # may differ from robot[0], reference_motion.py:18)
  object_init: jax.Array
  ref_type: int = struct.field(pytree_node=False)
  horizon: float = struct.field(pytree_node=False)

  @classmethod
  def from_arrays(cls, time, robot, obj=None,
                  robot_vel=None, robot_init=None,
                  object_init=None) -> "ReferenceMotion":
    time = jnp.atleast_1d(jnp.asarray(time, dtype=jnp.float32))
    robot = jnp.atleast_2d(jnp.asarray(robot, dtype=jnp.float32))
    n = robot.shape[0]
    if n == 1:
      rtype = RefType.FIXED
    elif n == 2:
      rtype = RefType.RANDOM
    else:
      rtype = RefType.TRACK
    if obj is None:
      obj = jnp.tile(jnp.array([0, 0, 0, 1, 0, 0, 0], dtype=jnp.float32),
                     (n, 1))
    else:
      obj = jnp.atleast_2d(jnp.asarray(obj, dtype=jnp.float32))
    if robot_vel is None:
      if n > 1:
        dt = jnp.diff(time)[:, None]
        vel = jnp.diff(robot, axis=0) / jnp.maximum(dt, 1e-8)
        robot_vel = jnp.concatenate([vel, vel[-1:]], axis=0)
      else:
        robot_vel = jnp.zeros_like(robot)
    else:
      robot_vel = jnp.atleast_2d(jnp.asarray(robot_vel, dtype=jnp.float32))
    robot_init = (robot[0] if robot_init is None
                  else jnp.asarray(robot_init, dtype=jnp.float32))
    object_init = (obj[0] if object_init is None
                   else jnp.asarray(object_init, dtype=jnp.float32))
    return cls(time=time, robot=robot, object=obj, robot_vel=robot_vel,
               robot_init=robot_init, object_init=object_init,
               ref_type=int(rtype), horizon=float(time[-1]))

  @classmethod
  def from_npz(cls, path: str) -> "ReferenceMotion":
    """Load a mocap npz in the reference's schema
    (/root/reference/myosuite/logger/reference_motion.py:13-19: time,
    robot, robot_vel, object, robot_init, object_init)."""
    data = np.load(path, allow_pickle=True)
    get = lambda k: data[k] if k in data else None
    return cls.from_arrays(
        data["time"], data["robot"], get("object"), get("robot_vel"),
        get("robot_init"), get("object_init"))

  # -- queries (pure, jit-safe) ------------------------------------------
  def find_timeslot(self, t: jax.Array):
    """(index_below, index_above, blend) for time t, clamped to range."""
    t = jnp.clip(t, self.time[0], self.time[-1])
    hi = jnp.clip(jnp.searchsorted(self.time, t, side="right"),
                  1, self.time.shape[0] - 1)
    lo = hi - 1
    span = jnp.maximum(self.time[hi] - self.time[lo], 1e-8)
    blend = (t - self.time[lo]) / span
    return lo, hi, blend

  def get_reference(self, t: jax.Array) -> Dict[str, jax.Array]:
    """Interpolated {robot, robot_vel, object} at time t."""
    if self.ref_type != RefType.TRACK:
      return {"robot": self.robot[0], "robot_vel": self.robot_vel[0],
              "object": self.object[0]}
    lo, hi, b = self.find_timeslot(t)
    lerp = lambda arr: (1.0 - b) * arr[lo] + b * arr[hi]
    return {"robot": lerp(self.robot), "robot_vel": lerp(self.robot_vel),
            "object": lerp(self.object)}

  def get_init(self) -> Dict[str, jax.Array]:
    return {"robot": self.robot_init, "robot_vel": self.robot_vel[0],
            "object": self.object_init}

  def sample(self, rng: jax.Array) -> jax.Array:
    """RANDOM refs: uniform pose between the two rows."""
    lo, hi = self.robot[0], self.robot[-1]
    return jax.random.uniform(rng, lo.shape, minval=lo, maxval=hi)
