"""Robot abstraction: the sim<->hardware bridge, functional edition.

Role-equivalent of the reference's Robot layer
(/root/reference/myosuite/robot/robot.py:36-1051): a uniform view over
sensors and actuators with calibration scale/offset, sensor noise, and
position/velocity limit enforcement on controls. Redesigned as pure
functions over the physics Data pytree so the same pipeline runs batched
under jit (the simulation path) or against a hardware driver object (host
side, single robot).

Hardware drivers themselves (dynamixel/optitrack/franka/...) are
out of scope (SURVEY.md section 7 "not to rebuild"); the `HardwareDriver`
protocol documents the integration surface.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_tpu.physics.types import Data, Model


class SensorSpec(NamedTuple):
  """Calibration for one sensor channel (hdr <-> sim mapping).

  sim = scale * hdr + offset  (reference robot.py calibration semantics).
  """
  name: str
  scale: float = 1.0
  offset: float = 0.0
  noise: float = 0.0   # gaussian std in sim units


class Robot:
  """Uniform sensor/actuator view over a Model.

  All methods are pure; `noise_rng` threads explicitly. For batched sim
  use, methods vmap over Data.
  """

  def __init__(self, model: Model, sensor_noise: float = 0.0,
               pos_limit_margin: float = 0.0,
               vel_limit: Optional[float] = None):
    self._model = model
    self._noise = sensor_noise
    self._pos_margin = pos_limit_margin
    self._vel_limit = vel_limit

  # -- sensors ------------------------------------------------------------
  def get_sensors(self, d: Data, rng: Optional[jax.Array] = None
                  ) -> Dict[str, jax.Array]:
    """Joint-space sensor dict, optionally with observation noise
    (reference robot.get_sensors + noisy-sensor path, robot.py:454)."""
    out = {"time": d.time, "qpos": d.qpos, "qvel": d.qvel, "act": d.act}
    if self._noise > 0 and rng is not None:
      r1, r2 = jax.random.split(rng)
      out["qpos"] = out["qpos"] + self._noise * jax.random.normal(
          r1, out["qpos"].shape)
      out["qvel"] = out["qvel"] + self._noise * jax.random.normal(
          r2, out["qvel"].shape)
    return out

  # -- actuation ----------------------------------------------------------
  def normalize_actions(self, ctrl: jax.Array) -> jax.Array:
    """Map [-1, 1] policy actions into actuator ctrlrange."""
    m = self._model
    lo = m.actuator_ctrlrange[:, 0]
    hi = m.actuator_ctrlrange[:, 1]
    limited = jnp.asarray(np.asarray(m.actuator_ctrllimited), dtype=bool)
    mapped = lo + 0.5 * (ctrl + 1.0) * (hi - lo)
    return jnp.where(limited, mapped, ctrl)

  def process_actuator(self, d: Data, ctrl: jax.Array,
                       dt: float) -> jax.Array:
    """Enforce position/velocity limits on controls
    (reference robot.process_actuator, robot.py:767-854): clamp each
    joint-transmitted control so the commanded position stays inside
    jnt_range and implied velocity below vel_limit."""
    m = self._model
    out = ctrl
    if self._vel_limit is not None:
      # limit rate of change relative to current actuator length
      max_delta = self._vel_limit * dt
      out = jnp.clip(out, d.actuator_length - max_delta,
                     d.actuator_length + max_delta)
    limited = jnp.asarray(np.asarray(m.actuator_ctrllimited), dtype=bool)
    out = jnp.where(limited,
                    jnp.clip(out, m.actuator_ctrlrange[:, 0],
                             m.actuator_ctrlrange[:, 1]), out)
    return out


class SensorCache:
  """Fixed-depth history of timestamped sensor dicts (the reference keeps
  a deque of 5, robot.py sensor cache). Host-side helper for hardware
  loops and sensor-delay emulation."""

  def __init__(self, depth: int = 5):
    from collections import deque
    self._buf = deque(maxlen=depth)

  def append(self, sensors: Dict[str, np.ndarray]) -> None:
    self._buf.append(sensors)

  def latest(self) -> Optional[Dict[str, np.ndarray]]:
    return self._buf[-1] if self._buf else None

  def delayed(self, steps: int) -> Optional[Dict[str, np.ndarray]]:
    """Sensor reading `steps` control periods ago (clamped to history)."""
    if not self._buf:
      return None
    idx = max(-len(self._buf), -(steps + 1))
    return self._buf[idx]

  def __len__(self):
    return len(self._buf)


def sensor2sim(model: Model, data: Data,
               sensors: Dict[str, jax.Array]) -> Data:
  """Write (possibly noisy/delayed) sensors into an observed Data — the
  reference's partial-observability path (robot.sensor2sim writes sensors
  into the obsd sim then mj_forward's it, robot.py:575-607). Returns a
  Data whose kinematic quantities are re-derived from the sensor state;
  task get_obs code then reads the OBSERVED state, not ground truth."""
  from myosuite_tpu.physics import forward as F

  d = data.replace(qpos=sensors["qpos"], qvel=sensors["qvel"])
  if "act" in sensors and model.na:
    d = d.replace(act=sensors["act"])
  d = F.fwd_position(model, d)
  d = F.fwd_velocity(model, d)
  return d


class HardwareDriver(Protocol):
  """Integration surface for physical hardware (reference robot.py:129-186
  lazily imports dynamixel/optitrack/franka/realsense/robotiq drivers;
  implement this protocol to plug a device into the same Robot view)."""

  def connect(self) -> None: ...
  def get_sensors(self) -> Dict[str, np.ndarray]: ...
  def apply_controls(self, ctrl: np.ndarray) -> None: ...
  def close(self) -> None: ...
