"""Shared fixtures: test MJCF models and MuJoCo ground-truth helpers."""

import mujoco
import numpy as np

# A deliberately heterogeneous model: hinge chain, slide, ball, a free body
# with geoms, sites, springs/dampers/armature — exercises every joint type.
CHAIN_XML = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 .1"/>
    <body name="b1" pos="0 0 1">
      <joint name="h1" type="hinge" axis="0 1 0" damping="0.1" armature="0.01"
             stiffness="2.0" springref="0.1"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04"/>
      <site name="s1" pos="0.3 0 0"/>
      <body name="b2" pos="0.3 0 0">
        <joint name="s2" type="slide" axis="1 0 0" damping="0.2"/>
        <joint name="h2" type="hinge" axis="0 0 1" damping="0.05"/>
        <geom type="capsule" fromto="0 0 0 0 0.25 0" size="0.035"/>
        <body name="b3" pos="0 0.25 0">
          <joint name="ball3" type="ball" damping="0.03"/>
          <geom type="capsule" fromto="0 0 0 0 0 -0.2" size="0.03"/>
          <site name="tip" pos="0 0 -0.2"/>
        </body>
      </body>
    </body>
    <body name="obj" pos="0.5 0.5 0.5">
      <freejoint/>
      <geom type="sphere" size="0.05" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>
"""

# Muscle-actuated 1-dof arm with a spatial tendon through via sites —
# the minimal myoElbow-like system (scale anchor: SURVEY.md section 6).
MUSCLE_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="upper" pos="0 0 1">
      <geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.035"/>
      <site name="o1" pos="0.02 0 -0.05"/>
      <site name="o2" pos="-0.02 0 -0.05"/>
      <body name="lower" pos="0 0 -0.3">
        <joint name="elbow" type="hinge" axis="0 1 0" range="0 2.3"
               damping="0.1" armature="0.005"/>
        <geom type="capsule" fromto="0 0 0 0 0 -0.25" size="0.03"/>
        <site name="i1" pos="0.02 0 -0.08"/>
        <site name="i2" pos="-0.02 0 -0.08"/>
        <site name="handle" pos="0 0 -0.25"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <spatial name="flex" limited="false">
      <site site="o1"/>
      <site site="i1"/>
    </spatial>
    <spatial name="ext">
      <site site="o2"/>
      <site site="i2"/>
    </spatial>
  </tendon>
  <actuator>
    <muscle name="mflex" tendon="flex" force="120"/>
    <muscle name="mext" tendon="ext" force="100"/>
  </actuator>
</mujoco>
"""


_PIPELINES = {}


def jitted_pipeline(m, *stage_fns):
  """Cache a jitted composition of physics stages per (model, stages)."""
  import jax

  key = (id(m), tuple(f.__module__ + "." + f.__name__ for f in stage_fns))
  if key not in _PIPELINES:
    def run(d):
      for f in stage_fns:
        d = f(m, d)
      return d
    _PIPELINES[key] = jax.jit(run)
  return _PIPELINES[key]


def randomize_state(mj_model, seed=0, vel_scale=0.5):
  """Random but valid (qpos, qvel) for any model."""
  rng = np.random.RandomState(seed)
  d = mujoco.MjData(mj_model)
  qpos = mj_model.qpos0.copy()
  for j in range(mj_model.njnt):
    jt = mj_model.jnt_type[j]
    adr = mj_model.jnt_qposadr[j]
    if jt == mujoco.mjtJoint.mjJNT_FREE:
      qpos[adr:adr + 3] += rng.uniform(-0.3, 0.3, 3)
      q = rng.randn(4)
      qpos[adr + 3:adr + 7] = q / np.linalg.norm(q)
    elif jt == mujoco.mjtJoint.mjJNT_BALL:
      q = rng.randn(4)
      qpos[adr:adr + 4] = q / np.linalg.norm(q)
    else:
      lo, hi = mj_model.jnt_range[j]
      if lo < hi:
        qpos[adr] = rng.uniform(lo, hi)
      else:
        qpos[adr] += rng.uniform(-0.5, 0.5)
  qvel = rng.uniform(-vel_scale, vel_scale, mj_model.nv)
  d.qpos[:] = qpos
  d.qvel[:] = qvel
  return d


def tier_jit_ctx():
  """Context manager: eager in the default (LITE) tier, jitted in FULL.

  Big-scene behavioral tests run under jax.disable_jit() by default —
  the env logic under test is backend-independent, and skipping the
  minutes-long XLA:CPU compile of each full model keeps `pytest tests/`
  within its wall-clock budget on a small CI box. MTX_TEST=FULL restores
  the jitted path so the background FULL sweep keeps compile coverage.
  """
  import contextlib
  import os

  import jax
  if os.environ.get("MTX_TEST", "LITE").upper() == "FULL":
    return contextlib.nullcontext()
  return jax.disable_jit()
