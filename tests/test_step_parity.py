"""Full mj_step trajectory parity: our engine vs MuJoCo CPU.

The north-star requirement from BASELINE.md: trajectories match the
reference MuJoCo envs under fixed seed. These tests drive the complete
pipeline (forward + constraints + Euler) for hundreds of steps.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from myosuite_tpu.physics import forward, io
from tests.common import MUSCLE_XML, jitted_pipeline

FALLING_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1"/>
    <body name="ball" pos="0 0 0.3">
      <freejoint/>
      <geom type="sphere" size="0.05" mass="0.1" friction="1 0.005 0.0001"/>
    </body>
    <body name="rod" pos="0.5 0 0.4" euler="0 25 0">
      <freejoint/>
      <geom type="capsule" fromto="-0.1 0 0 0.1 0 0" size="0.03" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>
"""

LIMIT_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="h" type="hinge" axis="0 1 0" range="-0.4 0.4"
             damping="0.02" frictionloss="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.03"/>
    </body>
  </worldbody>
</mujoco>
"""


def _rollout(xml, nsteps, ctrl_fn=None, qpos0=None, qvel0=None):
  mj_model = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mj_model)
  if qpos0 is not None:
    mjd.qpos[:] = qpos0
  if qvel0 is not None:
    mjd.qvel[:] = qvel0

  m = io.put_model(mj_model)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos, dtype=jnp.float32),
                qvel=jnp.asarray(mjd.qvel, dtype=jnp.float32))
  step = jitted_pipeline(m, forward.step)

  ours, ref = [], []
  for i in range(nsteps):
    if ctrl_fn is not None:
      c = ctrl_fn(i)
      mjd.ctrl[:] = c
      d = d.replace(ctrl=jnp.asarray(c, dtype=jnp.float32))
    d = step(d)
    mujoco.mj_step(mj_model, mjd)
    ours.append(np.asarray(jax.device_get(d.qpos)))
    ref.append(mjd.qpos.copy())
  return np.stack(ours), np.stack(ref), d, mjd


def test_passive_chain_trajectory():
  """Smooth dynamics only (chain lifted away from the floor)."""
  xml = """
  <mujoco><option timestep="0.002"/>
  <worldbody><body pos="0 0 2">
    <joint type="hinge" axis="0 1 0" damping="0.05" armature="0.002"/>
    <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"/>
    <body pos="0.3 0 0"><joint type="hinge" axis="1 0 0" damping="0.03"/>
      <geom type="capsule" fromto="0 0 0 0 0.25 0" size="0.025"/>
    </body>
  </body></worldbody></mujoco>"""
  ours, ref, _, _ = _rollout(xml, 300, qpos0=[0.9, -0.4])
  np.testing.assert_allclose(ours[-1], ref[-1], atol=2e-3)


def test_muscle_arm_trajectory():
  """Muscle-actuated arm under sinusoidal excitation."""
  def ctrl(i):
    return np.array([0.5 + 0.5 * np.sin(0.02 * i), 0.3])
  ours, ref, d, mjd = _rollout(MUSCLE_XML, 300, ctrl_fn=ctrl)
  np.testing.assert_allclose(ours[-1], ref[-1], atol=5e-3)
  np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=5e-3)


def test_contact_settle():
  """Ball and capsule fall onto the plane and settle (contact + friction)."""
  ours, ref, d, mjd = _rollout(FALLING_XML, 500)
  # settled heights match to sub-mm
  np.testing.assert_allclose(ours[-1][2], ref[-1][2], atol=1e-3)
  np.testing.assert_allclose(ours[-1][9], ref[-1][9], atol=1e-3)
  # full free-joint pose close
  np.testing.assert_allclose(ours[-1][:3], ref[-1][:3], atol=5e-3)
  np.testing.assert_allclose(ours[-1][7:10], ref[-1][7:10], atol=5e-3)


def test_joint_limit_and_frictionloss():
  """Swing into the joint limit; frictionloss dissipates."""
  ours, ref, _, _ = _rollout(LIMIT_XML, 400, qpos0=[0.0], qvel0=[3.0])
  np.testing.assert_allclose(ours[-1], ref[-1], atol=5e-3)
  # limit respected (allowing solver softness)
  assert np.all(ours[:, 0] < 0.45)
