"""Tendon path + muscle actuation parity vs MuJoCo CPU."""

import mujoco
import numpy as np
import pytest

import jax.numpy as jnp

from myosuite_tpu.physics import actuation, io, kinematics, tendon
from tests.common import MUSCLE_XML, jitted_pipeline, randomize_state

# Tendon routed over a sphere wrap and a cylinder wrap (with sidesites),
# the geometry myo muscle paths rely on.
WRAP_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="upper" pos="0 0 1">
      <geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.03"/>
      <site name="org" pos="0.03 0 -0.1"/>
      <site name="side_elbow" pos="0.06 0 -0.3"/>
      <body name="lower" pos="0 0 -0.3">
        <joint name="elbow" type="hinge" axis="0 1 0" range="-0.5 2.0"/>
        <geom name="cyl" type="cylinder" fromto="0 -0.04 0 0 0.04 0"
              size="0.025" contype="0" conaffinity="0"/>
        <geom name="sph" type="sphere" pos="0.01 0 -0.1" size="0.03"
              contype="0" conaffinity="0"/>
        <geom type="capsule" fromto="0 0 0 0 0 -0.25" size="0.02"/>
        <site name="mid" pos="0.03 0 -0.05"/>
        <site name="side_sph" pos="0.06 0 -0.1"/>
        <site name="ins" pos="0.025 0 -0.2"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <spatial name="wrapped">
      <site site="org"/>
      <geom geom="cyl" sidesite="side_elbow"/>
      <site site="mid"/>
      <geom geom="sph" sidesite="side_sph"/>
      <site site="ins"/>
    </spatial>
  </tendon>
  <actuator>
    <muscle name="mus" tendon="wrapped" force="100"/>
  </actuator>
</mujoco>
"""


def _dense(vec, rownnz, rowadr, colind, shape):
  out = np.zeros(shape)
  mujoco.mju_sparse2dense(out, vec, rownnz, rowadr, colind)
  return out


_MODELS = {}


def _setup(xml, seed, ctrl_scale=1.0):
  if xml not in _MODELS:
    mjm = mujoco.MjModel.from_xml_string(xml)
    mjm.opt.jacobian = mujoco.mjtJacobian.mjJAC_DENSE
    _MODELS[xml] = (mjm, io.put_model(mjm))
  mj_model, _ = _MODELS[xml]
  mjd = randomize_state(mj_model, seed=seed)
  rng = np.random.RandomState(seed + 100)
  mjd.ctrl[:] = rng.uniform(0, ctrl_scale, mj_model.nu)
  if mj_model.na:
    mjd.act[:] = rng.uniform(0.1, 0.9, mj_model.na)
  mujoco.mj_forward(mj_model, mjd)

  m = _MODELS[xml][1]
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos, dtype=jnp.float32),
                qvel=jnp.asarray(mjd.qvel, dtype=jnp.float32),
                ctrl=jnp.asarray(mjd.ctrl, dtype=jnp.float32),
                act=jnp.asarray(mjd.act, dtype=jnp.float32))
  pipeline = jitted_pipeline(
      m, kinematics.kinematics, kinematics.com_pos, kinematics.com_vel,
      tendon.tendon, tendon.tendon_velocity, actuation.transmission,
      actuation.actuator_velocity, actuation.actuation)
  d = pipeline(d)
  return mj_model, mjd, m, d


@pytest.mark.parametrize("xml", [MUSCLE_XML, WRAP_XML])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tendon_parity(xml, seed):
  mj_model, mjd, m, d = _setup(xml, seed)
  np.testing.assert_allclose(d.ten_length, mjd.ten_length, atol=1e-5)
  ref_j = mjd.ten_J.reshape(mj_model.ntendon, mj_model.nv)
  np.testing.assert_allclose(d.ten_J, ref_j, atol=1e-4)
  np.testing.assert_allclose(d.ten_velocity, mjd.ten_velocity, atol=1e-4)


@pytest.mark.parametrize("xml", [MUSCLE_XML, WRAP_XML])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_actuation_parity(xml, seed):
  mj_model, mjd, m, d = _setup(xml, seed)
  np.testing.assert_allclose(d.actuator_length, mjd.actuator_length,
                             atol=1e-5)
  ref_mom = _dense(mjd.actuator_moment, mjd.moment_rownnz, mjd.moment_rowadr,
                   mjd.moment_colind, (mj_model.nu, mj_model.nv))
  np.testing.assert_allclose(d.actuator_moment, ref_mom, atol=1e-4)
  np.testing.assert_allclose(d.actuator_velocity, mjd.actuator_velocity,
                             atol=1e-4)
  np.testing.assert_allclose(d.act_dot, mjd.act_dot, atol=1e-3)
  np.testing.assert_allclose(d.actuator_force, mjd.actuator_force,
                             rtol=2e-3, atol=1e-3)
  np.testing.assert_allclose(d.qfrc_actuator, mjd.qfrc_actuator,
                             rtol=2e-3, atol=1e-3)
