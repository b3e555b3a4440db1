"""Stage-by-stage parity of the TPU engine's smooth dynamics vs MuJoCo CPU.

This is the analog of the reference's MJX-vs-MuJoCo parity tests
(/root/reference/myosuite/tests/test_mjx.py:21-134) for our own engine.
"""

import mujoco
import numpy as np
import pytest

import jax.numpy as jnp

from myosuite_tpu.physics import io, kinematics, smooth
from tests.common import CHAIN_XML, MUSCLE_XML, randomize_state


def _forward_to(model_xml, seed, stages=("pos", "vel")):
  mj_model = mujoco.MjModel.from_xml_string(model_xml)
  mjd = randomize_state(mj_model, seed=seed)
  mujoco.mj_forward(mj_model, mjd)

  m = io.put_model(mj_model)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mjd.qpos, dtype=jnp.float32),
                qvel=jnp.asarray(mjd.qvel, dtype=jnp.float32))
  d = kinematics.kinematics(m, d)
  d = kinematics.com_pos(m, d)
  if "vel" in stages:
    d = kinematics.com_vel(m, d)
  return mj_model, mjd, m, d


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("xml", [CHAIN_XML, MUSCLE_XML])
def test_kinematics(xml, seed):
  _, mjd, _, d = _forward_to(xml, seed)
  np.testing.assert_allclose(d.xpos, mjd.xpos, atol=1e-5)
  # quaternions up to sign
  ours = np.asarray(d.xquat)
  ref = mjd.xquat
  sign = np.sign(np.sum(ours * ref, axis=1, keepdims=True))
  sign[sign == 0] = 1.0
  np.testing.assert_allclose(ours * sign, ref, atol=1e-5)
  np.testing.assert_allclose(d.xipos, mjd.xipos, atol=1e-5)
  np.testing.assert_allclose(
      np.asarray(d.ximat), mjd.ximat.reshape(-1, 3, 3), atol=1e-5)
  np.testing.assert_allclose(d.xanchor, mjd.xanchor, atol=1e-5)
  np.testing.assert_allclose(d.xaxis, mjd.xaxis, atol=1e-5)
  np.testing.assert_allclose(d.geom_xpos, mjd.geom_xpos, atol=1e-5)
  np.testing.assert_allclose(d.site_xpos, mjd.site_xpos, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("xml", [CHAIN_XML, MUSCLE_XML])
def test_com_quantities(xml, seed):
  _, mjd, _, d = _forward_to(xml, seed)
  np.testing.assert_allclose(d.subtree_com, mjd.subtree_com, atol=1e-5)
  np.testing.assert_allclose(d.cinert, mjd.cinert, atol=1e-4)
  np.testing.assert_allclose(d.cdof, mjd.cdof, atol=1e-5)
  np.testing.assert_allclose(d.cvel, mjd.cvel, atol=1e-4)
  np.testing.assert_allclose(d.cdof_dot, mjd.cdof_dot, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("xml", [CHAIN_XML, MUSCLE_XML])
def test_crb_rne_passive(xml, seed):
  mj_model, mjd, m, d = _forward_to(xml, seed)
  d = smooth.crb(m, d)
  d = smooth.rne(m, d)

  full_m = np.zeros((mj_model.nv, mj_model.nv))
  mujoco.mj_fullM(mj_model, mjd, full_m)
  np.testing.assert_allclose(d.qM, full_m, atol=1e-4)
  np.testing.assert_allclose(d.qfrc_bias, mjd.qfrc_bias, atol=1e-4)

  # factor + solve round-trip
  d = smooth.factor_m(m, d)
  y = np.random.RandomState(seed).randn(m.nv).astype(np.float32)
  x = smooth.solve_m(d, jnp.asarray(y))
  np.testing.assert_allclose(full_m @ np.asarray(x), y, atol=1e-3)

  # passive (no tendons computed yet for CHAIN; tendon terms zero there)
  d = smooth.passive(m, d)
  if m.ntendon == 0:
    np.testing.assert_allclose(d.qfrc_passive, mjd.qfrc_passive, atol=1e-5)
