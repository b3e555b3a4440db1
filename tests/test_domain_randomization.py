"""Dynamic Model fields must work as tracers (vmapped domain randomization).

types.py documents numeric Model fields (jnt_stiffness, dof_damping,
actuator_actrange, ...) as batchable under vmap; the step pipeline must not
jax.device_get them at trace time. These tests vmap the full step over a
batch of randomized Models and check (a) no ConcretizationTypeError and
(b) the zero-perturbation member of the batch matches the unbatched step.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from myosuite_tpu.physics import forward, io
from tests.common import CHAIN_XML, randomize_state


def _setup():
  mj_model = mujoco.MjModel.from_xml_string(CHAIN_XML)
  m = io.put_model(mj_model)
  d = io.make_data(m)
  md = randomize_state(mj_model, seed=3)
  d = d.replace(qpos=jnp.asarray(md.qpos.astype(np.float32)),
                qvel=jnp.asarray(md.qvel.astype(np.float32)))
  return m, d


def test_vmapped_stiffness_damping_randomization():
  m, d = _setup()
  B = 4
  scales = jnp.asarray([1.0, 0.5, 2.0, 0.0], dtype=jnp.float32)
  stiff = m.jnt_stiffness[None] * scales[:, None]
  damp = m.dof_damping[None] * scales[:, None]

  def step1(stiff_b, damp_b):
    mm = m.replace(jnt_stiffness=stiff_b, dof_damping=damp_b)
    return forward.step(mm, d)

  out = jax.jit(jax.vmap(step1))(stiff, damp)
  assert np.isfinite(np.asarray(out.qpos)).all()

  # batch member 0 is the unperturbed model: must match unbatched step
  ref = jax.jit(lambda: forward.step(m, d))()
  np.testing.assert_allclose(np.asarray(out.qpos)[0], np.asarray(ref.qpos),
                             rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(np.asarray(out.qvel)[0], np.asarray(ref.qvel),
                             rtol=1e-4, atol=1e-5)

  # the randomization must actually change the dynamics
  assert not np.allclose(np.asarray(out.qvel)[0], np.asarray(out.qvel)[2])


def test_vmapped_body_mass_randomization():
  m, d = _setup()
  B = 3
  scales = jnp.asarray([1.0, 1.3, 0.8], dtype=jnp.float32)
  mass = m.body_mass[None] * scales[:, None]
  inertia = m.body_inertia[None] * scales[:, None, None]

  def step1(mass_b, inertia_b):
    mm = m.replace(body_mass=mass_b, body_inertia=inertia_b)
    return forward.step(mm, d)

  out = jax.jit(jax.vmap(step1))(mass, inertia)
  assert np.isfinite(np.asarray(out.qpos)).all()
  ref = jax.jit(lambda: forward.step(m, d))()
  np.testing.assert_allclose(np.asarray(out.qvel)[0], np.asarray(ref.qvel),
                             rtol=1e-4, atol=1e-5)
