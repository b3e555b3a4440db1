"""Heightfield terrain: generator determinism + contact correctness.

Reference analog: same-seed reproducibility of ChaseTagField/TrackField
(/root/reference/myosuite/tests/test_heightfields.py:9-40), plus a physics
check the reference delegates to MuJoCo's C hfield collider: a ball dropped
on terrain settles at the local surface height.
"""

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_tpu.envs import heightfields
from myosuite_tpu.physics import forward, io


def test_generators_deterministic():
  rng = jax.random.PRNGKey(3)
  for code in (1, 2, 3):
    a = heightfields.generate(rng, jnp.int32(code), (16, 32))
    b = heightfields.generate(rng, jnp.int32(code), (16, 32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(a).std() > 0  # non-flat


def test_sample_height_bilinear():
  hf = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
  # center of the grid (x=0, y=0) -> exact middle cell interpolation
  h = heightfields.sample_height(hf, jnp.array([0.0, 0.0]), (4.0, 2.0))
  assert np.isfinite(float(h))
  # corner clamp: far outside returns border value
  h_far = heightfields.sample_height(hf, jnp.array([100.0, 100.0]),
                                     (4.0, 2.0))
  np.testing.assert_allclose(float(h_far), 11.0, rtol=1e-6)


_BALL_XML = """
<mujoco>
  <asset><hfield name="t" nrow="16" ncol="16" size="1 1 1 0.1"/></asset>
  <worldbody>
    <geom name="terrain" type="hfield" hfield="t" contype="1" conaffinity="1"/>
    <body name="ball" pos="0 0 0.5">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.05" mass="0.1"
            contype="1" conaffinity="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_ball_settles_on_terrain():
  model, _ = io.load_model(xml=_BALL_XML)
  height = 0.12
  d = io.make_data(model)
  d = d.replace(hfield_data=jnp.full((16, 16), height, dtype=jnp.float32))

  d = jax.jit(lambda dd: forward.step_n(model, dd, 400))(d)
  # ball rests with center one radius above the (flat) raised terrain
  np.testing.assert_allclose(float(d.qpos[2]), height + 0.05, atol=5e-3)
  assert abs(float(d.qvel[2])) < 1e-2


def test_ball_rolls_down_slope():
  model, _ = io.load_model(xml=_BALL_XML)
  # tilted plane: rises along +x => ball at center rolls toward -x
  x = jnp.linspace(0.0, 0.3, 16)
  hf = jnp.tile(x[None, :], (16, 1))
  d = io.make_data(model)
  d = d.replace(hfield_data=hf)
  d = jax.jit(lambda dd: forward.step_n(model, dd, 300))(d)
  assert float(d.qpos[0]) < -0.01
