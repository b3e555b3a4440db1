"""MyoDM suite: registration surface, reference-motion semantics, and
track-env behavior (reference contract:
/root/reference/myosuite/envs/myo/myodm/__init__.py:100-180 and
myodm_v0.py:24-312)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import myosuite_tpu
from myosuite_tpu.envs import myodm
from myosuite_tpu.logger.reference_motion import ReferenceMotion, RefType


def test_registration_surface():
  names = myosuite_tpu.registered_envs()
  # ~90 track envs + 50 objects x Fixed/Random
  for suffix, _, _ in myodm.TRACK_SPECS:
    assert f"MtxHand{suffix}-v0" in names
  for obj in myodm.GRAB_OBJECTS:
    assert f"MtxHand{obj.title()}Fixed-v0" in names
    assert f"MtxHand{obj.title()}Random-v0" in names
  # reference aliases resolve
  env = myosuite_tpu.make("MyoHandAppleLift-v0")
  assert env.action_size > 30   # myoHand has 39 muscles


def test_object_motion_shapes():
  for verb in ("lift", "pass", "fly", "inspect", "drink", "pour", "on",
               "use", "play", "shake", "strike", "brush", "toast"):
    t, obj = myodm.object_motion(verb)
    assert obj.shape == (len(t), 7)
    assert np.isfinite(obj).all()
    # quaternions stay normalized
    np.testing.assert_allclose(np.linalg.norm(obj[:, 3:], axis=1), 1.0,
                               atol=1e-6)
    # starts at rest on the palm
    np.testing.assert_allclose(obj[0, :3], myodm.PALM, atol=1e-6)


def test_track_env_steps_and_tracks_time():
  env = myosuite_tpu.make("MtxHandAppleLift-v0")
  st = jax.jit(env.reset)(jax.random.PRNGKey(0))
  assert float(st.info["motion_time"]) == 0.0
  step = jax.jit(env.step)
  st = step(st, 0.5 * jnp.ones(env.action_size))
  assert float(st.info["motion_time"]) == pytest.approx(env.dt)
  assert np.isfinite(np.asarray(st.obs["state"])).all()
  assert {"pose_err", "obj_err", "solved"} <= set(st.metrics)


def test_random_object_env_resamples_target():
  env = myosuite_tpu.make("MtxHandAppleRandom-v0")
  s1 = env.reset(jax.random.PRNGKey(1))
  s2 = env.reset(jax.random.PRNGKey(2))
  assert not np.allclose(np.asarray(s1.info["obj_target"]),
                         np.asarray(s2.info["obj_target"]))
  # same seed => same target (determinism)
  s3 = env.reset(jax.random.PRNGKey(1))
  np.testing.assert_array_equal(np.asarray(s1.info["obj_target"]),
                                np.asarray(s3.info["obj_target"]))


def test_reference_motion_type_inference():
  # FIXED / RANDOM / TRACK from leading dim (reference_motion.py:59-66)
  one = ReferenceMotion.from_arrays([0.0], np.zeros((1, 4)))
  two = ReferenceMotion.from_arrays([0.0, 1.0], np.zeros((2, 4)))
  many = ReferenceMotion.from_arrays(np.linspace(0, 1, 5), np.zeros((5, 4)))
  assert one.ref_type == RefType.FIXED
  assert two.ref_type == RefType.RANDOM
  assert many.ref_type == RefType.TRACK
