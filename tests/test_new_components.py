"""Round-3 component tests: env variants, native trace sink, paths utils,
RoboSet schema, reflex controller wiring, exo env."""

import numpy as np
import pytest


def test_register_env_variant():
  import myosuite_tpu
  from myosuite_tpu.envs import registry

  vid = registry.register_env_variant(
      "MtxElbowPoseRandom-v0",
      {"max_episode_steps": 7, "reward_weights.pose": 3.5},
      variant_id="MtxElbowPoseShort-v0", silent=True)
  assert vid == "MtxElbowPoseShort-v0"
  env = myosuite_tpu.make(vid)
  assert env.max_episode_steps == 7
  assert float(env.config.reward_weights.pose) == 3.5
  # base env unchanged
  base = myosuite_tpu.make("MtxElbowPoseRandom-v0")
  assert base.max_episode_steps != 7


def test_tracepack_roundtrip(tmp_path):
  from myosuite_tpu.logger.trace import Trace
  from myosuite_tpu.native import native_available

  assert native_available(), "g++ build of tracepack failed"
  tr = Trace("t")
  tr.create_group("rollout0")
  tr.trace["rollout0"]["qpos"] = np.arange(40, dtype=np.float32).reshape(10, 4)
  tr.trace["rollout0"]["rew"] = np.ones(10, dtype=np.float32)
  path = str(tmp_path / "t.mtp")
  tr.save(path)
  t2 = Trace.load(path)
  np.testing.assert_array_equal(t2["rollout0"]["qpos"],
                                tr["rollout0"]["qpos"])


def test_roboset_schema(tmp_path):
  from myosuite_tpu.logger.roboset import RoboSetTrace

  paths = [{"obs": [np.zeros(3)] * 4, "reward": [1.0] * 4,
            "solved": [0.0] * 4}]
  tr = RoboSetTrace.from_paths(paths)
  assert "Trial0" in tr.keys()
  assert "data/observations" in tr["Trial0"]
  tr.save(str(tmp_path / "rs.h5"))


def test_paths_utils(tmp_path):
  import pickle

  from myosuite_tpu.logger.trace import Trace
  from myosuite_tpu.utils import paths_utils

  paths = [{"obs": [np.zeros(3)] * 8, "reward": [1.0] * 8,
            "solved": [1.0] * 8},
           {"obs": [np.zeros(3)] * 3, "reward": [0.5] * 3,
            "solved": [0.0] * 3}]
  stats = paths_utils.path_stats(paths)
  assert stats["num_paths"] == 2 and stats["success_rate"] == 0.5
  pkl = str(tmp_path / "paths.pkl")
  with open(pkl, "wb") as f:
    pickle.dump(paths, f)
  h5 = paths_utils.pickle2h5(pkl)
  assert Trace.load(h5)["rollout0"]["reward"].shape == (8,)
  trunc = paths_utils.truncate_paths(paths, 2)
  assert len(trunc[0]["reward"]) == 2


def test_dict_and_vector_utils():
  import jax.numpy as jnp

  from myosuite_tpu.utils.dict_utils import dict_numpify, flatten_dict
  from myosuite_tpu.utils.vector_math import calculate_cosine

  flat = flatten_dict({"a": {"b": 1, "c": {"d": 2}}})
  assert flat == {"a/b": 1, "a/c/d": 2}
  d = dict_numpify({"x": np.ones(3, dtype=np.float64)})
  assert d["x"].dtype == np.float16
  c = calculate_cosine(jnp.array([1.0, 0.0]), jnp.array([1.0, 0.0]))
  assert float(c) == pytest.approx(1.0)
  z = calculate_cosine(jnp.zeros(2), jnp.array([1.0, 0.0]))
  assert float(z) == 0.0


def test_xml_utils():
  from myosuite_tpu.utils import xml_utils

  a = "<mujoco><worldbody><body name='a' pos='0 0 1'/></worldbody></mujoco>"
  b = ("<mujoco><worldbody><body name='b'/></worldbody>"
       "<actuator><motor name='m' joint='j'/></actuator></mujoco>")
  merged = xml_utils.merge_xmls(a, b)
  assert 'name="b"' in merged and "motor" in merged
  moved = xml_utils.reparent_body(merged, "b", "a", pos="1 2 3")
  root = xml_utils.parse_xml(moved)
  body_a = xml_utils.find_body(root, "a")
  assert any(c.get("name") == "b" for c in body_a)
  removed = xml_utils.remove_body(moved, "b")
  assert xml_utils.find_body(xml_utils.parse_xml(removed), "b") is None


def test_elbow_exo_env():
  import jax
  import jax.numpy as jnp

  import myosuite_tpu

  env = myosuite_tpu.make("MtxElbowPoseExoRandom-v0")
  s = jax.jit(env.reset)(jax.random.PRNGKey(0))
  assert "payload_mass" in s.info
  s2 = jax.jit(env.step)(s, jnp.zeros(env.action_size))
  assert np.isfinite(np.asarray(s2.obs["state"])).all()
  # payload is part of the obs (last entry)
  assert s2.obs["state"].shape[-1] == s.obs["state"].shape[-1]


def test_reflex_controller_shapes():
  import jax

  import myosuite_tpu
  from myosuite_tpu.agents.reflex import ReflexController, default_params

  env = myosuite_tpu.make("MtxLegWalk-v0")
  ctl = ReflexController(env)
  s = jax.jit(env.reset)(jax.random.PRNGKey(0))
  stim = jax.jit(ctl)(s.data)
  arr = np.asarray(stim)
  assert arr.shape == (env.model.nu,)
  assert (arr >= 0).all() and (arr <= 1).all()
  # stimulations are not uniformly the baseline (pathways fire)
  assert arr.std() > 1e-4


def test_training_callbacks_smoke(tmp_path):
  from myosuite_tpu.train import callbacks as cb

  info = cb.InfoCallback(log_file=str(tmp_path / "log.txt"))
  info.on_iteration(0, 1000, {"loss": 0.5}, None, None)
  assert (tmp_path / "log.txt").exists()


def test_obs_vec_codec():
  import jax.numpy as jnp

  from myosuite_tpu.envs.obs_vec import (ObsVec, compute_path_rewards,
                                         evaluate_success)

  template = {"qpos": np.zeros(4), "qvel": np.zeros(4), "err": np.zeros(2)}
  codec = ObsVec(["qpos", "qvel", "err"], template)
  assert codec.size == 10
  d = {"qpos": jnp.arange(4.0), "qvel": jnp.arange(4.0) + 10,
       "err": jnp.arange(2.0) + 20}
  vec = codec.obsdict2obsvec(d)
  assert vec.shape == (10,)
  back = codec.obsvec2obsdict(vec)
  np.testing.assert_array_equal(np.asarray(back["qvel"]),
                                np.asarray(d["qvel"]))
  # batched paths (traj, horizon, obs)
  paths = jnp.broadcast_to(vec, (3, 5, 10))
  rew = compute_path_rewards(
      paths, codec, lambda od: {"e": jnp.linalg.norm(od["err"], axis=-1)})
  assert rew["e"].shape == (3, 5)
  assert evaluate_success([np.ones(8), np.zeros(8)]) == 50.0


def test_visual_obs_key_parsing():
  from myosuite_tpu.envs.visual import parse_visual_key

  ch, cam, hw, enc = parse_visual_key("rgb:view_1:224x224:2d")
  assert (ch, cam, hw, enc) == ("rgb", "view_1", (224, 224), "2d")
