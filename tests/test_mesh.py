"""Mesh-sharded training on the 8-device CPU fake.

SURVEY.md §4 calls for multi-host fakes via
xla_force_host_platform_device_count (conftest.py provisions 8 virtual
CPU devices); these tests exercise parallel/mesh.py in the builder's own
suite instead of only the driver's dryrun: the distributed training step
must (a) numerically match the single-device step from identical inits
and (b) keep the env-state batch sharded over the env axis through the
scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import myosuite_tpu
from myosuite_tpu.parallel import mesh as mesh_mod
from myosuite_tpu.train import ppo as ppo_mod

pytestmark = pytest.mark.fast


N_DEV = 8


def _small_ppo(num_envs):
  env = myosuite_tpu.make("MtxElbowPoseRandom-v0")
  cfg = ppo_mod.default_config()
  cfg.num_envs = num_envs
  cfg.unroll_length = 2
  cfg.num_minibatches = 2
  cfg.num_updates_per_batch = 1
  cfg.num_evals = 1
  return ppo_mod.PPO(env, cfg)


@pytest.fixture(scope="module")
def mesh():
  assert jax.device_count() >= N_DEV, "conftest must provision 8 devices"
  return mesh_mod.make_mesh(N_DEV)


def test_distributed_matches_single_device(mesh):
  """One mesh-sharded training step == one single-device step, same init."""
  ppo = _small_ppo(num_envs=4 * N_DEV)
  ts0 = ppo.init(jax.random.PRNGKey(0))

  ts_single, m_single = jax.jit(ppo.training_step)(ts0)

  ts_mesh = mesh_mod.place(ppo.init(jax.random.PRNGKey(0)), ppo, mesh)
  train_fn = mesh_mod.make_distributed_training_fn(ppo, ts_mesh, mesh,
                                                   steps_per_call=1)
  ts_dist, m_dist = train_fn(ts_mesh)

  for k in m_single:
    np.testing.assert_allclose(
        np.asarray(m_single[k]), np.asarray(m_dist[k]),
        rtol=2e-4, atol=2e-5, err_msg=f"metric {k}")

  # learner params agree (replicated across the mesh)
  flat_s = jax.tree_util.tree_leaves(ts_single.policy_params)
  flat_d = jax.tree_util.tree_leaves(jax.device_get(ts_dist.policy_params))
  for a, b in zip(flat_s, flat_d):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-5)


def test_env_state_stays_sharded(mesh):
  """env_state batch sharding must survive the scanned training step."""
  ppo = _small_ppo(num_envs=4 * N_DEV)
  ts = mesh_mod.place(ppo.init(jax.random.PRNGKey(1)), ppo, mesh)
  train_fn = mesh_mod.make_distributed_training_fn(ppo, ts, mesh,
                                                   steps_per_call=2)
  ts, _ = train_fn(ts)

  env_sharding = NamedSharding(mesh, P(mesh_mod.ENV_AXIS))
  qpos = ts.env_state.data.qpos
  assert qpos.sharding.is_equivalent_to(env_sharding, qpos.ndim), (
      qpos.sharding)
  # and the learner params stayed replicated
  leaf = jax.tree_util.tree_leaves(ts.policy_params)[0]
  assert leaf.sharding.is_fully_replicated


def test_local_env_slice_single_process(mesh):
  """Single-process run owns the whole env batch."""
  sl = mesh_mod.local_env_slice(mesh, global_batch=64)
  assert (sl.start, sl.stop) == (0, 64)


def test_global_env_array_roundtrip(mesh):
  local = np.arange(64 * 3, dtype=np.float32).reshape(64, 3)
  arr = mesh_mod.global_env_array(local, mesh, global_batch=64)
  assert arr.shape == (64, 3)
  np.testing.assert_array_equal(jax.device_get(arr), local)
  assert arr.sharding.is_equivalent_to(
      NamedSharding(mesh, P(mesh_mod.ENV_AXIS)), arr.ndim)


def test_initialize_distributed_noop_single_process():
  """On a single process with no coordinator it must be a no-op."""
  mesh_mod.initialize_distributed()
  assert jax.process_count() == 1
