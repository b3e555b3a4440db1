"""SAR multi-geometry reorient suite (reference contract:
/root/reference/myosuite/envs/myo/myobase/reorient_sar_v0.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import myosuite_tpu
from myosuite_tpu.envs import sar


def test_geometry_tables():
  assert sar.geometry_table("8").shape == (8, 3)
  assert sar.geometry_table("100").shape == (100, 3)
  # tables are deterministic across calls
  np.testing.assert_array_equal(sar.geometry_table("8"),
                                sar.geometry_table("8"))
  # OOD rows fall outside the training (100) radius range
  train = sar.geometry_table("100")
  ood = sar.geometry_table("ood")
  lo, hi = train[:, 0].min(), train[:, 0].max()
  assert ((ood[:, 0] < lo) | (ood[:, 0] > hi)).all()


def test_sar_env_randomizes_geometry_per_episode():
  env = myosuite_tpu.make("MtxHandReorient100-v0")
  reset = jax.jit(env.reset)
  idxs = {int(reset(jax.random.PRNGKey(s)).info["geom_idx"])
          for s in range(6)}
  assert len(idxs) > 1          # different seeds, different objects
  # same seed => same object (determinism)
  a = int(reset(jax.random.PRNGKey(3)).info["geom_idx"])
  b = int(reset(jax.random.PRNGKey(3)).info["geom_idx"])
  assert a == b


def test_sar_env_steps_with_per_env_model():
  env = myosuite_tpu.make("MtxHandReorient8-v0")
  n = 4
  st = jax.jit(jax.vmap(env.reset))(
      jax.random.split(jax.random.PRNGKey(0), n))
  step = jax.jit(jax.vmap(env.step))
  st = step(st, 0.4 * jnp.ones((n, env.action_size)))
  assert np.isfinite(np.asarray(st.obs["state"])).all()
  assert np.isfinite(np.asarray(st.reward)).all()
  assert "solved" in st.metrics
