"""Env conformance sweep: every registered env resets, steps, and is
deterministic under the same seed (the reference's de-facto guarantee,
/root/reference/myosuite/tests/test_envs.py:41-126)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import os

import myosuite_tpu
from myosuite_tpu.envs import registry

# LITE mode (default): representative envs per family; MTX_TEST=FULL sweeps
# every registered id (reference pattern: ROBOHIVE_TEST=LITE,
# /root/reference/myosuite/tests/test_envs.py:44-51).
# One representative per model family (each distinct scene pays its own
# XLA compile, ~25-50 s cold on a 2-CPU box); FULL sweeps every id.
_LITE_SET = [
    "MtxElbowPoseRandom-v0", "MtxFingerPoseFixed-v0",
    "MtxFingerReachRandom-v0", "MtxFatiElbowPoseRandom-v0",
    "MtxSarcFingerPoseRandom-v0", "MtxFingerTrackCyclic-v0",
    "MtxHandReachRandom-v0", "MtxLegWalk-v0",
    "MtxTorsoPoseRandom-v0", "MtxArmReachRandom-v0",
]
_SWEEP = (registry.registered_envs()
          if os.environ.get("MTX_TEST", "LITE").upper() == "FULL"
          else [n for n in _LITE_SET if n in registry.registered_envs()])


@pytest.mark.parametrize("name", _SWEEP)
def test_env_conformance(name):
  _conformance(name)


def _conformance(name):
  env = myosuite_tpu.make(name)
  rng = jax.random.PRNGKey(0)
  reset = jax.jit(env.reset)
  step = jax.jit(env.step)

  state = reset(rng)
  assert "state" in state.obs
  obs_dim = state.obs["state"].shape[-1]
  assert obs_dim > 0 and np.isfinite(np.asarray(state.obs["state"])).all()

  a = 0.5 * jnp.ones(env.action_size)
  nxt = step(state, a)
  assert np.isfinite(float(nxt.reward))
  assert np.isfinite(np.asarray(nxt.obs["state"])).all()
  assert nxt.obs["state"].shape[-1] == obs_dim
  for k, v in nxt.metrics.items():
    assert np.isfinite(float(v)), k

  # determinism: same seed => same trajectory
  s1 = reset(jax.random.PRNGKey(7))
  s2 = reset(jax.random.PRNGKey(7))
  for i in range(3):
    act = jnp.full((env.action_size,), 0.3 + 0.1 * i)
    s1 = step(s1, act)
    s2 = step(s2, act)
  np.testing.assert_array_equal(np.asarray(s1.obs["state"]),
                                np.asarray(s2.obs["state"]))
  np.testing.assert_array_equal(float(s1.reward), float(s2.reward))


def test_vmap_batching():
  env = myosuite_tpu.make("MtxElbowPoseRandom-v0")
  n = 8
  rngs = jax.random.split(jax.random.PRNGKey(0), n)
  v_reset = jax.jit(jax.vmap(env.reset))
  v_step = jax.jit(jax.vmap(env.step))
  state = v_reset(rngs)
  assert state.obs["state"].shape[0] == n
  acts = jnp.zeros((n, env.action_size))
  nxt = v_step(state, acts)
  assert nxt.reward.shape == (n,)
  # envs got different targets
  assert np.std(np.asarray(state.info["target_angles"])) > 1e-3


def test_aliases():
  assert registry.resolve("myoElbowPose1D6MRandom-v0") == "MtxElbowPoseRandom-v0"
  env = myosuite_tpu.make("MjxElbowPoseRandom-v0")
  assert env.action_size == 6
