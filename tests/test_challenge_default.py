"""Default-tier behavioral smoke for Bimanual and TableTennis.

With these two, all 8 challenge families step in the default suite
(reference anchors:
/root/reference/myosuite/envs/myo/myochallenge/bimanual_v0.py:24,173,
tabletennis_v0.py:28). Runs jitted — measured on a 2-CPU box an eager
(disable_jit) big-scene reset costs minutes of per-op dispatch while the
cold jitted compile is tens of seconds (and free on rerun via the
persistent cache).
"""

import jax
import jax.numpy as jnp
import numpy as np

import myosuite_tpu


def _smoke(name, steps=2):
  env = myosuite_tpu.make(name)
  s = jax.jit(env.reset)(jax.random.PRNGKey(0))
  step = jax.jit(env.step)
  for _ in range(steps):
    s = step(s, jnp.zeros(env.action_size))
  assert np.isfinite(np.asarray(s.obs["state"])).all()
  assert np.isfinite(float(s.reward))
  return env, s


def test_bimanual():
  env, s = _smoke("MtxBimanual-v0")
  # policy controls muscles AND the prosthetic gripper (5 non-muscle acts)
  assert env.action_size == env.model.nu
  import mujoco
  dyn = np.asarray(env.mj_model.actuator_dyntype)
  assert (dyn != mujoco.mjtDyn.mjDYN_MUSCLE.value).sum() == 5
  assert "solved" in s.metrics and "lifted" in s.metrics


def test_tabletennis():
  env, s = _smoke("MtxTableTennis-v0")
  # the serve must be in flight toward the agent (+x velocity)
  s0 = jax.jit(env.reset)(jax.random.PRNGKey(1))
  ball_vel = np.asarray(s0.data.qvel[env._ball_dadr:env._ball_dadr + 3])
  assert ball_vel[0] > 1.0
  assert "hit" in s.metrics
