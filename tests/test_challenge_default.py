"""Default-tier behavioral smoke for Bimanual and TableTennis.

The jitted full-myoArm scenes take tens of minutes of XLA:CPU compile
(kept in test_challenge_new.py behind MTX_TEST=FULL), but the env LOGIC
— contact-label obs, serve kinematics, reward contracts
(/root/reference/myosuite/envs/myo/myochallenge/bimanual_v0.py:24,173,
tabletennis_v0.py:28) — is backend-independent. Running eagerly
(jax.disable_jit) skips compilation entirely, so all 8 challenge
families now step in the default suite.
"""

import jax
import jax.numpy as jnp
import numpy as np

import myosuite_tpu


def _eager_smoke(name, steps=2):
  env = myosuite_tpu.make(name)
  with jax.disable_jit():
    s = env.reset(jax.random.PRNGKey(0))
    for _ in range(steps):
      s = env.step(s, jnp.zeros(env.action_size))
  assert np.isfinite(np.asarray(s.obs["state"])).all()
  assert np.isfinite(float(s.reward))
  return env, s


def test_bimanual_eager():
  env, s = _eager_smoke("MtxBimanual-v0")
  # policy controls muscles AND the prosthetic gripper (5 non-muscle acts)
  assert env.action_size == env.model.nu
  import mujoco
  dyn = np.asarray(env.mj_model.actuator_dyntype)
  assert (dyn != mujoco.mjtDyn.mjDYN_MUSCLE.value).sum() == 5
  assert "solved" in s.metrics and "lifted" in s.metrics


def test_tabletennis_eager():
  env, s = _eager_smoke("MtxTableTennis-v0")
  # the serve must be in flight toward the agent (+x velocity)
  with jax.disable_jit():
    s0 = env.reset(jax.random.PRNGKey(1))
  ball_vel = np.asarray(s0.data.qvel[env._ball_dadr:env._ball_dadr + 3])
  assert ball_vel[0] > 1.0
  assert "hit" in s.metrics
