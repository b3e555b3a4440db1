"""Smoke tests for the Bimanual and TableTennis challenge envs.

Gated behind MTX_TEST=FULL: the full-myoArm scenes take tens of minutes
to compile on the CPU backend (XLA:CPU LLVM codegen of the unrolled
step), while the TPU backend compiles them in ~90 s — they are exercised
on real TPU by the verify recipe (.claude/skills/verify)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import myosuite_tpu

pytestmark = pytest.mark.skipif(
    os.environ.get("MTX_TEST", "LITE").upper() != "FULL",
    reason="heavy CPU compile; run with MTX_TEST=FULL or on TPU")


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
  # policy controls muscles AND the prosthetic gripper
  assert env.action_size == env.model.nu
  import mujoco
  dyn = np.asarray(env.mj_model.actuator_dyntype)
  assert (dyn != mujoco.mjtDyn.mjDYN_MUSCLE.value).sum() == 5
  # touching_body labels live in the obs and are finite
  assert "solved" in s.metrics and "lifted" in s.metrics


def test_tabletennis():
  env, s = _smoke("MtxTableTennis-v0")
  # the serve must be in flight toward the agent (+x velocity)
  s0 = jax.jit(env.reset)(jax.random.PRNGKey(1))
  ball_vel = np.asarray(s0.data.qvel[env._ball_dadr:env._ball_dadr + 3])
  assert ball_vel[0] > 1.0
  assert "hit" in s.metrics
