"""3CC-r fatigue model tests: math parity vs an independent numpy
implementation, and wrapper behavior (analog of the reference's
tests/mjx/test_fatigue.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import myosuite_tpu
from myosuite_tpu.envs import fatigue


def _numpy_3ccr(TL, MA, MR, MF, tau_act, tau_deact, F, R, r, dt):
  """Straightforward transcription of the published 3CC-r update."""
  LD = (0.5 + 1.5 * MA) / tau_act
  LR = (0.5 + 1.5 * MA) / tau_deact
  C = np.zeros_like(MA)
  m1 = (MA < TL) & (MR > (TL - MA))
  m2 = (MA < TL) & (MR <= (TL - MA))
  m3 = MA >= TL
  C[m1] = (LD * (TL - MA))[m1]
  C[m2] = (LD * MR)[m2]
  C[m3] = (LR * (TL - MA))[m3]
  rR = np.where(m3, r * R, R)
  Cmin = np.maximum(-MA / dt + F * MA, (MR - 1) / dt + rR * MF)
  Cmax = np.minimum((1 - MA) / dt + F * MA, MR / dt + rR * MF)
  C = np.clip(C, Cmin, Cmax)
  return (MA + (C - F * MA) * dt, MR + (-C + rR * MF) * dt,
          MF + (F * MA - rR * MF) * dt)


def test_3ccr_math_parity():
  env = myosuite_tpu.make("MtxElbowPoseRandom-v0")
  params, mask = fatigue.make_params(env.model, env.dt)
  na = int(mask.sum())
  rng = np.random.RandomState(0)
  MA = rng.uniform(0, 1, na).astype(np.float32)
  MF = (rng.uniform(0, 1, na) * (1 - MA)).astype(np.float32)
  MR = (1 - MA - MF).astype(np.float32)
  state = {"MA": jnp.asarray(MA), "MR": jnp.asarray(MR),
           "MF": jnp.asarray(MF)}
  for i in range(50):
    TL = rng.uniform(0, 1, na).astype(np.float32)
    state = fatigue.compute_act(params, jnp.asarray(TL), state)
    MA, MR, MF = _numpy_3ccr(
        TL, MA, MR, MF,
        np.asarray(params.tau_act), np.asarray(params.tau_deact),
        float(params.F), float(params.R), float(params.r), float(params.dt))
  np.testing.assert_allclose(state["MA"], MA, atol=1e-4)
  np.testing.assert_allclose(state["MR"], MR, atol=1e-4)
  np.testing.assert_allclose(state["MF"], MF, atol=1e-4)
  # compartments stay a partition of 1
  total = np.asarray(state["MA"] + state["MR"] + state["MF"])
  np.testing.assert_allclose(total, 1.0, atol=1e-3)


def test_fatigue_env_accumulates():
  env = myosuite_tpu.make("MtxFatiElbowPoseRandom-v0")
  step = jax.jit(env.step)
  state = jax.jit(env.reset)(jax.random.PRNGKey(0))
  full = jnp.ones(env.action_size)
  for _ in range(60):
    state = step(state, full)
  fat = state.info["fatigue"]
  # sustained max drive fatigues muscles: MF grows, MR shrinks
  assert float(jnp.max(fat["MF"])) > 1e-3
  assert float(jnp.min(fat["MR"])) < 0.99
  assert np.isfinite(float(state.reward))


def test_sarcopenia_weakens():
  base = myosuite_tpu.make("MtxElbowPoseFixed-v0")
  sarc = myosuite_tpu.make("MtxSarcElbowPoseFixed-v0")
  rng = jax.random.PRNGKey(0)
  s0 = jax.jit(base.reset)(rng)
  s1 = jax.jit(sarc.reset)(rng)
  act = jnp.ones(base.action_size)
  # drive flexors only
  act = act.at[3:].set(-1.0)
  step0 = jax.jit(base.step)
  step1 = jax.jit(sarc.step)
  for _ in range(20):
    s0 = step0(s0, act)
    s1 = step1(s1, act)
  # the weak muscle moves the joint less from the same start
  q0 = float(jnp.abs(s0.data.qpos[0] - s0.info["target_angles"][0]))
  q1 = float(jnp.abs(s1.data.qpos[0] - s1.info["target_angles"][0]))
  assert float(s1.data.qpos[0]) < float(s0.data.qpos[0])
