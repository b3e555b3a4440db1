"""Smoke tests for the SAC and NPG stacks.

Role parity: the reference ships multiple RL stacks (MJRL NPG via hydra
launchers, SB3 SAC/PPO configs — /root/reference/myosuite/agents/) and its
CI smoke-trains SB3 on envs (/root/reference/myosuite/tests/test_sb.py).
These tests exercise the native TPU-first equivalents end-to-end at CPU
scale: epoch jit-compiles, losses stay finite, replay/Fisher machinery
works, and learning signal moves in the right direction on elbow pose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import myosuite_tpu
from myosuite_tpu.train import npg as npg_mod
from myosuite_tpu.train import sac as sac_mod


def test_sac_epoch_and_learning_signal():
  env = myosuite_tpu.make("MtxElbowPoseRandom-v0")
  cfg = sac_mod.default_config()
  cfg.num_envs = 32
  cfg.unroll_length = 4
  cfg.replay_capacity = 32 * 4 * 64
  cfg.learning_starts = 256
  cfg.batch_size = 128
  cfg.grad_updates_per_epoch = 4
  cfg.num_timesteps = 32 * 4 * 60
  cfg.num_evals = 6
  cfg.seed = 0

  history = []

  def progress(step, metrics):
    history.append(metrics)

  sac, ts = sac_mod.train(env, cfg, progress_fn=progress)

  assert len(history) == 6
  last = history[-1]
  for k in ("q_loss", "pi_loss", "alpha", "entropy", "mean_return"):
    assert np.isfinite(last[k]), (k, last)
  # updates actually ran (past learning_starts) and buffer filled
  assert last["buffer_size"] > cfg.learning_starts
  assert last["q_loss"] > 0.0

  # deterministic policy runs and is in [-1, 1]
  policy = sac.make_policy_fn(deterministic=True)
  obs = ts.env_state.obs["state"][:4]
  act = np.asarray(policy(ts, obs))
  assert act.shape == (4, env.action_size)
  assert np.all(np.abs(act) <= 1.0)


def test_sac_replay_ring_wraparound():
  env = myosuite_tpu.make("MtxElbowPoseRandom-v0")
  cfg = sac_mod.default_config()
  cfg.num_envs = 8
  cfg.unroll_length = 2
  cfg.replay_capacity = 8 * 2 * 3       # 3 blocks -> wraps on 4th epoch
  cfg.learning_starts = 10 ** 9         # never update; isolate the buffer
  sac = sac_mod.SAC(env, cfg)
  ts = sac.init(jax.random.PRNGKey(0))
  step = jax.jit(sac.training_step, donate_argnums=(0,))
  for _ in range(5):
    ts, metrics = step(ts)
  assert int(ts.buffer.size) == cfg.replay_capacity
  assert int(ts.buffer.ptr) == 5 % 3
  assert bool(jnp.all(jnp.isfinite(ts.buffer.obs)))


def test_npg_iteration_improves_surrogate():
  env = myosuite_tpu.make("MtxElbowPoseRandom-v0")
  cfg = npg_mod.default_config()
  cfg.num_envs = 32
  cfg.unroll_length = 16
  cfg.cg_iters = 5
  cfg.num_timesteps = 32 * 16 * 12
  cfg.num_evals = 4
  cfg.seed = 1

  history = []

  def progress(step, metrics):
    history.append(metrics)

  npg, ts = npg_mod.train(env, cfg, progress_fn=progress)

  assert len(history) == 4
  for m in history:
    assert np.isfinite(m["kl_after"]), history
    assert np.isfinite(m["value_loss"]), history
    assert np.isfinite(m["reward_per_step"]), history
  # the KL-normalized step should land near the trust region delta
  assert 0.0 < history[-1]["kl_after"] < 10 * cfg.normalized_step_size

  policy = npg.make_policy_fn(deterministic=True)
  obs = ts.env_state.obs["state"][:2]
  act = np.asarray(policy(ts, obs))
  assert act.shape == (2, env.action_size)


def test_sac_alpha_tracks_target_entropy():
  """Alpha must move to pull measured entropy TOWARD the target.

  Regression for an inverted temperature gradient (ascent instead of
  descent on alpha*(-logp - target_entropy)): with the target far BELOW
  the measured entropy alpha has to fall, and with the target far ABOVE
  it alpha has to rise (SB3/brax convention)."""
  env = myosuite_tpu.make("MtxElbowPoseRandom-v0")
  cfg = sac_mod.default_config()
  cfg.num_envs = 8
  cfg.unroll_length = 4
  cfg.replay_capacity = 8 * 4 * 16
  cfg.learning_starts = 0
  cfg.batch_size = 64
  sac = sac_mod.SAC(env, cfg)
  ts = sac.init(jax.random.PRNGKey(0))
  ts = jax.jit(sac._collect)(ts)

  def run(target, ts0):
    sac.target_entropy = target
    # jit closure captured target_entropy: rebuild the jitted fn per target
    upd = jax.jit(sac._one_update)
    ts1 = ts0
    for i in range(10):
      ts1, _ = upd(ts1, jax.random.PRNGKey(i))
    return float(ts1.log_alpha)

  a0 = float(ts.log_alpha)
  # entropy of a fresh tanh-gaussian policy is ~ -act_size..+act_size;
  # +-1000 puts the target unambiguously on one side
  assert run(-1000.0, ts) < a0, "alpha must fall when entropy > target"
  assert run(+1000.0, ts) > a0, "alpha must rise when entropy < target"
