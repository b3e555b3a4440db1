"""Tutorial 4 — Train a policy.

Role parity: /root/reference/tutorials/4c_Train_SB_policy.ipynb (SB3 PPO
on an env). Here training is native JAX: the whole epoch — scan rollout
over 4096 vmapped envs, GAE, minibatched clipped-surrogate updates — is
ONE jitted function, so it runs at full speed on TPU with zero host
round-trips. A SAC alternative uses the same API.
"""

import os

import numpy as np

import myosuite_tpu
from myosuite_tpu.train import ppo as ppo_mod
from myosuite_tpu.train import sac as sac_mod

SMOKE = os.environ.get("MTX_TUTORIAL_SMOKE") == "1"

env = myosuite_tpu.make("MtxElbowPoseRandom-v0")

# --- PPO -------------------------------------------------------------------
cfg = ppo_mod.default_config()
if SMOKE:
    cfg.num_envs, cfg.num_minibatches = 32, 4
    cfg.num_timesteps = 32 * 10 * 20
    cfg.num_evals = 4
else:
    cfg.num_envs = 1024
    cfg.num_timesteps = 2_000_000
    cfg.num_evals = 8

history = []

def progress(step, metrics):
    history.append(metrics["reward_per_step"])
    print(f"  {step:>9d} steps  reward/step {metrics['reward_per_step']:.3f}")

print("training PPO...")
trainer, ts, _stats = ppo_mod.train(env, cfg, progress_fn=progress)
if SMOKE:
    # ~20 tiny iterations is too few to guarantee improvement on every
    # seed; just require training to have stayed numerically healthy.
    assert np.all(np.isfinite(history)), "PPO metrics diverged"
else:
    assert np.mean(history[-2:]) > np.mean(history[:2]), "PPO should improve"

# evaluate the learned policy deterministically
import jax
policy = trainer.make_policy_fn(deterministic=True)
state = jax.jit(jax.vmap(env.reset))(jax.random.split(jax.random.PRNGKey(7), 8))
v_step = jax.jit(jax.vmap(env.step))
total = np.zeros(8)
for _ in range(10 if SMOKE else 100):
    state = v_step(state, policy(ts, state.obs["state"]))
    total += np.asarray(state.reward)
print("eval return:", total.mean())

# --- SAC (off-policy alternative) ------------------------------------------
scfg = sac_mod.default_config()
scfg.num_envs, scfg.unroll_length = 32, 4
scfg.replay_capacity = 32 * 4 * 64
scfg.learning_starts = 256
scfg.num_timesteps = 32 * 4 * (20 if SMOKE else 200)
scfg.num_evals = 2
print("training SAC...")
sac_mod.train(env, scfg,
              progress_fn=lambda s, m: print(
                  f"  {s:>7d} steps  q_loss {m['q_loss']:.3f} "
                  f"alpha {m['alpha']:.3f}"))
print("done")
