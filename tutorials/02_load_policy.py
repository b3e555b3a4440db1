"""Tutorial 2 — Load a trained policy and evaluate it.

Role parity: /root/reference/tutorials/2_Load_policy.ipynb (load an NPG
pickle, rollout, render). Here we restore a shipped orbax baseline from
myosuite_tpu/agents/pretrained/ and measure success rate with the
reference's >5-step solved rule.
"""

import os

import jax
import numpy as np

import myosuite_tpu
from myosuite_tpu.envs import obs_vec
from myosuite_tpu.train import checkpoint, ppo as ppo_mod

SMOKE = os.environ.get("MTX_TUTORIAL_SMOKE") == "1"
ENV_ID = "MtxElbowPoseRandom-v0"
CKPT = os.path.join(os.path.dirname(myosuite_tpu.__file__), "agents",
                    "pretrained", ENV_ID.replace("-", "_"))

env = myosuite_tpu.make(ENV_ID)
trainer = ppo_mod.PPO(env, ppo_mod.default_config())
ts = trainer.init(jax.random.PRNGKey(0))
step_dir = checkpoint.latest_step_dir(CKPT)
ts = checkpoint.restore_learner(step_dir, ts)
print("restored", step_dir)

policy = trainer.make_policy_fn(deterministic=True)

# batched deterministic eval: N episodes in parallel, one scan
n_episodes = 4 if SMOKE else 16
horizon = 20 if SMOKE else env.max_episode_steps
v_reset = jax.jit(jax.vmap(env.reset))
v_step = jax.jit(jax.vmap(env.step))

state = v_reset(jax.random.split(jax.random.PRNGKey(42), n_episodes))

def body(state, _):
    action = policy(ts, state.obs["state"])
    state = v_step(state, action)
    return state, (state.reward, state.metrics["solved"])

state, (rewards, solved) = jax.lax.scan(body, state, None, length=horizon)
rewards, solved = np.asarray(rewards), np.asarray(solved)

success = obs_vec.evaluate_success(
    [solved[:, i] for i in range(n_episodes)])
print(f"return/episode {rewards.sum(0).mean():.1f}  success {success:.0f}%")
if not SMOKE:
    assert success >= 90.0, "shipped elbow baseline should solve the task"
