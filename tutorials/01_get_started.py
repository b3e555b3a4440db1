"""Tutorial 1 — Get started.

Role parity: /root/reference/tutorials/1_Get_Started.ipynb (gym.make,
reset, random actions, mujoco rendering). Here envs are pure functions:
`reset(rng) -> State`, `step(State, action) -> State`, so the same code
runs single-env or batched under `jax.vmap` and compiles with `jax.jit`.
"""

import os

import jax
import jax.numpy as jnp

import myosuite_tpu

SMOKE = os.environ.get("MTX_TUTORIAL_SMOKE") == "1"

# --- single env ------------------------------------------------------------
env = myosuite_tpu.make("MtxElbowPoseRandom-v0")   # alias: myoElbowPose1D6MRandom-v0
print(f"{env.action_size} muscles, ctrl_dt {env.dt}s, "
      f"horizon {env.max_episode_steps}")

rng = jax.random.PRNGKey(0)
state = jax.jit(env.reset)(rng)
print("obs shape:", state.obs["state"].shape)

step = jax.jit(env.step)
for t in range(5 if SMOKE else 50):
    rng, sub = jax.random.split(rng)
    action = jax.random.uniform(sub, (env.action_size,))  # muscle excitations
    state = step(state, action)
print("reward:", float(state.reward), "done:", float(state.done))

# --- the same env, 1024 at once --------------------------------------------
n = 64 if SMOKE else 1024
v_reset = jax.jit(jax.vmap(env.reset))
v_step = jax.jit(jax.vmap(env.step))

vstate = v_reset(jax.random.split(jax.random.PRNGKey(1), n))
vstate = v_step(vstate, jnp.zeros((n, env.action_size)))
print(f"{n} envs: mean reward {float(vstate.reward.mean()):.3f}")

# --- whole rollouts inside one compiled scan --------------------------------
def rollout(vstate, rng, horizon):
    def body(carry, _):
        vstate, rng = carry
        rng, sub = jax.random.split(rng)
        a = jax.random.uniform(sub, (n, env.action_size))
        vstate = v_step(vstate, a)
        return (vstate, rng), vstate.reward

    (vstate, _), rewards = jax.lax.scan(body, (vstate, rng), None,
                                        length=horizon)
    return vstate, rewards

vstate, rewards = jax.jit(rollout, static_argnums=2)(
    vstate, jax.random.PRNGKey(2), 8 if SMOKE else 100)
print("scan rollout rewards:", rewards.shape, float(rewards.mean()))
