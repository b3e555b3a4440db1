"""Evaluate a learner checkpoint on MtxLegWalk-v0 (honest metrics)."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, os, sys
import jax, jax.numpy as jnp, numpy as np
from myosuite_tpu.utils import jax_cache_dir
jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import myosuite_tpu
from myosuite_tpu.train import checkpoint, ppo as ppo_mod

ckpt = sys.argv[1]
env = myosuite_tpu.make("MtxLegWalk-v0")
cfg = ppo_mod.default_config()
cfg.num_envs = 4
ppo = ppo_mod.PPO(env, cfg)
ts = ppo.init(jax.random.PRNGKey(0))
ts = checkpoint.restore_learner(ckpt, ts, skip_opt=True)
pol = ppo.make_policy_fn(deterministic=True)
horizon = env.max_episode_steps

def one_episode(rng):
    state = env.reset(rng)
    def body(carry, _):
        st, solved, alive, dist = carry
        st = env.step(st, pol(ts, st.obs["state"]))
        solved = solved + jnp.int32(alive * (st.metrics["solved"] > 0))
        reward = st.reward * alive
        dist = jnp.where(alive > 0, st.metrics["distance"], dist)
        alive_steps = alive
        alive = alive * (1.0 - st.done)
        return (st, solved, alive, dist), (reward, alive_steps)
    (_, solved, _, dist), (rew, alive) = jax.lax.scan(
        body, (state, jnp.int32(0), jnp.float32(1.0), jnp.float32(0.0)),
        None, length=horizon)
    return jnp.sum(rew), solved, dist, jnp.sum(alive)

ret, solved, dist, alive = jax.device_get(jax.jit(
    lambda r: jax.vmap(one_episode)(jax.random.split(r, 32)))(
        jax.random.PRNGKey(123)))
out = {
    "eval_return": float(np.mean(ret)),
    "success_rate": float(np.mean(solved > 5)),
    "solved_steps_mean": float(np.mean(solved)),
    "distance_mean_m": float(np.mean(dist)),
    "upright_steps_mean": float(np.mean(alive)),
    "upright_time_mean_s": float(np.mean(alive) * 0.02),
    "horizon": int(horizon),
}
print(json.dumps(out, indent=1))
with open("/tmp/walk_eval.json", "w") as f:
    json.dump(out, f)
os._exit(0)
