"""Locomotion baseline trainer for MtxLegWalk-v0.

Trains PPO on the walk task (optionally on a reward-shaped variant for
curriculum) and always evaluates on the STANDARD MtxLegWalk-v0 with the
reference's strict success criterion (vel_reward >= 1.0 for >5 steps,
/root/reference/myosuite/envs/myo/myobase/walk_v0.py:312 +
env_base.py:798-824). Reports per-episode return, solved steps, distance
traveled and upright time so a "walking" claim is backed by numbers.

Run on the TPU chip:
  python tools/train_walk.py --tag base --num_timesteps 60000000
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_overrides(pairs):
  out = {}
  for p in pairs or ():
    k, v = p.split("=", 1)
    try:
      v = float(v) if "." in v or "e" in v.lower() else int(v)
    except ValueError:
      pass
    out[k] = v
  return out


def build_eval(env, ppo, n_episodes):
  """Final eval: episodes terminate at done; returns per-episode stats."""
  pol = ppo.make_policy_fn(deterministic=True)
  horizon = env.max_episode_steps

  def one_episode(ts, rng):
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

    (_, solved, _, dist), (rewards, alive_mask) = jax.lax.scan(
        body, (state, jnp.int32(0), jnp.float32(1.0), jnp.float32(0.0)),
        None, length=horizon)
    return (jnp.sum(rewards), solved, dist, jnp.sum(alive_mask))

  def evaluate(ts, rng):
    rngs = jax.random.split(rng, n_episodes)
    return jax.vmap(lambda r: one_episode(ts, r))(rngs)

  return jax.jit(evaluate)


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--tag", required=True)
  p.add_argument("--num_timesteps", type=int, default=60_000_000)
  p.add_argument("--num_envs", type=int, default=4096)
  p.add_argument("--num_evals", type=int, default=20)
  p.add_argument("--lr", type=float, default=3e-4)
  p.add_argument("--lr_schedule", choices=["constant", "cosine"],
                 default="constant")
  p.add_argument("--entropy", type=float, default=1e-3)
  p.add_argument("--reward_scaling", type=float, default=1.0)
  p.add_argument("--discounting", type=float, default=0.97)
  p.add_argument("--unroll", type=int, default=10)
  p.add_argument("--hidden", default="64,64,64")
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--episode_steps", type=int, default=0,
                 help="training-time episode cap (0 = env default)")
  p.add_argument("--override", nargs="*", default=[],
                 help="training-env config overrides, dot.path=value")
  p.add_argument("--eval_episodes", type=int, default=32)
  p.add_argument("--save_ckpt", action="store_true")
  p.add_argument("--init_ckpt", default=None,
                 help="warm-start learner from this checkpoint dir "
                      "(e.g. a MtxLegStand balance policy — same "
                      "obs/action space; stand->walk curriculum)")
  args = p.parse_args()

  from myosuite_tpu.utils import jax_cache_dir
  if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

  import myosuite_tpu
  from myosuite_tpu.envs import registry
  from myosuite_tpu.train import callbacks as cb
  from myosuite_tpu.train import checkpoint
  from myosuite_tpu.train import ppo as ppo_mod

  overrides = parse_overrides(args.override)
  if args.episode_steps:
    overrides["max_episode_steps"] = args.episode_steps
  if overrides:
    train_id = registry.register_env_variant(
        "MtxLegWalk-v0", overrides, variant_id=f"MtxLegWalkTrain_{args.tag}-v0",
        silent=True)
  else:
    train_id = "MtxLegWalk-v0"
  train_env = myosuite_tpu.make(train_id)
  eval_env = myosuite_tpu.make("MtxLegWalk-v0")

  cfg = ppo_mod.default_config()
  cfg.num_timesteps = args.num_timesteps
  cfg.num_envs = args.num_envs
  cfg.num_evals = args.num_evals
  cfg.learning_rate = args.lr
  cfg.lr_schedule = args.lr_schedule
  cfg.entropy_cost = args.entropy
  cfg.reward_scaling = args.reward_scaling
  cfg.discounting = args.discounting
  cfg.unroll_length = args.unroll
  cfg.policy_hidden = tuple(int(x) for x in args.hidden.split(","))
  cfg.value_hidden = cfg.policy_hidden
  cfg.seed = args.seed

  eval_cb = cb.EvalCallback(eval_env, num_episodes=16, every=2)
  init_transform = None
  if args.init_ckpt:
    def init_transform(ppo, ts):
      print(f"warm start from {args.init_ckpt}", flush=True)
      # keep the pretrained policy/value/obs_stats but reset the step
      # budget and optimizer so the new task trains at full length
      ts = checkpoint.restore_learner(args.init_ckpt, ts, skip_opt=True)
      return ts.replace(env_steps=jax.numpy.zeros_like(ts.env_steps))
  t0 = time.time()
  ppo, ts, stats = ppo_mod.train(
      train_env, cfg, callbacks=[cb.InfoCallback(), eval_cb],
      init_transform=init_transform)

  final_eval = build_eval(eval_env, ppo, args.eval_episodes)
  ret, solved, dist, alive = jax.device_get(
      final_eval(ts, jax.random.PRNGKey(123)))
  ctrl_dt = eval_env.ctrl_dt if hasattr(eval_env, "ctrl_dt") else 0.02
  result = {
      "tag": args.tag,
      "argv": sys.argv[1:],
      "steps": stats["steps"],
      "wall_clock": stats["wall_clock"],
      "eval_return_mean": float(np.mean(ret)),
      "success_rate_strict": float(np.mean(solved > 5)),
      "solved_steps_mean": float(np.mean(solved)),
      "distance_mean_m": float(np.mean(dist)),
      "distance_p90_m": float(np.percentile(dist, 90)),
      "upright_steps_mean": float(np.mean(alive)),
      "upright_time_mean_s": float(np.mean(alive) * ctrl_dt),
      "history": eval_cb.history,
  }
  outdir = os.path.join(os.path.dirname(__file__), "walk_runs")
  os.makedirs(outdir, exist_ok=True)
  with open(os.path.join(outdir, f"{args.tag}.json"), "w") as f:
    json.dump(result, f, indent=2)
  print(json.dumps({k: v for k, v in result.items() if k != "history"},
                   indent=2), flush=True)
  if args.save_ckpt:
    ck = os.path.abspath(os.path.join(outdir, f"{args.tag}_ckpt"))
    checkpoint.save(ck, ts, step=stats["steps"], learner_only=True)
    print("checkpoint:", ck, flush=True)
  os._exit(0)


if __name__ == "__main__":
  main()
