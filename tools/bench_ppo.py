"""PPO training wall-clock benchmark: steps/s and time-to-return vs num_envs.

Role-equivalent of the reference's PPO benchmark harness
(/root/reference/benchmarks/mjx_benchmark_PPO.py:18-70: 5M steps, num_envs
sweep, repeated timed brax-PPO runs). This harness times the native PPO
trainer end-to-end (compile excluded and reported separately), sweeps the
env-batch size, and additionally records time-to-target-return — the
number the reference harness leaves implicit in its wandb curves.

Run on the TPU chip:
  python tools/bench_ppo.py --env MtxElbowPoseRandom-v0 \
      --num_envs 512 1024 2048 4096 8192 --num_timesteps 5000000
Emits one JSON blob and writes tools/bench_ppo_results.json.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import json
import os
import time

import jax
import numpy as np


def run_one(env, num_envs, num_timesteps, target_return, repeats, seed0):
  from myosuite_tpu.train import ppo as ppo_mod

  results = []
  for rep in range(repeats):
    cfg = ppo_mod.default_config()
    cfg.num_timesteps = num_timesteps
    cfg.num_envs = num_envs
    cfg.seed = seed0 + rep
    # fine-grained outer iterations so time-to-return has resolution
    cfg.num_evals = 20
    ppo = ppo_mod.PPO(env, cfg)
    ts = ppo.init(jax.random.PRNGKey(cfg.seed))
    steps_per_call = max(1, cfg.num_timesteps // (
        cfg.num_evals * cfg.unroll_length * cfg.num_envs))
    train_fn = ppo.make_training_fn(steps_per_call)

    # compile (excluded from the timed run, reported separately)
    t0 = time.time()
    ts, _ = jax.block_until_ready(train_fn(ts))
    compile_and_first = time.time() - t0
    warm_steps = int(jax.device_get(ts.env_steps))

    t0 = time.time()
    time_to_target = None
    steps_at_target = None
    for it in range(cfg.num_evals - 1):
      ts, metrics = train_fn(ts)
      ret = float(jax.device_get(metrics["episode_return"]))
      if time_to_target is None and ret >= target_return:
        time_to_target = time.time() - t0
        steps_at_target = int(jax.device_get(ts.env_steps)) - warm_steps
    jax.block_until_ready(ts.env_steps)
    wall = time.time() - t0
    total_steps = int(jax.device_get(ts.env_steps)) - warm_steps
    results.append({
        "repeat": rep,
        "wall_clock_s": wall,
        "compile_plus_first_call_s": compile_and_first,
        "env_steps_timed": total_steps,
        "steps_per_s": total_steps / wall,
        "final_episode_return": ret,
        "time_to_target_return_s": time_to_target,
        "steps_to_target_return": steps_at_target,
    })
    print(json.dumps(results[-1]), flush=True)
  return results


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--env", default="MtxElbowPoseRandom-v0")
  p.add_argument("--num_envs", type=int, nargs="+",
                 default=[512, 1024, 2048, 4096, 8192])
  p.add_argument("--num_timesteps", type=int, default=5_000_000)
  p.add_argument("--target_return", type=float, default=500.0,
                 help="episode return defining 'solved-level' performance "
                      "(elbow pose: ~700 is a 100%%-success policy)")
  p.add_argument("--repeats", type=int, default=1)
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--out", default=None)
  args = p.parse_args()

  from myosuite_tpu.utils import jax_cache_dir
  if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

  import myosuite_tpu

  env = myosuite_tpu.make(args.env)
  sweep = {}
  for n in args.num_envs:
    print(f"=== num_envs={n}", flush=True)
    sweep[n] = run_one(env, n, args.num_timesteps, args.target_return,
                       args.repeats, args.seed)
  blob = {
      "env": args.env,
      "num_timesteps": args.num_timesteps,
      "target_return": args.target_return,
      "device": str(jax.devices()[0]),
      "sweep": sweep,
  }
  out = args.out or os.path.join(os.path.dirname(__file__),
                                 "bench_ppo_results.json")
  with open(out, "w") as f:
    json.dump(blob, f, indent=2)
  print(json.dumps(blob, indent=2))
  os._exit(0)


if __name__ == "__main__":
  main()
