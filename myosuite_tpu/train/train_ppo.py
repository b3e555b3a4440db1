"""Training CLI: PPO on any registered env, with checkpointing.

Role-equivalent of the reference's launcher
(/root/reference/myosuite/envs/myo/mjx/train_jax_ppo.py): pick an env,
train with the anchored PPO config, log progress, save checkpoints.

Usage:
  python -m myosuite_tpu.train.train_ppo -e MtxElbowPoseRandom-v0 \
      --num_timesteps 5000000 --num_envs 2048 [--ckpt /tmp/ckpt]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("-e", "--env_name", default="MtxElbowPoseRandom-v0")
  parser.add_argument("--num_timesteps", type=int, default=50_000_000)
  parser.add_argument("--num_envs", type=int, default=4096)
  parser.add_argument("--unroll_length", type=int, default=10)
  parser.add_argument("--num_minibatches", type=int, default=32)
  parser.add_argument("--learning_rate", type=float, default=3e-4)
  parser.add_argument("--num_evals", type=int, default=16)
  parser.add_argument("--seed", type=int, default=0)
  parser.add_argument("--ckpt", default=None, help="checkpoint dir")
  parser.add_argument("--mesh", action="store_true",
                      help="shard env axis over all devices")
  args = parser.parse_args(argv)

  import jax

  import myosuite_tpu
  from myosuite_tpu.train import ppo as ppo_mod

  env = myosuite_tpu.make(args.env_name)
  cfg = ppo_mod.default_config()
  cfg.num_timesteps = args.num_timesteps
  cfg.num_envs = args.num_envs
  cfg.unroll_length = args.unroll_length
  cfg.num_minibatches = args.num_minibatches
  cfg.learning_rate = args.learning_rate
  cfg.num_evals = args.num_evals
  cfg.seed = args.seed

  ppo = ppo_mod.PPO(env, cfg)
  ts = ppo.init(jax.random.PRNGKey(cfg.seed))

  steps_per_call = max(1, cfg.num_timesteps // (
      cfg.num_evals * cfg.unroll_length * cfg.num_envs))

  if args.mesh and jax.device_count() > 1:
    from myosuite_tpu.parallel import mesh as mesh_mod
    mesh = mesh_mod.make_mesh()
    ts = mesh_mod.place(ts, ppo, mesh)
    train_fn = mesh_mod.make_distributed_training_fn(
        ppo, ts, mesh, steps_per_call)
  else:
    train_fn = ppo.make_training_fn(steps_per_call)

  print(f"training {args.env_name}: {cfg.num_timesteps:,} steps, "
        f"{cfg.num_envs} envs, {jax.device_count()} device(s)", flush=True)
  t0 = time.time()
  compile_done = None
  for it in range(cfg.num_evals):
    ts, metrics = train_fn(ts)
    jax.block_until_ready(ts.policy_params)
    if compile_done is None:
      compile_done = time.time()
      print(f"[jit {compile_done - t0:.0f}s]", flush=True)
    steps = int(jax.device_get(ts.env_steps))
    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    sps = steps / max(time.time() - compile_done, 1e-9)
    print(f"steps={steps:,} ep_return={m['episode_return']:.2f} "
          f"reward/step={m['reward_per_step']:.3f} "
          f"entropy={m['entropy']:.2f} ({sps:,.0f} steps/s)", flush=True)
    if args.ckpt:
      from myosuite_tpu.train import checkpoint
      checkpoint.save(args.ckpt, jax.device_get(ts), step=steps)

  wall = time.time() - t0
  print(json.dumps({"env": args.env_name,
                    "steps": int(jax.device_get(ts.env_steps)),
                    "wall_clock_s": round(wall, 1)}), flush=True)
  os._exit(0)  # bypass slow TPU-plugin atexit teardown


if __name__ == "__main__":
  main()
