"""Training sweep launcher: envs x seeds with per-job configs/outputs.

Role-equivalent of the reference's hydra launchers + train_myosuite.sh
(/root/reference/myosuite/agents/hydra_mjrl_launcher.py,
train_myosuite.sh:1-50): sweep a suite of env ids over seeds, one output
directory per job with config.json / metrics.jsonl / checkpoints. Jobs run
sequentially on the local accelerator (a slurm/job-array analog would fan
these out; each job is independent, the reference's only multi-node
pattern, SURVEY.md section 2.7).

Usage:
  python -m myosuite_tpu.agents.launcher --envs MtxElbowPoseRandom-v0 \
      MtxFingerPoseRandom-v0 --seeds 0 1 2 --num_timesteps 2000000 \
      --output_dir /tmp/sweep
"""

from __future__ import annotations

import argparse
import json
import os


def run_job(env_name: str, seed: int, out_dir: str, num_timesteps: int,
            num_envs: int, num_evals: int, algo: str = "ppo") -> dict:
  import jax

  import myosuite_tpu
  from myosuite_tpu.train import callbacks as cb
  from myosuite_tpu.train import ppo as ppo_mod

  os.makedirs(out_dir, exist_ok=True)
  env = myosuite_tpu.make(env_name)

  if algo in ("sac", "npg"):
    # off-policy / natural-gradient stacks share the simple driver API
    from myosuite_tpu.train import npg as npg_mod
    from myosuite_tpu.train import sac as sac_mod
    mod = sac_mod if algo == "sac" else npg_mod
    cfg = mod.default_config()
    cfg.num_timesteps = num_timesteps
    cfg.num_envs = num_envs
    cfg.num_evals = num_evals
    cfg.seed = seed
    with open(os.path.join(out_dir, "config.json"), "w") as f:
      json.dump({"env": env_name, "seed": seed, "algo": algo,
                 **cfg.to_dict()}, f, indent=2)
    metrics_path = os.path.join(out_dir, "metrics.jsonl")

    def progress(steps, m):
      with open(metrics_path, "a") as f:
        f.write(json.dumps({"steps": steps,
                            **{k: float(v) for k, v in m.items()}}) + "\n")

    trainer, ts = mod.train(env, cfg, progress_fn=progress)
    from myosuite_tpu.train import checkpoint
    checkpoint.save(os.path.join(out_dir, "final"), ts,
                    step=int(ts.env_steps))
    result = {"env": env_name, "seed": seed, "algo": algo,
              "steps": int(ts.env_steps)}
    with open(os.path.join(out_dir, "result.json"), "w") as f:
      json.dump(result, f, indent=2)
    return result

  cfg = ppo_mod.default_config()
  cfg.num_timesteps = num_timesteps
  cfg.num_envs = num_envs
  cfg.num_evals = num_evals
  cfg.seed = seed
  with open(os.path.join(out_dir, "config.json"), "w") as f:
    json.dump({"env": env_name, "seed": seed, **cfg.to_dict()}, f, indent=2)

  metrics_path = os.path.join(out_dir, "metrics.jsonl")
  eval_cb = cb.EvalCallback(env, num_episodes=8, every=max(num_evals // 5, 1))
  cbs = [cb.InfoCallback(log_file=os.path.join(out_dir, "train.log")),
         cb.FallbackCheckpoint(os.path.join(out_dir, "ckpt"),
                               every=max(num_evals // 3, 1)),
         eval_cb]

  def progress(steps, m):
    with open(metrics_path, "a") as f:
      f.write(json.dumps({"steps": steps,
                          **{k: float(v) for k, v in m.items()}}) + "\n")

  ppo, ts, stats = ppo_mod.train(env, cfg, progress_fn=progress,
                                 callbacks=cbs)
  from myosuite_tpu.train import checkpoint
  checkpoint.save(os.path.join(out_dir, "final"), ts, step=stats["steps"])
  result = {**stats, "env": env_name, "seed": seed,
            "eval_history": eval_cb.history}
  with open(os.path.join(out_dir, "result.json"), "w") as f:
    json.dump(result, f, indent=2)
  return result


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("--envs", nargs="+", required=True)
  parser.add_argument("--seeds", nargs="+", type=int, default=[0])
  parser.add_argument("--num_timesteps", type=int, default=5_000_000)
  parser.add_argument("--num_envs", type=int, default=2048)
  parser.add_argument("--num_evals", type=int, default=20)
  parser.add_argument("--output_dir", default="./sweep_output")
  parser.add_argument("--algo", choices=("ppo", "sac", "npg"),
                      default="ppo")
  args = parser.parse_args(argv)

  results = []
  for env_name in args.envs:
    for seed in args.seeds:
      out = os.path.join(args.output_dir,
                         f"{env_name.replace('-', '_')}_seed{seed}")
      print(f"=== {env_name} seed {seed} -> {out}")
      results.append(run_job(env_name, seed, out, args.num_timesteps,
                             args.num_envs, args.num_evals, args.algo))
  print(json.dumps([{k: v for k, v in r.items() if k != "eval_history"}
                    for r in results], indent=2))
  os._exit(0)  # bypass slow TPU-plugin atexit teardown


if __name__ == "__main__":
  main()
