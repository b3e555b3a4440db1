"""Train and save the pre-trained baseline checkpoints shipped in
myosuite_tpu/agents/pretrained/ (the reference ships NPG policy pickles
per env, /root/reference/myosuite/agents/baslines_NPG/).

Run on the TPU chip:
  python tools/train_baselines.py --envs MtxElbowPoseRandom-v0 \
      --num_timesteps 4000000
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import json
import os

import jax

from myosuite_tpu.utils import jax_cache_dir

# machine-keyed cache: cross-machine XLA:CPU AOT entries execute wrong
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
  jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--envs", nargs="+", default=["MtxElbowPoseRandom-v0",
                                               "MtxFingerPoseRandom-v0"])
  p.add_argument("--num_timesteps", type=int, default=4_000_000)
  p.add_argument("--num_envs", type=int, default=2048)
  p.add_argument("--num_evals", type=int, default=10,
                 help="outer eval points; also bounds each jitted train "
                      "call's device time (long single calls can trip "
                      "remote-TPU watchdogs)")
  p.add_argument("--out", default=None)
  p.add_argument("--lr", type=float, default=3e-4)
  p.add_argument("--lr_schedule", choices=["constant", "cosine"],
                 default="constant")
  p.add_argument("--entropy", type=float, default=1e-3)
  p.add_argument("--hidden", default="64,64,64")
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--eval_episodes", type=int, default=16)
  args = p.parse_args()

  import jax

  import myosuite_tpu
  from myosuite_tpu.train import callbacks as cb
  from myosuite_tpu.train import checkpoint
  from myosuite_tpu.train import ppo as ppo_mod

  root = args.out or os.path.join(
      os.path.dirname(__file__), "..", "myosuite_tpu", "agents", "pretrained")
  summary = {}
  for env_name in args.envs:
    print(f"=== training {env_name}", flush=True)
    env = myosuite_tpu.make(env_name)
    cfg = ppo_mod.default_config()
    cfg.num_timesteps = args.num_timesteps
    cfg.num_envs = args.num_envs
    cfg.num_evals = args.num_evals
    cfg.learning_rate = args.lr
    cfg.lr_schedule = args.lr_schedule
    cfg.entropy_cost = args.entropy
    cfg.policy_hidden = tuple(int(x) for x in args.hidden.split(","))
    cfg.value_hidden = cfg.policy_hidden
    cfg.seed = args.seed
    eval_cb = cb.EvalCallback(env, num_episodes=args.eval_episodes, every=3)
    out = os.path.abspath(os.path.join(root, env_name.replace("-", "_")))
    # crash resilience: remote-TPU tunnels can die mid-run; keep a rolling
    # learner checkpoint so a near-final policy is never lost
    fallback_cb = cb.FallbackCheckpoint(os.path.join(out, "fallback"),
                                        every=3, learner_only=True)
    ppo, ts, stats = ppo_mod.train(
        env, cfg, callbacks=[cb.InfoCallback(), eval_cb, fallback_cb])
    # final eval so the summary reflects the shipped params
    eval_cb.on_iteration(0, stats["steps"], {}, ppo, ts)
    out = os.path.abspath(os.path.join(root, env_name.replace("-", "_")))
    # learner-only: the shipped artifact is the policy, not the env batch
    checkpoint.save(out, ts, step=stats["steps"], learner_only=True)
    summary[env_name] = {
        "steps": stats["steps"], "wall_clock": stats["wall_clock"],
        "final_eval": eval_cb.history[-1] if eval_cb.history else None}
    with open(os.path.join(root, env_name.replace("-", "_"),
                           "metrics.jsonl"), "w") as f:
      for row in eval_cb.history:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(summary[env_name]), flush=True)
  spath = os.path.join(root, "summary.json")
  if os.path.exists(spath):   # merge: per-env reruns keep other entries
    with open(spath) as f:
      merged = json.load(f)
    merged.update(summary)
    summary = merged
  with open(spath, "w") as f:
    json.dump(summary, f, indent=2)
  print(json.dumps(summary, indent=2))
  os._exit(0)


if __name__ == "__main__":
  main()
