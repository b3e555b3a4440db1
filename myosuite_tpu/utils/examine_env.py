"""examine_env CLI: roll out a policy on an env, report success%, save
traces and videos.

Role-equivalent of the reference CLI
(/root/reference/myosuite/utils/examine_env.py:45-126): load env + policy
(random, checkpoint directory, or zero), run N episodes, print success%
(solved for >5 steps per episode => success, env_base.py:798-824), save an
h5 Trace and optionally an mp4.

Usage:
  python -m myosuite_tpu.utils.examine_env -e MtxElbowPoseRandom-v0 \
      -n 5 [-p <ppo checkpoint dir>] [--video out.mp4] [--trace out.h5]
"""

from __future__ import annotations

import argparse
import os


def rollout_episodes(env, policy_fn, num_episodes: int, horizon: int,
                     seed: int = 0, collect_data: bool = False,
                     viewer=None):
  """Host-driven episode loop; returns (paths, success_rate).

  `viewer`: optional renderer.PassiveViewer — each step is displayed in
  the interactive window (reference examine_policy onscreen mode)."""
  import jax
  import jax.numpy as jnp
  import numpy as np

  reset = jax.jit(env.reset)
  step = jax.jit(env.step)

  paths = []
  successes = 0
  rng = jax.random.PRNGKey(seed)
  for ep in range(num_episodes):
    rng, r = jax.random.split(rng)
    state = reset(r)
    solved_steps = 0
    path = {"obs": [], "reward": [], "solved": [], "data": []}
    for t in range(horizon):
      rng, ra = jax.random.split(rng)
      act = policy_fn(state.obs["state"], ra)
      state = step(state, act)
      path["obs"].append(np.asarray(state.obs["state"]))
      path["reward"].append(float(state.reward))
      solved = float(state.metrics.get("solved", 0.0))
      path["solved"].append(solved)
      solved_steps += solved > 0
      if collect_data:
        path["data"].append(jax.device_get(state.data))
      if viewer is not None:
        if not viewer.is_running():
          break
        viewer.sync(state.data)
      if float(state.done) > 0:
        break
    # success = solved held for > 5 steps (reference evaluate_success)
    if solved_steps > 5:
      successes += 1
    paths.append(path)
  return paths, successes / max(num_episodes, 1)


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("-e", "--env_name", required=True)
  parser.add_argument("-p", "--policy_path", default=None,
                      help="PPO checkpoint dir (None => random policy)")
  parser.add_argument("-n", "--num_episodes", type=int, default=3)
  parser.add_argument("--horizon", type=int, default=None)
  parser.add_argument("--seed", type=int, default=0)
  parser.add_argument("--trace", default=None, help="save rollout h5 here")
  parser.add_argument("--video", default=None, help="save mp4 here")
  parser.add_argument("--render", default="none",
                      choices=["none", "onscreen"],
                      help="onscreen: interactive passive-viewer window "
                           "(reference mj_renderer.py:50-79 role)")
  args = parser.parse_args(argv)

  import jax
  import jax.numpy as jnp
  import numpy as np

  import myosuite_tpu

  env = myosuite_tpu.make(args.env_name)
  horizon = args.horizon or env.max_episode_steps

  if args.policy_path:
    from myosuite_tpu.train import checkpoint, ppo as ppo_mod
    ppo = ppo_mod.PPO(env)
    ts = ppo.init(jax.random.PRNGKey(0))
    try:   # shipped pretrained artifacts are learner-only checkpoints
      ts = checkpoint.restore_learner(args.policy_path, ts)
    except Exception:
      ts = checkpoint.restore(args.policy_path, ts)
    pol = ppo.make_policy_fn(deterministic=True)
    policy_fn = jax.jit(lambda obs, rng: pol(ts, obs))
  else:
    nu = env.action_size
    policy_fn = jax.jit(
        lambda obs, rng: jax.random.uniform(rng, (nu,), minval=-1.0,
                                            maxval=1.0))

  viewer = None
  if args.render == "onscreen":
    from myosuite_tpu.renderer import PassiveViewer
    try:
      viewer = PassiveViewer(env)
    except Exception as e:   # headless box: report and fall back
      print(f"onscreen viewer unavailable ({e}); running headless")

  collect = bool(args.video)
  paths, success = rollout_episodes(env, policy_fn, args.num_episodes,
                                    horizon, args.seed, collect,
                                    viewer=viewer)
  if viewer is not None:
    viewer.close()
  rewards = [float(np.sum(p["reward"])) for p in paths]
  print(f"episodes: {len(paths)}  success%: {100*success:.1f}  "
        f"mean return: {np.mean(rewards):.2f}")

  if args.trace:
    from myosuite_tpu.logger.trace import Trace
    tr = Trace("rollouts")
    for i, p in enumerate(paths):
      tr.create_group(f"rollout{i}")
      tr.trace[f"rollout{i}"]["observations"] = np.stack(p["obs"])
      tr.trace[f"rollout{i}"]["rewards"] = np.asarray(p["reward"])
      tr.trace[f"rollout{i}"]["solved"] = np.asarray(p["solved"])
    tr.save(args.trace)
    print(f"saved trace: {args.trace}")

  if args.video:
    from myosuite_tpu.renderer import render_rollout
    datas = [d for p in paths for d in p["data"]]
    render_rollout(env, datas, args.video, fps=int(1.0 / env.dt))
    print(f"saved video: {args.video}")

  os._exit(0)  # bypass slow TPU-plugin atexit teardown


if __name__ == "__main__":
  main()
