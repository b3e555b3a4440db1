"""examine_logs CLI: inspect / replay saved rollout traces.

Role-equivalent of the reference CLI
(/root/reference/myosuite/logger/examine_logs.py:132): load an h5/pickle
Trace, print its structure, and optionally (a) recompute rewards by
replaying logged qpos/qvel through an env's reward pipeline or (b) render
the logged states to an mp4.

Usage:
  python -m myosuite_tpu.logger.examine_logs -t rollouts.h5 [-e <env id>]
      [--video out.mp4] [--mode print|playback|render]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def playback(env, trace, group: str):
  """Replay logged qpos/qvel through the env's physics-derived pipeline,
  returning recomputed per-step rewards (reference examine_logs playback
  mode)."""
  import jax
  import jax.numpy as jnp

  from myosuite_tpu.physics import forward as F
  from myosuite_tpu.physics import io as pio

  qpos = np.asarray(trace[group]["qpos"])
  qvel = np.asarray(trace[group]["qvel"])
  m = env.model
  d0 = pio.make_data(m)

  @jax.jit
  def settle(qp, qv):
    d = d0.replace(qpos=qp, qvel=qv)
    d = F.fwd_position(m, d)
    d = F.fwd_velocity(m, d)
    return d

  state = env.reset(jax.random.PRNGKey(0))
  rewards = []
  for t in range(qpos.shape[0]):
    d = settle(jnp.asarray(qpos[t]), jnp.asarray(qvel[t]))
    r = env._get_rewards(d, state.info)
    rewards.append({k: float(v) for k, v in r.items()})
  return rewards


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("-t", "--trace", required=True)
  parser.add_argument("-e", "--env_name", default=None)
  parser.add_argument("--mode", default="print",
                      choices=["print", "playback", "render"])
  parser.add_argument("--video", default=None)
  args = parser.parse_args(argv)

  from myosuite_tpu.logger.trace import Trace

  tr = Trace.load(args.trace)
  print(tr)

  if args.mode == "playback":
    assert args.env_name, "--env_name required for playback"
    import myosuite_tpu
    env = myosuite_tpu.make(args.env_name)
    for group in tr.keys():
      if "qpos" not in tr[group]:
        print(f"{group}: no qpos stream, skipping")
        continue
      rewards = playback(env, tr, group)
      total = sum(sum(r.values()) for r in rewards)
      print(f"{group}: {len(rewards)} steps, recomputed reward sum "
            f"{total:.3f}")

  if args.mode == "render" or args.video:
    assert args.env_name, "--env_name required for render"
    import jax.numpy as jnp

    import myosuite_tpu
    from myosuite_tpu.renderer import render_qpos_sequence
    env = myosuite_tpu.make(args.env_name)
    group = next(iter(tr.keys()))
    qpos = np.asarray(tr[group]["qpos"])
    out = args.video or "examine_logs.mp4"
    render_qpos_sequence(env, qpos, out, fps=int(1.0 / env.dt))
    print(f"saved video: {out}")

  os._exit(0)  # bypass slow TPU-plugin atexit teardown


if __name__ == "__main__":
  main()
