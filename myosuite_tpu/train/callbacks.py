"""Training callbacks: info logging, fallback checkpoints, periodic eval.

Role-equivalent of the reference's SB3 callbacks
(/root/reference/myosuite/agents/in_callbacks.py:20-107): InfoCallback
(metric logging), FallbackCheckpoint (crash-resume aid — the reference's
only elastic-recovery mechanism, SURVEY.md section 5), EvalCallback
(periodic deterministic rollouts reporting success%), and
SaveSuccesses (stop/flag on success threshold, curriculum_utils role).

Callbacks receive (iteration, env_steps, metrics, ppo, train_state) after
every outer training iteration.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import numpy as np


class Callback:
  def on_iteration(self, it: int, env_steps: int, metrics: Dict,
                   ppo, ts) -> None:
    ...


class InfoCallback(Callback):
  """Print training metrics every `every` iterations (SB3 InfoCallback
  role)."""

  def __init__(self, every: int = 1, log_file: Optional[str] = None):
    self._every = every
    self._log = log_file
    self._t0 = time.time()

  def on_iteration(self, it, env_steps, metrics, ppo, ts):
    if it % self._every:
      return
    sps = env_steps / max(time.time() - self._t0, 1e-9)
    line = (f"iter {it}  steps {env_steps:,}  {sps:,.0f} steps/s  "
            + "  ".join(f"{k}={float(v):.4g}" for k, v in
                        sorted(metrics.items())))
    print(line, flush=True)
    if self._log:
      with open(self._log, "a") as f:
        f.write(line + "\n")


class FallbackCheckpoint(Callback):
  """Periodically save the train state so a crashed run resumes
  (reference FallbackCheckpoint, in_callbacks.py:38-47)."""

  def __init__(self, ckpt_dir: str, every: int = 10,
               learner_only: bool = False):
    self._dir = ckpt_dir
    self._every = every
    self._learner_only = learner_only

  def on_iteration(self, it, env_steps, metrics, ppo, ts):
    if it % self._every:
      return
    from myosuite_tpu.train import checkpoint
    os.makedirs(self._dir, exist_ok=True)
    checkpoint.save(self._dir, ts, step=env_steps,
                    learner_only=self._learner_only)


class EvalCallback(Callback):
  """Deterministic eval episodes reporting success% (solved >5 steps =>
  success, env_base.py:798-824 semantics)."""

  def __init__(self, env, num_episodes: int = 8, every: int = 5):
    self._env = env
    self._n = num_episodes
    self._every = every
    self._eval_fn = None
    self.history: List[Dict] = []

  def _build(self, ppo):
    import jax
    import jax.numpy as jnp

    env = self._env
    pol = ppo.make_policy_fn(deterministic=True)
    horizon = env.max_episode_steps

    def one_episode(ts, rng):
      state = env.reset(rng)

      def body(carry, _):
        st, solved_steps, alive = carry
        act = pol(ts, st.obs["state"])
        st = env.step(st, act)
        # Episodes end at `done` (env_base.py:798-824 truncates paths on
        # done): steps after termination contribute neither reward nor
        # solved counts.
        solved_steps = solved_steps + jnp.int32(
            alive * (st.metrics.get("solved", jnp.float32(0.0)) > 0))
        reward = st.reward * alive
        alive = alive * (1.0 - st.done)
        return (st, solved_steps, alive), reward

      (state, solved_steps, _), rewards = jax.lax.scan(
          body, (state, jnp.int32(0), jnp.float32(1.0)), None,
          length=horizon)
      return jnp.sum(rewards), solved_steps

    def evaluate(ts, rng):
      rngs = jax.random.split(rng, self._n)
      returns, solved = jax.vmap(lambda r: one_episode(ts, r))(rngs)
      return returns.mean(), (solved > 5).mean()

    self._eval_fn = jax.jit(evaluate)

  def on_iteration(self, it, env_steps, metrics, ppo, ts):
    if it % self._every:
      return
    import jax
    if self._eval_fn is None:
      self._build(ppo)
    ret, succ = self._eval_fn(ts, jax.random.PRNGKey(it))
    entry = {"iteration": it, "env_steps": env_steps,
             "eval_return": float(ret), "success_rate": float(succ)}
    self.history.append(entry)
    print(f"  eval@{env_steps:,}: return {entry['eval_return']:.2f}  "
          f"success {100 * entry['success_rate']:.0f}%", flush=True)


class SaveSuccesses(Callback):
  """Record a checkpoint whenever eval success crosses a threshold
  (reference SaveSuccesses role + curriculum_utils threshold scheduler)."""

  def __init__(self, eval_cb: EvalCallback, ckpt_dir: str,
               threshold: float = 0.8):
    self._eval = eval_cb
    self._dir = ckpt_dir
    self._th = threshold
    self._best = 0.0

  def on_iteration(self, it, env_steps, metrics, ppo, ts):
    if not self._eval.history:
      return
    succ = self._eval.history[-1]["success_rate"]
    if succ >= self._th and succ > self._best:
      self._best = succ
      from myosuite_tpu.train import checkpoint
      path = os.path.join(self._dir, f"success_{int(100 * succ)}")
      os.makedirs(path, exist_ok=True)
      checkpoint.save(path, ts, step=env_steps)
      print(f"  saved success checkpoint ({100 * succ:.0f}%): {path}",
            flush=True)


class TensorBoardCallback(Callback):
  """Stream training metrics to TensorBoard event files.

  Role of the reference MJX trainer's wandb logging
  (/root/reference/myosuite/envs/myo/mjx/train_jax_ppo.py:25-27,78) using
  the locally-available backend; wandb itself is an optional external
  service. No-ops with a warning if tensorboard is not importable.
  """

  def __init__(self, log_dir: str):
    try:
      from torch.utils.tensorboard import SummaryWriter
      self._writer = SummaryWriter(log_dir)
    except Exception as e:  # pragma: no cover - depends on install
      import warnings
      warnings.warn(f"tensorboard unavailable ({e}); metrics not streamed")
      self._writer = None

  def on_iteration(self, it, env_steps, metrics, ppo, ts):
    if self._writer is None:
      return
    for k, v in metrics.items():
      try:
        self._writer.add_scalar(f"train/{k}", float(v), env_steps)
      except (TypeError, ValueError):
        pass
    self._writer.flush()

  def close(self):
    if self._writer is not None:
      self._writer.close()
