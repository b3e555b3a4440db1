"""PPO trainer: scan-based rollouts, GAE, clipped surrogate — pure JAX.

A ground-up replacement for the brax PPO the reference calls
(/root/reference/myosuite/envs/myo/mjx/train_jax_ppo.py:29-44), with its
hyperparameter anchor (/root/reference/myosuite/envs/myo/mjx/__init__.py:43-67):
50M steps, 4096 envs, lr 3e-4, discount 0.97, GAE 0.95, entropy 1e-3,
clip 0.3, unroll 10, 32 minibatches, 8 update epochs, 3x64 MLPs, observation
normalization.

TPU-first: the entire training epoch (rollout scan over vmapped env.step +
minibatched updates) is ONE jitted function with donated carry; scale-out
shards the env axis over a mesh via shard_map (myosuite_tpu.parallel).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from ml_collections import config_dict

from myosuite_tpu.envs.base import MyoEnv, State
from myosuite_tpu.envs.wrappers import AutoResetWrapper
from myosuite_tpu.train import networks, running_stats


def default_config() -> config_dict.ConfigDict:
  return config_dict.create(
      num_timesteps=50_000_000,
      num_envs=4096,
      learning_rate=3e-4,
      discounting=0.97,
      gae_lambda=0.95,
      entropy_cost=1e-3,
      clipping_epsilon=0.3,
      max_grad_norm=1.0,
      value_loss_coef=0.5,
      unroll_length=10,
      num_minibatches=32,
      num_updates_per_batch=8,
      reward_scaling=1.0,
      # lr_schedule: "constant" or "cosine" (cosine decays to
      # lr_final_scale * learning_rate over the full num_timesteps budget —
      # stabilizes the final policy on pose/reach tasks where a constant lr
      # keeps re-breaking a near-solved policy)
      lr_schedule="constant",
      lr_final_scale=0.05,
      normalize_observations=True,
      policy_hidden=(64, 64, 64),
      value_hidden=(64, 64, 64),
      num_evals=10,
      seed=0,
  )


@struct.dataclass
class TrainState:
  policy_params: Any
  value_params: Any
  opt_state: Any
  obs_stats: running_stats.RunningStats
  env_state: State
  rng: jax.Array
  env_steps: jax.Array


class Transition(NamedTuple):
  obs: jax.Array          # (T, B, obs)
  action: jax.Array       # tanh action in [-1, 1]
  raw_action: jax.Array   # pre-tanh
  log_prob: jax.Array
  reward: jax.Array
  done: jax.Array         # terminal (not truncation)
  truncation: jax.Array
  terminal_obs: jax.Array  # obs before any auto-reset


class PPO:
  """Builds the jitted training epoch for an env."""

  def __init__(self, env: MyoEnv, config: Optional[config_dict.ConfigDict] = None):
    self.env = AutoResetWrapper(env)
    self.cfg = config or default_config()
    self.policy = networks.PolicyNet(action_size=env.action_size,
                                     hidden=tuple(self.cfg.policy_hidden))
    self.value = networks.ValueNet(hidden=tuple(self.cfg.value_hidden))
    if self.cfg.get("lr_schedule", "constant") == "cosine":
      # one optimizer step per minibatch; total over the step budget
      updates_total = max(1, (
          self.cfg.num_timesteps
          // (self.cfg.unroll_length * self.cfg.num_envs)
          * self.cfg.num_updates_per_batch * self.cfg.num_minibatches))
      lr = optax.cosine_decay_schedule(
          self.cfg.learning_rate, updates_total,
          alpha=self.cfg.get("lr_final_scale", 0.05))
    else:
      lr = self.cfg.learning_rate
    # apply_if_finite: a non-finite gradient (diverged rollout, overflow)
    # skips the update instead of poisoning the params with NaN
    self.optimizer = optax.apply_if_finite(optax.chain(
        optax.clip_by_global_norm(self.cfg.max_grad_norm),
        optax.adam(lr),
    ), max_consecutive_errors=100)

  # -- initialization -----------------------------------------------------
  def init(self, rng: jax.Array) -> TrainState:
    cfg = self.cfg
    rng, r_env, r_pol, r_val = jax.random.split(rng, 4)
    env_state = jax.jit(jax.vmap(self.env.reset))(
        jax.random.split(r_env, cfg.num_envs))
    obs_dim = env_state.obs["state"].shape[-1]
    dummy = jnp.zeros((1, obs_dim))
    policy_params = self.policy.init(r_pol, dummy)
    value_params = self.value.init(r_val, dummy)
    opt_state = self.optimizer.init((policy_params, value_params))
    return TrainState(
        policy_params=policy_params, value_params=value_params,
        opt_state=opt_state, obs_stats=running_stats.init(obs_dim),
        env_state=env_state, rng=rng, env_steps=jnp.int64(0)
        if jax.config.jax_enable_x64 else jnp.int32(0))

  # -- rollout ------------------------------------------------------------
  def _norm_obs(self, stats, obs):
    if not self.cfg.normalize_observations:
      return obs
    return running_stats.normalize(stats, obs)

  def _rollout(self, ts: TrainState) -> Tuple[TrainState, Transition]:
    cfg = self.cfg
    v_step = jax.vmap(self.env.step)

    def one_step(carry, _):
      env_state, rng, stats = carry
      rng, sub = jax.random.split(rng)
      obs = env_state.obs["state"]
      nobs = self._norm_obs(stats, obs)
      mean, log_std = self.policy.apply(ts.policy_params, nobs)
      action, raw, logp = networks.sample_action_raw(mean, log_std, sub)
      nxt = v_step(env_state, action)
      tr = Transition(
          obs=obs, action=action, raw_action=raw, log_prob=logp,
          reward=nxt.reward * cfg.reward_scaling,
          done=nxt.done * (1.0 - nxt.info["truncation"]),
          truncation=nxt.info["truncation"],
          terminal_obs=nxt.info["terminal_obs"],
      )
      return (nxt, rng, stats), tr

    (env_state, rng, _), traj = jax.lax.scan(
        one_step, (ts.env_state, ts.rng, ts.obs_stats), None,
        length=cfg.unroll_length)

    stats = ts.obs_stats
    if cfg.normalize_observations:
      stats = running_stats.update(stats, traj.obs)

    steps = ts.env_steps + cfg.unroll_length * cfg.num_envs
    ts = ts.replace(env_state=env_state, rng=rng, obs_stats=stats,
                    env_steps=steps)
    return ts, traj

  # -- advantage ----------------------------------------------------------
  def _gae(self, ts: TrainState, traj: Transition, stats):
    cfg = self.cfg
    vf = lambda obs: self.value.apply(
        ts.value_params, self._norm_obs(stats, obs))
    values = vf(traj.obs)                       # (T, B)
    # bootstrap: value of the state the env actually reached (pre-reset)
    term_values = vf(traj.terminal_obs)

    def scan_fn(carry, xs):
      gae_next, value_next = carry
      value, term_value, reward, done, trunc = xs
      # at a truncation boundary bootstrap from the terminal obs value
      boundary = jnp.maximum(done, trunc)
      v_next = jnp.where(boundary > 0, term_value, value_next)
      nonterminal = 1.0 - done
      delta = reward + cfg.discounting * v_next * nonterminal - value
      gae = delta + (cfg.discounting * cfg.gae_lambda * nonterminal
                     * (1.0 - trunc) * gae_next)
      return (gae, value), gae

    last_val = vf(ts.env_state.obs["state"])
    # iterate in reverse time
    xs = (values, term_values, traj.reward, traj.done, traj.truncation)
    (_, _), advs = jax.lax.scan(
        scan_fn, (jnp.zeros_like(last_val), last_val),
        jax.tree.map(lambda x: x[::-1], xs))
    advs = advs[::-1]
    returns = advs + values
    return advs, returns

  # -- update -------------------------------------------------------------
  def _loss(self, params, batch, obs_stats):
    cfg = self.cfg
    policy_params, value_params = params
    obs, raw_action, old_logp, adv, ret = batch
    nobs = self._norm_obs(obs_stats, obs)
    mean, log_std = self.policy.apply(policy_params, nobs)
    logp = networks.gaussian_tanh_log_prob(mean, log_std, raw_action)
    # clamp the log-ratio: once the policy sharpens, off-policy samples can
    # reach |logp - old_logp| > 80 and exp() overflows to inf; inf * a
    # zero advantage is NaN and one NaN poisons every parameter through
    # the mean. Clipping at e^+-20 leaves the PPO objective untouched
    # inside the trust region (observed: elbow run NaN'd at iter 4).
    ratio = jnp.exp(jnp.clip(logp - old_logp, -20.0, 20.0))
    adv_n = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
    surrogate = -jnp.minimum(
        ratio * adv_n,
        jnp.clip(ratio, 1 - cfg.clipping_epsilon,
                 1 + cfg.clipping_epsilon) * adv_n)
    v = self.value.apply(value_params, nobs)
    v_loss = 0.5 * jnp.mean((ret - v) ** 2)
    entropy = jnp.mean(networks.entropy_estimate(mean, log_std, raw_action))
    total = (jnp.mean(surrogate) + cfg.value_loss_coef * v_loss
             - cfg.entropy_cost * entropy)
    return total, {"policy_loss": jnp.mean(surrogate), "value_loss": v_loss,
                   "entropy": entropy}

  def _update_epoch(self, ts: TrainState, traj: Transition, stats):
    cfg = self.cfg
    advs, rets = self._gae(ts, traj, stats)
    t, b = traj.reward.shape
    flat = lambda x: x.reshape((t * b,) + x.shape[2:])
    dataset = (flat(traj.obs), flat(traj.raw_action), flat(traj.log_prob),
               flat(advs), flat(rets))
    n = t * b
    mb = n // cfg.num_minibatches

    def one_pass(carry, _):
      (pol, val, opt, rng) = carry
      rng, sub = jax.random.split(rng)
      perm = jax.random.permutation(sub, n)
      shuffled = jax.tree.map(lambda x: x[perm], dataset)

      def mb_step(carry2, i):
        pol2, val2, opt2 = carry2
        sl = jax.tree.map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, i * mb, mb), shuffled)
        (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
            (pol2, val2), sl, stats)
        updates, opt2 = self.optimizer.update(grads, opt2, (pol2, val2))
        (pol2, val2) = optax.apply_updates((pol2, val2), updates)
        return (pol2, val2, opt2), aux

      (pol, val, opt), aux = jax.lax.scan(
          mb_step, (pol, val, opt), jnp.arange(cfg.num_minibatches))
      return (pol, val, opt, rng), aux

    (pol, val, opt, rng), aux = jax.lax.scan(
        one_pass, (ts.policy_params, ts.value_params, ts.opt_state, ts.rng),
        None, length=cfg.num_updates_per_batch)
    aux = jax.tree.map(lambda x: x.mean(), aux)
    return ts.replace(policy_params=pol, value_params=val, opt_state=opt,
                      rng=rng), aux

  # -- public API ---------------------------------------------------------
  def training_step(self, ts: TrainState):
    """One rollout + PPO update; jit-compile this (or a scan over it)."""
    # old_logp was computed under the BEHAVIOR-time normalizer; the update
    # must renormalize stored obs with those same stats, or the PPO ratio
    # measures the normalizer shift instead of the policy change (observed:
    # ratio blowups -> entropy-maximizing collapse on the elbow run). The
    # freshly-updated stats only take effect at the next rollout.
    behavior_stats = ts.obs_stats
    ts, traj = self._rollout(ts)
    ts, aux = self._update_epoch(ts, traj, behavior_stats)
    metrics = {
        **aux,
        "reward_per_step": traj.reward.mean(),
        "episode_return": ts.env_state.info["returned_episode_return"].mean(),
    }
    return ts, metrics

  def make_training_fn(self, steps_per_call: int) -> Callable:
    """Jitted function advancing `steps_per_call` training steps."""
    def run(ts):
      def body(carry, _):
        return self.training_step(carry)
      ts, metrics = jax.lax.scan(body, ts, None, length=steps_per_call)
      return ts, jax.tree.map(lambda x: x[-1], metrics)
    return jax.jit(run, donate_argnums=(0,))

  def make_policy_fn(self, deterministic: bool = True) -> Callable:
    def policy_fn(ts: TrainState, obs, rng=None):
      nobs = self._norm_obs(ts.obs_stats, obs)
      mean, log_std = self.policy.apply(ts.policy_params, nobs)
      if deterministic:
        return networks.deterministic_action(mean)
      action, _ = networks.sample_action(mean, log_std, rng)
      return action
    return policy_fn


def train(env: MyoEnv, config: Optional[config_dict.ConfigDict] = None,
          progress_fn: Optional[Callable[[int, Dict], None]] = None,
          callbacks=(), init_transform: Optional[Callable] = None):
  """Convenience training loop (reference train_jax_ppo.py equivalent).

  `callbacks`: train.callbacks.Callback instances invoked after every
  outer iteration (the reference's SB3 in_callbacks role).
  `init_transform(ppo, ts) -> ts`: optional hook applied to the fresh
  TrainState — warm starts / curricula (e.g. restore a learner trained
  on a related task with the same spaces)."""
  ppo = PPO(env, config)
  cfg = ppo.cfg
  ts = ppo.init(jax.random.PRNGKey(cfg.seed))
  if init_transform is not None:
    ts = init_transform(ppo, ts)

  steps_per_call = max(
      1, cfg.num_timesteps // (cfg.num_evals * cfg.unroll_length
                               * cfg.num_envs))
  train_fn = ppo.make_training_fn(steps_per_call)

  t0 = time.time()
  for it in range(cfg.num_evals):
    ts, metrics = train_fn(ts)
    metrics = jax.device_get(metrics)
    env_steps = int(jax.device_get(ts.env_steps))
    if progress_fn:
      progress_fn(env_steps, metrics)
    for cb in callbacks:
      cb.on_iteration(it, env_steps, metrics, ppo, ts)
  wall = time.time() - t0
  return ppo, ts, {"wall_clock": wall,
                   "steps": int(jax.device_get(ts.env_steps))}
