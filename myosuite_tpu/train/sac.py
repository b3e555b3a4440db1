"""SAC trainer: off-policy soft actor-critic with a device-resident replay
buffer — pure JAX, one jitted epoch.

Role parity: the reference ships SB3 SAC job configs as one of its five RL
stacks (/root/reference/myosuite/agents/hydra_sb3_launcher.py, SB3 configs
under /root/reference/myosuite/agents/config/). This is the TPU-native
equivalent: instead of subprocess vec-envs feeding a torch learner, the
replay buffer lives in device memory, collection is a `lax.scan` over the
vmapped env step, and the (collect + N gradient updates + soft target
update) epoch is ONE jitted function with a donated carry. Haiku-style
hyperparameters anchor to SB3 defaults (tau 0.005, discount 0.99,
lr 3e-4, batch 256, auto-tuned entropy temperature).

Networks are shared with PPO (`train/networks.py`): tanh-squashed diagonal
Gaussian policy; twin Q critics defined here.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct
from ml_collections import config_dict

from myosuite_tpu.envs.base import MyoEnv, State
from myosuite_tpu.envs.wrappers import AutoResetWrapper
from myosuite_tpu.train import networks, running_stats


def default_config() -> config_dict.ConfigDict:
  return config_dict.create(
      num_timesteps=2_000_000,
      num_envs=256,              # parallel collectors
      unroll_length=4,           # env steps per epoch (per env)
      learning_rate=3e-4,
      discounting=0.99,
      tau=0.005,                 # soft target-update rate
      batch_size=256,
      grad_updates_per_epoch=8,
      replay_capacity=2 ** 18,
      learning_starts=10_000,    # env steps before updates begin
      reward_scaling=1.0,
      normalize_observations=True,
      policy_hidden=(256, 256),
      q_hidden=(256, 256),
      init_alpha=1.0,
      # target entropy = -action_size * target_entropy_scale
      target_entropy_scale=0.5,
      num_evals=10,
      seed=0,
  )


class QNet(nn.Module):
  """Twin Q(s, a) critics evaluated in one module (vmapped ensemble)."""
  hidden: Tuple[int, ...] = (256, 256)

  @nn.compact
  def __call__(self, obs, action):
    x = jnp.concatenate([obs, action], axis=-1)
    outs = []
    for j in range(2):
      h = x
      for i, f in enumerate(self.hidden):
        h = nn.swish(nn.Dense(f, name=f"q{j}_dense_{i}")(h))
      outs.append(nn.Dense(1, name=f"q{j}_out")(h).squeeze(-1))
    return jnp.stack(outs, axis=0)  # (2, ...)


@struct.dataclass
class ReplayBuffer:
  """Fixed-capacity ring buffer of transitions, resident in device memory.

  Rows are inserted in aligned blocks of (unroll_length * num_envs) via
  `lax.dynamic_update_slice_in_dim`, so capacity must be a multiple of the
  block size; `ptr` counts blocks, `size` counts valid rows.
  """
  obs: jax.Array        # (C, obs_dim)
  action: jax.Array     # (C, act_dim)
  reward: jax.Array     # (C,)
  next_obs: jax.Array   # (C, obs_dim)
  done: jax.Array       # (C,) terminal (excludes truncation)
  ptr: jax.Array        # scalar int32, block index
  size: jax.Array       # scalar int32, valid rows


@struct.dataclass
class SACState:
  policy_params: Any
  q_params: Any
  q_target_params: Any
  log_alpha: jax.Array
  policy_opt: Any
  q_opt: Any
  alpha_opt: Any
  obs_stats: running_stats.RunningStats
  buffer: ReplayBuffer
  env_state: State
  rng: jax.Array
  env_steps: jax.Array


class SAC:
  """Builds the jitted SAC training epoch for an env."""

  def __init__(self, env: MyoEnv,
               config: Optional[config_dict.ConfigDict] = None):
    self.cfg = config or default_config()
    if self.cfg.replay_capacity % (
        self.cfg.unroll_length * self.cfg.num_envs):
      raise ValueError("replay_capacity must be a multiple of "
                       "unroll_length * num_envs")
    self.env = AutoResetWrapper(env)
    self.policy = networks.PolicyNet(env.action_size,
                                     tuple(self.cfg.policy_hidden))
    self.q = QNet(tuple(self.cfg.q_hidden))
    self.target_entropy = (
        -float(env.action_size) * self.cfg.target_entropy_scale)
    self.policy_tx = optax.adam(self.cfg.learning_rate)
    self.q_tx = optax.adam(self.cfg.learning_rate)
    self.alpha_tx = optax.adam(self.cfg.learning_rate)

  # -- init ---------------------------------------------------------------
  def init(self, rng: jax.Array) -> SACState:
    cfg = self.cfg
    rng, k_env, k_pi, k_q = jax.random.split(rng, 4)
    env_state = jax.vmap(self.env.reset)(
        jax.random.split(k_env, cfg.num_envs))
    obs_dim = env_state.obs["state"].shape[-1]
    act_dim = self.env.action_size
    dummy_obs = jnp.zeros((1, obs_dim))
    dummy_act = jnp.zeros((1, act_dim))
    policy_params = self.policy.init(k_pi, dummy_obs)
    q_params = self.q.init(k_q, dummy_obs, dummy_act)
    cap = cfg.replay_capacity
    buffer = ReplayBuffer(
        obs=jnp.zeros((cap, obs_dim)),
        action=jnp.zeros((cap, act_dim)),
        reward=jnp.zeros((cap,)),
        next_obs=jnp.zeros((cap, obs_dim)),
        done=jnp.zeros((cap,)),
        ptr=jnp.int32(0),
        size=jnp.int32(0),
    )
    state = SACState(
        policy_params=policy_params,
        q_params=q_params,
        q_target_params=q_params,
        log_alpha=jnp.log(jnp.float32(cfg.init_alpha)),
        policy_opt=self.policy_tx.init(policy_params),
        q_opt=self.q_tx.init(q_params),
        alpha_opt=self.alpha_tx.init(jnp.float32(0.0)),
        obs_stats=running_stats.init(obs_dim),
        buffer=buffer,
        env_state=env_state,
        rng=rng,
        env_steps=jnp.int32(0),
    )
    # deep-copy every leaf: eagerly-built state trees alias buffers (the
    # target net == q net, terminal_obs == obs, cached scalar constants),
    # and a donated training step must never donate one buffer twice
    return jax.tree.map(jnp.copy, state)

  def _norm_obs(self, stats, obs):
    if not self.cfg.normalize_observations:
      return obs
    return running_stats.normalize(stats, obs)

  # -- collection ---------------------------------------------------------
  def _collect(self, ts: SACState) -> SACState:
    cfg = self.cfg
    v_step = jax.vmap(self.env.step)

    def one_step(carry, _):
      env_state, rng = carry
      rng, sub = jax.random.split(rng)
      obs = env_state.obs["state"]
      nobs = self._norm_obs(ts.obs_stats, obs)
      mean, log_std = self.policy.apply(ts.policy_params, nobs)
      action, _ = networks.sample_action(mean, log_std, sub)
      nxt = v_step(env_state, action)
      row = (obs, action, nxt.reward * cfg.reward_scaling,
             nxt.info["terminal_obs"],
             nxt.done * (1.0 - nxt.info["truncation"]))
      return (nxt, rng), row

    (env_state, rng), rows = jax.lax.scan(
        one_step, (ts.env_state, ts.rng), None, length=cfg.unroll_length)

    # (T, B, ...) -> (T*B, ...) block insert at an aligned offset.
    block = cfg.unroll_length * cfg.num_envs
    flat = [r.reshape((block,) + r.shape[2:]) for r in rows]
    buf = ts.buffer
    start = buf.ptr * block
    n_blocks = cfg.replay_capacity // block
    upd = lambda dst, src: jax.lax.dynamic_update_slice_in_dim(
        dst, src.astype(dst.dtype), start, axis=0)
    buffer = buf.replace(
        obs=upd(buf.obs, flat[0]),
        action=upd(buf.action, flat[1]),
        reward=upd(buf.reward, flat[2]),
        next_obs=upd(buf.next_obs, flat[3]),
        done=upd(buf.done, flat[4]),
        ptr=(buf.ptr + 1) % n_blocks,
        size=jnp.minimum(buf.size + block, cfg.replay_capacity),
    )
    stats = ts.obs_stats
    if cfg.normalize_observations:
      stats = running_stats.update(stats, rows[0])
    return ts.replace(
        env_state=env_state, rng=rng, buffer=buffer, obs_stats=stats,
        env_steps=ts.env_steps + block)

  # -- losses -------------------------------------------------------------
  def _critic_loss(self, q_params, ts: SACState, batch, rng):
    obs, action, reward, next_obs, done = batch
    nobs = self._norm_obs(ts.obs_stats, obs)
    n_next = self._norm_obs(ts.obs_stats, next_obs)
    mean, log_std = self.policy.apply(ts.policy_params, n_next)
    next_a, next_logp = networks.sample_action(mean, log_std, rng)
    q_next = self.q.apply(ts.q_target_params, n_next, next_a).min(axis=0)
    alpha = jnp.exp(ts.log_alpha)
    target = reward + self.cfg.discounting * (1.0 - done) * (
        q_next - alpha * next_logp)
    q_pred = self.q.apply(q_params, nobs, action)  # (2, batch)
    return jnp.mean((q_pred - target[None]) ** 2)

  def _actor_loss(self, policy_params, ts: SACState, batch, rng):
    obs = batch[0]
    nobs = self._norm_obs(ts.obs_stats, obs)
    mean, log_std = self.policy.apply(policy_params, nobs)
    action, logp = networks.sample_action(mean, log_std, rng)
    q = self.q.apply(ts.q_params, nobs, action).min(axis=0)
    alpha = jax.lax.stop_gradient(jnp.exp(ts.log_alpha))
    return jnp.mean(alpha * logp - q), jnp.mean(logp)

  # -- update -------------------------------------------------------------
  def _one_update(self, ts: SACState, rng) -> Tuple[SACState, Dict]:
    cfg = self.cfg
    rng, k_idx, k_q, k_pi = jax.random.split(rng, 4)
    idx = jax.random.randint(k_idx, (cfg.batch_size,), 0,
                             jnp.maximum(ts.buffer.size, 1))
    buf = ts.buffer
    batch = (buf.obs[idx], buf.action[idx], buf.reward[idx],
             buf.next_obs[idx], buf.done[idx])

    q_loss, q_grad = jax.value_and_grad(self._critic_loss)(
        ts.q_params, ts, batch, k_q)
    q_updates, q_opt = self.q_tx.update(q_grad, ts.q_opt, ts.q_params)
    q_params = optax.apply_updates(ts.q_params, q_updates)
    ts = ts.replace(q_params=q_params, q_opt=q_opt)

    (pi_loss, mean_logp), pi_grad = jax.value_and_grad(
        self._actor_loss, has_aux=True)(ts.policy_params, ts, batch, k_pi)
    pi_updates, policy_opt = self.policy_tx.update(
        pi_grad, ts.policy_opt, ts.policy_params)
    policy_params = optax.apply_updates(ts.policy_params, pi_updates)

    # temperature: minimize L(log_alpha) = alpha * (-logp - target_entropy)
    # (SB3/brax convention). dL/dlog_alpha = alpha * (-logp - target): when
    # measured entropy (-logp) exceeds the target the gradient is positive
    # and descent LOWERS alpha; when entropy is below target, alpha rises.
    alpha_grad = jnp.exp(ts.log_alpha) * (
        -mean_logp - self.target_entropy)
    a_updates, alpha_opt = self.alpha_tx.update(alpha_grad, ts.alpha_opt,
                                                ts.log_alpha)
    log_alpha = optax.apply_updates(ts.log_alpha, a_updates)

    q_target = jax.tree.map(
        lambda t, p: t * (1.0 - cfg.tau) + p * cfg.tau,
        ts.q_target_params, q_params)
    ts = ts.replace(policy_params=policy_params, policy_opt=policy_opt,
                    log_alpha=log_alpha, alpha_opt=alpha_opt,
                    q_target_params=q_target)
    metrics = {"q_loss": q_loss, "pi_loss": pi_loss,
               "alpha": jnp.exp(log_alpha), "entropy": -mean_logp}
    return ts, metrics

  # -- epoch --------------------------------------------------------------
  def training_step(self, ts: SACState) -> Tuple[SACState, Dict]:
    cfg = self.cfg
    ts = self._collect(ts)

    def upd(carry, _):
      ts, rng = carry
      rng, sub = jax.random.split(rng)
      ts, m = self._one_update(ts, sub)
      return (ts, rng), m

    def run_updates(ts):
      rng, sub = jax.random.split(ts.rng)
      (ts, _), ms = jax.lax.scan(
          upd, (ts.replace(rng=rng), sub), None,
          length=cfg.grad_updates_per_epoch)
      return ts, jax.tree.map(lambda x: x[-1], ms)

    def skip_updates(ts):
      zeros = {"q_loss": jnp.float32(0.0), "pi_loss": jnp.float32(0.0),
               "alpha": jnp.exp(ts.log_alpha), "entropy": jnp.float32(0.0)}
      return ts, zeros

    ts, metrics = jax.lax.cond(
        ts.env_steps >= cfg.learning_starts, run_updates, skip_updates, ts)
    metrics["buffer_size"] = ts.buffer.size
    metrics["mean_return"] = jnp.mean(
        ts.env_state.info["returned_episode_return"])
    return ts, metrics

  def make_training_fn(self, epochs_per_call: int) -> Callable:
    def run(ts):
      def body(ts, _):
        ts, m = self.training_step(ts)
        return ts, m
      ts, ms = jax.lax.scan(body, ts, None, length=epochs_per_call)
      return ts, jax.tree.map(lambda x: x[-1], ms)
    return jax.jit(run, donate_argnums=(0,))

  def make_policy_fn(self, deterministic: bool = True) -> Callable:
    def policy_fn(ts: SACState, obs, rng=None):
      nobs = self._norm_obs(ts.obs_stats, obs)
      mean, log_std = self.policy.apply(ts.policy_params, nobs)
      if deterministic:
        return networks.deterministic_action(mean)
      action, _ = networks.sample_action(mean, log_std, rng)
      return action
    return policy_fn


def train(env: MyoEnv, config: Optional[config_dict.ConfigDict] = None,
          progress_fn: Optional[Callable[[int, Dict], None]] = None,
          checkpoint_dir: Optional[str] = None):
  """Convenience driver: epochs until num_timesteps, periodic progress."""
  cfg = config or default_config()
  sac = SAC(env, cfg)
  ts = sac.init(jax.random.PRNGKey(cfg.seed))
  steps_per_epoch = cfg.unroll_length * cfg.num_envs
  total_epochs = max(1, cfg.num_timesteps // steps_per_epoch)
  evals = max(1, cfg.num_evals)
  epochs_per_call = max(1, total_epochs // evals)
  run = sac.make_training_fn(epochs_per_call)
  t0 = time.time()
  for i in range(evals):
    ts, metrics = run(ts)
    metrics = {k: float(np.asarray(v)) for k, v in metrics.items()}
    metrics["wall_clock"] = time.time() - t0
    if progress_fn is not None:
      progress_fn(int(ts.env_steps), metrics)
    if checkpoint_dir is not None:
      from myosuite_tpu.train import checkpoint
      checkpoint.save(checkpoint_dir, ts, step=int(ts.env_steps))
  return sac, ts
