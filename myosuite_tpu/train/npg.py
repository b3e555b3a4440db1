"""NPG trainer: natural policy gradient with conjugate-gradient Fisher
solves — pure JAX, one jitted iteration.

Role parity: the reference's classic-stack flagship is MJRL's NPG (hydra
launcher /root/reference/myosuite/agents/hydra_mjrl_launcher.py, config
anchor /root/reference/myosuite/agents/config/hydra_myo_config.yaml:
96 trajectories/iteration, (32, 32) policy, normalized step size 0.1,
1051 iterations; shipped NPG policy pickles under agents/baslines_NPG/).
That stack samples trajectories in 8 CPU subprocesses; here collection is
a `lax.scan` over the vmapped env step and the whole iteration (rollout →
GAE → vanilla gradient → CG solve of F x = g via double-backward
Fisher-vector products → normalized step → value-function regression) is
ONE jitted function.

Networks are shared with PPO (`train/networks.py`).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.flatten_util
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
      num_timesteps=5_000_000,
      num_envs=96,               # == mjrl's 96 trajectories/iteration
      unroll_length=50,          # horizon chunk per iteration
      discounting=0.995,
      gae_lambda=0.97,
      normalized_step_size=0.1,  # delta: KL-normalized step
      cg_iters=10,
      cg_damping=1e-4,
      value_lr=1e-3,
      value_epochs=2,
      value_batches=4,
      normalize_observations=True,
      policy_hidden=(32, 32),
      value_hidden=(128, 128),
      num_evals=10,
      seed=0,
  )


@struct.dataclass
class NPGState:
  policy_params: Any
  value_params: Any
  value_opt: Any
  obs_stats: running_stats.RunningStats
  env_state: State
  rng: jax.Array
  env_steps: jax.Array


class NPG:
  """Builds the jitted NPG training iteration for an env."""

  def __init__(self, env: MyoEnv,
               config: Optional[config_dict.ConfigDict] = None):
    self.cfg = config or default_config()
    self.env = AutoResetWrapper(env)
    self.policy = networks.PolicyNet(env.action_size,
                                     tuple(self.cfg.policy_hidden))
    self.value = networks.ValueNet(tuple(self.cfg.value_hidden))
    self.value_tx = optax.adam(self.cfg.value_lr)

  def init(self, rng: jax.Array) -> NPGState:
    cfg = self.cfg
    rng, k_env, k_pi, k_v = jax.random.split(rng, 4)
    env_state = jax.vmap(self.env.reset)(
        jax.random.split(k_env, cfg.num_envs))
    obs_dim = env_state.obs["state"].shape[-1]
    dummy = jnp.zeros((1, obs_dim))
    value_params = self.value.init(k_v, dummy)
    state = NPGState(
        policy_params=self.policy.init(k_pi, dummy),
        value_params=value_params,
        value_opt=self.value_tx.init(value_params),
        obs_stats=running_stats.init(obs_dim),
        env_state=env_state,
        rng=rng,
        env_steps=jnp.int32(0),
    )
    # deep-copy every leaf so a donated training step never sees two
    # state leaves aliasing one buffer (see sac.SAC.init)
    return jax.tree.map(jnp.copy, state)

  def _norm_obs(self, stats, obs):
    if not self.cfg.normalize_observations:
      return obs
    return running_stats.normalize(stats, obs)

  # -- rollout + GAE (same conventions as train/ppo.py) -------------------
  def _rollout(self, ts: NPGState):
    cfg = self.cfg
    v_step = jax.vmap(self.env.step)

    def one_step(carry, _):
      env_state, rng = carry
      rng, sub = jax.random.split(rng)
      obs = env_state.obs["state"]
      nobs = self._norm_obs(ts.obs_stats, obs)
      mean, log_std = self.policy.apply(ts.policy_params, nobs)
      action, raw, _ = networks.sample_action_raw(mean, log_std, sub)
      nxt = v_step(env_state, action)
      out = (obs, raw, nxt.reward,
             nxt.done * (1.0 - nxt.info["truncation"]),
             nxt.info["truncation"], nxt.info["terminal_obs"])
      return (nxt, rng), out

    (env_state, rng), (obs, raw, reward, done, trunc, term_obs) = (
        jax.lax.scan(one_step, (ts.env_state, ts.rng), None,
                     length=cfg.unroll_length))
    stats = ts.obs_stats
    if cfg.normalize_observations:
      stats = running_stats.update(stats, obs)
    ts = ts.replace(
        env_state=env_state, rng=rng, obs_stats=stats,
        env_steps=ts.env_steps + cfg.unroll_length * cfg.num_envs)
    return ts, (obs, raw, reward, done, trunc, term_obs)

  def _gae(self, ts: NPGState, traj, stats):
    cfg = self.cfg
    obs, _, reward, done, trunc, term_obs = traj
    vf = lambda o: self.value.apply(ts.value_params,
                                    self._norm_obs(stats, o))
    values = vf(obs)
    term_values = vf(term_obs)

    def scan_fn(carry, xs):
      gae = carry
      r, d, tr, v, tv = xs
      boundary = jnp.maximum(d, tr)
      delta = r + cfg.discounting * tv * (1.0 - d) - v
      gae = delta + (cfg.discounting * cfg.gae_lambda
                     * (1.0 - boundary) * gae)
      return gae, gae

    _, adv = jax.lax.scan(
        scan_fn, jnp.zeros_like(values[0]),
        (reward, done, trunc, values, term_values), reverse=True)
    returns = adv + values
    adv = (adv - adv.mean()) / (adv.std() + 1e-6)
    return adv, returns

  # -- natural gradient ---------------------------------------------------
  def _natural_step(self, ts: NPGState, traj, adv, stats):
    cfg = self.cfg
    obs, raw = traj[0], traj[1]
    nobs = self._norm_obs(stats, obs)
    flat_obs = nobs.reshape((-1, nobs.shape[-1]))
    flat_raw = raw.reshape((-1, raw.shape[-1]))
    flat_adv = adv.reshape((-1,))

    params0, unravel = jax.flatten_util.ravel_pytree(ts.policy_params)
    old_mean, old_log_std = self.policy.apply(ts.policy_params, flat_obs)
    old_logp = networks.gaussian_tanh_log_prob(old_mean, old_log_std,
                                               flat_raw)

    def surrogate(flat_params):
      p = unravel(flat_params)
      mean, log_std = self.policy.apply(p, flat_obs)
      logp = networks.gaussian_tanh_log_prob(mean, log_std, flat_raw)
      ratio = jnp.exp(logp - jax.lax.stop_gradient(old_logp))
      return jnp.mean(ratio * flat_adv)

    def mean_kl(flat_params):
      # KL(old || new) for diagonal Gaussians over the pre-tanh variable
      p = unravel(flat_params)
      mean, log_std = self.policy.apply(p, flat_obs)
      var0 = jnp.exp(2.0 * old_log_std)
      var1 = jnp.exp(2.0 * log_std)
      kl = (log_std - old_log_std
            + (var0 + (old_mean - mean) ** 2) / (2.0 * var1) - 0.5)
      return jnp.mean(jnp.sum(kl, axis=-1))

    g = jax.grad(surrogate)(params0)

    def fvp(v):
      grad_kl = lambda p: jax.grad(mean_kl)(p)
      _, hv = jax.jvp(grad_kl, (params0,), (v,))
      return hv + cfg.cg_damping * v

    # conjugate gradient for F x = g
    def cg_body(carry, _):
      x, r, p, rs = carry
      fp = fvp(p)
      alpha = rs / (jnp.vdot(p, fp) + 1e-12)
      x = x + alpha * p
      r = r - alpha * fp
      rs_new = jnp.vdot(r, r)
      p = r + (rs_new / (rs + 1e-12)) * p
      return (x, r, p, rs_new), None

    x0 = jnp.zeros_like(g)
    (x, _, _, _), _ = jax.lax.scan(
        cg_body, (x0, g, g, jnp.vdot(g, g)), None, length=cfg.cg_iters)

    # normalized step: sqrt(2 delta / (x^T F x))
    xfx = jnp.vdot(x, fvp(x))
    scale = jnp.sqrt(2.0 * cfg.normalized_step_size
                     / jnp.maximum(xfx, 1e-12))
    new_params = unravel(params0 + scale * x)
    metrics = {"surrogate": surrogate(params0),
               "kl_after": mean_kl(params0 + scale * x),
               "grad_norm": jnp.linalg.norm(g)}
    return ts.replace(policy_params=new_params), metrics

  def _fit_value(self, ts: NPGState, traj, returns, stats):
    cfg = self.cfg
    obs = traj[0]
    nobs = self._norm_obs(stats, obs).reshape((-1, obs.shape[-1]))
    tgt = returns.reshape((-1,))
    n = nobs.shape[0]
    mb = n // cfg.value_batches

    def loss_fn(p, o, t):
      return jnp.mean((self.value.apply(p, o) - t) ** 2)

    def epoch(carry, _):
      params, opt, rng = carry
      rng, sub = jax.random.split(rng)
      perm = jax.random.permutation(sub, n)

      def mb_step(carry2, i):
        params, opt = carry2
        idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
        l, grad = jax.value_and_grad(loss_fn)(params, nobs[idx], tgt[idx])
        upd, opt = self.value_tx.update(grad, opt, params)
        return (optax.apply_updates(params, upd), opt), l

      (params, opt), losses = jax.lax.scan(
          mb_step, (params, opt), jnp.arange(cfg.value_batches))
      return (params, opt, rng), losses.mean()

    rng, sub = jax.random.split(ts.rng)
    (vp, vopt, _), vloss = jax.lax.scan(
        epoch, (ts.value_params, ts.value_opt, sub), None,
        length=cfg.value_epochs)
    return ts.replace(value_params=vp, value_opt=vopt, rng=rng), vloss[-1]

  # -- iteration ----------------------------------------------------------
  def training_step(self, ts: NPGState) -> Tuple[NPGState, Dict]:
    stats0 = ts.obs_stats   # normalize with pre-update stats, like PPO
    ts, traj = self._rollout(ts)
    adv, returns = self._gae(ts, traj, stats0)
    ts, metrics = self._natural_step(ts, traj, adv, stats0)
    ts, vloss = self._fit_value(ts, traj, returns, stats0)
    metrics["value_loss"] = vloss
    metrics["reward_per_step"] = traj[2].mean()
    metrics["mean_return"] = jnp.mean(
        ts.env_state.info["returned_episode_return"])
    return ts, metrics

  def make_training_fn(self, iters_per_call: int) -> Callable:
    def run(ts):
      def body(ts, _):
        ts, m = self.training_step(ts)
        return ts, m
      ts, ms = jax.lax.scan(body, ts, None, length=iters_per_call)
      return ts, jax.tree.map(lambda x: x[-1], ms)
    return jax.jit(run, donate_argnums=(0,))

  def make_policy_fn(self, deterministic: bool = True) -> Callable:
    def policy_fn(ts: NPGState, obs, rng=None):
      nobs = self._norm_obs(ts.obs_stats, obs)
      mean, log_std = self.policy.apply(ts.policy_params, nobs)
      if deterministic:
        return networks.deterministic_action(mean)
      action, _ = networks.sample_action(mean, log_std, rng)
      return action
    return policy_fn


def train(env: MyoEnv, config: Optional[config_dict.ConfigDict] = None,
          progress_fn: Optional[Callable[[int, Dict], None]] = None):
  """Convenience driver: iterations until num_timesteps."""
  cfg = config or default_config()
  npg = NPG(env, cfg)
  ts = npg.init(jax.random.PRNGKey(cfg.seed))
  steps_per_iter = cfg.unroll_length * cfg.num_envs
  total_iters = max(1, cfg.num_timesteps // steps_per_iter)
  evals = max(1, cfg.num_evals)
  iters_per_call = max(1, total_iters // evals)
  run = npg.make_training_fn(iters_per_call)
  t0 = time.time()
  for _ in range(evals):
    ts, metrics = run(ts)
    metrics = {k: float(np.asarray(v)) for k, v in metrics.items()}
    metrics["wall_clock"] = time.time() - t0
    if progress_fn is not None:
      progress_fn(int(ts.env_steps), metrics)
  return npg, ts
