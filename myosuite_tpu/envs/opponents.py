"""Scripted opponents as pure policies driven by in-graph colored noise.

The reference's ChallengeOpponent / RepellerChallengeOpponent / GoalKeeper
(/root/reference/myosuite/envs/myo/myochallenge/chasetag_v0.py:119-437 and
soccer_v0.py:19-201) are host-side classes stepped with
pink.ColoredNoiseProcess samples and written into the sim via qpos. Here
each opponent is a pure function over a small state pytree carried in the
env's info dict, so thousands of opponents run inside one jitted graph:

  * colored noise is generated spectrally for a whole episode at reset
    (scale white noise by f^{-beta/2}, irfft) — a static-shape equivalent
    of the reference's streaming ColoredNoiseProcess (beta=1 pink noise);
  * the per-episode policy mix (static / random / chase or evade) is a
    sampled integer, and all branches are computed and select()-ed, the
    standard TPU trade of a little redundant FLOP for zero divergence.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

# opponent policy codes (reference chase/random/static policies,
# chasetag_v0.py:155-210)
STATIC = 0
RANDOM = 1
CHASE = 2   # chases the agent (agent plays evader)
EVADE = 3   # flees the agent (agent plays chaser)


def colored_noise(rng: jax.Array, n_steps: int, n_dim: int,
                  beta: float = 1.0) -> jax.Array:
  """(n_steps, n_dim) noise with 1/f^beta spectrum, unit variance."""
  nfreq = n_steps // 2 + 1
  f = jnp.arange(1, nfreq + 1, dtype=jnp.float32)
  scale = f ** (-beta / 2.0)
  r1, r2 = jax.random.split(rng)
  re = jax.random.normal(r1, (nfreq, n_dim)) * scale[:, None]
  im = jax.random.normal(r2, (nfreq, n_dim)) * scale[:, None]
  spec = re + 1j * im
  x = jnp.fft.irfft(spec, n=n_steps, axis=0)
  return x / jnp.maximum(jnp.std(x, axis=0, keepdims=True), 1e-8)


@struct.dataclass
class OpponentState:
  """Pose + per-episode noise table; lives in the env info dict."""
  pose: jax.Array      # (3,) x, y, heading
  vel: jax.Array       # (2,) linear, angular speed commands
  policy: jax.Array    # int32 policy code
  noise: jax.Array     # (horizon, 2) colored-noise command table
  t: jax.Array         # int32 step index into the noise table


def reset_opponent(rng: jax.Array, horizon: int,
                   arena_half: float = 6.0,
                   probs: Tuple[float, float, float] = (0.1, 0.45, 0.45),
                   mode: int = CHASE) -> OpponentState:
  """Sample spawn pose, per-episode policy, and the noise table.

  probs = (static, random, chase-or-evade), mirroring the reference's
  opponent_probabilities kwarg (chasetag_v0.py registration defaults)."""
  r1, r2, r3, r4 = jax.random.split(rng, 4)
  xy = jax.random.uniform(r1, (2,), minval=-arena_half * 0.8,
                          maxval=arena_half * 0.8)
  heading = jax.random.uniform(r2, minval=-jnp.pi, maxval=jnp.pi)
  p = jnp.asarray(probs, dtype=jnp.float32)
  choice = jax.random.categorical(r3, jnp.log(p / p.sum()))
  policy = jnp.where(choice == 0, STATIC,
                     jnp.where(choice == 1, RANDOM, mode)).astype(jnp.int32)
  noise = colored_noise(r4, horizon, 2, beta=1.0)
  return OpponentState(pose=jnp.concatenate([xy, heading[None]]),
                       vel=jnp.zeros(2),
                       policy=policy, noise=noise, t=jnp.int32(0))


def step_opponent(opp: OpponentState, agent_xy: jax.Array, dt: float,
                  arena_half: float = 6.0,
                  max_lin: float = 2.0, max_ang: float = 4.0,
                  chase_speed: float = 1.2) -> OpponentState:
  """Advance the opponent one control step (pure, no host round-trip)."""
  x, y, th = opp.pose[0], opp.pose[1], opp.pose[2]

  # random policy: colored-noise linear/angular velocity (reference
  # random_policy samples from ColoredNoiseProcess each step)
  ncmd = opp.noise[jnp.clip(opp.t, 0, opp.noise.shape[0] - 1)]
  lin_rand = jnp.clip(ncmd[0], -1.0, 1.0) * max_lin
  ang_rand = jnp.clip(ncmd[1], -1.0, 1.0) * max_ang

  # chase policy: steer toward the agent at chase_speed
  # (reference chase_player, chasetag_v0.py:191-210)
  to_agent = agent_xy - opp.pose[:2]
  des_th = jnp.arctan2(to_agent[1], to_agent[0])
  dth = jnp.mod(des_th - th + jnp.pi, 2 * jnp.pi) - jnp.pi
  ang_chase = jnp.clip(dth / jnp.maximum(dt, 1e-6), -max_ang, max_ang)
  lin_chase = jnp.float32(chase_speed)

  # evade: steer away from the agent
  des_th_e = jnp.arctan2(-to_agent[1], -to_agent[0])
  dth_e = jnp.mod(des_th_e - th + jnp.pi, 2 * jnp.pi) - jnp.pi
  ang_evade = jnp.clip(dth_e / jnp.maximum(dt, 1e-6), -max_ang, max_ang)

  lin = jnp.select(
      [opp.policy == STATIC, opp.policy == RANDOM, opp.policy == CHASE],
      [0.0, lin_rand, lin_chase], default=lin_chase)
  ang = jnp.select(
      [opp.policy == STATIC, opp.policy == RANDOM, opp.policy == CHASE],
      [0.0, ang_rand, ang_chase], default=ang_evade)

  th_new = th + ang * dt
  x_new = jnp.clip(x + lin * jnp.cos(th_new) * dt, -arena_half, arena_half)
  y_new = jnp.clip(y + lin * jnp.sin(th_new) * dt, -arena_half, arena_half)
  return opp.replace(pose=jnp.stack([x_new, y_new, th_new]),
                     vel=jnp.stack([lin, ang]), t=opp.t + 1)


@struct.dataclass
class KeeperState:
  """Goalkeeper moving along the goal line (reference GoalKeeper,
  soccer_v0.py:19-201: random / stationary / block-ball policies)."""
  pose: jax.Array      # (2,) y position on goal line + heading
  policy: jax.Array    # int32: 0 stationary, 1 random, 2 block-ball
  noise: jax.Array     # (horizon, 1)
  t: jax.Array


def reset_keeper(rng: jax.Array, horizon: int,
                 probs=(0.2, 0.3, 0.5)) -> KeeperState:
  r1, r2, r3 = jax.random.split(rng, 3)
  y0 = jax.random.uniform(r1, minval=-0.8, maxval=0.8)
  p = jnp.asarray(probs, dtype=jnp.float32)
  policy = jax.random.categorical(r2, jnp.log(p / p.sum())).astype(jnp.int32)
  return KeeperState(pose=jnp.stack([y0, jnp.float32(0.0)]),
                     policy=policy,
                     noise=colored_noise(r3, horizon, 1, beta=1.0),
                     t=jnp.int32(0))


def step_keeper(kp: KeeperState, ball_xy: jax.Array, dt: float,
                goal_half_width: float = 1.0,
                max_speed: float = 2.0) -> KeeperState:
  y = kp.pose[0]
  ncmd = kp.noise[jnp.clip(kp.t, 0, kp.noise.shape[0] - 1), 0]
  v_rand = jnp.clip(ncmd, -1.0, 1.0) * max_speed
  v_block = jnp.clip((ball_xy[1] - y) / jnp.maximum(dt, 1e-6),
                     -max_speed, max_speed)
  v = jnp.select([kp.policy == 0, kp.policy == 1], [0.0, v_rand],
                 default=v_block)
  y_new = jnp.clip(y + v * dt, -goal_half_width, goal_half_width)
  return kp.replace(pose=jnp.stack([y_new, v]), t=kp.t + 1)
