"""Functional environment base: State pytree + MyoEnv.

Re-designs the reference's env stack (classic MujocoEnv,
/root/reference/myosuite/envs/env_base.py:33, and MJX MjxMyoBase,
/root/reference/myosuite/envs/myo/mjx/mjx_base_env.py:20) as one functional
TPU-native stack: an env instance holds a compiled Model and pure
reset/step functions over a State pytree. Batching is jax.vmap at the
trainer; episode resets happen in-graph (no host round-trips), following
the reference's in-info resampling pattern
(/root/reference/myosuite/envs/myo/mjx/playground_pose_v0.py:87-117).
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
from flax import struct
from ml_collections import config_dict

from myosuite_tpu.physics import forward as physics_forward
from myosuite_tpu.physics import io as physics_io
from myosuite_tpu.physics.types import Data, Model


@struct.dataclass
class State:
  """Carry of the env scan: physics data + RL signals."""
  data: Data
  obs: Dict[str, jax.Array]
  reward: jax.Array
  done: jax.Array
  metrics: Dict[str, jax.Array]
  info: Dict[str, Any]


def _apply_sarcopenia(model: Model, weakness: float) -> Model:
  """Scale down muscle max force (reference halves actuator_gainprm[:, 2],
  /root/reference/myosuite/envs/myo/base_v0.py:63-67). When force < 0
  MuJoCo uses scale/acc0 instead, so scale (gainprm[:, 3]) is reduced."""
  import numpy as np
  from myosuite_tpu.physics.types import GainType

  is_muscle = jnp.asarray(
      np.asarray(model.actuator_gaintype) == int(GainType.MUSCLE))
  gp = model.actuator_gainprm
  force = gp[:, 2]
  scale = gp[:, 3]
  new_force = jnp.where(is_muscle & (force > 0), force * weakness, force)
  new_scale = jnp.where(is_muscle & (force <= 0), scale * weakness, scale)
  gp = gp.at[:, 2].set(new_force).at[:, 3].set(new_scale)
  # bias uses the same F_max
  bp = model.actuator_biasprm
  bforce = bp[:, 2]
  bscale = bp[:, 3]
  bp = bp.at[:, 2].set(
      jnp.where(is_muscle & (bforce > 0), bforce * weakness, bforce))
  bp = bp.at[:, 3].set(
      jnp.where(is_muscle & (bforce <= 0), bscale * weakness, bscale))
  return model.replace(actuator_gainprm=gp, actuator_biasprm=bp)


class ReafferentationWrapper:
  """Tendon-transfer fault injection: redirect one actuator's command to
  another (reference: EIP -> EPL, base_v0.py:104-108)."""

  def __init__(self, env, src: int, dst: int):
    self._env = env
    self._src, self._dst = src, dst

  def __getattr__(self, name):
    return getattr(self._env, name)

  def reset(self, rng):
    return self._env.reset(rng)

  def step(self, state, action):
    action = action.at[self._dst].set(action[self._src])
    action = action.at[self._src].set(0.0)
    return self._env.step(state, action)


class MyoEnv(abc.ABC):
  """Pure functional musculoskeletal env over the TPU physics engine.

  Subclasses implement reset() plus the obs/reward/done/metrics/info hooks;
  step() composes them in the same stage order as the reference
  (mjx_base_env.py:74-92).
  """

  def __init__(self, config: config_dict.ConfigDict,
               config_overrides: Optional[Dict[str, Any]] = None):
    cfg = config_dict.ConfigDict(config)
    if config_overrides:
      cfg.update(config_overrides)
    self._config = cfg
    xml = self._make_xml()
    self._model, self._mj_model = physics_io.load_model(xml=xml)
    # force the configured sim timestep
    self._model = self._model.replace(
        opt=self._model.opt.replace(timestep=float(cfg.sim_dt)))
    self._mj_model.opt.timestep = float(cfg.sim_dt)
    self._n_substeps = int(round(cfg.ctrl_dt / cfg.sim_dt))
    if cfg.get("muscle_condition", None) == "sarcopenia":
      self._model = _apply_sarcopenia(self._model,
                                      cfg.get("sarcopenia_weakness", 0.5))

  # -- model access -------------------------------------------------------
  @abc.abstractmethod
  def _make_xml(self) -> str:
    """Return the MJCF for this env (usually from assets.builder)."""

  @property
  def model(self) -> Model:
    return self._model

  @property
  def mj_model(self):
    """Host-side compiled model (introspection / rendering only)."""
    return self._mj_model

  @property
  def action_size(self) -> int:
    return self._model.nu

  @property
  def dt(self) -> float:
    return float(self._config.ctrl_dt)

  @property
  def max_episode_steps(self) -> int:
    return int(self._config.max_episode_steps)

  @property
  def config(self) -> config_dict.ConfigDict:
    return self._config

  # -- action handling ----------------------------------------------------
  @classmethod
  def norm_actions(cls, action: jax.Array) -> jax.Array:
    """Sigmoid projection of policy actions into (0, 1) muscle space.

    Exact reference semantics: 1/(1+exp(-5(a-0.5)))
    (/root/reference/myosuite/envs/myo/base_v0.py:86-96 and
    mjx_base_env.py:58-60).
    """
    return 1.0 / (1.0 + jnp.exp(-5.0 * (action - 0.5)))

  # -- core API -----------------------------------------------------------
  @abc.abstractmethod
  def reset(self, rng: jax.Array) -> State:
    ...

  def step(self, state: State, action: jax.Array) -> State:
    ctrl = action
    if self._config.get("norm_actions", True):
      ctrl = self.norm_actions(action)
    return self.step_ctrl(state, ctrl)

  def step_ctrl(self, state: State, ctrl: jax.Array) -> State:
    """Step with already-normalized muscle controls (fatigue wrapper hook)."""
    state = self._step_simulation(state, ctrl)
    state = state.replace(obs=self._get_obs(state.data, state.info))
    rewards = self._get_rewards(state.data, state.info)
    state = state.replace(reward=self._sum_rewards(rewards))
    state = state.replace(done=self._get_done(state))
    state = state.replace(
        metrics={**state.metrics, **self._get_metrics(state, rewards)})
    state = state.replace(info=self._get_info(state))
    return state

  def _model_for_step(self, info: Dict[str, Any]) -> Model:
    """Hook for in-graph domain randomization: envs that randomize object
    geometry/mass/friction per episode (reference RelocateEnvV0,
    /root/reference/myosuite/envs/myo/myochallenge/relocate_v0.py:16, and
    the SAR reorient suite) return self._model with fields replaced from
    info — the perturbed model is a traced pytree, so each env in a vmap
    batch simulates its own physics parameters with zero host round-trips."""
    return self._model

  def _step_simulation(self, state: State, ctrl: jax.Array) -> State:
    data = state.data.replace(ctrl=ctrl)
    data = physics_forward.step_n(self._model_for_step(state.info), data,
                                  self._n_substeps)
    info = {**state.info, "step_count": state.info["step_count"] + 1}
    return state.replace(data=data, info=info)

  def _sum_rewards(self, rewards: Dict[str, jax.Array]) -> jax.Array:
    """dense = sum wt * rwd, the reference's weighted-dict convention
    (/root/reference/myosuite/envs/myo/myobase/reach_v0.py:148-150)."""
    weights = self._config.reward_weights
    total = jnp.float32(0.0)
    for k, r in rewards.items():
      total = total + float(weights.get(k, 1.0)) * r
    return total

  def _make_data(self, qpos: jax.Array, qvel: jax.Array,
                 act: Optional[jax.Array] = None,
                 hfield: Optional[jax.Array] = None) -> Data:
    d = physics_io.make_data(self._model)
    d = d.replace(qpos=qpos, qvel=qvel)
    if act is not None:
      d = d.replace(act=act)
    if hfield is not None:
      d = d.replace(hfield_data=hfield)
    # settle derived quantities so obs at reset are valid
    d = physics_forward.fwd_position(self._model, d)
    d = physics_forward.fwd_velocity(self._model, d)
    return d

  # -- hooks --------------------------------------------------------------
  @abc.abstractmethod
  def _get_obs(self, data: Data, info: Dict) -> Dict[str, jax.Array]:
    ...

  @abc.abstractmethod
  def _get_rewards(self, data: Data, info: Dict) -> Dict[str, jax.Array]:
    ...

  def _get_done(self, state: State) -> jax.Array:
    return jnp.float32(0.0)

  def _get_metrics(self, state: State,
                   rewards: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    return {}

  def _get_info(self, state: State) -> Dict[str, Any]:
    return state.info

  def _episode_boundary(self, state: State):
    """(truncation, boundary): in-graph episode bookkeeping."""
    done = state.done
    truncation = jnp.where(
        state.info["step_count"] >= self.max_episode_steps,
        1.0 - done, jnp.float32(0.0))
    boundary = jnp.logical_or(done, truncation)
    return truncation, boundary
