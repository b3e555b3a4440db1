"""3CC-r cumulative muscle fatigue — pure functional JAX.

Implements the three-compartment-controller fatigue model (Looft et al.;
the model the reference implements in
/root/reference/myosuite/envs/myo/fatigue.py:5 and re-derives for JAX in
/root/reference/myosuite/envs/myo/mjx/fatigue_jax.py:57-118): muscle units
are split into active (MA), resting (MR), fatigued (MF) fractions with
activation-dependent transfer rates, a fatigue coefficient F, recovery
coefficient R and rest-recovery multiplier r.

State lives in the env State.info pytree (no userdata side channel), so it
vmaps/shards with everything else.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from myosuite_tpu.physics.types import DynType, Model


@struct.dataclass
class FatigueParams:
  F: jax.Array          # fatigue coefficient
  R: jax.Array          # recovery coefficient
  r: jax.Array          # rest recovery multiplier
  dt: jax.Array         # integration step (ctrl_dt)
  tau_act: jax.Array    # (na,) activation time constants
  tau_deact: jax.Array  # (na,) deactivation time constants


def make_params(m: Model, dt: float) -> Tuple[FatigueParams, np.ndarray]:
  """Params + boolean mask of muscle actuators (reference defaults:
  F=0.00912, R=0.1*0.00094, r=10*15, fatigue_jax.py:32-36)."""
  is_muscle = np.asarray(m.actuator_dyntype) == int(DynType.MUSCLE)
  dynprm = np.asarray(jax.device_get(m.actuator_dynprm))
  tau_act = dynprm[is_muscle, 0].astype(np.float32)
  tau_deact = dynprm[is_muscle, 1].astype(np.float32)
  params = FatigueParams(
      F=jnp.float32(0.00912),
      R=jnp.float32(0.1 * 0.00094),
      r=jnp.float32(10 * 15),
      dt=jnp.float32(dt),
      tau_act=jnp.asarray(tau_act),
      tau_deact=jnp.asarray(tau_deact),
  )
  return params, is_muscle


def init_state(params: FatigueParams,
               rng: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
  """Fresh (or randomized) fatigue state: all units rested by default."""
  na = params.tau_act.shape[0]
  if rng is None:
    return {"MA": jnp.zeros(na), "MR": jnp.ones(na), "MF": jnp.zeros(na)}
  r1, r2 = jax.random.split(rng)
  ma = jax.random.uniform(r1, (na,))
  mf = jax.random.uniform(r2, (na,)) * (1.0 - ma)
  return {"MA": ma, "MR": 1.0 - ma - mf, "MF": mf}


def compute_act(params: FatigueParams, target_load: jax.Array,
                state: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
  """One fatigue update. target_load = desired activation in [0, 1]."""
  MA, MR, MF = state["MA"], state["MR"], state["MF"]
  TL = target_load

  LD = (0.5 + 1.5 * MA) / params.tau_act
  LR = (0.5 + 1.5 * MA) / params.tau_deact

  c = jnp.zeros_like(MA)
  c = jnp.where((MA < TL) & (MR > (TL - MA)), LD * (TL - MA), c)
  c = jnp.where((MA < TL) & (MR <= (TL - MA)), LD * MR, c)
  c = jnp.where(MA >= TL, LR * (TL - MA), c)

  rR = jnp.where(MA >= TL, params.r * params.R, params.R)

  c_min = jnp.maximum(-MA / params.dt + params.F * MA,
                      (MR - 1.0) / params.dt + rR * MF)
  c_max = jnp.minimum((1.0 - MA) / params.dt + params.F * MA,
                      MR / params.dt + rR * MF)
  c = jnp.clip(c, c_min, c_max)

  dMA = (c - params.F * MA) * params.dt
  dMR = (-c + rR * MF) * params.dt
  dMF = (params.F * MA - rR * MF) * params.dt
  return {"MA": MA + dMA, "MR": MR + dMR, "MF": MF + dMF}


def effort(state: Dict[str, jax.Array], target_load: jax.Array) -> jax.Array:
  return jnp.linalg.norm(state["MA"] - target_load)


class FatigueWrapper:
  """Env wrapper: muscle controls are replaced by fatigued activation MA.

  Reference behavior: FatigueWrapper stores MA/MR/MF per muscle, replaces
  muscle actions with MA each step, optionally exposes fatigue in obs
  (/root/reference/myosuite/envs/myo/mjx/fatigue_jax.py:176-285). Here the
  fatigue state rides in State.info["fatigue"].
  """

  def __init__(self, env, fatigue_reset_random: bool = False,
               fatigue_in_obs: bool = False):
    self._env = env
    self._random_reset = fatigue_reset_random
    self._in_obs = fatigue_in_obs
    self.params, self._muscle_mask = make_params(env.model, env.dt)
    self._muscle_idx = np.nonzero(self._muscle_mask)[0]

  def __getattr__(self, name):
    return getattr(self._env, name)

  def reset(self, rng: jax.Array) -> "State":
    rng, sub, fsub = jax.random.split(rng, 3)
    state = self._env.reset(sub)
    fat = init_state(self.params, fsub if self._random_reset else None)
    state = state.replace(info={**state.info, "fatigue": fat})
    if self._in_obs:
      state = state.replace(obs=self._augment_obs(state.obs, fat))
    return state

  def _augment_obs(self, obs, fat):
    extra = jnp.concatenate([fat["MA"], fat["MR"], fat["MF"]])
    return {**obs, "state": jnp.concatenate([obs["state"], extra])}

  def step(self, state, action):
    ctrl = action
    if self._env.config.get("norm_actions", True):
      ctrl = self._env.norm_actions(action)
    fat = compute_act(self.params, ctrl[self._muscle_idx],
                      state.info["fatigue"])
    ctrl = ctrl.at[self._muscle_idx].set(fat["MA"])
    state = state.replace(info={**state.info, "fatigue": fat})
    state = self._env.step_ctrl(state, ctrl)
    state = state.replace(info={**state.info, "fatigue": fat})
    if self._in_obs:
      state = state.replace(obs=self._augment_obs(state.obs, fat))
    return state
