"""Spinal reflex locomotion controller (Song & Geyer 2015), pure JAX.

Role-equivalent of the reference's reflex baseline
(/root/reference/myosuite/agents/baseline_Reflex/reflexCtr.py:23): a
model-based feedback controller that produces muscle stimulations from
proprioceptive signals (muscle force/length), ground reaction forces, and
trunk orientation — no learning required. Redesigned TPU-first: the
controller is a pure function (params, signals) -> stimulations, so it
vmaps over env batches and composes into jitted rollouts, unlike the
reference's stateful per-instance numpy loop.

Pathways (per leg, gated by stance/swing from the GRF):
  M1  stance: positive force feedback on anti-gravity muscles
      (SOL/GAS/VAS/GMAX) — the force-feedback F+ loop.
  M2  stance: trunk balance PD on hip muscles (lean angle + rate).
  M3  always: TA length feedback minus SOL force inhibition
      (ankle clearance).
  M4  swing:  hip flexor drive (PSOAS/ILIACUS/RF) + knee flexor assist.
  M5  late swing: hamstring force feedback to retract and straighten.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ReflexParams(NamedTuple):
  """Reflex gains (the trainable parameter vector of the baseline)."""
  g_sol: jax.Array      # F+ gain, plantarflexors
  g_gas: jax.Array
  g_vas: jax.Array      # F+ gain, knee extensors
  g_gmax: jax.Array     # F+ gain, hip extensors
  g_ta: jax.Array       # TA length feedback gain
  l_off_ta: jax.Array   # TA length feedback offset (normalized length)
  g_solta: jax.Array    # SOL -> TA inhibition
  g_hip_p: jax.Array    # trunk balance P gain
  g_hip_d: jax.Array    # trunk balance D gain
  theta_ref: jax.Array  # desired trunk pitch (rad, forward lean)
  g_hfl: jax.Array      # swing hip flexor drive
  g_ham: jax.Array      # late-swing hamstring F+ gain
  s0: jax.Array         # baseline stimulation
  g_bfsh: jax.Array     # early-swing knee flexion (ground clearance)
  g_retract: jax.Array  # late-swing leg retraction vs hip angle
  g_kick: jax.Array     # gait-initiation impulse (left leg, ~first 0.4 s)
  k_swing: jax.Array    # load-difference swing-gate sharpness


def default_params() -> ReflexParams:
  """Hand-tuned defaults in the range of Song & Geyer Table 1."""
  f = jnp.float32
  return ReflexParams(
      g_sol=f(1.2 / 4000), g_gas=f(1.1 / 1500), g_vas=f(1.2 / 6000),
      g_gmax=f(1.0 / 1500), g_ta=f(1.1), l_off_ta=f(0.71),
      g_solta=f(0.0003), g_hip_p=f(1.9), g_hip_d=f(0.25),
      theta_ref=f(0.105), g_hfl=f(0.45), g_ham=f(1.0 / 3000), s0=f(0.01),
      # new-pathway gains seed small: the multiplicative ES tuner scales
      # them up if stepping pays off, down toward zero if it does not
      g_bfsh=f(0.1), g_retract=f(0.1), g_kick=f(0.1), k_swing=f(8.0))


_GROUPS = {
    "sol": ("SOL", "TP", "FDL", "FHL", "PERLONG", "PERBREV", "FDB"),
    "gas": ("GASMED", "GASLAT"),
    "vas": ("VASLAT", "VASMED", "VASINT"),
    "gmax": ("GMAX1", "GMAX2", "GMAX3"),
    "ta": ("TA", "EDL", "EHL"),
    "hfl": ("PSOAS", "ILIACUS", "RF", "SAR", "TFL"),
    "ham": ("SEMIMEM", "SEMITEN", "BFLH", "BFSH"),
    "bfsh": ("BFSH",),
    "hab": ("GMED1", "GMED2", "GMED3", "GMIN"),
    "had": ("ADDLONG", "ADDBREV", "ADDMAG1", "ADDMAG2", "ADDMAG3", "GRA"),
}


class ReflexController:
  """Bind the reflex network to a leg env (actuator name -> group maps)."""

  def __init__(self, env, params: ReflexParams = None):
    import mujoco

    self._env = env
    self.params = params or default_params()
    mj = env.mj_model
    names = [mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_ACTUATOR.value, i)
             for i in range(mj.nu)]
    self._nu = mj.nu
    self._masks: Dict[str, Dict[str, jax.Array]] = {}
    for side in ("r", "l"):
      side_masks = {}
      for group, members in _GROUPS.items():
        mask = np.zeros(mj.nu, dtype=np.float32)
        for i, n in enumerate(names):
          if n and n.startswith(f"{side}_") and n[2:] in members:
            mask[i] = 1.0
        side_masks[group] = jnp.asarray(mask)
      self._masks[side] = side_masks
    # GRF masks per side (challenge-env plumbing reused)
    from myosuite_tpu.envs.challenge import _geom_ids, contact_slot_mask
    self._grf = {}
    for side in ("r", "l"):
      feet = [f"{side}_heel_geom", f"{side}_foot_geom", f"{side}_toes_geom"]
      self._grf[side] = contact_slot_mask(env.model, _geom_ids(mj, feet))
    self._weight = float(np.sum(mj.body_mass)) * 9.81
    # hip-flexion qpos address per side (late-swing retraction signal)
    self._hip_qadr = {}
    for side in ("r", "l"):
      jid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_JOINT.value,
                              f"{side}_hip_flexion")
      self._hip_qadr[side] = int(mj.jnt_qposadr[jid]) if jid >= 0 else -1

  def _trunk_pitch(self, data):
    q = data.qpos[3:7]   # free-root quaternion
    # pitch about +y
    return jnp.arctan2(2 * (q[0] * q[2] - q[1] * q[3]),
                       1 - 2 * (q[1] ** 2 + q[2] ** 2))

  def __call__(self, data, params: ReflexParams = None) -> jax.Array:
    """Muscle stimulations (nu,) in [0, 1] from the current Data."""
    p = params or self.params
    theta = self._trunk_pitch(data)
    dtheta = data.qvel[4]
    force = jnp.abs(data.actuator_force)
    # normalized muscle length proxy: actuator length / optimal (length0)
    lnorm = data.actuator_length / jnp.maximum(
        self._env.model.actuator_length0, 1e-6)

    stim = jnp.full((self._nu,), p.s0)
    loads = {s: jnp.dot(self._grf[s], data.contact_force) / self._weight
             for s in ("r", "l")}
    # gait initiation: a brief open-loop impulse that lifts the left leg
    # and pushes off the right — breaks the symmetric two-legged stance the
    # closed loop can never leave on its own (both loads identical =>
    # swing gates stay shut). Gaussian bump centered at 0.25 s.
    kick = jnp.exp(-((data.time - 0.25) / 0.12) ** 2)
    for side in ("r", "l"):
      mk = self._masks[side]
      load = loads[side]
      stance = jnp.clip(load * 5.0, 0.0, 1.0)   # smooth stance gate
      # contralateral stance gate: swing initiation only once the other
      # leg carries load (Song & Geyer double-support suppression)
      contra = jnp.clip(loads["l" if side == "r" else "r"] * 5.0, 0.0, 1.0)
      swing = 1.0 - stance
      # asymmetry gate for the NEW pathways only: opens when this leg
      # unloads while the other carries weight (per-leg state machine
      # role); k_swing tunes its sharpness. Zero new-pathway gains
      # recover the previous controller exactly.
      asym = jax.nn.sigmoid(
          p.k_swing * (loads["l" if side == "r" else "r"] - load) - 1.0)
      hipq = (data.qpos[self._hip_qadr[side]]
              if self._hip_qadr[side] >= 0 else jnp.float32(0.0))
      if side == "l":
        stim = stim + p.g_kick * kick * (mk["hfl"] + 0.7 * mk["bfsh"])
      else:
        stim = stim + p.g_kick * kick * 0.6 * (mk["sol"] + mk["gas"])

      def fplus(gain, mask):
        """Positive force feedback of the group's own force."""
        return gain * jnp.sum(mask * force) / jnp.maximum(
            jnp.sum(mask), 1.0)

      # M1: anti-gravity force feedback in stance
      stim = stim + stance * (
          mk["sol"] * fplus(p.g_sol, mk["sol"])
          + mk["gas"] * fplus(p.g_gas, mk["gas"])
          + mk["vas"] * fplus(p.g_vas, mk["vas"])
          + mk["gmax"] * fplus(p.g_gmax, mk["gmax"]))
      # M2: trunk balance PD on hip muscles (stance leg steers the trunk)
      lean = (theta - p.theta_ref) + p.g_hip_d / jnp.maximum(
          p.g_hip_p, 1e-6) * dtheta
      stim = stim + stance * p.g_hip_p * (
          mk["gmax"] * jnp.maximum(lean, 0.0)
          + mk["hfl"] * jnp.maximum(-lean, 0.0))
      # M3: TA length feedback minus SOL force inhibition (always on)
      ta_l = jnp.sum(mk["ta"] * lnorm) / jnp.maximum(jnp.sum(mk["ta"]), 1.0)
      sol_f = jnp.sum(mk["sol"] * force) / jnp.maximum(
          jnp.sum(mk["sol"]), 1.0)
      stim = stim + mk["ta"] * jnp.maximum(
          p.g_ta * (ta_l - p.l_off_ta) - stance * p.g_solta * sol_f, 0.0)
      # M4: swing hip flexor drive
      stim = stim + swing * mk["hfl"] * p.g_hfl
      # M4b: early-swing knee flexion for ground clearance (BFSH) —
      # active while the swing leg is still behind (hip not yet flexed);
      # gated by the load-asymmetry signal and contralateral support
      stim = stim + asym * contra * mk["bfsh"] * (
          p.g_bfsh * jnp.maximum(0.4 - hipq, 0.0))
      # M5: late-swing hamstring retraction (force feedback + hip-angle
      # proportional leg retraction once the leg is well forward)
      stim = stim + swing * mk["ham"] * fplus(p.g_ham, mk["ham"])
      retract = p.g_retract * jnp.maximum(hipq - 0.45, 0.0)
      stim = stim + asym * retract * (mk["ham"] + 0.5 * mk["gmax"])
      # lateral stability: abductors against pelvis roll
      roll = data.qpos[4] if data.qpos.shape[0] > 4 else jnp.float32(0.0)
      sign = 1.0 if side == "r" else -1.0
      stim = stim + stance * 0.3 * (
          mk["hab"] * jnp.maximum(sign * roll, 0.0)
          + mk["had"] * jnp.maximum(-sign * roll, 0.0))

    return jnp.clip(stim, 0.0, 1.0)

  def rollout(self, rng, horizon: int):
    """Jitted closed-loop rollout on the bound env using step_ctrl
    (stimulations bypass the policy sigmoid)."""
    env = self._env

    def body(state, _):
      ctrl = self(state.data)
      state = env.step_ctrl(state, ctrl)
      return state, (state.reward, state.metrics.get("solved", 0.0),
                     state.data.qpos[0])

    state0 = env.reset(rng)
    return jax.lax.scan(body, state0, None, length=horizon)
