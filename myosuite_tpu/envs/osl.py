"""OSL prosthetic-leg state-machine controller, fully in-graph.

Re-designs the reference's MyoOSLController
(/root/reference/myosuite/envs/myo/assets/leg/myoosl_control.py:9-356): a
4-phase gait FSM (e_stance, l_stance, e_swing, l_swing) with per-phase
impedance (PD) control of the prosthetic knee and ankle, the reference's
default gains/targets (myoosl_control.py:156-230, initDefaults),
body-weight-scaled load thresholds, per-transition threshold dicts with
the reference's OR semantics (State.check_transition:258-267 fires on ANY
met threshold), peak-torque clipping (HARDWARE knee 142.272 / ankle
168.192 N*m), and n_sets=4 selectable parameter sets
(change_osl_mode:83-89, set_osl_param_batch:91-113).

TPU-native shape: the phase is an int32 carried in the env info; gains
for all sets x phases live in one (n_sets, 4, 6) table and thresholds in
a (n_sets, 7) table, so set/phase selection is a gather and transitions
are boolean-mask updates — no lax.cond branches, so the controller
vectorizes across the env batch for free.

Sign conventions (this repo's leg model, assets/leg.py): knee flexion is
NEGATIVE (range -2.1..0.02) and ankle dorsiflexion POSITIVE; the
reference tables use positive knee flexion, so knee targets/thresholds
below are sign-flipped from myoosl_control.py's degree values.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# phase ids
E_STANCE, L_STANCE, E_SWING, L_SWING = 0, 1, 2, 3
PHASE_NAMES = ("e_stance", "l_stance", "e_swing", "l_swing")
N_SETS = 4

_D = np.deg2rad

# Per-phase gain table, columns:
#   knee_target, knee_stiffness, knee_damping,
#   ankle_target, ankle_stiffness, ankle_damping
# Values are the reference defaults (myoosl_control.py:186-230), knee
# sign flipped to this model's flexion-negative convention.
_DEFAULT_GAINS = np.array([
    # e_stance: knee 5 deg flex, ankle -2 deg (slight plantarflex)
    [-_D(5.0), 99.372, 3.180, _D(-2.0), 19.874, 0.000],
    # l_stance: knee 8 deg, ankle -20 deg push-off
    [-_D(8.0), 99.372, 1.272, _D(-20.0), 79.498, 0.063],
    # e_swing: rapid knee flexion to 60 deg, ankle 25 deg dorsiflex
    [-_D(60.0), 39.749, 0.063, _D(25.0), 7.949, 0.000],
    # l_swing: knee re-extends to 5 deg for heel strike, ankle 15 deg
    [-_D(5.0), 15.899, 3.816, _D(15.0), 7.949, 0.000],
], dtype=np.float32)

# Transition-threshold vector (reference threshold dicts, OR semantics):
#   0 load_estance   e_stance->l_stance when load > 0.25 BW
#   1 ankle_estance  e_stance->l_stance when ankle > 6 deg dorsiflex
#   2 load_lstance   l_stance->e_swing when load < 0.15 BW
#   3 knee_eswing    e_swing->l_swing when knee flex beyond 50 deg
#   4 kneevel_eswing e_swing->l_swing when knee vel < 3 deg/s (osl conv)
#   5 load_lswing    l_swing->e_stance when load > 0.40 BW
#   6 knee_lswing    l_swing->e_stance when knee flex under 30 deg
# Load entries are fractions of body weight (the env feeds GRF/BW).
_DEFAULT_THRESH = np.array(
    [0.25, _D(6.0), 0.15, _D(50.0), _D(3.0), 0.40, _D(30.0)],
    dtype=np.float32)

# HARDWARE peak torques (myoosl_control.py:171-178)
KNEE_PEAK_TORQUE = 142.272
ANKLE_PEAK_TORQUE = 168.192


class OslParams(NamedTuple):
  """n_sets independent parameter sets (reference OSL_PARAM_LIST)."""
  gains: jax.Array    # (n_sets, 4, 6)
  thresh: jax.Array   # (n_sets, 7)


def make_osl_params(body_mass: float = None, n_sets: int = N_SETS
                    ) -> OslParams:
  """Default parameter sets.

  `body_mass` (kg): when given, the load thresholds (BW fractions
  0.25/0.15/0.40 at indices 0/2/5) are scaled to absolute Newtons at
  body_mass * 9.81, matching the reference's initDefaults
  (myoosl_control.py:156-230: `0.25 * self.BODY_WEIGHT` etc.) — osl_step
  must then be fed the raw vertical GRF in Newtons, and a heavier model
  transitions at proportionally larger absolute loads. When None the
  thresholds stay body-weight *fractions* and osl_step expects GRF/BW.
  """
  thresh1 = _DEFAULT_THRESH.copy()
  if body_mass is not None:
    thresh1[[0, 2, 5]] *= float(body_mass) * 9.81
  gains = np.broadcast_to(_DEFAULT_GAINS, (n_sets,) + _DEFAULT_GAINS.shape)
  thresh = np.broadcast_to(thresh1, (n_sets,) + thresh1.shape)
  return OslParams(jnp.asarray(gains.copy()), jnp.asarray(thresh.copy()))


def set_osl_param_batch(params: OslParams, mode: int,
                        gains=None, thresh=None) -> OslParams:
  """Functional twin of the reference's set_osl_param_batch
  (myoosl_control.py:91-113): replace one mode's tables."""
  g, t = params.gains, params.thresh
  if gains is not None:
    g = g.at[mode].set(jnp.asarray(gains, dtype=g.dtype))
  if thresh is not None:
    t = t.at[mode].set(jnp.asarray(thresh, dtype=t.dtype))
  return OslParams(g, t)


def set_osl_param(params: OslParams, mode: int, phase: int, column: int,
                  value: float) -> OslParams:
  """Set one gain entry (reference set_osl_param, myoosl_control.py:115)."""
  return OslParams(
      params.gains.at[mode, phase, column].set(value), params.thresh)


def osl_step(phase: jax.Array, params, knee_q: jax.Array,
             knee_v: jax.Array, ankle_q: jax.Array, ankle_v: jax.Array,
             load: jax.Array, mode: Optional[jax.Array] = None):
  """One controller tick.

  Args:
    phase: int32 current gait phase.
    params: OslParams from make_osl_params (a bare (4, 6) gain table is
      also accepted for backward compatibility).
    knee_q/v, ankle_q/v: prosthetic joint state (model convention).
    load: vertical GRF under the prosthetic foot / body weight.
    mode: int32 parameter-set selector (reference change_osl_mode);
      default set 0. May be a per-env tracer.
  Returns:
    (new_phase, knee_torque, ankle_torque)
  """
  if isinstance(params, OslParams):
    midx = jnp.int32(0) if mode is None else mode
    gains = params.gains[midx]          # (4, 6)
    th = params.thresh[midx]            # (7,)
  else:  # legacy bare table
    gains = params
    th = jnp.asarray(_DEFAULT_THRESH)

  # ---- transitions: OR over each phase's threshold dict (reference
  # State.check_transition fires on the FIRST met threshold) ----
  to_lstance = (phase == E_STANCE) & (
      (load > th[0]) | (ankle_q > th[1]))
  to_eswing = (phase == L_STANCE) & (load < th[2])
  # e_swing->l_swing: knee flexed beyond threshold OR knee velocity has
  # (nearly) stopped flexing; model knee vel = -osl knee vel
  to_lswing = (phase == E_SWING) & (
      (knee_q < -th[3]) | (-knee_v < th[4]))
  to_estance = (phase == L_SWING) & (
      (load > th[5]) | (knee_q > -th[6]))

  new_phase = phase
  new_phase = jnp.where(to_lstance, L_STANCE, new_phase)
  new_phase = jnp.where(to_eswing, E_SWING, new_phase)
  new_phase = jnp.where(to_lswing, L_SWING, new_phase)
  new_phase = jnp.where(to_estance, E_STANCE, new_phase)

  # ---- per-phase impedance control (reference _get_joint_torque) ----
  row = gains[new_phase]
  knee_tau = jnp.clip(row[1] * (row[0] - knee_q) - row[2] * knee_v,
                      -KNEE_PEAK_TORQUE, KNEE_PEAK_TORQUE)
  ankle_tau = jnp.clip(row[4] * (row[3] - ankle_q) - row[5] * ankle_v,
                       -ANKLE_PEAK_TORQUE, ANKLE_PEAK_TORQUE)
  return new_phase.astype(jnp.int32), knee_tau, ankle_tau
