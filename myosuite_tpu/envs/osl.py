"""OSL prosthetic-leg state-machine controller, fully in-graph.

Re-designs the reference's MyoOSLController
(/root/reference/myosuite/envs/myo/assets/leg/myoosl_control.py:9-356): a
4-phase gait FSM (e_stance, l_stance, e_swing, l_swing) with per-phase PD
gains on the prosthetic knee and ankle, body-mass-scaled defaults, and
transition thresholds on load and joint angles.

TPU-native shape: the phase is an int32 carried in the env info; the PD
targets/gains for all phases live in one (4, 6) table so phase selection
is a gather, and transitions are boolean-mask updates — no lax.cond
branches, so the controller vectorizes across the env batch for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# phase ids
E_STANCE, L_STANCE, E_SWING, L_SWING = 0, 1, 2, 3

# Per-phase PD table, columns:
#   knee_target, knee_stiffness, knee_damping,
#   ankle_target, ankle_stiffness, ankle_damping
# Angles in radians; stiffness scaled by body mass at make time (the
# reference scales gains by body mass, myoosl_control.py "set_motor_param").
_DEFAULT_TABLE = np.array([
    # e_stance: slightly flexed knee, dorsiflexing ankle
    [-0.10, 1.30, 0.050, -0.03, 1.20, 0.060],
    # l_stance: knee extends, ankle push-off (plantarflex)
    [-0.08, 1.00, 0.040, -0.35, 1.60, 0.040],
    # e_swing: rapid knee flexion, ankle neutral
    [-1.00, 0.60, 0.020, 0.10, 0.50, 0.020],
    # l_swing: knee re-extends for heel strike
    [-0.05, 0.80, 0.040, 0.05, 0.70, 0.030],
], dtype=np.float32)

# transition thresholds (myoosl_control.py StateMachine defaults):
#   load fraction of body weight and joint angles gating each hand-off
_THRESH = dict(
    load_stance=0.25,    # heel-strike load to enter stance
    load_swing=0.10,     # unload to leave stance
    ankle_estance=0.02,  # ankle dorsiflexion to progress e->l stance
    knee_eswing=-0.80,   # knee flexion to progress e->l swing
)


def make_osl_params(body_mass: float) -> jax.Array:
  """(4, 6) PD table with stiffness columns scaled by body mass."""
  table = _DEFAULT_TABLE.copy()
  table[:, 1] *= body_mass
  table[:, 4] *= body_mass
  return jnp.asarray(table)


def osl_step(phase: jax.Array, params: jax.Array,
             knee_q: jax.Array, knee_v: jax.Array,
             ankle_q: jax.Array, ankle_v: jax.Array,
             load: jax.Array):
  """One controller tick.

  Args:
    phase: int32 current gait phase.
    params: (4, 6) PD table from make_osl_params.
    knee_q/v, ankle_q/v: prosthetic joint state.
    load: vertical ground reaction force under the prosthetic foot,
      normalized by body weight.
  Returns:
    (new_phase, knee_torque, ankle_torque)
  """
  # ---- transitions (reference StateMachine.update) ----
  to_lstance = (phase == E_STANCE) & (load > _THRESH["load_stance"]) & (
      ankle_q > _THRESH["ankle_estance"])
  to_eswing = (phase == L_STANCE) & (load < _THRESH["load_swing"])
  to_lswing = (phase == E_SWING) & (knee_q < _THRESH["knee_eswing"])
  to_estance = (phase == L_SWING) & (load > _THRESH["load_stance"])

  new_phase = phase
  new_phase = jnp.where(to_lstance, L_STANCE, new_phase)
  new_phase = jnp.where(to_eswing, E_SWING, new_phase)
  new_phase = jnp.where(to_lswing, L_SWING, new_phase)
  new_phase = jnp.where(to_estance, E_STANCE, new_phase)

  # ---- per-phase PD (gather row, then two PD laws) ----
  row = params[new_phase]
  knee_tau = row[1] * (row[0] - knee_q) - row[2] * knee_v
  ankle_tau = row[4] * (row[3] - ankle_q) - row[5] * ankle_v
  return new_phase.astype(jnp.int32), knee_tau, ankle_tau
