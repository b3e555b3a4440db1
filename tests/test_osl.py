"""OSL state-machine controller unit tests (reference parameterization).

Covers VERDICT r3 #9: the 4 named parameter sets, the full
transition-threshold dict with OR semantics, and a driven gait that walks
the FSM through all four phases with the default set
(/root/reference/myosuite/envs/myo/assets/leg/myoosl_control.py:240-356).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myosuite_tpu.envs import osl

pytestmark = pytest.mark.fast


BW80 = 80.0 * 9.81   # make_osl_params(80.0) thresholds are in Newtons


def _tick(phase, params, knee_q=0.0, knee_v=0.0, ankle_q=0.0, ankle_v=0.0,
          load=0.0, mode=None):
  load = load * BW80   # tests specify load as a body-weight fraction
  p, kt, at = osl.osl_step(
      jnp.int32(phase), params, jnp.float32(knee_q), jnp.float32(knee_v),
      jnp.float32(ankle_q), jnp.float32(ankle_v), jnp.float32(load),
      mode=None if mode is None else jnp.int32(mode))
  return int(p), float(kt), float(at)


def test_default_set_walks_all_four_phases():
  """Drive the FSM through one full gait cycle with synthetic sensors."""
  params = osl.make_osl_params(80.0)
  seen = [osl.E_STANCE]
  phase = osl.E_STANCE

  # heel strike -> midstance: heavy load, ankle dorsiflexes past 6 deg
  phase, _, _ = _tick(phase, params, load=0.6, ankle_q=np.deg2rad(8))
  seen.append(phase)
  assert phase == osl.L_STANCE

  # toe off: load drops below 0.15 BW
  phase, _, _ = _tick(phase, params, load=0.05)
  seen.append(phase)
  assert phase == osl.E_SWING

  # swing: knee flexes past 50 deg (model convention: negative), still
  # flexing fast so the velocity clause must NOT fire alone
  phase, _, _ = _tick(phase, params, knee_q=np.deg2rad(-55),
                      knee_v=-2.0, load=0.0)
  seen.append(phase)
  assert phase == osl.L_SWING

  # heel strike: load returns
  phase, _, _ = _tick(phase, params, knee_q=np.deg2rad(-10), load=0.5)
  seen.append(phase)
  assert phase == osl.E_STANCE
  assert seen == [0, 1, 2, 3, 0]


def test_or_semantics_per_transition():
  params = osl.make_osl_params(80.0)
  # e_stance -> l_stance on load alone
  p, _, _ = _tick(osl.E_STANCE, params, load=0.3)
  assert p == osl.L_STANCE
  # ... or on ankle angle alone
  p, _, _ = _tick(osl.E_STANCE, params, ankle_q=np.deg2rad(7))
  assert p == osl.L_STANCE
  # neither met: stays
  p, _, _ = _tick(osl.E_STANCE, params, load=0.1, ankle_q=0.0)
  assert p == osl.E_STANCE
  # e_swing -> l_swing on the knee-velocity clause alone (knee nearly
  # stopped flexing while not yet past 50 deg)
  p, _, _ = _tick(osl.E_SWING, params, knee_q=np.deg2rad(-20), knee_v=0.0)
  assert p == osl.L_SWING
  # l_swing -> e_stance on knee extension alone (no load yet)
  p, _, _ = _tick(osl.L_SWING, params, knee_q=np.deg2rad(-10), load=0.0)
  assert p == osl.E_STANCE


def test_four_parameter_sets_selectable():
  params = osl.make_osl_params(80.0)
  assert params.gains.shape == (osl.N_SETS, 4, 6)
  # stiffen mode 1's e_stance knee; mode 0 must be untouched
  g1 = np.array(params.gains[1])
  g1[osl.E_STANCE, 1] = 500.0
  params2 = osl.set_osl_param_batch(params, mode=1, gains=g1)
  _, kt0, _ = _tick(osl.E_STANCE, params2, knee_q=-0.5, mode=0)
  _, kt1, _ = _tick(osl.E_STANCE, params2, knee_q=-0.5, mode=1)
  assert kt1 != kt0
  np.testing.assert_allclose(np.asarray(params2.gains[0]),
                             np.asarray(params.gains[0]))


def test_peak_torque_clipping():
  params = osl.make_osl_params(80.0)
  _, kt, at = _tick(osl.E_STANCE, params, knee_q=10.0, ankle_q=-10.0)
  assert abs(kt) <= osl.KNEE_PEAK_TORQUE + 1e-5
  assert abs(at) <= osl.ANKLE_PEAK_TORQUE + 1e-5


def test_gain_values_match_reference_defaults():
  """Spot-check the ported defaults (myoosl_control.py:186-230)."""
  params = osl.make_osl_params(80.0)
  g = np.asarray(params.gains[0])
  np.testing.assert_allclose(g[osl.E_STANCE, 1], 99.372)
  np.testing.assert_allclose(g[osl.L_STANCE, 4], 79.498)
  np.testing.assert_allclose(g[osl.E_SWING, 0], -np.deg2rad(60), rtol=1e-6)
  np.testing.assert_allclose(g[osl.L_SWING, 2], 3.816)


def test_body_mass_scales_load_thresholds():
  """Reference initDefaults puts load thresholds in Newtons at
  fraction * body_mass * g (myoosl_control.py:156-230): an 80 kg model
  must transition at twice the absolute load of a 40 kg model."""
  p40 = osl.make_osl_params(body_mass=40.0)
  p80 = osl.make_osl_params(body_mass=80.0)
  t40, t80 = np.asarray(p40.thresh[0]), np.asarray(p80.thresh[0])
  # load entries (e_stance 0.25 BW, l_stance 0.15 BW, l_swing 0.40 BW)
  np.testing.assert_allclose(t40[[0, 2, 5]],
                             np.array([0.25, 0.15, 0.40]) * 40.0 * 9.81)
  np.testing.assert_allclose(t80[[0, 2, 5]], 2.0 * t40[[0, 2, 5]])
  # angle thresholds are mass-independent
  np.testing.assert_allclose(t80[[1, 3, 4, 6]], t40[[1, 3, 4, 6]])

  # behavioral check: a 600 N load lifts the 40 kg model out of e_stance
  # (600 > 0.25*392 N) but not the 80 kg model (600 < 0.25*785 N would be
  # wrong -- 0.25*785=196; use 150 N instead)
  load = jnp.float32(150.0)   # > 0.25*40*9.81=98.1, < 0.25*80*9.81=196.2
  args = (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
          jnp.float32(0.0), load)
  ph40, _, _ = osl.osl_step(jnp.int32(osl.E_STANCE), p40, *args)
  ph80, _, _ = osl.osl_step(jnp.int32(osl.E_STANCE), p80, *args)
  assert int(ph40) == osl.L_STANCE
  assert int(ph80) == osl.E_STANCE
