"""Actuation: transmissions, activation dynamics, and the muscle FLV model.

Implements MuJoCo's documented muscle actuator semantics (force-length-
velocity surface, activation/deactivation time constants from
actuator_dynprm — the same parameters the reference's 3CC-r fatigue model
reads, /root/reference/myosuite/envs/myo/mjx/fatigue_jax.py:39-55) plus
motor/position/velocity/intvelocity general actuators. All per-actuator
work is vectorized over nu with jnp.where masks keyed on static type
arrays, so a 39-muscle hand is one fused VPU pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_tpu.physics import math
from myosuite_tpu.physics.types import (BiasType, Data, DynType, GainType,
                                        JointType, Model, TrnType)


# ---------------------------------------------------------------------------
# transmission: actuator length / moment arms
# ---------------------------------------------------------------------------


_TRN_PLANS = {}


def _trn_plan(m: Model):
  """Static transmission tables: one-hot joint maps + tendon gathers."""
  key = id(m.collision_pairs)  # stable across replace()-randomized Models
  # entries hold a strong ref to the keyed Static so its id cannot be
  # recycled by GC for a different model (see types.plan_cache rationale)
  hit = _TRN_PLANS.get(key)
  if hit is not None and hit[0] is m.collision_pairs:
    return hit[1]
  gear = np.asarray(jax.device_get(m.actuator_gear))
  # joint transmissions contribute a CONSTANT moment matrix
  joint_moment = np.zeros((m.nu, m.nv), dtype=np.float32)
  len_qmap = np.zeros((m.nu, m.nq), dtype=np.float32)  # length = map @ qpos
  ten_gather = np.zeros(m.nu, dtype=np.int32)          # tendon id per act
  ten_scale = np.zeros(m.nu, dtype=np.float32)         # gear0 (0 if not ten)
  for i in range(m.nu):
    trn = int(m.actuator_trntype[i])
    tid = int(m.actuator_trnid[i][0])
    if trn == TrnType.JOINT:
      jtype = int(m.jnt_type[tid])
      qadr = int(m.jnt_qposadr[tid])
      vadr = int(m.jnt_dofadr[tid])
      if jtype in (JointType.SLIDE, JointType.HINGE):
        len_qmap[i, qadr] = gear[i, 0]
        joint_moment[i, vadr] = gear[i, 0]
      else:
        nd = 3 if jtype == JointType.BALL else 6
        joint_moment[i, vadr:vadr + nd] = gear[i, :nd]
    elif trn == TrnType.TENDON:
      ten_gather[i] = tid
      ten_scale[i] = gear[i, 0]
    else:
      raise NotImplementedError(f"actuator transmission {trn} not supported")
  plan = (joint_moment, len_qmap, ten_gather, ten_scale)
  _TRN_PLANS[key] = (m.collision_pairs, plan)
  return plan


def transmission(m: Model, d: Data) -> Data:
  """actuator_length and dense actuator_moment (nu, nv), batched."""
  if m.nu == 0:
    return d
  joint_moment, len_qmap, ten_gather, ten_scale = _trn_plan(m)
  lengths = math.mm(jnp.asarray(len_qmap), d.qpos)
  moment = jnp.asarray(joint_moment) * jnp.ones((), dtype=d.qpos.dtype)
  if m.ntendon:
    scale = jnp.asarray(ten_scale)
    lengths = lengths + d.ten_length[ten_gather] * scale
    moment = moment + d.ten_J[ten_gather] * scale[:, None]
  return d.replace(actuator_length=lengths, actuator_moment=moment)


def actuator_velocity(m: Model, d: Data) -> Data:
  if m.nu == 0:
    return d
  return d.replace(actuator_velocity=math.mm(d.actuator_moment, d.qvel))


# ---------------------------------------------------------------------------
# muscle curves (mju_muscleGain / mju_muscleBias / mju_muscleDynamics)
# ---------------------------------------------------------------------------


def _bump(length, a, mid, b):
  """Quartic spline bump: 0 at a and b, 1 at mid (MuJoCo FL curve)."""
  left = 0.5 * (a + mid)
  right = 0.5 * (mid + b)

  x_l = (length - a) / jnp.maximum(left - a, 1e-9)
  x_m1 = (mid - length) / jnp.maximum(mid - left, 1e-9)
  x_m2 = (length - mid) / jnp.maximum(right - mid, 1e-9)
  x_r = (b - length) / jnp.maximum(b - right, 1e-9)

  out = jnp.where(length <= a, 0.0,
        jnp.where(length < left, 0.5 * x_l * x_l,
        jnp.where(length < mid, 1.0 - 0.5 * x_m1 * x_m1,
        jnp.where(length < right, 1.0 - 0.5 * x_m2 * x_m2,
        jnp.where(length < b, 0.5 * x_r * x_r, 0.0)))))
  return out


def muscle_gain(length, vel, lengthrange, acc0, prm):
  """Active muscle gain: -F_max * FL(L) * FV(V)."""
  range0, range1, force, scale = prm[0], prm[1], prm[2], prm[3]
  lmin, lmax, vmax, fvmax = prm[4], prm[5], prm[6], prm[8]
  force = jnp.where(force < 0, scale / jnp.maximum(acc0, 1e-9), force)

  l0 = (lengthrange[1] - lengthrange[0]) / jnp.maximum(range1 - range0, 1e-9)
  l_n = range0 + (length - lengthrange[0]) / jnp.maximum(l0, 1e-9)
  v_n = vel / jnp.maximum(l0 * vmax, 1e-9)

  fl = _bump(l_n, lmin, 1.0, lmax)

  y = fvmax - 1.0
  fv = jnp.where(v_n <= -1.0, 0.0,
       jnp.where(v_n <= 0.0, (v_n + 1.0) * (v_n + 1.0),
       jnp.where(v_n <= y, fvmax - (y - v_n) * (y - v_n) /
                 jnp.maximum(y, 1e-9), fvmax)))
  return -force * fl * fv


def muscle_bias(length, lengthrange, acc0, prm):
  """Passive muscle force: -F_max * FP(L)."""
  range0, range1, force, scale = prm[0], prm[1], prm[2], prm[3]
  lmax, fpmax = prm[5], prm[7]
  force = jnp.where(force < 0, scale / jnp.maximum(acc0, 1e-9), force)

  l0 = (lengthrange[1] - lengthrange[0]) / jnp.maximum(range1 - range0, 1e-9)
  l_n = range0 + (length - lengthrange[0]) / jnp.maximum(l0, 1e-9)

  b = 0.5 * (lmax + 1.0)
  x = (l_n - 1.0) / jnp.maximum(b - 1.0, 1e-9)
  fp = jnp.where(l_n <= 1.0, 0.0,
       jnp.where(l_n <= b, 0.25 * fpmax * x * x * x,
                 0.25 * fpmax * (1.0 + 3.0 * (l_n - b) /
                                 jnp.maximum(b - 1.0, 1e-9))))
  return -force * fp


def muscle_dynamics(ctrl, act, prm):
  """Activation dynamics with act-dependent time constants + smoothing."""
  tau_act, tau_deact, smooth_width = prm[0], prm[1], prm[2]
  c = jnp.clip(ctrl, 0.0, 1.0)
  tau_a = tau_act * (0.5 + 1.5 * act)
  tau_d = tau_deact / (0.5 + 1.5 * act)
  dctrl = c - act
  # sigmoid blend between activation/deactivation time constants
  def sigmoid(x):
    # mujoco's quintic smoothstep on [0, 1]
    xc = jnp.clip(x, 0.0, 1.0)
    return xc * xc * xc * (3.0 * xc * (2.0 * xc - 5.0) + 10.0)
  blend = jnp.where(smooth_width < 1e-9,
                    (dctrl > 0.0).astype(act.dtype),
                    sigmoid(dctrl / jnp.maximum(smooth_width, 1e-9) + 0.5))
  tau = blend * tau_a + (1.0 - blend) * tau_d
  return dctrl / jnp.maximum(tau, 1e-9)


# ---------------------------------------------------------------------------
# full actuation pass
# ---------------------------------------------------------------------------


def actuation(m: Model, d: Data) -> Data:
  """act_dot, actuator_force, qfrc_actuator (mj_fwdActuation semantics)."""
  if m.nu == 0:
    return d
  dtype = d.qpos.dtype

  ctrl = d.ctrl
  limited = jnp.asarray(np.asarray(m.actuator_ctrllimited), dtype=bool)
  ctrl = jnp.where(limited,
                   jnp.clip(ctrl, m.actuator_ctrlrange[:, 0],
                            m.actuator_ctrlrange[:, 1]), ctrl)

  # map activation states to actuators (actadr >= 0)
  act_full = jnp.zeros(m.nu, dtype=dtype)
  act_dot_rows = jnp.zeros(m.nu, dtype=dtype)
  has_act = np.asarray(m.actuator_actadr) >= 0
  if m.na:
    gather = np.where(has_act, np.asarray(m.actuator_actadr), 0)
    act_full = jnp.where(jnp.asarray(has_act), d.act[gather], 0.0)

  dyntypes = np.asarray(m.actuator_dyntype)
  # activation dynamics, vectorized with masks
  dd = jnp.zeros(m.nu, dtype=dtype)
  if (dyntypes == DynType.MUSCLE).any():
    dd_mus = muscle_dynamics(ctrl, act_full, m.actuator_dynprm.T)
    dd = jnp.where(jnp.asarray(dyntypes == DynType.MUSCLE), dd_mus, dd)
  if (dyntypes == DynType.INTEGRATOR).any():
    dd = jnp.where(jnp.asarray(dyntypes == DynType.INTEGRATOR), ctrl, dd)
  if ((dyntypes == DynType.FILTER) | (dyntypes == DynType.FILTEREXACT)).any():
    tau = jnp.maximum(m.actuator_dynprm[:, 0], 1e-9)
    dd = jnp.where(
        jnp.asarray((dyntypes == DynType.FILTER) |
                    (dyntypes == DynType.FILTEREXACT)),
        (ctrl - act_full) / tau, dd)
  act_dot_rows = dd

  # actuator input: act for stateful, ctrl for direct
  inp = jnp.where(jnp.asarray(has_act), act_full, ctrl)

  # gain
  gaintypes = np.asarray(m.actuator_gaintype)
  gain = jnp.zeros(m.nu, dtype=dtype)
  gain = jnp.where(jnp.asarray(gaintypes == GainType.FIXED),
                   m.actuator_gainprm[:, 0], gain)
  gain = jnp.where(
      jnp.asarray(gaintypes == GainType.AFFINE),
      m.actuator_gainprm[:, 0] + m.actuator_gainprm[:, 1] * d.actuator_length
      + m.actuator_gainprm[:, 2] * d.actuator_velocity, gain)
  if (gaintypes == GainType.MUSCLE).any():
    g_mus = muscle_gain(d.actuator_length, d.actuator_velocity,
                        m.actuator_lengthrange.T, m.actuator_acc0,
                        m.actuator_gainprm.T)
    gain = jnp.where(jnp.asarray(gaintypes == GainType.MUSCLE), g_mus, gain)

  # bias
  biastypes = np.asarray(m.actuator_biastype)
  bias = jnp.zeros(m.nu, dtype=dtype)
  bias = jnp.where(
      jnp.asarray(biastypes == BiasType.AFFINE),
      m.actuator_biasprm[:, 0] + m.actuator_biasprm[:, 1] * d.actuator_length
      + m.actuator_biasprm[:, 2] * d.actuator_velocity, bias)
  if (biastypes == BiasType.MUSCLE).any():
    b_mus = muscle_bias(d.actuator_length, m.actuator_lengthrange.T,
                        m.actuator_acc0, m.actuator_biasprm.T)
    bias = jnp.where(jnp.asarray(biastypes == BiasType.MUSCLE), b_mus, bias)

  force = gain * inp + bias
  flimited = jnp.asarray(np.asarray(m.actuator_forcelimited), dtype=bool)
  force = jnp.where(flimited,
                    jnp.clip(force, m.actuator_forcerange[:, 0],
                             m.actuator_forcerange[:, 1]), force)

  qfrc = math.mm(d.actuator_moment.T, force)

  # scatter act_dot back into the activation vector (batched)
  act_dot = d.act_dot
  if m.na:
    adr = np.asarray(m.actuator_actadr)
    src = np.nonzero(adr >= 0)[0]
    act_dot = act_dot.at[adr[src]].set(act_dot_rows[src])

  return d.replace(actuator_force=force, qfrc_actuator=qfrc,
                   act_dot=act_dot)
