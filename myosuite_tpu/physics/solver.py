"""Primal Newton constraint solver (MuJoCo-style soft constraints).

Minimizes  C(a) = 1/2 (a - a_smooth)^T M (a - a_smooth) + sum_i s_i(J_i a - aref_i)
where s_i is a one-sided quadratic (limits/contacts, active when jar < 0)
or a Huber-style bounded quadratic (dof friction loss).

TPU-first: fixed iteration counts (opt.iterations Newton steps,
opt.ls_iterations of exact 1D Newton linesearch on the piecewise-quadratic
objective), dense (nv, nv) Hessian + Cholesky — everything vectorizes
across the env batch with zero host control flow. This replaces MuJoCo's
CG/Newton with per-env convergence checks; the reference anchors
iterations=6 / ls_iterations=6 for exactly this reason
(/root/reference/myosuite/envs/myo/mjx/mjx_base_env.py:49-51).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from myosuite_tpu.physics import math
from myosuite_tpu.physics.constraint import Efc
from myosuite_tpu.physics.types import Data, Model

_RIDGE = 1e-8


def _forces(efc: Efc, jar: jax.Array):
  """Per-row constraint force and curvature weight at this jar."""
  quad_f = -jar / efc.R
  # limit-type rows: active iff gated active AND jar < 0
  lim_active = efc.active & (jar < 0.0)
  lim_force = jnp.where(lim_active, quad_f, 0.0)
  lim_w = jnp.where(lim_active, 1.0 / efc.R, 0.0)
  # friction rows: clipped two-sided
  fr_force = jnp.clip(quad_f, -efc.floss, efc.floss)
  fr_in_band = jnp.abs(quad_f) < efc.floss
  fr_w = jnp.where(fr_in_band, 1.0 / efc.R, 0.0)
  force = jnp.where(efc.is_friction, fr_force, lim_force)
  w = jnp.where(efc.is_friction, fr_w, lim_w)
  return force, w


def _cost(efc: Efc, jar: jax.Array) -> jax.Array:
  quad = 0.5 * jar * jar / efc.R
  lim_cost = jnp.where(efc.active & (jar < 0.0), quad, 0.0)
  # friction: quadratic inside band, linear outside
  band = efc.floss * efc.R
  fr_cost = jnp.where(jnp.abs(jar) < band, quad,
                      efc.floss * jnp.abs(jar) - 0.5 * efc.floss * band)
  return jnp.sum(jnp.where(efc.is_friction, fr_cost, lim_cost))


def solve(m: Model, d: Data,
          efc: Efc) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """Returns (qacc, qfrc_constraint, efc_force)."""
  if efc.J.shape[0] == 0:
    return (d.qacc_smooth, jnp.zeros(m.nv, dtype=d.qpos.dtype),
            jnp.zeros(0, dtype=d.qpos.dtype))

  a_smooth = d.qacc_smooth

  def total_cost(a):
    jar = math.mm(efc.J, a) - efc.aref
    da = a - a_smooth
    return 0.5 * da @ math.mm(d.qM, da) + _cost(efc, jar)

  # warmstart: previous qacc if it beats qacc_smooth
  a0 = jnp.where(total_cost(d.qacc) < total_cost(a_smooth),
                 d.qacc, a_smooth)

  def newton_iter(a, _):
    jar = math.mm(efc.J, a) - efc.aref
    force, w = _forces(efc, jar)
    grad = math.mm(d.qM, a - a_smooth) - math.mm(efc.J.T, force)
    hess = d.qM + math.mm(efc.J.T * w[None, :], efc.J)
    hess = hess + _RIDGE * jnp.eye(m.nv, dtype=a.dtype)
    chol = jnp.linalg.cholesky(hess)
    p = -jax.scipy.linalg.cho_solve((chol, True), grad)

    # exact-ish linesearch: 1D Newton on alpha over the piecewise quadratic
    jp = math.mm(efc.J, p)
    mp = math.mm(d.qM, p)
    g0 = p @ math.mm(d.qM, a - a_smooth)
    pmp = p @ mp

    def ls_iter(alpha, _):
      jar_a = jar + alpha * jp
      force_a, w_a = _forces(efc, jar_a)
      dphi = g0 + alpha * pmp - jnp.sum(force_a * jp)
      ddphi = pmp + jnp.sum(w_a * jp * jp)
      alpha_new = alpha - dphi / jnp.maximum(ddphi, 1e-12)
      return jnp.clip(alpha_new, 0.0, 4.0), None

    alpha, _ = jax.lax.scan(ls_iter, jnp.float32(1.0), None,
                            length=m.opt.ls_iterations)
    a_new = a + alpha * p
    # guard: keep the better point
    a_new = jnp.where(total_cost(a_new) <= total_cost(a), a_new, a)
    return a_new, None

  a, _ = jax.lax.scan(newton_iter, a0, None, length=m.opt.iterations)

  jar = math.mm(efc.J, a) - efc.aref
  force, _ = _forces(efc, jar)
  qfrc_constraint = math.mm(efc.J.T, force)
  return a, qfrc_constraint, force
