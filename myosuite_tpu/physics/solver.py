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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_tpu.physics import linalg, math
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


def _use_pallas() -> bool:
  """Fused TPU kernel path (physics/pallas_solver.py); env var gate for
  debugging and for backends without Mosaic support."""
  import os
  if os.environ.get("MTX_DISABLE_PALLAS", "0") == "1":
    return False
  try:
    return jax.default_backend() == "tpu"
  except RuntimeError:
    return False


def _pallas_fits(nv: int, nefc: int, budget_bytes: float = 96e6) -> bool:
  """Conservative VMEM estimate for one 1024-env kernel block.

  The kernel keeps J plus ~2 J-sized temporaries (Jw, per-row Hessian
  products), the qM/hess/Cholesky tiles, and a handful of nefc/nv vectors
  resident per (8, 128) env tile. Models whose (nv, nefc) blow the ~128 MB
  v5e VMEM (observed: myoLeg at nefc of a few hundred rows) fall back to
  the XLA path instead of failing to compile with a Mosaic stack OOM."""
  per_env_floats = 3 * nv * nv + 3 * nefc * nv + 10 * nefc + 16 * nv
  return per_env_floats * 4 * 1024 <= budget_bytes


def newton_xla(qM: jax.Array, efc: Efc, warm: jax.Array,
               a_smooth: jax.Array, iterations: int, ls_iterations: int
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """Per-env Newton solve, pure XLA. Also the fallback the Pallas entry
  uses for small batches and the reference semantics for its parity test."""

  def total_cost(a):
    jar = math.mm(efc.J, a) - efc.aref
    da = a - a_smooth
    return 0.5 * da @ math.mm(qM, da) + _cost(efc, jar)

  # warmstart: previous qacc if it beats qacc_smooth
  a0 = jnp.where(total_cost(warm) < total_cost(a_smooth), warm, a_smooth)

  # Both loops are STATICALLY UNROLLED in python, never lax.scan: a scan
  # whose body mixes dynamic-update-slices (the unrolled Cholesky) with the
  # carry defeats XLA's fusion on TPU — measured in-graph, scan-of-6 Newton
  # iterations costs 32.5 ms/substep vs 3.0 ms unrolled (batch 2048, myoHand,
  # v5e). Iteration counts are small static config (6x6), so trace size
  # stays modest.
  nv = qM.shape[-1]
  a = a0
  for _ in range(int(iterations)):
    jar = math.mm(efc.J, a) - efc.aref
    force, w = _forces(efc, jar)
    grad = math.mm(qM, a - a_smooth) - math.mm(efc.J.T, force)
    hess = qM + math.mm(efc.J.T * w[None, :], efc.J)
    hess = hess + _RIDGE * jnp.eye(nv, dtype=a.dtype)
    p = -linalg.solve_pd(hess, grad)

    # exact-ish linesearch: 1D Newton on alpha over the piecewise quadratic
    jp = math.mm(efc.J, p)
    mp = math.mm(qM, p)
    g0 = p @ math.mm(qM, a - a_smooth)
    pmp = p @ mp

    alpha = jnp.float32(1.0)
    for _ in range(int(ls_iterations)):
      jar_a = jar + alpha * jp
      force_a, w_a = _forces(efc, jar_a)
      dphi = g0 + alpha * pmp - jnp.sum(force_a * jp)
      ddphi = pmp + jnp.sum(w_a * jp * jp)
      alpha = jnp.clip(alpha - dphi / jnp.maximum(ddphi, 1e-12), 0.0, 4.0)
    a_new = a + alpha * p
    # guard: keep the better point
    a = jnp.where(total_cost(a_new) <= total_cost(a), a_new, a)

  jar = math.mm(efc.J, a) - efc.aref
  force, _ = _forces(efc, jar)
  qfrc_constraint = math.mm(efc.J.T, force)
  return a, qfrc_constraint, force


def fused_path(m: Optional[Model] = None) -> bool:
  """True when the Pallas kernel also computes qacc_smooth and the
  implicit-damping Euler acceleration (so the XLA graph skips mj_factorM /
  mj_solveM / the integrator's second Cholesky entirely).

  Must agree with the dispatch in solve(): when the model's (nv, nefc)
  footprint exceeds the kernel's VMEM budget the whole pipeline stays on
  the XLA path, so pass the model whenever it is in scope."""
  if not _use_pallas():
    return False
  if m is None:
    return True
  from myosuite_tpu.physics import constraint as constraint_mod
  return _pallas_fits(m.nv, constraint_mod._efc_plan(m).nefc)


def solve(m: Model, d: Data, efc: Efc
          ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
  """Returns (qacc, qfrc_constraint, efc_force, qacc_smooth, qacc_euler).

  The trailing two are None on the plain XLA path (they are produced by
  smooth.solve_m / forward.euler there); on the fused Pallas path they
  come out of the kernel."""
  dtype = d.qpos.dtype
  if efc.J.shape[0] == 0:
    if fused_path(m):
      damph = m.opt.timestep * m.dof_damping
      a_smooth = linalg.solve_pd(d.qM, d.qfrc_smooth)
      qacc_euler = linalg.solve_pd(d.qM + jnp.diag(damph), d.qfrc_smooth)
      return (a_smooth, jnp.zeros(m.nv, dtype=dtype),
              jnp.zeros(0, dtype=dtype), a_smooth, qacc_euler)
    return (d.qacc_smooth, jnp.zeros(m.nv, dtype=dtype),
            jnp.zeros(0, dtype=dtype), None, None)

  if _use_pallas() and _pallas_fits(m.nv, efc.J.shape[0]):
    from myosuite_tpu.physics import pallas_solver
    fn = pallas_solver.solve_entry(
        tuple(bool(x) for x in np.asarray(efc.is_friction)),
        int(m.opt.iterations), int(m.opt.ls_iterations))
    damph = (m.opt.timestep * m.dof_damping).astype(dtype)
    return fn(d.qM, efc.J, efc.aref, efc.R, efc.floss,
              efc.active.astype(dtype), d.qacc, d.qfrc_smooth, damph)

  qacc, qfrc, force = newton_xla(d.qM, efc, d.qacc, d.qacc_smooth,
                                 int(m.opt.iterations),
                                 int(m.opt.ls_iterations))
  return qacc, qfrc, force, None, None
