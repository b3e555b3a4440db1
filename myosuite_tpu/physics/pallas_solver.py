"""Fused Pallas TPU kernel for the Newton constraint solver.

Why this exists: the XLA path in solver.py lowers one physics substep's
Newton solve to ~400 small HLO ops over (batch, 23)-ish tensors, each
paying HBM round-trips for its operands — measured at 1.3 ms/substep for
myoHand at batch 2048 on a v5e chip, 40% of the whole step. This kernel
runs the complete solve (warmstart + N Newton iterations, each with an
unrolled Cholesky and exact 1D linesearch) out of VMEM in ONE kernel:
inputs are read from HBM once, every intermediate lives on-chip.

Layout: the env batch is the *trailing* (8, 128) tile — sublane x lane —
so every scalar-per-env operation in the solver becomes a full-width VPU
op. Matrix dimensions (nv, nefc <= ~60) are leading axes unrolled at
trace time. The batch is blocked in groups of 1024 envs (grid dim 0).

Semantics are identical to solver.solve (same iteration counts, same
linesearch, same cost guard); reference anchor for the solver config is
/root/reference/myosuite/envs/myo/mjx/mjx_base_env.py:49-51
(iterations=6, ls_iterations=6).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RIDGE = 1e-8
_EPS = 1e-12

# batch tile: (sublane, lane) for float32
_SUB, _LANE = 8, 128
_BLOCK = _SUB * _LANE


# ---------------------------------------------------------------------------
# batched small-matrix helpers: operands carry trailing (8, 128) env dims
# ---------------------------------------------------------------------------


def _matvec(A, x):
  """(r, c, 8, 128) @ (c, 8, 128) -> (r, 8, 128)."""
  return jnp.sum(A * x[None], axis=1)


def _matvec_t(A, y):
  """(r, c, 8, 128)^T @ (r, 8, 128) -> (c, 8, 128)."""
  return jnp.sum(A * y[:, None], axis=0)


def _dot(x, y):
  """(n, 8, 128) . (n, 8, 128) -> (8, 128)."""
  return jnp.sum(x * y, axis=0)


def _chol_factor(M):
  """Left-looking unrolled Cholesky on (n, n, 8, 128)."""
  n = M.shape[0]
  cols = [None] * n
  for j in range(n):
    s = M[j:, j]
    for k in range(j):
      # cols[k] holds rows k..n-1 of column k
      s = s - cols[k][j - k:] * cols[k][j - k][None]
    djj = jnp.sqrt(jnp.maximum(s[0], _EPS))
    cols[j] = s / djj[None]
  return cols      # cols[j]: (n - j, 8, 128)


def _chol_solve(cols, b):
  """Solve (L L^T) x = b with L given as per-column list."""
  n = b.shape[0]
  # forward: L y = b
  y = [None] * n
  for i in range(n):
    s = b[i]
    for k in range(i):
      s = s - cols[k][i - k] * y[k]
    y[i] = s / cols[i][0]
  # backward: L^T x = y
  x = [None] * n
  for i in reversed(range(n)):
    s = y[i]
    for k in range(i + 1, n):
      s = s - cols[i][k - i] * x[k]
    x[i] = s / cols[i][0]
  return jnp.stack(x)


def _solver_kernel(qM_ref, J_ref, aref_ref, R_ref, floss_ref, active_ref,
                   warm_ref, qfs_ref, damph_ref,
                   qacc_ref, qfrc_ref, force_ref, asmooth_ref, qaccint_ref,
                   *, n_friction: int, iterations: int,
                   ls_iterations: int):
  qM = qM_ref[:]                # (nv, nv, 8, 128)
  J = J_ref[:]                  # (nefc, nv, 8, 128)
  aref = aref_ref[:]            # (nefc, 8, 128)
  Rinv = 1.0 / R_ref[:]
  floss = floss_ref[:]
  active = active_ref[:]        # float mask
  qfs = qfs_ref[:]              # qfrc_smooth (nv, 8, 128)
  damph = damph_ref[:]          # h * dof_damping (nv, 8, 128)
  warm = warm_ref[:]

  # a_smooth = qM^-1 qfrc_smooth, factored here so the XLA graph never
  # needs mj_factorM/mj_solveM stages (each an unrolled Cholesky of ~n
  # scatter-broken fusions per substep).
  a_smooth = _chol_solve(_chol_factor(qM), qfs)

  nefc = aref.shape[0]
  # friction rows are a static PREFIX of the efc layout
  # (constraint.make_efc emits [dof friction][joint lim][tendon lim]
  # [contacts]), so the mask is an iota comparison — pallas kernels cannot
  # capture array constants.
  isfr = (jax.lax.broadcasted_iota(jnp.int32, (nefc, 1, 1), 0)
          < n_friction).astype(aref.dtype)

  def forces(jar):
    quad_f = -jar * Rinv
    lim_on = active * (jar < 0.0)
    lim_force = lim_on * quad_f
    lim_w = lim_on * Rinv
    fr_force = jnp.clip(quad_f, -floss, floss)
    fr_in = (jnp.abs(quad_f) < floss).astype(jar.dtype)
    force = isfr * fr_force + (1.0 - isfr) * lim_force
    w = isfr * fr_in * Rinv + (1.0 - isfr) * lim_w
    return force, w

  def cost(jar):
    quad = 0.5 * jar * jar * Rinv
    lim_cost = active * (jar < 0.0) * quad
    band = floss / jnp.maximum(Rinv, _EPS)
    fr_cost = jnp.where(jnp.abs(jar) < band, quad,
                        floss * jnp.abs(jar) - 0.5 * floss * band)
    return jnp.sum(isfr * fr_cost + (1.0 - isfr) * lim_cost, axis=0)

  def total_cost(a):
    jar = _matvec(J, a) - aref
    da = a - a_smooth
    return 0.5 * _dot(da, _matvec(qM, da)) + cost(jar)

  # warmstart: previous qacc if it beats qacc_smooth
  use_warm = total_cost(warm) < total_cost(a_smooth)
  a = jnp.where(use_warm[None], warm, a_smooth)

  nv = qM.shape[0]
  ii = jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1, 1), 0)
  jj = jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1, 1), 1)
  eye_ridge = (ii == jj).astype(qM.dtype) * _RIDGE

  for _ in range(iterations):
    jar = _matvec(J, a) - aref
    force, w = forces(jar)
    grad = _matvec(qM, a - a_smooth) - _matvec_t(J, force)
    # hess = qM + J^T diag(w) J  (+ ridge); row-at-a-time keeps the
    # intermediate at (nefc, nv, 8, 128) instead of (nefc, nv, nv, 8, 128)
    Jw = J * w[:, None]
    rows = [jnp.sum(Jw[:, v:v + 1] * J, axis=0) for v in range(nv)]
    hess = jnp.stack(rows) + qM + eye_ridge
    cols = _chol_factor(hess)
    p = -_chol_solve(cols, grad)

    jp = _matvec(J, p)
    g0 = _dot(p, _matvec(qM, a - a_smooth))
    pmp = _dot(p, _matvec(qM, p))
    alpha = jnp.ones_like(g0)
    for _ in range(ls_iterations):
      jar_a = jar + alpha[None] * jp
      force_a, w_a = forces(jar_a)
      dphi = g0 + alpha * pmp - jnp.sum(force_a * jp, axis=0)
      ddphi = pmp + jnp.sum(w_a * jp * jp, axis=0)
      alpha = jnp.clip(alpha - dphi / jnp.maximum(ddphi, 1e-12), 0.0, 4.0)
    a_new = a + alpha[None] * p
    better = (total_cost(a_new) <= total_cost(a))[None]
    a = jnp.where(better, a_new, a)

  jar = _matvec(J, a) - aref
  force, _ = forces(jar)
  qfrc = _matvec_t(J, force)

  # implicit-damping Euler solve (mj_Euler): (qM + h diag(damping)) qacc =
  # qfrc_smooth + qfrc_constraint, fused here to drop the second full
  # Cholesky from the XLA substep graph.
  eyef = (ii == jj).astype(qM.dtype)
  mh = qM + eyef * damph[:, None]
  qacc_int = _chol_solve(_chol_factor(mh), qfs + qfrc)

  qacc_ref[:] = a
  qfrc_ref[:] = qfrc
  force_ref[:] = force
  asmooth_ref[:] = a_smooth
  qaccint_ref[:] = qacc_int


def _to_tiles(x: jax.Array, nb: int) -> jax.Array:
  """(B, ...) -> (..., nb, 8, 128): batch to trailing tiles."""
  lead = tuple(range(1, x.ndim))
  x = jnp.transpose(x, lead + (0,))
  return x.reshape(x.shape[:-1] + (nb, _SUB, _LANE))


def _from_tiles(x: jax.Array, batch: int) -> jax.Array:
  """(..., nb, 8, 128) -> (B, ...)."""
  x = x.reshape(x.shape[:-3] + (-1,))
  lead = tuple(range(x.ndim - 1))
  return jnp.transpose(x, (x.ndim - 1,) + lead)[:batch]


def solve_batched(qM, J, aref, R, floss, active, warm, qfrc_smooth, damph,
                  *, is_friction: Tuple[bool, ...], iterations: int,
                  ls_iterations: int, interpret: bool = False):
  """Batched Newton solve + fused smooth/implicit solves. Args lead with
  batch axis; returns (qacc, qfrc_constraint, efc_force, qacc_smooth,
  qacc_euler) batched the same way."""
  batch = qM.shape[0]
  nv = qM.shape[-1]
  nefc = J.shape[1]
  pad = (-batch) % _BLOCK
  if pad:
    # pad with identity systems so the dummy envs stay PD and finite
    eye = jnp.broadcast_to(jnp.eye(nv, dtype=qM.dtype), (pad, nv, nv))
    qM = jnp.concatenate([qM, eye])
    J = jnp.concatenate([J, jnp.zeros((pad,) + J.shape[1:], J.dtype)])
    zs = lambda x: jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    aref, floss, warm, qfrc_smooth, damph = map(
        zs, (aref, floss, warm, qfrc_smooth, damph))
    R = jnp.concatenate([R, jnp.ones((pad,) + R.shape[1:], R.dtype)])
    active = jnp.concatenate(
        [active, jnp.zeros((pad,) + active.shape[1:], active.dtype)])
  nb = qM.shape[0] // _BLOCK

  qM_t = _to_tiles(qM, nb)
  J_t = _to_tiles(J, nb)
  aref_t = _to_tiles(aref, nb)
  R_t = _to_tiles(R, nb)
  floss_t = _to_tiles(floss, nb)
  active_t = _to_tiles(active.astype(qM.dtype), nb)
  warm_t = _to_tiles(warm, nb)
  qfs_t = _to_tiles(qfrc_smooth, nb)
  damph_t = _to_tiles(damph, nb)

  isfr = np.asarray(is_friction, dtype=bool)
  n_friction = int(isfr.sum())
  assert not isfr[n_friction:].any(), (
      "friction rows must be a prefix of the efc layout")
  kernel = functools.partial(
      _solver_kernel, n_friction=n_friction,
      iterations=iterations, ls_iterations=ls_iterations)

  mat_spec = lambda r, c: pl.BlockSpec(
      (r, c, None, _SUB, _LANE), lambda b: (0, 0, b, 0, 0),
      memory_space=pltpu.VMEM)
  vec_spec = lambda r: pl.BlockSpec(
      (r, None, _SUB, _LANE), lambda b: (0, b, 0, 0),
      memory_space=pltpu.VMEM)

  qacc_t, qfrc_t, force_t, asm_t, qint_t = pl.pallas_call(
      kernel,
      grid=(nb,),
      interpret=interpret,
      # Mosaic's default 16 MiB scoped-VMEM cap OOMs once the grid double-
      # buffers blocks of a big model (observed: myoLeg nv=20/nefc=54 at
      # nb>=2 needs 22.5 MiB). Give the kernel most of the chip's VMEM;
      # solver._pallas_fits keeps truly oversized models off this path.
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      in_specs=[mat_spec(nv, nv), mat_spec(nefc, nv), vec_spec(nefc),
                vec_spec(nefc), vec_spec(nefc), vec_spec(nefc),
                vec_spec(nv), vec_spec(nv), vec_spec(nv)],
      out_specs=[vec_spec(nv), vec_spec(nv), vec_spec(nefc),
                 vec_spec(nv), vec_spec(nv)],
      out_shape=[
          jax.ShapeDtypeStruct((nv, nb, _SUB, _LANE), qM.dtype),
          jax.ShapeDtypeStruct((nv, nb, _SUB, _LANE), qM.dtype),
          jax.ShapeDtypeStruct((nefc, nb, _SUB, _LANE), qM.dtype),
          jax.ShapeDtypeStruct((nv, nb, _SUB, _LANE), qM.dtype),
          jax.ShapeDtypeStruct((nv, nb, _SUB, _LANE), qM.dtype),
      ],
  )(qM_t, J_t, aref_t, R_t, floss_t, active_t, warm_t, qfs_t, damph_t)

  return (_from_tiles(qacc_t, batch), _from_tiles(qfrc_t, batch),
          _from_tiles(force_t, batch), _from_tiles(asm_t, batch),
          _from_tiles(qint_t, batch))


# ---------------------------------------------------------------------------
# custom_vmap entry: slots the batched kernel into per-env vmapped code
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def solve_entry(is_friction: Tuple[bool, ...], iterations: int,
                ls_iterations: int, interpret: bool = False):
  """Per-env solve fn whose vmap rule dispatches to the fused kernel.

  The engine's step is written per-env and batched with jax.vmap at the
  trainer (SURVEY.md section 7 architecture); jax.custom_batching lets the
  solver swap in the whole-batch Pallas kernel at exactly that boundary.

  Batches below one (8, 128) tile block — eval, debugging, single-env
  rollouts — route to the XLA Newton instead of padding up to _BLOCK envs
  (up to 1024x wasted compute); so do direct un-vmapped calls. The Pallas
  path has no jvp/vjp rule: set MTX_DISABLE_PALLAS=1 to differentiate
  through the solver via the XLA path.
  """
  from jax import custom_batching

  from myosuite_tpu.physics import solver as _solver
  from myosuite_tpu.physics.constraint import Efc

  kw = dict(is_friction=is_friction, iterations=iterations,
            ls_iterations=ls_iterations, interpret=interpret)
  isfr_np = np.asarray(is_friction, dtype=bool)

  def xla_single(qM, J, aref, R, floss, active, warm, qfrc_smooth, damph):
    from myosuite_tpu.physics import linalg
    a_smooth = linalg.solve_pd(qM, qfrc_smooth)
    efc = Efc(J=J, aref=aref, R=R, floss=floss, active=active != 0,
              is_friction=isfr_np)
    qacc, qfrc, force = _solver.newton_xla(qM, efc, warm, a_smooth,
                                           iterations, ls_iterations)
    mh = qM + jnp.diag(damph)
    qacc_euler = linalg.solve_pd(mh, qfrc_smooth + qfrc)
    return qacc, qfrc, force, a_smooth, qacc_euler

  @custom_batching.custom_vmap
  def f(qM, J, aref, R, floss, active, warm, qfrc_smooth, damph):
    # un-vmapped call: a single env never pays for a padded kernel block
    return xla_single(qM, J, aref, R, floss, active, warm, qfrc_smooth,
                      damph)

  @f.def_vmap
  def _rule(axis_size, in_batched, qM, J, aref, R, floss, active, warm,
            qfrc_smooth, damph):
    def bcast(x, b):
      return x if b else jnp.broadcast_to(x[None],
                                          (axis_size,) + x.shape)
    args = [bcast(x, b) for x, b in
            zip((qM, J, aref, R, floss, active, warm, qfrc_smooth, damph),
                in_batched)]
    if axis_size < _BLOCK:
      outs = jax.vmap(xla_single)(*args)
    else:
      outs = solve_batched(*args, **kw)
    return tuple(outs), (True, True, True, True, True)

  return f

