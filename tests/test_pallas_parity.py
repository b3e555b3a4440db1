"""Pallas Newton-solver kernel vs XLA reference solver, on CPU.

The fused TPU kernel (physics/pallas_solver.py) is the default solve path
on TPU but is invisible to the CPU-pinned test suite; this runs the SAME
kernel in Pallas interpret mode against solver.newton_xla on synthetic
constraint systems so an edit to the kernel cannot silently diverge. The
kernel also fuses the smooth solve (a_smooth = qM^-1 qfrc_smooth) and the
implicit-damping Euler solve; both are checked against linalg.solve_pd.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myosuite_tpu.physics import linalg, pallas_solver, solver
from myosuite_tpu.physics.constraint import Efc


def _random_system(rng: np.random.Generator, nv: int, nefc: int,
                   n_friction: int):
  A = rng.standard_normal((nv, nv)).astype(np.float32)
  qM = A @ A.T + 2.0 * np.eye(nv, dtype=np.float32)
  J = rng.standard_normal((nefc, nv)).astype(np.float32)
  aref = rng.standard_normal(nefc).astype(np.float32)
  R = (0.1 + rng.random(nefc)).astype(np.float32)
  floss = np.zeros(nefc, dtype=np.float32)
  floss[:n_friction] = 0.5 + rng.random(n_friction)
  active = np.ones(nefc, dtype=np.float32)
  active[n_friction:] = (rng.random(nefc - n_friction) > 0.3)
  warm = rng.standard_normal(nv).astype(np.float32)
  qfrc_smooth = rng.standard_normal(nv).astype(np.float32)
  damph = (0.01 * rng.random(nv)).astype(np.float32)
  return qM, J, aref, R, floss, active, warm, qfrc_smooth, damph


def _xla_reference(is_friction):
  isfr_np = np.asarray(is_friction)

  def xla_one(qM, J, aref, R, floss, active, warm, qfrc_smooth, damph):
    a_smooth = linalg.solve_pd(qM, qfrc_smooth)
    efc = Efc(J=J, aref=aref, R=R, floss=floss, active=active != 0,
              is_friction=isfr_np)
    qacc, qfrc, force = solver.newton_xla(qM, efc, warm, a_smooth, 6, 6)
    qacc_euler = linalg.solve_pd(qM + jnp.diag(damph), qfrc_smooth + qfrc)
    return qacc, qfrc, force, a_smooth, qacc_euler

  return xla_one


@pytest.mark.parametrize("batch", [5, 37])
def test_pallas_kernel_matches_xla(batch):
  nv, nefc, n_fr = 5, 9, 3
  rng = np.random.default_rng(0)
  args = [np.stack(x) for x in zip(
      *[_random_system(rng, nv, nefc, n_fr) for _ in range(batch)])]
  args = [jnp.asarray(a) for a in args]

  is_friction = tuple([True] * n_fr + [False] * (nefc - n_fr))
  outs_p = pallas_solver.solve_batched(
      *args, is_friction=is_friction, iterations=6, ls_iterations=6,
      interpret=True)

  outs_x = jax.vmap(_xla_reference(is_friction))(*args)

  for p, x, name in zip(outs_p, outs_x,
                        ("qacc", "qfrc", "force", "a_smooth", "qacc_euler")):
    np.testing.assert_allclose(p, x, rtol=1e-4, atol=1e-4, err_msg=name)


def test_solve_entry_small_batch_uses_xla():
  """vmap of the custom_vmap entry below one kernel block must not pad to
  1024 envs: it routes to the XLA path, so interpret=False still works on
  CPU and results match the direct XLA solve."""
  nv, nefc, n_fr = 4, 6, 2
  batch = 8
  rng = np.random.default_rng(1)
  args = [np.stack(x) for x in zip(
      *[_random_system(rng, nv, nefc, n_fr) for _ in range(batch)])]
  args = [jnp.asarray(a) for a in args]

  is_friction = tuple([True] * n_fr + [False] * (nefc - n_fr))
  entry = pallas_solver.solve_entry(is_friction, 6, 6)
  qacc_e, _, _, asm_e, qeu_e = jax.jit(jax.vmap(entry))(*args)

  qacc_x, _, _, asm_x, qeu_x = jax.vmap(_xla_reference(is_friction))(*args)
  np.testing.assert_allclose(qacc_e, qacc_x, rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(asm_e, asm_x, rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(qeu_e, qeu_x, rtol=1e-5, atol=1e-5)


def test_solve_entry_unbatched_no_padding():
  nv, nefc, n_fr = 4, 6, 2
  rng = np.random.default_rng(2)
  args = [jnp.asarray(a) for a in _random_system(rng, nv, nefc, n_fr)]
  is_friction = tuple([True] * n_fr + [False] * (nefc - n_fr))
  entry = pallas_solver.solve_entry(is_friction, 6, 6)
  qacc, qfrc, force, a_smooth, qacc_euler = jax.jit(entry)(*args)
  assert qacc.shape == (nv,) and force.shape == (nefc,)
  assert np.isfinite(np.asarray(qacc)).all()
  assert np.isfinite(np.asarray(qacc_euler)).all()


def test_chol_factor_nan_on_non_pd():
  """Non-PD input must surface as NaN, not silently-finite garbage."""
  M = jnp.asarray(np.diag([1.0, -2.0, 3.0]).astype(np.float32))
  L = linalg.chol_factor(M)
  assert np.isnan(np.asarray(L)[1:, 1]).all()
  # PD input stays NaN-free
  Mpd = jnp.asarray(np.diag([1.0, 2.0, 3.0]).astype(np.float32))
  assert np.isfinite(np.asarray(linalg.chol_factor(Mpd))).all()
