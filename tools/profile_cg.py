import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os, time
import jax

from myosuite_tpu.utils import jax_cache_dir

# machine-keyed cache: cross-machine XLA:CPU AOT entries execute wrong
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
  jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax, jax.numpy as jnp, numpy as np
import myosuite_tpu
from myosuite_tpu.physics import forward as F, constraint as Con, solver as Sol
from myosuite_tpu.physics import math, linalg

env = myosuite_tpu.make("MtxHandReachRandom-v0")
m = env.model
B, N = 2048, 80
rngs = jax.random.split(jax.random.PRNGKey(0), B)
state = jax.jit(jax.vmap(env.reset))(rngs)
d0 = state.data

def scan_time(name, fn):
  def run(d):
    def body(dd, _):
      return fn(dd), None
    d, _ = jax.lax.scan(body, d, None, length=N)
    return d
  jf = jax.jit(jax.vmap(run))
  out = jf(d0); jax.block_until_ready(out.qpos)
  t0=time.perf_counter()
  for _ in range(3): out = jf(d0)
  jax.block_until_ready(out.qpos)
  print(f"{name:36s} {(time.perf_counter()-t0)/3/N*1e3:8.3f} ms/substep", flush=True)
  return None

def tri_inv(L):
  """Explicit inverse of lower-triangular L, unrolled (columns of identity)."""
  n = L.shape[-1]
  # forward substitution with identity rhs, all columns at once
  X = jnp.zeros_like(L)
  for i in range(n):
    e = jnp.zeros(n, dtype=L.dtype).at[i].set(1.0)
    s = e - (jnp.einsum('...j,...jk->...k', L[..., i, :i], X[..., :i, :]) if i else 0.0)
    X = X.at[..., i, :].set(s / L[..., i, i][..., None])
  return X

def solver_cg(n_newton, n_cg):
  def fc(d):
    efc = Con.make_efc(m, d)
    a_smooth = d.qacc_smooth
    Linv = tri_inv(d.qLD)
    Minv = jnp.einsum('...ji,...jk->...ik', Linv, Linv)  # L^-T L^-1
    def total_cost(a):
      jar = math.mm(efc.J, a) - efc.aref
      da = a - a_smooth
      return 0.5 * da @ math.mm(d.qM, da) + Sol._cost(efc, jar)
    a = jnp.where(total_cost(d.qacc) < total_cost(a_smooth), d.qacc, a_smooth)
    for _ in range(n_newton):
      jar = math.mm(efc.J, a) - efc.aref
      force, w = Sol._forces(efc, jar)
      grad = math.mm(d.qM, a - a_smooth) - math.mm(efc.J.T, force)
      Jw = efc.J * w[:, None]
      def hmul(v):
        return math.mm(d.qM, v) + math.mm(efc.J.T, math.mm(Jw, v))
      # PCG with P = Minv
      x = jnp.zeros_like(grad)
      r = grad
      z = math.mm(Minv, r)
      p = z
      rz = r @ z
      for _ in range(n_cg):
        hp = hmul(p)
        alpha = rz / jnp.maximum(p @ hp, 1e-20)
        x = x + alpha * p
        r = r - alpha * hp
        z = math.mm(Minv, r)
        rz_new = r @ z
        p = z + (rz_new / jnp.maximum(rz, 1e-20)) * p
        rz = rz_new
      p_dir = -x
      jp = math.mm(efc.J, p_dir)
      g0 = p_dir @ math.mm(d.qM, a - a_smooth)
      pmp = p_dir @ math.mm(d.qM, p_dir)
      alpha = jnp.float32(1.0)
      for _ in range(int(m.opt.ls_iterations)):
        jar_a = jar + alpha * jp
        force_a, w_a = Sol._forces(efc, jar_a)
        dphi = g0 + alpha * pmp - jnp.sum(force_a * jp)
        ddphi = pmp + jnp.sum(w_a * jp * jp)
        alpha = jnp.clip(alpha - dphi/jnp.maximum(ddphi,1e-12), 0.0, 4.0)
      a_new = a + alpha * p_dir
      a = jnp.where(total_cost(a_new) <= total_cost(a), a_new, a)
    qfrc = math.mm(efc.J.T, Sol._forces(efc, math.mm(efc.J, a) - efc.aref)[0])
    return d.replace(qacc=a, qfrc_constraint=qfrc)
  def step(d):
    d = F.fwd_position(m, d)
    d = F.fwd_velocity(m, d)
    d = F.fwd_actuation(m, d)
    qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator + d.qfrc_applied)
    d = d.replace(qfrc_smooth=qfrc_smooth,
                  qacc_smooth=linalg.chol_solve(d.qLD, qfrc_smooth))
    d = fc(d)
    return F.euler(m, d)
  return step

scan_time("current step", lambda d: F.step(m, d))
scan_time("newton6 + PCG8", solver_cg(6, 8))
scan_time("newton6 + PCG5", solver_cg(6, 5))
scan_time("newton4 + PCG6", solver_cg(4, 6))

# accuracy check vs current on one batch
ref_step = jax.jit(jax.vmap(lambda d: F.step(m, d)))
cg_step = jax.jit(jax.vmap(solver_cg(6, 8)))
dr = ref_step(d0); dc = cg_step(d0)
print("qacc diff:", float(jnp.max(jnp.abs(dr.qacc - dc.qacc))),
      "qvel diff:", float(jnp.max(jnp.abs(dr.qvel - dc.qvel))))
dc5 = jax.jit(jax.vmap(solver_cg(6,5)))(d0)
print("qacc diff PCG5:", float(jnp.max(jnp.abs(dr.qacc - dc5.qacc))))
