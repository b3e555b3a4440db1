import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os, time
import jax

from myosuite_tpu.utils import jax_cache_dir

# machine-keyed cache: cross-machine XLA:CPU AOT entries execute wrong
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
  jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax, jax.numpy as jnp
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
  print(f"{name:36s} {(time.perf_counter()-t0)/3/N*1e3:8.3f} ms/substep")

def custom_solver(n_newton, n_ls, guard, warm):
  def fc(d):
    efc = Con.make_efc(m, d)
    a_smooth = d.qacc_smooth
    def total_cost(a):
      jar = math.mm(efc.J, a) - efc.aref
      da = a - a_smooth
      return 0.5 * da @ math.mm(d.qM, da) + Sol._cost(efc, jar)
    a = jnp.where(total_cost(d.qacc) < total_cost(a_smooth), d.qacc, a_smooth) if warm else a_smooth
    for _ in range(n_newton):
      jar = math.mm(efc.J, a) - efc.aref
      force, w = Sol._forces(efc, jar)
      grad = math.mm(d.qM, a - a_smooth) - math.mm(efc.J.T, force)
      hess = d.qM + math.mm(efc.J.T * w[None, :], efc.J)
      hess = hess + 1e-8 * jnp.eye(m.nv, dtype=a.dtype)
      p = -linalg.solve_pd(hess, grad)
      jp = math.mm(efc.J, p)
      g0 = p @ math.mm(d.qM, a - a_smooth)
      pmp = p @ math.mm(d.qM, p)
      alpha = jnp.float32(1.0)
      for _ in range(n_ls):
        jar_a = jar + alpha * jp
        force_a, w_a = Sol._forces(efc, jar_a)
        dphi = g0 + alpha * pmp - jnp.sum(force_a * jp)
        ddphi = pmp + jnp.sum(w_a * jp * jp)
        alpha = jnp.clip(alpha - dphi/jnp.maximum(ddphi,1e-12), 0.0, 4.0)
      a_new = a + alpha * p
      a = jnp.where(total_cost(a_new) <= total_cost(a), a_new, a) if guard else a_new
    qfrc = math.mm(efc.J.T, Sol._forces(efc, math.mm(efc.J, a) - efc.aref)[0])
    return d.replace(qacc=a, qfrc_constraint=qfrc)
  def step(d):
    d = F.fwd_position(m, d)
    d = F.fwd_velocity(m, d)
    d = F.fwd_actuation(m, d)
    d = F.fwd_acceleration(m, d)
    d = fc(d)
    return F.euler(m, d)
  return step

scan_time("full step (current)", lambda d: F.step(m, d))
scan_time("step g+w (same as current)", custom_solver(6,6,True,True))
scan_time("step noguard warm", custom_solver(6,6,False,True))
scan_time("step noguard nowarm", custom_solver(6,6,False,False))
scan_time("step newton4 ls4 g w", custom_solver(4,4,True,True))
def no_constraint(d):
  d = F.fwd_position(m, d)
  d = F.fwd_velocity(m, d)
  d = F.fwd_actuation(m, d)
  d = F.fwd_acceleration(m, d)
  d = d.replace(qacc=d.qacc_smooth)
  return F.euler(m, d)
scan_time("step NO-constraint", no_constraint)
