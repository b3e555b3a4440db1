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
from myosuite_tpu.physics import forward as F, linalg

env = myosuite_tpu.make("MtxHandReachRandom-v0")
m = env.model
B, N = 2048, 80
rngs = jax.random.split(jax.random.PRNGKey(0), B)
state = jax.jit(jax.vmap(env.reset))(rngs)
d0 = state.data
h = m.opt.timestep

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

def euler_explicit(d):
  dd = F.forward(m, d)
  act = F._integrate_act(m, dd, h)
  qvel = dd.qvel + h * dd.qacc
  qpos = F._integrate_qpos(m, dd.qpos, qvel, h)
  return dd.replace(qpos=qpos, qvel=qvel, act=act, time=dd.time + h)

def euler_noact(d):
  dd = F.forward(m, d)
  mh = dd.qM + h * jnp.diag(m.dof_damping)
  rhs = dd.qfrc_smooth + dd.qfrc_constraint
  qacc = linalg.solve_pd(mh, rhs)
  qvel = dd.qvel + h * qacc
  qpos = F._integrate_qpos(m, dd.qpos, qvel, h)
  return dd.replace(qpos=qpos, qvel=qvel, time=dd.time + h)

scan_time("step current", lambda d: F.step(m, d))
scan_time("step euler-explicit (no damp solve)", euler_explicit)
scan_time("step euler no-act-integrate", euler_noact)
scan_time("forward only", lambda d: F.forward(m, d))
