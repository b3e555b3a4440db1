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
from myosuite_tpu.physics import forward as F

env = myosuite_tpu.make("MtxHandReachRandom-v0")
m = env.model
B = 2048
rngs = jax.random.split(jax.random.PRNGKey(0), B)
state = jax.jit(jax.vmap(env.reset))(rngs)
d0 = state.data
NS = 10   # substeps per ctrl step
NC = 8    # ctrl steps in outer scan

def outer(name, substep_fn):
  def run(d):
    def body(dd, _):
      return substep_fn(dd), None
    d, _ = jax.lax.scan(body, d, None, length=NC)
    return d
  jf = jax.jit(jax.vmap(run))
  out = jf(d0); jax.block_until_ready(out.qpos)
  t0=time.perf_counter()
  for _ in range(3): out = jf(d0)
  jax.block_until_ready(out.qpos)
  per = (time.perf_counter()-t0)/3/(NC*NS)
  print(f"{name:34s} {per*1e3:8.3f} ms/substep  -> {B/ (per*NS)/1000:.0f}k env-steps/s")

def stepn_scan(d):
  return F.step_n(m, d, NS)

def stepn_unroll(d):
  for _ in range(NS):
    d = F.step(m, d)
  return d

outer("ctrl-step: scan(10 substeps)", stepn_scan)
outer("ctrl-step: unrolled 10 substeps", stepn_unroll)
