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
B = int(sys.argv[1]) if len(sys.argv)>1 else 2048
rngs = jax.random.split(jax.random.PRNGKey(0), B)
state = jax.jit(jax.vmap(env.reset))(rngs)
d0 = state.data
NS, NC = 10, 8
def run(d):
  def body(dd, _):
    return F.step_n(m, dd, NS), None
  d, _ = jax.lax.scan(body, d, None, length=NC)
  return d
jf = jax.jit(jax.vmap(run))
t0 = time.perf_counter()
out = jf(d0); jax.block_until_ready(out.qpos)
print(f"compile+first: {time.perf_counter()-t0:.1f}s")
t0=time.perf_counter()
for _ in range(3): out = jf(d0)
jax.block_until_ready(out.qpos)
per = (time.perf_counter()-t0)/3/(NC*NS)
print(f"{per*1e3:.3f} ms/substep  -> {B/(per*NS)/1000:.0f}k env-steps/s")
