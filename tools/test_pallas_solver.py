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
import time as _t
def mark(x): print(f"[{_t.time():.0f}] {x}", flush=True)
from myosuite_tpu.physics import forward as F

mark("make")
env = myosuite_tpu.make("MtxHandReachRandom-v0")
m = env.model
B = 2048
rngs = jax.random.split(jax.random.PRNGKey(0), B)
mark("reset")
state = jax.jit(jax.vmap(env.reset))(rngs)
jax.block_until_ready(state.data.qpos)
mark("reset done")
d0 = state.data
# drive to a state with active limits: random ctrl steps with XLA path
os.environ["MTX_DISABLE_PALLAS"] = "1"
step_xla = jax.jit(jax.vmap(lambda d, c: F.step(m, d.replace(ctrl=c))))
key = jax.random.PRNGKey(1)
d = d0
mark("xla loop")
for i in range(20):
  key, k = jax.random.split(key)
  c = jax.random.uniform(k, (B, m.nu))
  d = step_xla(d, c)
jax.block_until_ready(d.qpos)
mark("xla done")
dx = step_xla(d, jnp.ones((B, m.nu)) * 0.8)
jax.block_until_ready(dx.qpos)
mark("dx done")

os.environ["MTX_DISABLE_PALLAS"] = "0"
F.solver._use_pallas.__globals__  # noop
step_pl = jax.jit(jax.vmap(lambda dd, c: F.step(m, dd.replace(ctrl=c))))
mark("pallas compile")
dp = step_pl(d, jnp.ones((B, m.nu)) * 0.8)
jax.block_until_ready(dp.qpos)
mark("pallas done")
print("qacc maxdiff:", float(jnp.max(jnp.abs(dx.qacc - dp.qacc))))
print("qvel maxdiff:", float(jnp.max(jnp.abs(dx.qvel - dp.qvel))))
print("qacc scale:", float(jnp.max(jnp.abs(dx.qacc))))
print("qfrc_con maxdiff:", float(jnp.max(jnp.abs(dx.qfrc_constraint - dp.qfrc_constraint))),
      "scale:", float(jnp.max(jnp.abs(dx.qfrc_constraint))))
