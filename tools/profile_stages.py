import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os, time, functools
import jax

from myosuite_tpu.utils import jax_cache_dir

# machine-keyed cache: cross-machine XLA:CPU AOT entries execute wrong
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
  jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax, jax.numpy as jnp
import myosuite_tpu
from myosuite_tpu.physics import forward as F, kinematics as K, smooth as S, tendon as T, collision as C, constraint as Con, solver as Sol, actuation as A
from myosuite_tpu.physics import io as physics_io

env = myosuite_tpu.make("MtxHandReachRandom-v0")
m = env.model
print("nq,nv,nu,nbody,njnt,ntendon,ncon_max:", m.nq, m.nv, m.nu, m.nbody, m.njnt, m.ntendon, m.ncon_max)
B = 2048
rngs = jax.random.split(jax.random.PRNGKey(0), B)
state = jax.jit(jax.vmap(env.reset))(rngs)
d0 = state.data

def timeit(name, fn, *args):
  jf = jax.jit(jax.vmap(fn, in_axes=(0,)) if len(args)==1 else fn)
  out = jf(*args); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
  t0=time.perf_counter()
  for _ in range(5):
    out = jf(*args)
  jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
  dt=(time.perf_counter()-t0)/5
  print(f"{name:22s} {dt*1e3:8.2f} ms/call")
  return out

# stage-level timings (single call over batch)
timeit("kinematics", lambda d: K.kinematics(m, d), d0)
timeit("com_pos", lambda d: K.com_pos(m, d), d0)
timeit("tendon", lambda d: T.tendon(m, d), d0)
timeit("transmission", lambda d: A.transmission(m, d), d0)
timeit("crb", lambda d: S.crb(m, d), d0)
timeit("factor_m", lambda d: S.factor_m(m, d), d0)
timeit("collision", lambda d: C.collision(m, d), d0)
d1 = timeit("fwd_position", lambda d: F.fwd_position(m, d), d0)
timeit("com_vel", lambda d: K.com_vel(m, d), d1)
timeit("fwd_velocity(after)", lambda d: F.fwd_velocity(m, d), d1)
d2 = timeit("pos+vel+act", lambda d: F.fwd_actuation(m, F.fwd_velocity(m, F.fwd_position(m, d))), d0)
d3 = timeit("fwd_acceleration", lambda d: F.fwd_acceleration(m, d), d2)
timeit("fwd_constraint", lambda d: F.fwd_constraint(m, d), d3)
timeit("full step", lambda d: F.step(m, d), d0)
from myosuite_tpu.physics.constraint import _efc_plan
print("efc plan nefc:", _efc_plan(m).nefc)
