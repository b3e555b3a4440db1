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
from myosuite_tpu.physics import forward as F, kinematics as K, smooth as S, tendon as T, collision as C, constraint as Con, solver as Sol, actuation as A

env = myosuite_tpu.make(sys.argv[1] if len(sys.argv)>1 else "MtxHandReachRandom-v0")
m = env.model
B = int(sys.argv[2]) if len(sys.argv)>2 else 2048
N = 50
rngs = jax.random.split(jax.random.PRNGKey(0), B)
state = jax.jit(jax.vmap(env.reset))(rngs)
d0 = state.data

def scan_time(name, fn):
  def run(d):
    def body(dd, _):
      dd2 = fn(dd)
      # keep carry type: copy evolving fields back into d-structure
      return dd2, None
    d, _ = jax.lax.scan(body, d, None, length=N)
    return d
  jf = jax.jit(jax.vmap(run))
  out = jf(d0); jax.block_until_ready(out.qpos)
  t0=time.perf_counter()
  for _ in range(3): out = jf(d0)
  jax.block_until_ready(out.qpos)
  dt=(time.perf_counter()-t0)/3/N
  print(f"{name:30s} {dt*1e3:8.3f} ms/substep")

scan_time("kinematics", lambda d: K.kinematics(m, d))
scan_time("kin+com_pos", lambda d: K.com_pos(m, K.kinematics(m, d)))
scan_time("kin+com+tendon", lambda d: T.tendon(m, K.com_pos(m, K.kinematics(m, d))))
scan_time("kin+com+tendon+trans", lambda d: A.transmission(m, T.tendon(m, K.com_pos(m, K.kinematics(m, d)))))
scan_time("+crb", lambda d: S.crb(m, A.transmission(m, T.tendon(m, K.com_pos(m, K.kinematics(m, d))))))
scan_time("+factor_m", lambda d: S.factor_m(m, S.crb(m, A.transmission(m, T.tendon(m, K.com_pos(m, K.kinematics(m, d)))))))
scan_time("fwd_position(=+collision)", lambda d: F.fwd_position(m, d))
scan_time("pos+vel", lambda d: F.fwd_velocity(m, F.fwd_position(m, d)))
scan_time("pos+vel+act", lambda d: F.fwd_actuation(m, F.fwd_velocity(m, F.fwd_position(m, d))))
scan_time("pos+vel+act+accel", lambda d: F.fwd_acceleration(m, F.fwd_actuation(m, F.fwd_velocity(m, F.fwd_position(m, d)))))
scan_time("forward(all)", lambda d: F.forward(m, d))
scan_time("full step", lambda d: F.step(m, d))
