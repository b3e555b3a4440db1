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
from myosuite_tpu.physics import forward as F, kinematics as K, smooth as S, tendon as T, collision as C, actuation as A, linalg
from myosuite_tpu.physics.types import Data

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
  print(f"{name:32s} {(time.perf_counter()-t0)/3/N*1e3:8.3f} ms/substep", flush=True)

# fake stage: keep shape+dependency but trivial compute
def dep(x, *args):
  eps = jnp.float32(0.0)
  for a in args:
    eps = eps + 0.0 * jnp.sum(a)
  return x + eps

def make_step(skip):
  def fwd_pos(d):
    if "kinematics" in skip:
      d = d.replace(xpos=dep(d.xpos, d.qpos), xquat=dep(d.xquat, d.qpos),
                    xanchor=dep(d.xanchor, d.qpos), xaxis=dep(d.xaxis, d.qpos),
                    ximat=dep(d.ximat, d.qpos), xipos=dep(d.xipos, d.qpos))
    else:
      d = K.kinematics(m, d)
    if "com_pos" in skip:
      d = d.replace(subtree_com=dep(d.subtree_com, d.xipos),
                    cinert=dep(d.cinert, d.xipos), cdof=dep(d.cdof, d.xaxis))
    else:
      d = K.com_pos(m, d)
    if "tendon" in skip:
      d = d.replace(ten_length=dep(d.ten_length, d.xpos), ten_J=dep(d.ten_J, d.xpos))
    else:
      d = T.tendon(m, d)
    if "transmission" in skip:
      d = d.replace(actuator_length=dep(d.actuator_length, d.ten_length),
                    actuator_moment=dep(d.actuator_moment, d.ten_J))
    else:
      d = A.transmission(m, d)
    if "crb" in skip:
      d = d.replace(qM=dep(d.qM, d.cinert, d.cdof))
    else:
      d = S.crb(m, d)
    if "factor_m" in skip:
      d = d.replace(qLD=dep(d.qLD, d.qM))
    else:
      d = S.factor_m(m, d)
    d = C.collision(m, d)
    return d
  def fwd_vel(d):
    if "com_vel" in skip:
      d = d.replace(cvel=dep(d.cvel, d.cdof, d.qvel), cdof_dot=dep(d.cdof_dot, d.cdof))
    else:
      d = K.com_vel(m, d)
    d = T.tendon_velocity(m, d)
    d = A.actuator_velocity(m, d)
    if "rne" in skip:
      d = d.replace(qfrc_bias=dep(d.qfrc_bias, d.cvel, d.cinert))
    else:
      d = S.rne(m, d)
    if "passive" in skip:
      d = d.replace(qfrc_passive=dep(d.qfrc_passive, d.qvel, d.ten_velocity))
    else:
      d = S.passive(m, d)
    return d
  def step(d):
    d = fwd_pos(d)
    d = fwd_vel(d)
    if "actuation" in skip:
      d = d.replace(act_dot=dep(d.act_dot, d.ctrl), qfrc_actuator=dep(d.qfrc_actuator, d.actuator_moment, d.act))
    else:
      d = F.fwd_actuation(m, d)
    d = F.fwd_acceleration(m, d)
    if "constraint" in skip:
      d = d.replace(qacc=dep(d.qacc_smooth, d.qLD), qfrc_constraint=dep(d.qfrc_constraint, d.qacc_smooth))
    else:
      d = F.fwd_constraint(m, d)
    return F.euler(m, d)
  return step

scan_time("FULL", make_step(set()))
for st in ["kinematics","com_pos","tendon","transmission","crb","factor_m",
           "com_vel","rne","passive","actuation","constraint"]:
  scan_time(f"minus {st}", make_step({st}))
