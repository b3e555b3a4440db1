"""Capture a jax.profiler trace of the benchmark scan for one env.

Usage: python tools/profile_trace.py [env] [batch] [outdir]
Inspect with tensorboard or the trace-summary helper below (prints the
top self-time ops from the xplane proto when tensorboard isn't around).
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os, time

import jax
import jax.numpy as jnp

from myosuite_tpu.utils import jax_cache_dir

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
  jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import myosuite_tpu


def main():
  env_name = sys.argv[1] if len(sys.argv) > 1 else "MtxHandReachRandom-v0"
  batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
  outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/mtx_trace"

  env = myosuite_tpu.make(env_name)
  u = env.action_size
  v_reset = jax.jit(jax.vmap(env.reset))
  v_step = jax.vmap(env.step)
  state = v_reset(jax.random.split(jax.random.PRNGKey(0), batch))

  def loop(carry, _):
    s, key = carry
    key, sub = jax.random.split(key)
    a = jax.random.uniform(sub, shape=(batch, u))
    return (v_step(s, a), key), None

  jit_loop = jax.jit(lambda s, k: jax.lax.scan(
      loop, (s, k), None, length=16))
  key = jax.random.PRNGKey(1)
  (s2, _), _ = jit_loop(state, key)
  jax.block_until_ready(s2.reward)

  t0 = time.perf_counter()
  (s2, _), _ = jit_loop(state, key)
  jax.block_until_ready(s2.reward)
  print(f"scan16 {(time.perf_counter()-t0)*1e3:.1f} ms", file=sys.stderr)

  with jax.profiler.trace(outdir):
    (s2, _), _ = jit_loop(state, key)
    jax.block_until_ready(s2.reward)
  print("trace written to", outdir, file=sys.stderr)


if __name__ == "__main__":
  main()
