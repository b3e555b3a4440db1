"""Throughput benchmark: env-steps/s vs batch size on the default backend.

Replicates the reference harness's measurement protocol
(/root/reference/benchmarks/mjx_benchmark.py:11-62): 16-step lax.scan over
vmapped env.step with random actions, timeit.repeat(number=8192//batch, 3).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured against the driver target of 1M env-steps/s
aggregate (BASELINE.md) scaled to the number of visible devices (the
target is set for a v5e-8; a single chip's pro-rata share is 125k/s).
"""

from __future__ import annotations

import json
import os
import sys
import time
import timeit

import jax

from myosuite_tpu.utils import jax_cache_dir

# machine-keyed cache: cross-machine XLA:CPU AOT entries execute wrong
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
  jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure(env_name: str = "MtxElbowPoseRandom-v0",
            batches=(512, 2048, 4096, 8192), loop_iterations: int = 16,
            seed: int = 0, verbose: bool = True):
  import jax
  import jax.numpy as jnp

  import myosuite_tpu

  env = myosuite_tpu.make(env_name)
  u = env.action_size

  v_reset = jax.jit(jax.vmap(env.reset))
  v_step = jax.vmap(env.step)

  main_key = jax.random.PRNGKey(seed)
  reset_key, scan_key = jax.random.split(main_key)

  results = {}
  for e in batches:
    reset_keys = jax.random.split(reset_key, e)
    v_state = v_reset(reset_keys)

    def physics_loop(carry, _):
      state, key = carry
      key, subkey = jax.random.split(key)
      actions = jax.random.uniform(subkey, shape=(e, u), minval=0.0,
                                   maxval=1.0)
      return (v_step(state, actions), key), None

    jit_loop = jax.jit(lambda s, k: jax.lax.scan(
        physics_loop, (s, k), None, length=loop_iterations))

    (end_state, _), _ = jit_loop(v_state, scan_key)   # compile
    jax.block_until_ready(end_state.reward)

    def run():
      (fs, _), _ = jit_loop(v_state, scan_key)
      jax.block_until_ready(fs.reward)

    number = max(1, 8192 // e)
    times = timeit.repeat(run, number=number, repeat=3)
    best = min(times) / number
    sps = e * loop_iterations / best
    results[e] = sps
    if verbose:
      print(f"  batch={e}: {sps:,.0f} env-steps/s "
            f"({best*1e3:.1f} ms / {loop_iterations}-step scan)",
            file=sys.stderr)
  return results


def main():
  import jax
  n_dev = jax.device_count()
  # Headline env: the myoHand task the BASELINE.md target names. Sweep the
  # reference harness's other envs too (mjx_benchmark.py:26-33) unless
  # MTX_BENCH_ENV pins a single env.
  env_name = os.environ.get("MTX_BENCH_ENV", "MtxHandReachRandom-v0")
  sweep = [env_name]
  if "MTX_BENCH_ENV" not in os.environ and not os.environ.get(
      "MTX_BENCH_FAST"):
    sweep += ["MtxElbowPoseRandom-v0", "MtxFingerPoseRandom-v0"]
  target = 1_000_000 * n_dev / 8.0   # pro-rata share of the v5e-8 target
  headline = None
  for name in sweep:
    print(f"benchmarking {name} on {jax.devices()}", file=sys.stderr)
    results = measure(name)
    best = max(results.values())
    if headline is None:   # first env (the myoHand task) is the headline
      headline = (name, best)
    else:
      print(f"  [{name}] best {best:,.0f} steps/s "
            f"(vs_baseline {best / target:.2f})", file=sys.stderr)
  name, best = headline
  print(json.dumps({
      "metric": f"env_steps_per_sec[{name}]",
      "value": round(best, 1),
      "unit": "steps/s",
      "vs_baseline": round(best / target, 4),
  }))
  sys.stdout.flush()
  os._exit(0)


if __name__ == "__main__":
  main()
