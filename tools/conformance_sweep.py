"""Whole-registry conformance sweep with an incremental record.

Role: the reference's per-suite full-registry sweep
(/root/reference/myosuite/tests/test_myo.py:19-48 applying
tests/test_envs.py:41 to every registered id). Unlike the pytest FULL
tier this writes one JSONL row per env AS IT COMPLETES, so a partially
finished sweep still leaves a committed record of what was swept.

Usage:
  python tools/conformance_sweep.py [--out docs/sweep_full.jsonl]
  JAX_PLATFORMS=cpu python tools/conformance_sweep.py   # CPU box
Each row: {"env": id, "ok": bool, "secs": float, "error": str|null}.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import json
import os
import time
import traceback

import jax

from myosuite_tpu.utils import jax_cache_dir

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
  jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import myosuite_tpu
from myosuite_tpu.envs import registry


def check_env(name: str) -> None:
  """tests/test_envs.py _conformance semantics, minus the vmap extras."""
  env = myosuite_tpu.make(name)
  reset = jax.jit(env.reset)
  step = jax.jit(env.step)
  state = reset(jax.random.PRNGKey(0))
  assert "state" in state.obs
  obs_dim = state.obs["state"].shape[-1]
  assert obs_dim > 0 and np.isfinite(np.asarray(state.obs["state"])).all()
  nxt = step(state, 0.5 * jnp.ones(env.action_size))
  assert np.isfinite(float(nxt.reward))
  assert np.isfinite(np.asarray(nxt.obs["state"])).all()
  for k, v in nxt.metrics.items():
    assert np.isfinite(float(v)), k
  # determinism: same seed => same trajectory
  s1, s2 = reset(jax.random.PRNGKey(7)), reset(jax.random.PRNGKey(7))
  for i in range(3):
    act = jnp.full((env.action_size,), 0.3 + 0.1 * i)
    s1, s2 = step(s1, act), step(s2, act)
  np.testing.assert_array_equal(np.asarray(s1.obs["state"]),
                                np.asarray(s2.obs["state"]))


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--out", default="docs/sweep_full.jsonl")
  p.add_argument("--start", type=int, default=0,
                 help="resume from this index in the sorted registry")
  args = p.parse_args()

  names = registry.registered_envs()
  print(f"{len(names)} registered envs; writing {args.out}", flush=True)
  mode = "a" if args.start else "w"
  n_ok = 0
  with open(args.out, mode) as f:
    if not args.start:
      f.write(json.dumps({
          "sweep": "full-registry conformance",
          "n_envs": len(names),
          "backend": jax.default_backend(),
          "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
      }) + "\n")
      f.flush()
    for i, name in enumerate(names[args.start:], start=args.start):
      t0 = time.time()
      row = {"i": i, "env": name}
      try:
        check_env(name)
        row["ok"] = True
        n_ok += 1
      except Exception as e:  # record and continue: a sweep, not a gate
        row["ok"] = False
        row["error"] = traceback.format_exception_only(type(e), e)[-1].strip()
      row["secs"] = round(time.time() - t0, 2)
      f.write(json.dumps(row) + "\n")
      f.flush()
      print(f"[{i + 1}/{len(names)}] {name}: "
            f"{'ok' if row['ok'] else 'FAIL'} ({row['secs']}s)", flush=True)
  print(f"done: {n_ok} ok", flush=True)


if __name__ == "__main__":
  main()
