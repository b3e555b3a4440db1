"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Mirrors the reference's CPU-pinned JAX tests
(/root/reference/myosuite/tests/test_mjx.py:9) plus the multi-chip fake
required for sharding tests (xla_force_host_platform_device_count).
Must run before the first jax import.
"""

import gc
import os

# The suite keeps hundreds of jitted graphs + cached envs alive (registry
# lru_cache); CPython gen-2 collections over that object graph during a
# large trace go pathological (observed: a torso step that compiles in
# 20 s in a fresh process taking >70 min mid-suite). A blanket
# gc.disable() is NOT the fix — with collection off, the millions of
# short-lived tracer objects each big-scene trace creates are never
# reclaimed and tracing itself degrades the same way. Instead: freeze()
# moves everything alive at conftest time out of the collectable
# generations (per-file freezes below keep doing so as caches grow), so
# gen-2 scans only ever walk per-test garbage.
gc.freeze()


import pytest


@pytest.fixture(autouse=True, scope="module")
def _reset_jax_state_between_files():
  """Drop jit caches and freeze long-lived objects after each test file.

  Accumulated in-process jit/tracing state makes LATER big-scene compiles
  pathologically slow (observed: a bimanual step graph that cold-compiles
  in 71 s in a fresh process taking >19 min as test #13 of a session,
  with or without gc enabled). Each file re-pays its own compiles; that
  is minutes total, not tens of minutes."""
  yield
  import jax
  jax.clear_caches()
  gc.collect()
  gc.freeze()

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon TPU-tunnel sitecustomize registers its PJRT plugin (and reads
# jax's platform config) before conftest runs, so the env var alone is
# ignored — force the platform through jax.config below as well.


def pytest_sessionfinish(session, exitstatus):
  session.config._final_exitstatus = int(exitstatus)


def pytest_unconfigure(config):
  # The TPU-tunnel jax plugin registers an atexit handler that can hang for
  # minutes at interpreter shutdown even when tests run on CPU; hard-exit
  # once pytest has reported.
  import sys
  sys.stdout.flush()
  sys.stderr.flush()
  os._exit(getattr(config, "_final_exitstatus", 0))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()


# NO persistent compilation cache for tests. XLA:CPU AOT cache entries
# are machine-feature sensitive in ways the cache key does not capture
# (+prefer-no-scatter/+prefer-no-gather drift between concurrently
# running processes on the SAME box); a mismatched load either fails
# noisily and recompiles, or loads poisoned and executes garbage —
# observed as a 2-step smoke test spinning for 20+ minutes inside its
# while_loop solver. Cold compiles are 20-70 s per big scene and are paid
# once per suite run; correctness beats the warm-start.
import jax

jax.config.update("jax_platforms", "cpu")


# NOTE on tiers: everything runs JITTED, including the big hand/leg/arm
# scenes. Measured on this 2-CPU box: a jitted leg-scene reset+step
# compiles cold in ~25 s (persistent cache makes reruns instant), while
# ONE eager (disable_jit) leg-scene reset costs ~270 s of per-op dispatch
# — the earlier eager-files tier was strictly slower than compiling.
# Default (LITE) keeps the suite small by trimming the conformance env
# list and rollout lengths; MTX_TEST=FULL sweeps everything.
