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
# 20 s in a fresh process taking >70 min mid-suite). RAM is plentiful.
gc.disable()

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


# Persistent compilation cache: physics pipelines are expensive to compile
# and identical across test runs. The directory is keyed on the host CPU
# features — entries from a different machine load as mismatched XLA:CPU
# AOT blobs that can execute incorrectly (observed: jitted steps spinning
# forever on poisoned hits).
import jax

from myosuite_tpu.utils import jax_cache_dir

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------------------
# Default-tier (LITE) speed: big-scene behavioral test FILES run eagerly
# (jax.disable_jit) — the env logic they assert is backend-independent,
# and each full hand/leg scene otherwise costs minutes of XLA:CPU compile
# on a small CI box (observed: the jitted default suite exceeded 58 min
# on 2 CPUs). MTX_TEST=FULL restores the jitted path everywhere, so the
# background FULL sweep keeps compile coverage. Compile coverage in the
# default tier comes from the small-model parity/training suites and the
# LITE conformance sweep's small envs.
# ---------------------------------------------------------------------------
import pytest

_LITE_EAGER_FILES = {
    "test_challenge_suite.py",
    "test_challenge_default.py",
    "test_myodm.py",
    "test_sar.py",
    "test_reference_npz.py",
}


@pytest.fixture(autouse=True)
def _lite_eager_files(request):
  if (os.environ.get("MTX_TEST", "LITE").upper() != "FULL"
      and request.node.path.name in _LITE_EAGER_FILES):
    with jax.disable_jit():
      yield
  else:
    yield
