def jax_cache_dir() -> str:
  """Machine-keyed persistent compilation cache directory.

  XLA:CPU AOT results are target-machine specific, but the persistent
  cache key does NOT include host CPU features: an entry written on a
  different machine (a previous build-round container) loads with a
  cpu_aot_loader machine-feature-mismatch warning and can then execute
  incorrectly — observed as jitted steps spinning forever. Keying the
  directory on the CPU flags makes stale cross-machine entries unreachable.
  """
  import hashlib
  import os
  import platform

  tag = platform.machine()
  try:
    with open("/proc/cpuinfo") as f:
      for line in f:
        if line.startswith("flags"):
          tag += hashlib.sha256(line.encode()).hexdigest()[:12]
          break
  except OSError:
    pass
  # Fold in the XLA context: entries compiled under different XLA_FLAGS
  # (e.g. xla_force_host_platform_device_count in tests) or a different
  # platform carry different target "machine features" (+prefer-no-scatter
  # etc.) — the cache key does not include them, and a cross-context load
  # fails with a cpu_aot_loader feature-mismatch (observed: every cached
  # graph re-verifying+recompiling, a 38 s compile ballooning past 20 min).
  ctx = (os.environ.get("XLA_FLAGS", "")
         + os.environ.get("JAX_PLATFORMS", ""))
  tag += "_" + hashlib.sha256(ctx.encode()).hexdigest()[:8]
  return f"/tmp/mtx_jax_cache_{tag}"
