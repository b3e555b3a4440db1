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
  return f"/tmp/mtx_jax_cache_{tag}"
