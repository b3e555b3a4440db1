"""Mesh-sharded scale-out: env-batch data parallelism over ICI/DCN.

The reference scales by vmap on one accelerator plus embarrassingly-parallel
slurm jobs (SURVEY.md section 2.7); the TPU-native equivalent is a device
mesh with the env batch sharded over an "env" axis and the learner
replicated — XLA inserts the all-reduces for gradients and observation
statistics (psum over the batch axis happens inside the jitted training
step via sharding propagation).

Multi-host: call jax.distributed.initialize() before building the mesh and
the same code spans hosts (env shards per host feeding the replicated
learner over ICI, per BASELINE.json).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           **extra) -> None:
  """Idempotent jax.distributed.initialize for multi-host pod slices.

  Call once per host before make_mesh; afterwards jax.devices() returns
  the GLOBAL device list (what Mesh needs) while
  jax.local_devices() holds this host's chips. On single-process runs
  (including the CPU 8-device fake) this is a no-op. The reference's
  multi-node story is slurm job arrays (SURVEY.md section 2.7); this is
  the jax.distributed equivalent for one sharded computation spanning
  hosts.
  """
  import os
  kwargs = {}
  if coordinator_address is not None:
    kwargs["coordinator_address"] = coordinator_address
  if num_processes is not None:
    kwargs["num_processes"] = num_processes
  if process_id is not None:
    kwargs["process_id"] = process_id
  kwargs.update(extra)  # e.g. initialization_timeout
  if not kwargs and "JAX_COORDINATOR_ADDRESS" not in os.environ:
    return  # nothing to initialize against; stay single-process
  try:
    jax.distributed.initialize(**kwargs)
  except RuntimeError as e:
    # Only swallow the known benign case — the launcher (or an earlier
    # call) already initialized this process. Anything else (coordinator
    # unreachable, barrier timeout, id mismatch) must surface: on a real
    # pod a silent failure here strands the process single-host.
    if "already initialized" in str(e).lower():
      return
    raise


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
  """1-D env-axis mesh over the GLOBAL device list (all hosts).

  Under jax.distributed each process passes the same global list; XLA
  routes each shard to the chips its host owns. Use local_env_slice() to
  know which rows of the global env batch live on this process.
  """
  devs = devices if devices is not None else jax.devices()
  if n_devices is not None:
    devs = devs[:n_devices]
  return Mesh(np.array(devs), (ENV_AXIS,))


def local_env_slice(mesh: Mesh, global_batch: int) -> slice:
  """Rows of the globally-sharded env batch hosted by this process."""
  devs = list(mesh.devices.flat)
  n = len(devs)
  assert global_batch % n == 0, (global_batch, n)
  per_dev = global_batch // n
  mine = [i for i, dv in enumerate(devs)
          if dv.process_index == jax.process_index()]
  if not mine:
    return slice(0, 0)
  assert mine == list(range(mine[0], mine[0] + len(mine))), (
      "process devices must be contiguous on the env axis")
  return slice(mine[0] * per_dev, (mine[-1] + 1) * per_dev)


def global_env_array(local_np, mesh: Mesh, global_batch: int):
  """Assemble a global jax.Array for the env axis from this process's
  host-local rows (jax.make_array_from_process_local_data wrapper)."""
  sharding = NamedSharding(mesh, P(ENV_AXIS))
  return jax.make_array_from_process_local_data(
      sharding, np.asarray(local_np),
      (global_batch,) + tuple(np.asarray(local_np).shape[1:]))


def train_state_shardings(ppo, ts, mesh: Mesh):
  """Shardings for a TrainState: env_state sharded on batch dim, rest
  replicated."""
  batch = NamedSharding(mesh, P(ENV_AXIS))
  repl = NamedSharding(mesh, P())

  def env_leaf(x):
    return batch if getattr(x, "ndim", 0) >= 1 else repl

  env_sh = jax.tree.map(env_leaf, ts.env_state)
  repl_sh = jax.tree.map(lambda x: repl, ts)
  return repl_sh.replace(env_state=env_sh)


def make_distributed_training_fn(ppo, ts, mesh: Mesh,
                                 steps_per_call: int) -> Callable:
  """Jitted multi-device training fn; env axis sharded, learner replicated.

  XLA's sharding propagation turns the minibatch gradient computation into
  data-parallel compute + all-reduce over ICI; the rollout stays fully
  sharded with zero communication (each device steps its own env shard).
  """
  sh = train_state_shardings(ppo, ts, mesh)

  def run(state):
    def body(carry, _):
      return ppo.training_step(carry)
    state, metrics = jax.lax.scan(body, state, None, length=steps_per_call)
    return state, jax.tree.map(lambda x: x[-1], metrics)

  return jax.jit(run, in_shardings=(sh,), out_shardings=(sh, None),
                 donate_argnums=(0,))


def place(ts, ppo, mesh: Mesh):
  """Device-put a TrainState according to the mesh shardings."""
  sh = train_state_shardings(ppo, ts, mesh)
  return jax.tree.map(jax.device_put, ts, sh)
