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


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
  devs = devices if devices is not None else jax.devices()
  if n_devices is not None:
    devs = devs[:n_devices]
  return Mesh(np.array(devs), (ENV_AXIS,))


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
