"""Tutorial 12 — Scale out over a device mesh (TPU-native).

No reference counterpart — this is what the TPU rebuild adds. The env
axis shards over a `jax.sharding.Mesh`; learner params replicate; XLA
inserts the ICI collectives. This script runs anywhere by faking 8
devices on CPU (the same trick the test suite and the multi-chip dryrun
use). On a real TPU slice, delete the XLA_FLAGS line and the same code
uses the real chips.
"""

import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np

import myosuite_tpu
from myosuite_tpu.parallel import mesh as mesh_mod
from myosuite_tpu.train import ppo as ppo_mod

SMOKE = os.environ.get("MTX_TUTORIAL_SMOKE") == "1"

print("devices:", jax.devices())

env = myosuite_tpu.make("MtxElbowPoseRandom-v0")
cfg = ppo_mod.default_config()
cfg.num_envs = 64                 # global batch: 8 envs per device
cfg.num_minibatches = 4
trainer = ppo_mod.PPO(env, cfg)
ts = trainer.init(jax.random.PRNGKey(0))

m = mesh_mod.make_mesh()          # 1-D mesh over all visible devices
print("mesh:", m)

ts = mesh_mod.place(ts, trainer, m)      # shard env axis, replicate learner
run = mesh_mod.make_distributed_training_fn(
    trainer, ts, m, steps_per_call=1 if SMOKE else 5)

ts, metrics = run(ts)
print("distributed metrics:",
      {k: float(np.asarray(v)) for k, v in metrics.items()
       if np.asarray(v).ndim == 0})

# proof the env state is actually sharded across the mesh:
shard_devs = {s.device for s in ts.env_state.data.qpos.addressable_shards}
print(f"env_state.qpos lives on {len(shard_devs)} devices")
assert len(shard_devs) == len(jax.devices())
print("sharded training step ok")
