"""myosuite_tpu: a TPU-native musculoskeletal RL framework.

A ground-up JAX/XLA re-design with the capabilities of MyoSuite
(see SURVEY.md): batched muscle-driven physics, functional envs with
in-graph resets, PPO training, and mesh-sharded scale-out.
"""

__version__ = "0.1.0"

from myosuite_tpu.envs import make, registered_envs
