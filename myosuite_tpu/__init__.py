"""myosuite_tpu: a TPU-native musculoskeletal RL framework.

A ground-up JAX/XLA re-design with the capabilities of MyoSuite
(see SURVEY.md): batched muscle-driven physics, functional envs with
in-graph resets, PPO training, and mesh-sharded scale-out.
"""

__version__ = "0.2.0"

from myosuite_tpu.envs import make, registered_envs


def _suite_ids(tag):
  from myosuite_tpu.envs import registry
  return sorted(i for i in registered_envs() if registry.suite_of(i) == tag)


def __getattr__(name):
  """Suite id lists (the reference's registry-diff bookkeeping,
  /root/reference/myosuite/__init__.py:27-67), via registration tags."""
  tags = {"myosuite_myobase_suite": "myobase",
          "myosuite_myochal_suite": "myochal",
          "myosuite_myodm_suite": "myodm",
          "myosuite_myoedit_suite": "myoedits"}
  if name in tags:
    return _suite_ids(tags[name])
  raise AttributeError(name)
