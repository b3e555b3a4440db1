"""Functional TPU-native environments."""

from myosuite_tpu.envs.base import MyoEnv, State
from myosuite_tpu.envs.registry import make, register, registered_envs
