"""Environment registry, configs, and make().

One ConfigDict-based config system covering env+task+trainer (SURVEY.md
section 5 calls out the reference's three coexisting config systems; this
build uses one). Env ids mirror both the reference's MJX registry
(/root/reference/myosuite/envs/myo/mjx/myo_registry.py) and the classic ids
from the driver's target config set (BASELINE.md: myoElbowPose1D6MRandom,
myoFingerPose/ReachRandom, ...) so reference users find familiar names.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import numpy as np
from ml_collections import config_dict

from myosuite_tpu.assets import builder


def base_env_config() -> config_dict.ConfigDict:
  """Defaults anchored to the reference's MJX base config
  (/root/reference/myosuite/envs/myo/mjx/__init__.py:12-20)."""
  return config_dict.create(
      ctrl_dt=0.02,
      sim_dt=0.002,
      max_episode_steps=100,
      norm_actions=True,
      reset_type="random",
  )


def pose_config(model_xml: str, target_lo, target_hi,
                **overrides) -> config_dict.ConfigDict:
  cfg = base_env_config()
  cfg.update(config_dict.create(
      model_xml=model_xml,
      target_jnt_lo=tuple(np.atleast_1d(target_lo).tolist()),
      target_jnt_hi=tuple(np.atleast_1d(target_hi).tolist()),
      pose_thd=0.35,
      far_th=float(4 * np.pi / 2),
      fixed_target=False,
      reward_weights=config_dict.create(
          pose=1.0, bonus=4.0, act_reg=1.0, penalty=50.0),
  ))
  cfg.update(overrides)
  return cfg


def reach_config(model_xml: str, target_sites, target_lo, target_hi,
                 **overrides) -> config_dict.ConfigDict:
  cfg = base_env_config()
  cfg.update(config_dict.create(
      model_xml=model_xml,
      target_sites=tuple(target_sites),
      target_lo=tuple(map(tuple, np.atleast_2d(target_lo).tolist())),
      target_hi=tuple(map(tuple, np.atleast_2d(target_hi).tolist())),
      far_th=0.35,
      fixed_target=False,
      reset_type="init",
      reward_weights=config_dict.create(reach=1.0, bonus=4.0, penalty=50.0),
  ))
  cfg.update(overrides)
  return cfg


_REGISTRY: Dict[str, Callable[[], Any]] = {}
_ALIASES: Dict[str, str] = {}


def register(name: str, factory: Callable[[Optional[Dict]], Any],
             aliases=()) -> None:
  _REGISTRY[name] = factory
  for a in aliases:
    _ALIASES[a] = name


def registered_envs():
  return sorted(_REGISTRY)


def resolve(name: str) -> str:
  return _ALIASES.get(name, name)


@functools.lru_cache(maxsize=None)
def _cached_env(name: str, overrides_key=None):
  overrides = dict(overrides_key) if overrides_key else None
  return _REGISTRY[name](overrides)


def make(name: str, config_overrides: Optional[Dict[str, Any]] = None):
  """Instantiate (cached) an env by id — the reference's make()
  (/root/reference/myosuite/envs/myo/mjx/__init__.py:109) equivalent."""
  name = resolve(name)
  if name not in _REGISTRY:
    raise KeyError(
        f"unknown env {name!r}; registered: {registered_envs()}")
  key = tuple(sorted(config_overrides.items())) if config_overrides else None
  return _cached_env(name, key)


# ---------------------------------------------------------------------------
# registrations
# ---------------------------------------------------------------------------


def _register_all():
  from myosuite_tpu.envs.pose import PoseEnv
  from myosuite_tpu.envs.reach import ReachEnv

  elbow_xml = builder.BUILDERS["elbow"]()
  finger_xml = builder.BUILDERS["finger"]()

  # Elbow pose (target range mirrors a 1-dof elbow flexion task)
  def elbow_pose(overrides, fixed=False):
    cfg = pose_config(elbow_xml, [0.0], [2.27], fixed_target=fixed)
    return PoseEnv(cfg, overrides)

  register("MtxElbowPoseRandom-v0", functools.partial(elbow_pose),
           aliases=("MjxElbowPoseRandom-v0", "myoElbowPose1D6MRandom-v0"))
  register("MtxElbowPoseFixed-v0",
           functools.partial(elbow_pose, fixed=True),
           aliases=("MjxElbowPoseFixed-v0", "myoElbowPose1D6MFixed-v0"))

  # Finger pose
  f_lo = [-0.3, -0.25, 0.0, 0.0]
  f_hi = [0.3, 1.5, 1.8, 1.5]
  def finger_pose(overrides, fixed=False):
    cfg = pose_config(finger_xml, f_lo, f_hi, fixed_target=fixed,
                      pose_thd=0.5)
    return PoseEnv(cfg, overrides)

  register("MtxFingerPoseRandom-v0", functools.partial(finger_pose),
           aliases=("MjxFingerPoseRandom-v0", "myoFingerPoseRandom-v0"))
  register("MtxFingerPoseFixed-v0",
           functools.partial(finger_pose, fixed=True),
           aliases=("MjxFingerPoseFixed-v0", "myoFingerPoseFixed-v0"))

  # Finger reach: IFtip target box around the finger workspace
  tip_lo = [[-0.1, -0.1, 0.78]]
  tip_hi = [[0.1, 0.1, 0.92]]
  def finger_reach(overrides, fixed=False):
    cfg = reach_config(finger_xml, ["IFtip"], tip_lo, tip_hi,
                       fixed_target=fixed)
    return ReachEnv(cfg, overrides)

  register("MtxFingerReachRandom-v0", functools.partial(finger_reach),
           aliases=("myoFingerReachRandom-v0",))
  register("MtxFingerReachFixed-v0",
           functools.partial(finger_reach, fixed=True),
           aliases=("myoFingerReachFixed-v0",))


_register_all()
