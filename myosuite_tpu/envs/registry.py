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
_SUITES: Dict[str, str] = {}


def register(name: str, factory: Callable[[Optional[Dict]], Any],
             aliases=(), suite: str = "myobase") -> None:
  _REGISTRY[name] = factory
  _SUITES[name] = suite
  for a in aliases:
    _ALIASES[a] = name


def suite_of(name: str) -> str:
  """Which suite an env id belongs to (the reference's registry-diff
  suite bookkeeping, /root/reference/myosuite/__init__.py:27-67)."""
  return _SUITES.get(resolve(name), "myobase")


def registered_envs():
  return sorted(_REGISTRY)


def resolve(name: str) -> str:
  return _ALIASES.get(name, name)


@functools.lru_cache(maxsize=None)
def _cached_env(name: str, overrides_key=None):
  overrides = dict(overrides_key) if overrides_key else None
  return _REGISTRY[name](overrides)


def register_env_variant(env_id: str, variants: Dict[str, Any],
                         variant_id: Optional[str] = None,
                         silent: bool = False) -> str:
  """Register a variant of a registered env by merging config overrides.

  Role-equivalent of the reference's register_env_variant
  (/root/reference/myosuite/envs/env_variants.py:91-129): `variants` maps
  flat dot-path keys (e.g. "reward_weights.pose" or "max_episode_steps")
  to values; the variant id is auto-generated from the override keys when
  not given. Returns the new env id.
  """
  base = resolve(env_id)
  if base not in _REGISTRY:
    raise KeyError(f"unknown env {env_id!r}")
  if variant_id is None:
    tag = "-".join(f"{k.split('.')[-1]}={v}" for k, v in
                   sorted(variants.items()))
    stem, _, ver = base.rpartition("-")
    variant_id = f"{stem}_{tag}-{ver}"
  base_factory = _REGISTRY[base]

  def nest(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in flat.items():
      cur = out
      parts = k.split(".")
      for p in parts[:-1]:
        cur = cur.setdefault(p, {})
      cur[parts[-1]] = v
    return out

  def deep_merge(dst: Dict[str, Any], src: Dict[str, Any]) -> Dict[str, Any]:
    for k, v in src.items():
      if isinstance(v, dict) and isinstance(dst.get(k), dict):
        deep_merge(dst[k], v)
      else:
        dst[k] = v
    return dst

  def factory(overrides=None):
    merged = nest(variants)
    if overrides:
      deep_merge(merged, dict(overrides))
    return base_factory(merged)

  register(variant_id, factory)
  if not silent:
    from myosuite_tpu.utils.prompt_utils import prompt
    prompt(f"Registered env variant: {variant_id}", type_="INFO")
  return variant_id


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


def register_with_variants(name: str, factory, aliases=(),
                           suite: str = "myobase") -> None:
  """Register a base env plus Fati/Sarc muscle-condition variants.

  Mirrors the reference's auto-registration of muscle conditions for every
  myo env (/root/reference/myosuite/envs/myo/myobase/__init__.py:25-49 and
  mjx registry MjxFati* prefixes, myo_registry.py:54-90)."""
  from myosuite_tpu.envs.fatigue import FatigueWrapper

  register(name, factory, aliases, suite=suite)
  assert name.startswith("Mtx")
  suffix = name[len("Mtx"):]

  def fati_factory(overrides=None):
    return FatigueWrapper(factory(overrides))

  def sarc_factory(overrides=None):
    ov = dict(overrides or {})
    ov["muscle_condition"] = "sarcopenia"
    return factory(ov)

  register(f"MtxFati{suffix}", fati_factory,
           aliases=tuple(_variant_alias(a, "Fati") for a in aliases),
           suite=suite)
  register(f"MtxSarc{suffix}", sarc_factory,
           aliases=tuple(_variant_alias(a, "Sarc") for a in aliases),
           suite=suite)


def _variant_alias(alias: str, tag: str) -> str:
  for prefix in ("Mjx", "myo"):
    if alias.startswith(prefix):
      return prefix + tag + alias[len(prefix):]
  return tag + alias


def _register_all():
  from myosuite_tpu.envs.pose import PoseEnv
  from myosuite_tpu.envs.reach import ReachEnv

  elbow_xml = builder.BUILDERS["elbow"]()
  finger_xml = builder.BUILDERS["finger"]()

  # Elbow pose (target range mirrors a 1-dof elbow flexion task)
  def elbow_pose(overrides, fixed=False):
    cfg = pose_config(elbow_xml, [0.0], [2.27], fixed_target=fixed)
    return PoseEnv(cfg, overrides)

  register_with_variants(
      "MtxElbowPoseRandom-v0", functools.partial(elbow_pose),
      aliases=("MjxElbowPoseRandom-v0", "myoElbowPose1D6MRandom-v0"))
  register_with_variants(
      "MtxElbowPoseFixed-v0", functools.partial(elbow_pose, fixed=True),
      aliases=("MjxElbowPoseFixed-v0", "myoElbowPose1D6MFixed-v0"))

  # Finger pose
  f_lo = [-0.3, -0.25, 0.0, 0.0]
  f_hi = [0.3, 1.5, 1.8, 1.5]
  def finger_pose(overrides, fixed=False):
    cfg = pose_config(finger_xml, f_lo, f_hi, fixed_target=fixed,
                      pose_thd=0.5)
    return PoseEnv(cfg, overrides)

  register_with_variants(
      "MtxFingerPoseRandom-v0", functools.partial(finger_pose),
      aliases=("MjxFingerPoseRandom-v0", "myoFingerPoseRandom-v0"))
  register_with_variants(
      "MtxFingerPoseFixed-v0", functools.partial(finger_pose, fixed=True),
      aliases=("MjxFingerPoseFixed-v0", "myoFingerPoseFixed-v0"))

  # Finger reach: IFtip target box around the finger workspace
  tip_lo = [[-0.1, -0.1, 0.78]]
  tip_hi = [[0.1, 0.1, 0.92]]
  def finger_reach(overrides, fixed=False):
    cfg = reach_config(finger_xml, ["IFtip"], tip_lo, tip_hi,
                       fixed_target=fixed)
    return ReachEnv(cfg, overrides)

  register_with_variants(
      "MtxFingerReachRandom-v0", functools.partial(finger_reach),
      aliases=("myoFingerReachRandom-v0",))
  register_with_variants(
      "MtxFingerReachFixed-v0", functools.partial(finger_reach, fixed=True),
      aliases=("myoFingerReachFixed-v0",))

  # ---- myoHand (flagship: 23 joints / 39 muscles) ----
  import mujoco as _mj

  from myosuite_tpu.assets import hand as hand_mod
  from myosuite_tpu.envs.base import ReafferentationWrapper

  hand_xml = builder.finalize_muscles(hand_mod.build_hand())
  hand_mj = _mj.MjModel.from_xml_string(hand_xml)

  h_lo = hand_mj.jnt_range[:, 0].tolist()
  h_hi = hand_mj.jnt_range[:, 1].tolist()

  def hand_pose(overrides, fixed=False):
    cfg = pose_config(hand_xml, h_lo, h_hi, fixed_target=fixed,
                      pose_thd=1.0)
    return PoseEnv(cfg, overrides)

  register_with_variants(
      "MtxHandPoseRandom-v0", functools.partial(hand_pose),
      aliases=("MjxHandPoseRandom-v0", "myoHandPoseRandom-v0"))
  register_with_variants(
      "MtxHandPoseFixed-v0", functools.partial(hand_pose, fixed=True),
      aliases=("MjxHandPoseFixed-v0", "myoHandPoseFixed-v0"))

  # tip workspace boxes around the default tip positions
  hd = _mj.MjData(hand_mj)
  _mj.mj_forward(hand_mj, hd)
  tip_sites = ["THtip", "IFtip", "MFtip", "RFtip", "LFtip"]
  tip0 = np.stack([
      hd.site_xpos[_mj.mj_name2id(hand_mj, _mj.mjtObj.mjOBJ_SITE.value, s)]
      for s in tip_sites])
  span = np.array([0.05, 0.04, 0.05])

  def hand_reach(overrides, fixed=False):
    cfg = reach_config(hand_xml, tip_sites, (tip0 - span), (tip0 + span),
                       fixed_target=fixed)
    return ReachEnv(cfg, overrides)

  register_with_variants(
      "MtxHandReachRandom-v0", functools.partial(hand_reach),
      aliases=("MjxHandReachRandom-v0", "myoHandReachRandom-v0"))
  register_with_variants(
      "MtxHandReachFixed-v0", functools.partial(hand_reach, fixed=True),
      aliases=("MjxHandReachFixed-v0", "myoHandReachFixed-v0"))

  # ---- hand + object manipulation ----
  from myosuite_tpu.envs.manipulation import (BaodingEnv, KeyTurnEnv,
                                              ObjHoldEnv, PenTwirlEnv,
                                              ReorientEnv)

  def manip_config(obj, weights, palm_up=True, **kw):
    cfg = base_env_config()
    cfg.update(config_dict.create(
        model_xml=builder.finalize_muscles(
            hand_mod.build_hand(palm_up=palm_up, obj=obj)),
        drop_th=1.05,
        goal_center=(-0.15, 0.0, 1.25),
        fixed_target=False,
        reward_weights=config_dict.create(**weights),
    ))
    cfg.update(kw)
    return cfg

  def objhold(overrides=None, fixed=False):
    cfg = manip_config(
        "hold", dict(goal_dist=100.0, bonus=4.0, penalty=10.0),
        goal_span=(0.02, 0.02, 0.02), fixed_target=fixed)
    return ObjHoldEnv(cfg, overrides)

  register_with_variants(
      "MtxHandObjHoldRandom-v0", functools.partial(objhold),
      aliases=("myoHandObjHoldRandom-v0",))
  register_with_variants(
      "MtxHandObjHoldFixed-v0", functools.partial(objhold, fixed=True),
      aliases=("myoHandObjHoldFixed-v0",))

  def die(overrides=None, fixed=False):
    cfg = manip_config(
        "die", dict(pos_dist=100.0, rot_dist=1.0, bonus=0.0, penalty=0.0),
        goal_center=(-0.15, 0.0, 1.235), goal_rot_limit=1.57,
        fixed_target=fixed)
    return ReorientEnv(cfg, overrides)

  register_with_variants(
      "MtxHandDieReorient-v0", functools.partial(die),
      aliases=("myoChallengeDieReorientP1-v0", "myoHandReorient-v0"))

  def pen(overrides=None, fixed=False):
    cfg = manip_config(
        "pen", dict(pos_align=1.0, rot_align=1.0, act_reg=5.0, drop=5.0,
                    bonus=10.0),
        goal_center=(-0.15, 0.0, 1.17), goal_pitch_limit=1.0,
        fixed_target=fixed)
    return PenTwirlEnv(cfg, overrides)

  register_with_variants(
      "MtxHandPenTwirlRandom-v0", functools.partial(pen),
      aliases=("myoHandPenTwirlRandom-v0",))
  register_with_variants(
      "MtxHandPenTwirlFixed-v0", functools.partial(pen, fixed=True),
      aliases=("myoHandPenTwirlFixed-v0",))

  # ---- SAR multi-geometry reorient (reorient_sar_v0.py role) ----
  from myosuite_tpu.envs.sar import ReorientSAREnv

  def sar(overrides=None, variant="8"):
    cfg = manip_config(
        "pen", dict(pos_align=1.0, rot_align=1.0, act_reg=5.0, drop=5.0,
                    bonus=10.0),
        goal_center=(-0.15, 0.0, 1.17), geom_variant=variant)
    return ReorientSAREnv(cfg, overrides)

  for variant, rid in (("8", "Reorient8"), ("100", "Reorient100"),
                       ("id", "ReorientID"), ("ood", "ReorientOOD")):
    register(f"MtxHand{rid}-v0", functools.partial(sar, variant=variant),
             aliases=(f"myoHand{rid}-v0",))

  def baoding(overrides=None, fixed=False):
    cfg = manip_config(
        "baoding", dict(pos_dist_1=5.0, pos_dist_2=5.0, drop=0.0),
        goal_center=(-0.15, 0.0, 1.235), goal_radius_x=0.022,
        goal_radius_y=0.028, goal_speed=0.025,
        max_episode_steps=200, fixed_target=fixed)
    return BaodingEnv(cfg, overrides)

  register_with_variants(
      "MtxHandBaoding-v0", functools.partial(baoding),
      aliases=("myoChallengeBaodingP1-v1", "myoHandBaodingRandom-v0"))

  def keyturn(overrides=None, fixed=False):
    cfg = manip_config(
        "key", dict(key_turn=1.0, IFtip_approach=10.0, THtip_approach=10.0,
                    act_reg=1.0, bonus=4.0, penalty=25.0),
        palm_up=False, max_episode_steps=200, fixed_target=fixed)
    return KeyTurnEnv(cfg, overrides)

  register_with_variants(
      "MtxHandKeyTurnRandom-v0", functools.partial(keyturn),
      aliases=("myoHandKeyTurnRandom-v0",))
  register_with_variants(
      "MtxHandKeyTurnFixed-v0", functools.partial(keyturn, fixed=True),
      aliases=("myoHandKeyTurnFixed-v0",))

  # ---- myoLeg locomotion (20 DoF / 80 muscles) ----
  from myosuite_tpu.assets import leg as leg_mod
  from myosuite_tpu.envs.locomotion import StandEnv, WalkEnv

  leg_xml = builder.finalize_muscles(leg_mod.build_leg())

  def walk_cfg(**kw):
    cfg = base_env_config()
    cfg.update(config_dict.create(
        model_xml=leg_xml,
        max_episode_steps=1000,
        target_velocity=1.2,
        gait_period=1.0,
        hip_amplitude=0.8,   # reference walk_v0.py:426-433 (0.8 rad)
        min_height=0.7,
        max_rot=0.8,
        stand_height=0.93,
        # The reference resets from its model's mocap-derived walk
        # keyframes (walk_v0.py:320-351). This procedural model has no
        # mocap: its hand-derived mid-gait keyframes are not dynamically
        # consistent (measured: from the 'init' frame every constant
        # action falls within 0.5 s), so the default reset is the
        # physically consistent standing pose; 'init'/'random' keyframe
        # resets remain available as overrides.
        reset_type="none",
        reward_weights=config_dict.create(
            vel_reward=5.0, done=100.0, cyclic_hip=-10.0, ref_rot=10.0,
            joint_angle_rew=5.0, act_reg=1.0, progress=0.0),
    ))
    cfg.update(kw)
    return cfg

  def walk(overrides=None):
    return WalkEnv(walk_cfg(), overrides)

  register_with_variants("MtxLegWalk-v0", walk,
                         aliases=("myoLegWalk-v0",))

  def stand(overrides=None):
    cfg = walk_cfg(max_episode_steps=300, reset_type="none",
                   reward_weights=config_dict.create(
                       reach=1.0, bonus=4.0, penalty=50.0, act_reg=1.0))
    return StandEnv(cfg, overrides)

  register_with_variants("MtxLegStand-v0", stand,
                         aliases=("myoLegReachFixed-v0", "myoLegStand-v0"))

  # terrain walking (reference TerrainEnvV0 rough/hilly/stairs variants,
  # myobase/__init__.py registrations of myoLeg*TerrainWalk-v0)
  from myosuite_tpu.envs.locomotion import TerrainWalkEnv

  terrain_xml = builder.finalize_muscles(leg_mod.build_leg(terrain=True))

  def terrain_walk(overrides=None, kind="random"):
    cfg = walk_cfg(model_xml=terrain_xml, terrain_type=kind)
    return TerrainWalkEnv(cfg, overrides)

  register_with_variants(
      "MtxLegWalkRough-v0", functools.partial(terrain_walk, kind="rough"),
      aliases=("myoLegRoughTerrainWalk-v0",))
  register_with_variants(
      "MtxLegWalkHilly-v0", functools.partial(terrain_walk, kind="hilly"),
      aliases=("myoLegHillyTerrainWalk-v0",))
  register_with_variants(
      "MtxLegWalkStairs-v0", functools.partial(terrain_walk, kind="stairs"),
      aliases=("myoLegStairTerrainWalk-v0",))

  # ---- reference-motion tracking (MyoDM role) ----
  from myosuite_tpu.envs.tracking import TrackEnv, make_cyclic_reference

  def track_finger(overrides=None):
    cfg = base_env_config()
    cfg.update(config_dict.create(
        model_xml=finger_xml, pose_thd=0.6, far_th=4.0,
        max_episode_steps=200,
        reward_weights=config_dict.create(pose=1.0, vel=0.2, bonus=1.0,
                                          penalty=2.0),
    ))
    import mujoco as _mj2
    ref = make_cyclic_reference(_mj2.MjModel.from_xml_string(finger_xml))
    return TrackEnv(cfg, overrides, reference=ref)

  register_with_variants("MtxFingerTrackCyclic-v0", track_finger,
                         aliases=("myoDmFingerTrack-v0",), suite="myodm")

  def track_hand(overrides=None):
    cfg = base_env_config()
    cfg.update(config_dict.create(
        model_xml=hand_xml, pose_thd=1.2, far_th=8.0,
        max_episode_steps=200,
        reward_weights=config_dict.create(pose=1.0, vel=0.2, bonus=1.0,
                                          penalty=2.0),
    ))
    ref = make_cyclic_reference(hand_mj)
    return TrackEnv(cfg, overrides, reference=ref)

  register_with_variants("MtxHandTrackCyclic-v0", track_hand,
                         aliases=("myoDmHandTrack-v0",), suite="myodm")

  # ---- ASL hand postures (reference registers 10 ASL pose targets,
  # myobase/__init__.py:327-394) ----
  jnt_names = [_mj.mj_id2name(hand_mj, _mj.mjtObj.mjOBJ_JOINT.value, j)
               for j in range(hand_mj.njnt)]
  jr = hand_mj.jnt_range

  def _asl_target(pattern: Dict[str, float]):
    """pattern: digit prefix -> flexion fraction of joint range."""
    q = np.zeros(hand_mj.nq)
    for j, name in enumerate(jnt_names):
      prefix = name.split("_")[0]
      frac = pattern.get(prefix, 0.05)
      if name.endswith("_abd") or name.endswith("_dev") or "wrist" in name:
        frac = 0.0 if "wrist" in name or name.endswith("_dev") else 0.5
      lo, hi = jr[j]
      q[j] = lo + frac * (hi - lo)
    return tuple(q.tolist())

  E, F, O = 0.05, 0.85, 0.55   # extended / flexed / opposed-curved
  asl_patterns = [
      {"TH": O, "IF": 0.6, "MF": 0.6, "RF": 0.6, "LF": 0.6},   # 0
      {"TH": F, "IF": E, "MF": F, "RF": F, "LF": F},           # 1
      {"TH": F, "IF": E, "MF": E, "RF": F, "LF": F},           # 2
      {"TH": E, "IF": E, "MF": E, "RF": F, "LF": F},           # 3
      {"TH": F, "IF": E, "MF": E, "RF": E, "LF": E},           # 4
      {"TH": E, "IF": E, "MF": E, "RF": E, "LF": E},           # 5
      {"TH": O, "IF": E, "MF": E, "RF": E, "LF": O},           # 6
      {"TH": O, "IF": E, "MF": E, "RF": O, "LF": E},           # 7
      {"TH": O, "IF": E, "MF": O, "RF": E, "LF": E},           # 8
      {"TH": O, "IF": O, "MF": E, "RF": E, "LF": E},           # 9
  ]

  def hand_pose_asl(overrides=None, target=None):
    cfg = pose_config(hand_xml, h_lo, h_hi, fixed_target=True,
                      target_jnt_value=target, pose_thd=1.0)
    return PoseEnv(cfg, overrides)

  for k, pat in enumerate(asl_patterns):
    register(f"MtxHandPose{k}Fixed-v0",
             functools.partial(hand_pose_asl, target=_asl_target(pat)),
             aliases=(f"myoHandPose{k}Fixed-v0",))

  # ---- myoTorso (18 joints / 210 muscle fascicles) ----
  from myosuite_tpu.assets import torso as torso_mod

  torso_xml = builder.finalize_muscles(torso_mod.build_torso())
  torso_mj = _mj.MjModel.from_xml_string(torso_xml)
  t_lo = torso_mj.jnt_range[:, 0].tolist()
  t_hi = torso_mj.jnt_range[:, 1].tolist()

  def torso_pose(overrides=None, fixed=False):
    cfg = pose_config(torso_xml, t_lo, t_hi, fixed_target=fixed,
                      pose_thd=0.5)
    cfg.reward_weights.update(dict(done=0.0))
    return PoseEnv(cfg, overrides)

  register_with_variants(
      "MtxTorsoPoseRandom-v0", functools.partial(torso_pose),
      aliases=("myoTorsoPoseRandom-v0",))
  register_with_variants(
      "MtxTorsoPoseFixed-v0", functools.partial(torso_pose, fixed=True),
      aliases=("myoTorsoPoseFixed-v0",))

  # ---- myoArm reach via model surgery (myoedits role) ----
  from myosuite_tpu.assets.editor import build_arm_reach_xml

  armreach_xml = build_arm_reach_xml()
  arm_mj = _mj.MjModel.from_xml_string(armreach_xml)
  ad = _mj.MjData(arm_mj)
  _mj.mj_forward(arm_mj, ad)
  iftip0 = ad.site_xpos[
      _mj.mj_name2id(arm_mj, _mj.mjtObj.mjOBJ_SITE.value, "IFtip")].copy()
  arm_span = np.array([0.15, 0.15, 0.15])

  def arm_reach(overrides=None, fixed=False):
    cfg = reach_config(armreach_xml, ["IFtip"],
                       (iftip0 - arm_span)[None], (iftip0 + arm_span)[None],
                       fixed_target=fixed, far_th=1.0)
    return ReachEnv(cfg, overrides)

  register_with_variants(
      "MtxArmReachRandom-v0", functools.partial(arm_reach),
      aliases=("myoArmReachRandom-v0",), suite="myoedits")
  register_with_variants(
      "MtxArmReachFixed-v0", functools.partial(arm_reach, fixed=True),
      aliases=("myoArmReachFixed-v0",), suite="myoedits")

  # ---- myoArm pose (27 DoF / 63 muscles full arm+hand) ----
  arm_xml = builder.finalize_muscles(hand_mod.build_hand(arm=True))
  armfull_mj = _mj.MjModel.from_xml_string(arm_xml)
  a_lo = armfull_mj.jnt_range[:, 0].tolist()
  a_hi = armfull_mj.jnt_range[:, 1].tolist()

  def arm_pose(overrides=None, fixed=False):
    cfg = pose_config(arm_xml, a_lo, a_hi, fixed_target=fixed, pose_thd=1.5,
                      far_th=8.0)
    return PoseEnv(cfg, overrides)

  register_with_variants(
      "MtxArmPoseRandom-v0", functools.partial(arm_pose),
      aliases=("myoArmPoseRandom-v0",))

  # ---- MyoChallenge suite: Relocate / ChaseTag / Soccer / RunTrack ----
  from myosuite_tpu.envs.challenge import (ChaseTagEnv, RelocateEnv,
                                           RunTrackEnv, SoccerEnv)

  _OPPONENT_BODY = """
    <body name="opponent" mocap="true" pos="2 2 0.5">
      <geom name="opponent_geom" type="cylinder" size="0.18 0.5"
            contype="0" conaffinity="0" mass="1"/>
    </body>"""

  def chasetag(overrides=None, role="chase"):
    cfg = base_env_config()
    cfg.update(config_dict.create(
        model_xml=builder.finalize_muscles(leg_mod.build_leg(
            terrain=True, terrain_nrow=64, terrain_ncol=64,
            terrain_extent=(6.0, 6.0), terrain_center=(0.0, 0.0),
            extra_worldbody=_OPPONENT_BODY)),
        max_episode_steps=1000, arena_half=6.0, tag_radius=0.35,
        min_height=0.7, max_rot=0.8, gait_period=1.0, hip_amplitude=0.4,
        target_velocity=1.2, stand_height=0.93, reset_type="init",
        agent_role=role,
        reward_weights=config_dict.create(
            distance=-0.1, lose=1000.0, act_reg=1.0),
    ))
    return ChaseTagEnv(cfg, overrides)

  register("MtxChaseTag-v0", functools.partial(chasetag),
           aliases=("myoChallengeChaseTagP1-v0",), suite="myochal")
  register("MtxChaseTagEvade-v0", functools.partial(chasetag, role="evade"),
           aliases=("myoChallengeChaseTagP2-v0",), suite="myochal")

  _SOCCER_SCENE = """
    <body name="ball" pos="0.6 0 0.12">
      <freejoint name="ball_free"/>
      <geom name="ball_geom" type="sphere" size="0.11" mass="0.43"
            contype="2" conaffinity="7" friction="0.8 0.01 0.0005"
            solref="0.02 1" condim="3"/>
      <site name="ball_site" size="0.01"/>
    </body>
    <geom name="post_l" type="capsule" fromto="5 -1.22 0 5 -1.22 1.2"
          size="0.05" contype="4" conaffinity="3"/>
    <geom name="post_r" type="capsule" fromto="5 1.22 0 5 1.22 1.2"
          size="0.05" contype="4" conaffinity="3"/>
    <body name="keeper" mocap="true" pos="4.7 0 0.9">
      <geom name="keeper_geom" type="cylinder" size="0.18 0.9"
            contype="0" conaffinity="0" mass="1"/>
    </body>"""

  def soccer(overrides=None):
    cfg = base_env_config()
    cfg.update(config_dict.create(
        model_xml=builder.finalize_muscles(leg_mod.build_leg(
            extra_worldbody=_SOCCER_SCENE)),
        max_episode_steps=1000, goal_x=5.0, goal_half_width=1.22,
        keeper_reach=0.3, min_height=0.7, max_rot=0.8, gait_period=1.0,
        hip_amplitude=0.4, target_velocity=1.2, stand_height=0.93,
        reset_type="init",
        reward_weights=config_dict.create(
            goal_scored=1000.0, time_cost=0.01, act_reg=100.0, pain=10.0,
            ball_dist=1.0, goal_dist=1.0),
    ))
    return SoccerEnv(cfg, overrides)

  register("MtxSoccer-v0", soccer, aliases=("myoChallengeSoccerP1-v0",),
           suite="myochal")

  def runtrack(overrides=None):
    cfg = base_env_config()
    cfg.update(config_dict.create(
        model_xml=builder.finalize_muscles(leg_mod.build_leg(osl=True)),
        max_episode_steps=2000, min_velocity=0.3, target_velocity=1.2,
        finish_x=20.0, min_height=0.7, max_rot=0.8, gait_period=1.0,
        hip_amplitude=0.4, stand_height=0.93, reset_type="init",
        reward_weights=config_dict.create(
            sparse=1.0, solved=10.0, act_reg=1.0, pain=10.0,
            vel_reward=2.0),
    ))
    return RunTrackEnv(cfg, overrides)

  register("MtxRunTrack-v0", runtrack,
           aliases=("myoChallengeRunTrackP1-v0", "myoChallengeOslRunFixed-v0"),
           suite="myochal")

  def relocate(overrides=None):
    cfg = base_env_config()
    cfg.update(config_dict.create(
        model_xml=builder.finalize_muscles(
            hand_mod.build_hand(arm=True, obj="relocate")),
        max_episode_steps=150,
        goal_center=(0.2, 0.1, 1.3), goal_span=(0.1, 0.1, 0.1),
        obj_scale_range=(0.7, 1.2), lift_th=1.05, drop_th=0.6,
        reward_weights=config_dict.create(
            pos_dist=100.0, lift_bonus=4.0, bonus=4.0, act_reg=1.0),
    ))
    return RelocateEnv(cfg, overrides)

  register("MtxRelocate-v0", relocate,
           aliases=("myoChallengeRelocateP1-v0",), suite="myochal")

  # ---- Bimanual handover (MyoChallenge'24 BimanualEnvV1 role) ----
  from myosuite_tpu.envs.challenge import BimanualEnv, TableTennisEnv

  _BIMANUAL_SCENE = """
    <geom name="start_pillar" type="box" pos="-0.38 -0.10 0.5"
          size="0.09 0.09 0.5" contype="4" conaffinity="2"/>
    <geom name="goal_pillar" type="box" pos="-0.38 0.35 0.5"
          size="0.09 0.09 0.5" contype="4" conaffinity="2"/>
    <body name="pros_base" pos="-0.38 0.62 1.1">
      <joint name="pros_x" type="slide" axis="1 0 0" range="-0.25 0.25"
             damping="8"/>
      <joint name="pros_y" type="slide" axis="0 1 0" range="-0.45 0.1"
             damping="8"/>
      <joint name="pros_z" type="slide" axis="0 0 1" range="-0.2 0.2"
             damping="8"/>
      <geom name="pros_palm_geom" type="box" size="0.012 0.04 0.05"
            mass="0.5" contype="1" conaffinity="2"/>
      <site name="pros_palm" pos="0 -0.055 0" size="0.005"/>
      <body name="pros_fin1" pos="0 -0.055 0.05">
        <joint name="pros_grip1" type="slide" axis="0 0 -1"
               range="0 0.045" damping="3"/>
        <geom name="pros_pad1_geom" type="box" size="0.012 0.03 0.008"
              mass="0.05" contype="1" conaffinity="2"
              friction="1.2 0.01 0.0005"/>
      </body>
      <body name="pros_fin2" pos="0 -0.055 -0.05">
        <joint name="pros_grip2" type="slide" axis="0 0 1"
               range="0 0.045" damping="3"/>
        <geom name="pros_pad2_geom" type="box" size="0.012 0.03 0.008"
              mass="0.05" contype="1" conaffinity="2"
              friction="1.2 0.01 0.0005"/>
      </body>
    </body>
    <body name="object" pos="-0.38 -0.10 1.028">
      <freejoint name="object_free"/>
      <geom name="object_geom" type="box" size="0.027 0.027 0.027"
            mass="0.1" contype="2" conaffinity="7"
            friction="1 0.01 0.0005" solref="0.015 1" condim="3"/>
      <site name="object_site" size="0.005"/>
    </body>"""

  _BIMANUAL_ACTS = """
    <position name="pros_x_act" joint="pros_x" kp="300"
              ctrlrange="-0.25 0.25"/>
    <position name="pros_y_act" joint="pros_y" kp="300"
              ctrlrange="-0.45 0.1"/>
    <position name="pros_z_act" joint="pros_z" kp="300"
              ctrlrange="-0.2 0.2"/>
    <position name="pros_grip1_act" joint="pros_grip1" kp="120"
              ctrlrange="0 0.045"/>
    <position name="pros_grip2_act" joint="pros_grip2" kp="120"
              ctrlrange="0 0.045"/>"""

  def bimanual(overrides=None):
    cfg = base_env_config()
    cfg.update(config_dict.create(
        model_xml=builder.finalize_muscles(hand_mod.build_hand(
            arm=True, extra_worldbody=_BIMANUAL_SCENE,
            extra_actuators=_BIMANUAL_ACTS)),
        max_episode_steps=250, proximity_th=0.17, drop_th=0.9,
        lift_th=1.07, goal_center=(-0.38, 0.35, 1.05),
        reward_weights=config_dict.create(
            reach_dist=-0.1, act=0.0, fin_dis=-0.5, pass_err=-1.0),
    ))
    return BimanualEnv(cfg, overrides)

  register("MtxBimanual-v0", bimanual,
           aliases=("myoChallengeBimanual-v0",), suite="myochal")

  # ---- Table tennis (MyoChallenge'25 TableTennisEnvV0 role) ----
  from myosuite_tpu.assets.editor import build_tabletennis_xml

  def tabletennis(overrides=None):
    cfg = base_env_config()
    cfg.update(config_dict.create(
        model_xml=build_tabletennis_xml(),
        max_episode_steps=150,
        reward_weights=config_dict.create(
            reach_dist=1.0, palm_dist=1.0, paddle_quat=2.0, act_reg=0.5,
            torso_up=2.0, sparse=100.0, solved=1000.0, done_pen=10.0),
    ))
    return TableTennisEnv(cfg, overrides)

  register("MtxTableTennis-v0", tabletennis,
           aliases=("myoChallengeTableTennisP1-v0",), suite="myochal")

  # ---- Elbow pose with exo assist + payload randomization ----
  from myosuite_tpu.envs.pose import ElbowExoPoseEnv

  def elbow_exo(overrides=None, fixed=False):
    cfg = pose_config(elbow_xml, [0.0], [2.27], fixed_target=fixed,
                      weight_range=(0.0, 2.0), exo_assist=0.6)
    return ElbowExoPoseEnv(cfg, overrides)

  register_with_variants(
      "MtxElbowPoseExoRandom-v0", functools.partial(elbow_exo),
      aliases=("myoElbowPose1D6MExoRandom-v0",))
  register_with_variants(
      "MtxElbowPoseExoFixed-v0", functools.partial(elbow_exo, fixed=True),
      aliases=("myoElbowPose1D6MExoFixed-v0",))

  # reafferentation (tendon transfer EIP -> EPL), reference base_v0.py:104-108
  act_names = [_mj.mj_id2name(hand_mj, _mj.mjtObj.mjOBJ_ACTUATOR.value, i)
               for i in range(hand_mj.nu)]
  eip, epl = act_names.index("IF_EIP"), act_names.index("TH_EPL")

  def hand_pose_reaf(overrides=None):
    return ReafferentationWrapper(hand_pose(overrides), src=eip, dst=epl)

  register("MtxReafHandPoseRandom-v0", hand_pose_reaf,
           aliases=("myoReafHandPoseRandom-v0",))

  # ---- MyoDM suite: hand+object tracking over the 50 GRAB objects ----
  # (~90 track tasks + 100 Fixed/Random object envs, envs/myodm.py)
  from myosuite_tpu.envs import myodm as myodm_mod
  myodm_mod.register_all(
      functools.partial(register, suite="myodm"))


_register_all()
