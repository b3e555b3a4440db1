"""Core pytree types for the TPU-native physics engine.

Design notes (TPU-first):
  * `Model` is a pytree whose numeric fields are jnp arrays (so models can be
    batched / domain-randomized under vmap), while *structural* fields that
    drive Python-level trace decisions (tree topology, joint types, collision
    pair tables) are host numpy wrapped in `Static` — hashable, so jit treats
    them as compile-time constants and unrolls the kinematic tree into
    straight-line XLA with static shapes.
  * `Data` is one flat pytree holding both state (qpos/qvel/act/ctrl) and all
    per-step computed quantities, like the reference's mjx.Data
    (/root/reference/myosuite/envs/myo/mjx/mjx_base_env.py:128-189 uses
    mjx.make_data the same way). Everything has a static shape; contacts live
    in fixed-capacity arrays masked by activity.
  * The mass matrix is stored dense (nv x nv): nv is small (<= ~60 for myo
    models), and batched dense Cholesky maps straight onto the MXU, unlike
    MuJoCo's sparse LTDL which is branchy and sequential.
"""

from __future__ import annotations

import enum
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import struct


class JointType(enum.IntEnum):
  """MuJoCo-compatible joint type codes."""
  FREE = 0
  BALL = 1
  SLIDE = 2
  HINGE = 3


class GeomType(enum.IntEnum):
  PLANE = 0
  HFIELD = 1
  SPHERE = 2
  CAPSULE = 3
  ELLIPSOID = 4
  CYLINDER = 5
  BOX = 6
  MESH = 7


class DynType(enum.IntEnum):
  NONE = 0
  INTEGRATOR = 1
  FILTER = 2
  FILTEREXACT = 3
  MUSCLE = 4


class GainType(enum.IntEnum):
  FIXED = 0
  AFFINE = 1
  MUSCLE = 2


class BiasType(enum.IntEnum):
  NONE = 0
  AFFINE = 1
  MUSCLE = 2


class TrnType(enum.IntEnum):
  JOINT = 0
  JOINTINPARENT = 1
  SLIDERCRANK = 2
  TENDON = 3
  SITE = 4
  BODY = 5


class WrapType(enum.IntEnum):
  NONE = 0
  JOINT = 1
  PULLEY = 2
  SITE = 3
  SPHERE = 4
  CYLINDER = 5


class IntegratorType(enum.IntEnum):
  EULER = 0
  RK4 = 1
  IMPLICIT = 2
  IMPLICITFAST = 3


class ConeType(enum.IntEnum):
  PYRAMIDAL = 0
  ELLIPTIC = 1


class Static:
  """Immutable, hashable wrapper for host-side structural arrays.

  Stored in non-pytree fields of Model so jit caches correctly keyed on
  content, and Python-level loops over topology are resolved at trace time.
  """

  __slots__ = ("arr", "_hash")

  def __init__(self, arr):
    a = np.asarray(arr)
    a.setflags(write=False)
    object.__setattr__(self, "arr", a)
    object.__setattr__(self, "_hash",
                       hash((a.shape, str(a.dtype), a.tobytes())))

  def __setattr__(self, *_):
    raise AttributeError("Static is immutable")

  def __hash__(self):
    return self._hash

  def __eq__(self, other):
    return (isinstance(other, Static) and self.arr.shape == other.arr.shape
            and self.arr.dtype == other.arr.dtype
            and np.array_equal(self.arr, other.arr))

  def __getitem__(self, idx):
    return self.arr[idx]

  def __len__(self):
    return len(self.arr)

  def __iter__(self):
    return iter(self.arr)

  def __array__(self, dtype=None, copy=None):
    return np.asarray(self.arr, dtype=dtype)

  def __repr__(self):
    return f"Static({self.arr!r})"


def static_field(**kwargs):
  return struct.field(pytree_node=False, **kwargs)


_PLAN_CACHES: dict = {}


def plan_cache(key_obj, tag: str, builder):
  """Host-side plan cache keyed on a structural object's identity.

  Plans (static index tables built from a Model's Static fields) are cached
  per loaded model. Keying on id() alone is unsafe: if the keyed object is
  garbage-collected, CPython may reuse its id for a different model's array
  and silently serve a stale plan. Each entry therefore holds a strong
  reference to the key object and verifies it with `is` — while an entry
  lives, its id cannot be recycled.
  """
  cache = _PLAN_CACHES.setdefault(tag, {})
  key = id(key_obj)
  hit = cache.get(key)
  if hit is not None and hit[0] is key_obj:
    return hit[1]
  plan = builder()
  cache[key] = (key_obj, plan)
  return plan


@struct.dataclass
class Option:
  """Simulation options (subset of mjOption that the myo suite exercises)."""
  # static
  timestep: float = static_field()
  integrator: int = static_field()          # IntegratorType
  iterations: int = static_field()          # constraint solver iterations
  ls_iterations: int = static_field()       # linesearch iterations
  cone: int = static_field()                # ConeType (pyramidal only for now)
  disableflags: int = static_field()
  # device
  gravity: jax.Array
  impratio: jax.Array
  tolerance: jax.Array
  ls_tolerance: jax.Array
  # stabilization params for solref in "standard" mode
  o_margin: jax.Array


@struct.dataclass
class Model:
  """Physics model. Numeric params are jnp; structure is Static numpy.

  Field names deliberately follow mjModel so users of the reference find the
  same quantities (SURVEY.md section 2 inventory); the representation and the
  compute that consumes it are TPU-native.
  """
  # ---- sizes (static python ints) ----
  nq: int = static_field()
  nv: int = static_field()
  nu: int = static_field()
  na: int = static_field()
  nbody: int = static_field()
  njnt: int = static_field()
  ngeom: int = static_field()
  nsite: int = static_field()
  ntendon: int = static_field()
  nwrap: int = static_field()
  nmocap: int = static_field()
  ncon_max: int = static_field()   # static contact capacity
  # heightfield (at most one per model; terrain data itself lives in Data so
  # per-env terrain regenerates in-graph, unlike the reference's host-side
  # mj_model.hfield_data writes, /root/reference/myosuite/envs/heightfields.py:280)
  hfield_nrow: int = static_field()
  hfield_ncol: int = static_field()
  hfield_geomid: int = static_field()   # -1 if no hfield geom

  # ---- topology (Static numpy) ----
  body_parentid: Static = static_field()
  body_rootid: Static = static_field()
  body_jntadr: Static = static_field()
  body_jntnum: Static = static_field()
  body_dofadr: Static = static_field()
  body_dofnum: Static = static_field()
  body_mocapid: Static = static_field()
  body_tree: Tuple[Tuple[int, ...], ...] = static_field()  # topo levels, root first
  jnt_type: Static = static_field()
  jnt_qposadr: Static = static_field()
  jnt_dofadr: Static = static_field()
  jnt_bodyid: Static = static_field()
  jnt_limited: Static = static_field()
  jnt_actgravcomp: Static = static_field()
  dof_bodyid: Static = static_field()
  dof_jntid: Static = static_field()
  dof_parentid: Static = static_field()
  geom_type: Static = static_field()
  geom_bodyid: Static = static_field()
  geom_condim: Static = static_field()
  geom_priority: Static = static_field()
  # convex mesh colliders: geom -> mesh id (-1 for primitives); per-mesh
  # geom-local vertices (V, 3) float32 and triangle faces (F, 3) int32
  # with outward winding (MuJoCo asset convention)
  geom_dataid: Static = static_field()
  mesh_vert: tuple = static_field()     # tuple[Static, ...]
  mesh_face: tuple = static_field()     # tuple[Static, ...]
  site_bodyid: Static = static_field()
  tendon_adr: Static = static_field()
  tendon_num: Static = static_field()
  tendon_limited: Static = static_field()
  wrap_type: Static = static_field()
  wrap_objid: Static = static_field()
  actuator_trntype: Static = static_field()
  actuator_dyntype: Static = static_field()
  actuator_gaintype: Static = static_field()
  actuator_biastype: Static = static_field()
  actuator_trnid: Static = static_field()
  actuator_actadr: Static = static_field()
  actuator_actnum: Static = static_field()
  actuator_ctrllimited: Static = static_field()
  actuator_forcelimited: Static = static_field()
  actuator_actlimited: Static = static_field()
  # collision pair table: (npair, 4) columns [geom1, geom2, pairtype, condim]
  collision_pairs: Static = static_field()

  # ---- numeric parameters (jnp, batchable) ----
  qpos0: jax.Array
  qpos_spring: jax.Array
  body_pos: jax.Array
  body_quat: jax.Array
  body_ipos: jax.Array
  body_iquat: jax.Array
  body_mass: jax.Array
  body_inertia: jax.Array
  body_invweight0: jax.Array
  body_gravcomp: jax.Array
  body_subtreemask: jax.Array   # (nbody, nbody) 1.0 if col-body in row's subtree
  jnt_axis: jax.Array
  jnt_pos: jax.Array
  jnt_range: jax.Array
  jnt_stiffness: jax.Array
  jnt_margin: jax.Array
  jnt_solref: jax.Array
  jnt_solimp: jax.Array
  dof_armature: jax.Array
  dof_damping: jax.Array
  dof_frictionloss: jax.Array
  dof_invweight0: jax.Array
  geom_pos: jax.Array
  geom_quat: jax.Array
  geom_size: jax.Array
  geom_friction: jax.Array
  geom_solref: jax.Array
  geom_solimp: jax.Array
  geom_solmix: jax.Array
  geom_margin: jax.Array
  geom_gap: jax.Array
  site_pos: jax.Array
  site_quat: jax.Array
  tendon_range: jax.Array
  tendon_stiffness: jax.Array
  tendon_damping: jax.Array
  tendon_lengthspring: jax.Array
  tendon_length0: jax.Array
  tendon_invweight0: jax.Array
  tendon_margin: jax.Array
  tendon_solref_lim: jax.Array
  tendon_solimp_lim: jax.Array
  wrap_prm: jax.Array
  wrap_sidesite: Static = static_field()
  actuator_dynprm: jax.Array
  actuator_gainprm: jax.Array
  actuator_biasprm: jax.Array
  actuator_ctrlrange: jax.Array
  actuator_forcerange: jax.Array
  actuator_actrange: jax.Array
  actuator_gear: jax.Array
  actuator_acc0: jax.Array
  actuator_length0: jax.Array
  actuator_lengthrange: jax.Array
  hfield_size: jax.Array        # (4,) radius_x, radius_y, elev_z, base_z
  opt: Option


@struct.dataclass
class Contact:
  """Fixed-capacity contact set (all candidate pairs, masked by dist)."""
  dist: jax.Array           # (ncon,)
  pos: jax.Array            # (ncon, 3)
  frame: jax.Array          # (ncon, 3, 3) rows: normal, tan1, tan2
  includemargin: jax.Array  # (ncon,)
  friction: jax.Array       # (ncon, 5)
  solref: jax.Array         # (ncon, 2)
  solimp: jax.Array         # (ncon, 5)
  geom1: Static = static_field()
  geom2: Static = static_field()
  dim: Static = static_field()


@struct.dataclass
class Data:
  """Dynamic state + per-step computed quantities (flat, static shapes)."""
  # state
  time: jax.Array
  qpos: jax.Array
  qvel: jax.Array
  act: jax.Array
  ctrl: jax.Array
  qfrc_applied: jax.Array
  xfrc_applied: jax.Array
  mocap_pos: jax.Array
  mocap_quat: jax.Array

  # kinematics
  xpos: jax.Array           # (nbody, 3)
  xquat: jax.Array          # (nbody, 4)
  xmat: jax.Array           # (nbody, 3, 3)
  xipos: jax.Array
  ximat: jax.Array
  xanchor: jax.Array        # (njnt, 3)
  xaxis: jax.Array          # (njnt, 3)
  geom_xpos: jax.Array
  geom_xmat: jax.Array
  site_xpos: jax.Array
  site_xmat: jax.Array

  # com-based quantities
  subtree_com: jax.Array    # (nbody, 3)
  cinert: jax.Array         # (nbody, 10)
  cdof: jax.Array           # (nv, 6)
  cdof_dot: jax.Array       # (nv, 6)
  cvel: jax.Array           # (nbody, 6)

  # tendons / actuators
  ten_length: jax.Array     # (ntendon,)
  ten_velocity: jax.Array
  ten_J: jax.Array          # (ntendon, nv)
  actuator_length: jax.Array
  actuator_velocity: jax.Array
  actuator_moment: jax.Array  # (nu, nv)
  actuator_force: jax.Array
  act_dot: jax.Array

  # dynamics
  qM: jax.Array             # (nv, nv) dense
  qLD: jax.Array            # cholesky factor of qM (lower)
  qfrc_bias: jax.Array
  qfrc_passive: jax.Array
  qfrc_actuator: jax.Array
  qfrc_smooth: jax.Array
  qacc_smooth: jax.Array
  qfrc_constraint: jax.Array
  qacc: jax.Array
  # integrator acceleration from the fused solver kernel:
  # (qM + h diag(damping))^-1 (qfrc_smooth + qfrc_constraint); zeros on
  # the plain XLA path (euler() solves it inline there)
  qacc_euler: jax.Array

  # constraints
  contact: Contact
  efc_force_limit: jax.Array   # (nlimit,) forces from joint/tendon limits
  ncon_active: jax.Array       # scalar int: number of active contacts
  contact_force: jax.Array     # (ncon_max,) normal force per contact slot

  # terrain heights in meters, (hfield_nrow, hfield_ncol); (0, 0) if none.
  # Dynamic (per-env under vmap) so terrain regenerates at in-graph resets.
  hfield_data: jax.Array
