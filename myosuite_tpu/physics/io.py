"""Host-side model loading: MJCF -> TPU-native `Model`.

MuJoCo's (CPU) compiler is used ONLY at load time as an MJCF front-end — the
same role it plays for the reference's MJX branch
(/root/reference/myosuite/envs/myo/mjx/mjx_base_env.py:29-37 compiles an
MjSpec, then hands arrays to an accelerator engine). Every per-step
computation in this framework is our own JAX/Pallas code in this package.

The loader also precomputes everything that must be static for XLA:
  * topological levels of the kinematic tree (unrolled at trace time),
  * the dense collision-pair table with fixed contact capacity,
  * actuator activation-state addressing.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import mujoco
import numpy as np

from myosuite_tpu.physics import types
from myosuite_tpu.physics.types import (Contact, Data, GeomType, JointType,
                                        Model, Option, Static)

# Number of contact points each supported pair class can generate.
_PAIR_NCON = {
    (GeomType.HFIELD, GeomType.SPHERE): 1,
    (GeomType.HFIELD, GeomType.CAPSULE): 2,
    (GeomType.HFIELD, GeomType.BOX): 4,
    (GeomType.PLANE, GeomType.SPHERE): 1,
    (GeomType.PLANE, GeomType.CAPSULE): 2,
    (GeomType.PLANE, GeomType.ELLIPSOID): 1,
    (GeomType.PLANE, GeomType.BOX): 4,
    (GeomType.SPHERE, GeomType.SPHERE): 1,
    (GeomType.SPHERE, GeomType.CAPSULE): 1,
    (GeomType.SPHERE, GeomType.ELLIPSOID): 1,
    (GeomType.SPHERE, GeomType.BOX): 1,
    (GeomType.CAPSULE, GeomType.CAPSULE): 1,
    (GeomType.CAPSULE, GeomType.BOX): 2,
    (GeomType.BOX, GeomType.BOX): 8,
    # convex mesh colliders (physics/collision.py mesh kernels)
    (GeomType.PLANE, GeomType.MESH): 4,
    (GeomType.SPHERE, GeomType.MESH): 1,
    (GeomType.CAPSULE, GeomType.MESH): 2,
    (GeomType.BOX, GeomType.MESH): 4,
}


def _body_levels(parentid: np.ndarray) -> Tuple[Tuple[int, ...], ...]:
  """Group body ids (excluding world=0) into topological levels."""
  n = len(parentid)
  depth = np.zeros(n, dtype=int)
  for i in range(1, n):
    depth[i] = depth[parentid[i]] + 1
  levels = []
  for d in range(1, depth.max() + 1 if n > 1 else 1):
    ids = tuple(int(i) for i in np.nonzero(depth == d)[0])
    if ids:
      levels.append(ids)
  return tuple(levels)


def _collision_pairs(m: mujoco.MjModel) -> np.ndarray:
  """Static (npair, 4) table [geom1, geom2, ncon_slots, condim].

  Mirrors MuJoCo's pair filtering semantics (contype/conaffinity mask,
  same-body / parent-child / weld exclusion, <exclude> signatures) computed
  once on the host; the device then evaluates every pair every step with
  static shapes — no broadphase, no dynamic allocation.
  """
  pairs = []
  excl = set()
  for sig in m.exclude_signature:
    excl.add((int(sig) >> 16, int(sig) & 0xFFFF))

  weld = m.body_weldid
  for g1 in range(m.ngeom):
    for g2 in range(g1 + 1, m.ngeom):
      t1, t2 = int(m.geom_type[g1]), int(m.geom_type[g2])
      b1, b2 = int(m.geom_bodyid[g1]), int(m.geom_bodyid[g2])
      # contype/conaffinity mask
      mask = ((m.geom_contype[g1] & m.geom_conaffinity[g2]) or
              (m.geom_contype[g2] & m.geom_conaffinity[g1]))
      if not mask:
        continue
      # same-(welded-)body exclusion
      w1, w2 = int(weld[b1]), int(weld[b2])
      if w1 == w2:
        continue
      # parent-child exclusion (unless parent is the world body)
      pw1, pw2 = int(weld[m.body_parentid[w1]]), int(weld[m.body_parentid[w2]])
      if (pw1 == w2 and w2 != 0) or (pw2 == w1 and w1 != 0):
        continue
      if (b1, b2) in excl or (b2, b1) in excl:
        continue
      # canonical order by geom type
      if t1 > t2:
        g1s, g2s, t1s, t2s = g2, g1, t2, t1
      else:
        g1s, g2s, t1s, t2s = g1, g2, t1, t2
      key = (GeomType(t1s), GeomType(t2s))
      if key not in _PAIR_NCON:
        continue  # unsupported pair class (e.g. mesh) — skipped, documented
      condim = max(int(m.geom_condim[g1]), int(m.geom_condim[g2]))
      p1, p2 = int(m.geom_priority[g1]), int(m.geom_priority[g2])
      if p1 != p2:
        condim = int(m.geom_condim[g1 if p1 > p2 else g2])
      pairs.append((g1s, g2s, _PAIR_NCON[key], condim))

  if not pairs:
    return np.zeros((0, 4), dtype=np.int32)
  return np.array(pairs, dtype=np.int32)


def put_model(m: mujoco.MjModel) -> Model:
  """Convert a compiled mjModel into the TPU-native Model pytree."""
  # activation addressing
  actadr = m.actuator_actadr.copy()
  actnum = m.actuator_actnum.copy()

  pairs = _collision_pairs(m)
  ncon_max = int(pairs[:, 2].sum()) if len(pairs) else 0

  # heightfield metadata (at most one supported)
  assert m.nhfield <= 1, "at most one heightfield per model"
  if m.nhfield == 1:
    hf_nrow, hf_ncol = int(m.hfield_nrow[0]), int(m.hfield_ncol[0])
    hf_size = np.asarray(m.hfield_size[0], dtype=np.float32)
    hf_geomid = -1
    for g in range(m.ngeom):
      if int(m.geom_type[g]) == int(GeomType.HFIELD):
        hf_geomid = g
  else:
    hf_nrow = hf_ncol = 0
    hf_geomid = -1
    hf_size = np.zeros(4, dtype=np.float32)

  opt = Option(
      timestep=float(m.opt.timestep),
      integrator=int(m.opt.integrator),
      iterations=int(m.opt.iterations),
      ls_iterations=int(m.opt.ls_iterations),
      cone=int(m.opt.cone),
      disableflags=int(m.opt.disableflags),
      gravity=jnp.asarray(m.opt.gravity, dtype=jnp.float32),
      impratio=jnp.float32(m.opt.impratio),
      tolerance=jnp.float32(m.opt.tolerance),
      ls_tolerance=jnp.float32(m.opt.ls_tolerance),
      o_margin=jnp.float32(m.opt.o_margin),
  )

  f32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float32)
  S = lambda x: Static(np.asarray(x))

  # convex mesh assets: geom-local vertices + outward-wound triangles
  mesh_vert, mesh_face = [], []
  for i in range(int(m.nmesh)):
    va, vn = int(m.mesh_vertadr[i]), int(m.mesh_vertnum[i])
    fa, fn = int(m.mesh_faceadr[i]), int(m.mesh_facenum[i])
    mesh_vert.append(Static(np.asarray(
        m.mesh_vert[va:va + vn], dtype=np.float32)))
    mesh_face.append(Static(np.asarray(
        m.mesh_face[fa:fa + fn], dtype=np.int32)))
  mesh_vert, mesh_face = tuple(mesh_vert), tuple(mesh_face)

  return Model(
      nq=int(m.nq), nv=int(m.nv), nu=int(m.nu), na=int(m.na),
      nbody=int(m.nbody), njnt=int(m.njnt), ngeom=int(m.ngeom),
      nsite=int(m.nsite), ntendon=int(m.ntendon), nwrap=int(m.nwrap),
      nmocap=int(m.nmocap), ncon_max=ncon_max,
      hfield_nrow=hf_nrow, hfield_ncol=hf_ncol, hfield_geomid=hf_geomid,
      body_parentid=S(m.body_parentid), body_rootid=S(m.body_rootid),
      body_jntadr=S(m.body_jntadr), body_jntnum=S(m.body_jntnum),
      body_dofadr=S(m.body_dofadr), body_dofnum=S(m.body_dofnum),
      body_mocapid=S(m.body_mocapid),
      body_tree=_body_levels(m.body_parentid),
      jnt_type=S(m.jnt_type), jnt_qposadr=S(m.jnt_qposadr),
      jnt_dofadr=S(m.jnt_dofadr), jnt_bodyid=S(m.jnt_bodyid),
      jnt_limited=S(m.jnt_limited), jnt_actgravcomp=S(m.jnt_actgravcomp),
      dof_bodyid=S(m.dof_bodyid), dof_jntid=S(m.dof_jntid),
      dof_parentid=S(m.dof_parentid),
      geom_type=S(m.geom_type), geom_bodyid=S(m.geom_bodyid),
      geom_condim=S(m.geom_condim), geom_priority=S(m.geom_priority),
      geom_dataid=S(m.geom_dataid), mesh_vert=mesh_vert,
      mesh_face=mesh_face,
      site_bodyid=S(m.site_bodyid),
      tendon_adr=S(m.tendon_adr), tendon_num=S(m.tendon_num),
      tendon_limited=S(m.tendon_limited),
      wrap_type=S(m.wrap_type), wrap_objid=S(m.wrap_objid),
      actuator_trntype=S(m.actuator_trntype),
      actuator_dyntype=S(m.actuator_dyntype),
      actuator_gaintype=S(m.actuator_gaintype),
      actuator_biastype=S(m.actuator_biastype),
      actuator_trnid=S(m.actuator_trnid),
      actuator_actadr=S(actadr), actuator_actnum=S(actnum),
      actuator_ctrllimited=S(m.actuator_ctrllimited),
      actuator_forcelimited=S(m.actuator_forcelimited),
      actuator_actlimited=S(m.actuator_actlimited),
      collision_pairs=S(pairs),
      qpos0=f32(m.qpos0), qpos_spring=f32(m.qpos_spring),
      body_pos=f32(m.body_pos), body_quat=f32(m.body_quat),
      body_ipos=f32(m.body_ipos), body_iquat=f32(m.body_iquat),
      body_mass=f32(m.body_mass), body_inertia=f32(m.body_inertia),
      body_invweight0=f32(m.body_invweight0),
      body_gravcomp=f32(m.body_gravcomp),
      body_subtreemask=f32(_subtree_mask(m)),
      jnt_axis=f32(m.jnt_axis), jnt_pos=f32(m.jnt_pos),
      jnt_range=f32(m.jnt_range), jnt_stiffness=f32(m.jnt_stiffness),
      jnt_margin=f32(m.jnt_margin), jnt_solref=f32(m.jnt_solref),
      jnt_solimp=f32(m.jnt_solimp),
      dof_armature=f32(m.dof_armature), dof_damping=f32(m.dof_damping),
      dof_frictionloss=f32(m.dof_frictionloss),
      dof_invweight0=f32(m.dof_invweight0),
      geom_pos=f32(m.geom_pos), geom_quat=f32(m.geom_quat),
      geom_size=f32(m.geom_size), geom_friction=f32(m.geom_friction),
      geom_solref=f32(m.geom_solref), geom_solimp=f32(m.geom_solimp),
      geom_solmix=f32(m.geom_solmix), geom_margin=f32(m.geom_margin),
      geom_gap=f32(m.geom_gap),
      site_pos=f32(m.site_pos), site_quat=f32(m.site_quat),
      tendon_range=f32(m.tendon_range),
      tendon_stiffness=f32(m.tendon_stiffness),
      tendon_damping=f32(m.tendon_damping),
      tendon_lengthspring=f32(m.tendon_lengthspring),
      tendon_length0=f32(m.tendon_length0),
      tendon_invweight0=f32(m.tendon_invweight0),
      tendon_margin=f32(m.tendon_margin),
      tendon_solref_lim=f32(m.tendon_solref_lim),
      tendon_solimp_lim=f32(m.tendon_solimp_lim),
      wrap_prm=f32(m.wrap_prm),
      wrap_sidesite=S(_wrap_sidesites(m)),
      actuator_dynprm=f32(m.actuator_dynprm),
      actuator_gainprm=f32(m.actuator_gainprm),
      actuator_biasprm=f32(m.actuator_biasprm),
      actuator_ctrlrange=f32(m.actuator_ctrlrange),
      actuator_forcerange=f32(m.actuator_forcerange),
      actuator_actrange=f32(m.actuator_actrange),
      actuator_gear=f32(m.actuator_gear),
      # floor: a degenerate muscle path (constant length => acc0 ~ 0) would
      # otherwise get F0 = scale/acc0 ~ 1e14, and float32 Jacobian noise
      # times that force injects unbounded garbage torques. MuJoCo has the
      # same failure mode; flooring bounds F0 at ~1e3*scale and makes the
      # engine robust to bad models.
      actuator_acc0=f32(np.maximum(m.actuator_acc0, 1e-3)),
      actuator_length0=f32(m.actuator_length0),
      actuator_lengthrange=f32(m.actuator_lengthrange),
      hfield_size=jnp.asarray(hf_size),
      opt=opt,
  )


def _subtree_mask(m: mujoco.MjModel) -> np.ndarray:
  """(nbody, nbody) matrix: mask[i, j] = 1 iff body j is in subtree(i).

  Lets subtree aggregations (subtree_com, CRB inertia accumulation) run as
  one dense matmul on the MXU instead of a sequential tree walk.
  """
  n = m.nbody
  mask = np.zeros((n, n), dtype=np.float32)
  for j in range(n):
    b = j
    while True:
      mask[b, j] = 1.0
      if b == 0:
        break
      b = int(m.body_parentid[b])
  return mask


def _wrap_sidesites(m: mujoco.MjModel) -> np.ndarray:
  """Side-site ids for sphere/cylinder wrap segments (-1 when none).

  MuJoCo encodes the sidesite in wrap_prm for WRAP geoms as a float site id.
  """
  side = np.full(m.nwrap, -1, dtype=np.int32)
  for i in range(m.nwrap):
    t = int(m.wrap_type[i])
    if t in (int(types.WrapType.SPHERE), int(types.WrapType.CYLINDER)):
      sid = int(m.wrap_prm[i])
      side[i] = sid
  return side


def load_model(path: Optional[str] = None,
               xml: Optional[str] = None,
               assets: Optional[dict] = None) -> Tuple[Model, mujoco.MjModel]:
  """Compile MJCF (host) and convert; returns (tpu_model, mj_model)."""
  if xml is not None:
    mj = mujoco.MjModel.from_xml_string(xml, assets or {})
  else:
    mj = mujoco.MjModel.from_xml_path(path)
  return put_model(mj), mj


def make_data(m: Model) -> Data:
  """Fresh Data pytree at qpos0, everything else zeroed (static shapes)."""
  z = lambda *shape: jnp.zeros(shape, dtype=jnp.float32)
  ncon = m.ncon_max
  pairs = m.collision_pairs.arr
  # expand pair table into per-contact-slot geom ids / dims
  g1, g2, dim = [], [], []
  for p in pairs:
    for _ in range(int(p[2])):
      g1.append(int(p[0]))
      g2.append(int(p[1]))
      dim.append(int(p[3]))
  contact = Contact(
      dist=jnp.full((ncon,), 1e10, dtype=jnp.float32),
      pos=z(ncon, 3),
      frame=jnp.tile(jnp.eye(3, dtype=jnp.float32), (ncon, 1, 1)),
      includemargin=z(ncon),
      friction=jnp.tile(jnp.array([1, 1, 0.005, 0.0001, 0.0001],
                                  dtype=jnp.float32), (ncon, 1)),
      solref=jnp.tile(jnp.array([0.02, 1.0], dtype=jnp.float32), (ncon, 1)),
      solimp=jnp.tile(jnp.array([0.9, 0.95, 0.001, 0.5, 2.0],
                                dtype=jnp.float32), (ncon, 1)),
      geom1=Static(np.array(g1, dtype=np.int32)),
      geom2=Static(np.array(g2, dtype=np.int32)),
      dim=Static(np.array(dim, dtype=np.int32)),
  )
  return Data(
      time=jnp.float32(0.0),
      qpos=jnp.asarray(m.qpos0, dtype=jnp.float32),
      qvel=z(m.nv), act=z(m.na), ctrl=z(m.nu),
      qfrc_applied=z(m.nv), xfrc_applied=z(m.nbody, 6),
      mocap_pos=z(max(m.nmocap, 1), 3),
      mocap_quat=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype=jnp.float32),
                          (max(m.nmocap, 1), 1)),
      xpos=z(m.nbody, 3),
      xquat=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype=jnp.float32),
                     (m.nbody, 1)),
      xmat=jnp.tile(jnp.eye(3, dtype=jnp.float32), (m.nbody, 1, 1)),
      xipos=z(m.nbody, 3),
      ximat=jnp.tile(jnp.eye(3, dtype=jnp.float32), (m.nbody, 1, 1)),
      xanchor=z(m.njnt, 3), xaxis=z(m.njnt, 3),
      geom_xpos=z(m.ngeom, 3),
      geom_xmat=jnp.tile(jnp.eye(3, dtype=jnp.float32), (m.ngeom, 1, 1)),
      site_xpos=z(m.nsite, 3),
      site_xmat=jnp.tile(jnp.eye(3, dtype=jnp.float32), (m.nsite, 1, 1)),
      subtree_com=z(m.nbody, 3),
      cinert=z(m.nbody, 10), cdof=z(m.nv, 6), cdof_dot=z(m.nv, 6),
      cvel=z(m.nbody, 6),
      ten_length=z(m.ntendon), ten_velocity=z(m.ntendon),
      ten_J=z(m.ntendon, m.nv),
      actuator_length=z(m.nu), actuator_velocity=z(m.nu),
      actuator_moment=z(m.nu, m.nv), actuator_force=z(m.nu),
      act_dot=z(m.na),
      qM=z(m.nv, m.nv), qLD=z(m.nv, m.nv),
      qfrc_bias=z(m.nv), qfrc_passive=z(m.nv), qfrc_actuator=z(m.nv),
      qfrc_smooth=z(m.nv), qacc_smooth=z(m.nv),
      qfrc_constraint=z(m.nv), qacc=z(m.nv), qacc_euler=z(m.nv),
      contact=contact,
      efc_force_limit=z(m.njnt + m.ntendon),
      ncon_active=jnp.int32(0),
      contact_force=z(ncon),
      hfield_data=z(m.hfield_nrow, m.hfield_ncol),
  )
