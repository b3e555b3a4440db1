"""Convex-mesh contact kernels (die / GRAB object role).

Reference anchor: the reorient die and all GRAB objects are mesh geoms
(/root/reference/myosuite/envs/myo/myochallenge/reorient_v0.py:15,
myodm/__init__.py:49-70). The engine collides convex meshes via
closest-point-on-triangle over all faces (physics/collision.py mesh
kernels); a cube-hull mesh must agree with the analytic box kernels, and
a mesh die dropped on a plane must settle resting on a face, matching
MuJoCo's own settle height.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from myosuite_tpu.physics import collision, forward, io
from myosuite_tpu.physics.types import GeomType

DIE_MESH_XML = """
<mujoco>
  <option timestep="0.002"/>
  <asset>
    <mesh name="die" vertex="-0.023 -0.023 -0.023  0.023 -0.023 -0.023
                             -0.023  0.023 -0.023  0.023  0.023 -0.023
                             -0.023 -0.023  0.023  0.023 -0.023  0.023
                             -0.023  0.023  0.023  0.023  0.023  0.023"/>
  </asset>
  <worldbody>
    <geom name="floor" type="plane" size="1 1 .1"/>
    <body name="die" pos="0 0 0.15" euler="0.3 0.2 0.1">
      <freejoint/>
      <geom name="die_geom" type="mesh" mesh="die" mass="0.07"
            friction="1 0.005 0.0001" condim="3"/>
    </body>
  </worldbody>
</mujoco>
"""


def _cube_tables():
  verts = np.array([[sx, sy, sz] for sz in (-1, 1) for sy in (-1, 1)
                    for sx in (-1, 1)], dtype=np.float32) * 0.023
  # outward-wound triangles of the cube (2 per face)
  faces = np.array([
      [0, 2, 1], [1, 2, 3],      # bottom (z-)
      [4, 5, 6], [5, 7, 6],      # top (z+)
      [0, 1, 4], [1, 5, 4],      # y-
      [2, 6, 3], [3, 6, 7],      # y+
      [0, 4, 2], [2, 4, 6],      # x-
      [1, 3, 5], [3, 7, 5],      # x+
  ], dtype=np.int32)
  return verts, faces


def test_closest_on_tri_brute_force():
  rng = np.random.default_rng(0)
  a, b, c = [jnp.asarray(rng.standard_normal(3), dtype=jnp.float32)
             for _ in range(3)]
  for _ in range(20):
    p = jnp.asarray(rng.standard_normal(3) * 2, dtype=jnp.float32)
    got = collision._closest_on_tri(p, a, b, c)
    # brute force over barycentric grid
    us, vs = np.meshgrid(np.linspace(0, 1, 201), np.linspace(0, 1, 201))
    mask = us + vs <= 1.0
    pts = (np.asarray(a)[None] + us[mask][:, None] * np.asarray(b - a)[None]
           + vs[mask][:, None] * np.asarray(c - a)[None])
    d_brute = np.min(np.linalg.norm(pts - np.asarray(p)[None], axis=1))
    d_got = float(jnp.linalg.norm(got - p))
    assert abs(d_got - d_brute) < 2e-2, (d_got, d_brute)
    assert d_got <= d_brute + 1e-5


def test_sphere_mesh_matches_sphere_box():
  """A cube-hull mesh must collide like the analytic box kernel."""
  verts, faces = _cube_tables()
  fns = collision._mesh_factory(verts, faces)
  sphere_mesh = fns[(GeomType.SPHERE, GeomType.MESH)]

  rng = np.random.default_rng(1)
  size = jnp.asarray([0.023, 0.023, 0.023, 0.0], dtype=jnp.float32)
  eye = jnp.eye(3, dtype=jnp.float32)
  for _ in range(10):
    center = jnp.asarray(rng.uniform(-0.08, 0.08, 3), dtype=jnp.float32)
    r = jnp.float32(0.01)
    d_mesh, pos_mesh, n_mesh = sphere_mesh(
        center, eye, jnp.asarray([0.01, 0, 0, 0], dtype=jnp.float32),
        jnp.zeros(3), eye, size)
    d_box, pos_box, n_box = collision._sphere_box(
        center, eye, jnp.asarray([0.01, 0, 0, 0], dtype=jnp.float32),
        jnp.zeros(3), eye, size)
    np.testing.assert_allclose(np.asarray(d_mesh), np.asarray(d_box),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n_mesh), np.asarray(n_box),
                               rtol=1e-3, atol=1e-4)


def test_mesh_pairs_enter_collision_table():
  mj = mujoco.MjModel.from_xml_string(DIE_MESH_XML)
  m = io.put_model(mj)
  pairs = np.asarray(m.collision_pairs.arr)
  assert len(pairs) == 1          # plane vs die mesh
  assert m.ncon_max == 4
  assert len(m.mesh_vert) == 1 and m.mesh_vert[0].arr.shape == (8, 3)


def test_die_settles_on_plane_like_mujoco():
  mj = mujoco.MjModel.from_xml_string(DIE_MESH_XML)
  mjd = mujoco.MjData(mj)
  for _ in range(1500):
    mujoco.mj_step(mj, mjd)
  z_ref = float(mjd.qpos[2])

  m = io.put_model(mj)
  d = io.make_data(m)
  d = d.replace(qpos=jnp.asarray(mj.qpos0 if hasattr(mj, 'qpos0')
                                 else mjd.qpos, dtype=jnp.float32))
  # reproduce the initial keyframe (pos + tilted quat) from the spec
  d0 = mujoco.MjData(mj)
  d = d.replace(qpos=jnp.asarray(d0.qpos, dtype=jnp.float32))
  stepn = jax.jit(lambda dd: forward.step_n(m, dd, 1500))
  d = stepn(d)
  z = float(d.qpos[2])
  # resting flat on a face: center height = half-size (0.023)
  assert abs(z - 0.023) < 6e-3, z
  assert abs(z - z_ref) < 6e-3, (z, z_ref)
  # essentially at rest
  assert float(jnp.linalg.norm(d.qvel)) < 0.2


def test_die_env_steps_with_mesh_object():
  import myosuite_tpu
  env = myosuite_tpu.make("MtxHandDieReorient-v0")
  mjm = env.mj_model
  g = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_GEOM.value, "object_geom")
  assert int(mjm.geom_type[g]) == int(GeomType.MESH)
  s = jax.jit(env.reset)(jax.random.PRNGKey(0))
  step = jax.jit(env.step)
  for _ in range(3):
    s = step(s, 0.4 * jnp.ones(env.action_size))
  assert np.isfinite(np.asarray(s.obs["state"])).all()
  assert np.isfinite(float(s.reward))
