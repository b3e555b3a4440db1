"""Procedural terrain + egocentric heightmap observations.

Re-designs the reference's heightfield system
(/root/reference/myosuite/envs/heightfields.py:80-458) for the functional
stack: terrain is a (H, W) height grid in the env State.info, regenerated
in-graph at episode boundaries; the egocentric heightmap observation
(rotate a 10x10 probe grid by root yaw, sample heights,
heightfields.py:109-153) is a pure bilinear-sampling op that vmaps.

Terrain generators mirror TrackField's difficulty families: FLAT, ROUGH
(filtered noise), HILLY (sinusoid), STAIRS (quantized ramp)
(heightfields.py:374-409), all as pure functions of a PRNG key.
"""

from __future__ import annotations

import enum
from typing import Tuple

import jax
import jax.numpy as jnp


class TerrainType(enum.IntEnum):
  FLAT = 0
  ROUGH = 1
  HILLY = 2
  STAIRS = 3


def flat(shape: Tuple[int, int]) -> jax.Array:
  return jnp.zeros(shape, dtype=jnp.float32)


def rough(rng: jax.Array, shape: Tuple[int, int],
          amplitude: float = 0.05) -> jax.Array:
  """Filtered uniform noise (3x3 box blur keeps slopes walkable)."""
  noise = jax.random.uniform(rng, shape, minval=0.0, maxval=amplitude)
  k = jnp.ones((3, 3), dtype=jnp.float32) / 9.0
  return jax.scipy.signal.convolve2d(noise, k, mode="same")


def hilly(rng: jax.Array, shape: Tuple[int, int],
          amplitude: float = 0.15, wavelength: float = 12.0) -> jax.Array:
  """Sinusoidal hills with a random phase (TrackField HILLY family)."""
  phase = jax.random.uniform(rng, (), minval=0.0, maxval=2 * jnp.pi)
  x = jnp.arange(shape[1], dtype=jnp.float32)
  prof = 0.5 * amplitude * (1.0 - jnp.cos(2 * jnp.pi * x / wavelength
                                          + phase))
  return jnp.tile(prof[None, :], (shape[0], 1))


def stairs(rng: jax.Array, shape: Tuple[int, int],
           step_height: float = 0.08, step_len: int = 6) -> jax.Array:
  """Up-then-down staircase with randomized step height."""
  h = step_height * jax.random.uniform(rng, (), minval=0.5, maxval=1.0)
  x = jnp.arange(shape[1])
  half = shape[1] // 2
  up = (x // step_len).astype(jnp.float32)
  down = ((shape[1] - 1 - x) // step_len).astype(jnp.float32)
  prof = h * jnp.minimum(up, down)
  return jnp.tile(prof[None, :], (shape[0], 1))


def generate(rng: jax.Array, terrain_type: jax.Array,
             shape: Tuple[int, int]) -> jax.Array:
  """Dispatch on a traced terrain-type code (lax.switch, in-graph)."""
  return jax.lax.switch(
      jnp.asarray(terrain_type, dtype=jnp.int32),
      [lambda r: flat(shape),
       lambda r: rough(r, shape),
       lambda r: hilly(r, shape),
       lambda r: stairs(r, shape)],
      rng)


def chasetag_arena(rng: jax.Array, shape: Tuple[int, int],
                   patches: int = 2) -> jax.Array:
  """Patch-based chase-tag arena: a patches x patches grid where every
  patch is independently FLAT / ROUGH / HILLY (reference ChaseTagField
  _populate_patches, /root/reference/myosuite/envs/heightfields.py:244-260;
  the RELIEF logo patch is decorative and not reproduced).

  Runs in-graph: all three generators are evaluated per patch and
  select()-ed by the sampled code — fixed shapes, no host round-trip."""
  h, w = shape
  ph, pw = h // patches, w // patches
  rngs = jax.random.split(rng, patches * patches * 2)
  rows = []
  k = 0
  for i in range(patches):
    cols = []
    for j in range(patches):
      code = jax.random.randint(rngs[k], (), 0, 3)
      tile = generate(rngs[k + 1], code, (ph, pw))
      cols.append(tile)
      k += 2
    rows.append(jnp.concatenate(cols, axis=1))
  arena = jnp.concatenate(rows, axis=0)
  # pad to the exact grid if patches don't divide evenly
  return jnp.pad(arena, ((0, h - patches * ph), (0, w - patches * pw)),
                 mode="edge")


def sample_height(hfield: jax.Array, xy: jax.Array,
                  extent: Tuple[float, float],
                  base: Tuple[float, float] = (0.0, 0.0)) -> jax.Array:
  """Bilinear height lookup at world (x, y).

  extent = (size_x, size_y) of the full field centered at `base`.
  """
  h, w = hfield.shape
  u = (xy[0] - base[0]) / extent[0] + 0.5   # [0, 1] across columns
  v = (xy[1] - base[1]) / extent[1] + 0.5   # [0, 1] across rows
  cx = jnp.clip(u * (w - 1), 0.0, float(w - 1))
  cy = jnp.clip(v * (h - 1), 0.0, float(h - 1))
  x0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, w - 2)
  y0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, h - 2)
  fx = cx - x0
  fy = cy - y0
  h00 = hfield[y0, x0]
  h01 = hfield[y0, x0 + 1]
  h10 = hfield[y0 + 1, x0]
  h11 = hfield[y0 + 1, x0 + 1]
  return ((1 - fy) * ((1 - fx) * h00 + fx * h01)
          + fy * ((1 - fx) * h10 + fx * h11))


def egocentric_heightmap(hfield: jax.Array, root_xy: jax.Array,
                         root_yaw: jax.Array,
                         extent: Tuple[float, float],
                         grid: int = 10,
                         span: float = 1.0,
                         base: Tuple[float, float] = (0.0, 0.0)) -> jax.Array:
  """10x10 heightmap around the agent, rotated into its heading frame.

  Reference semantics: HeightField.get_heightmap_obs rotates the probe grid
  by root yaw and samples the field (heightfields.py:109-153).
  """
  lin = jnp.linspace(-span / 2, span / 2, grid)
  gx, gy = jnp.meshgrid(lin, lin)
  pts = jnp.stack([gx.ravel(), gy.ravel()])          # (2, grid*grid)
  c, s = jnp.cos(root_yaw), jnp.sin(root_yaw)
  rot = jnp.array([[c, -s], [s, c]])
  world = rot @ pts + root_xy[:, None]
  heights = jax.vmap(
      lambda p: sample_height(hfield, p, extent, base))(world.T)
  return heights.reshape(grid, grid)
