"""render_cams CLI: offscreen multi-camera snapshots of a model.

Role-equivalent of the reference's render_cams tool
(/root/reference/myosuite/utils/render_cams.py:23): render every (or the
named) camera of an env/model to PNGs or a tiled composite.

Usage:
  python -m myosuite_tpu.utils.render_cams -e MtxHandReachRandom-v0 \
      -o /tmp/cams [-c cam1 cam2]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def render_all_cams(env, cameras=None, width=400, height=300):
  """Returns {camera_name: rgb array} for one reset state."""
  import jax
  import mujoco

  from myosuite_tpu.renderer import Renderer

  mj = env.mj_model
  if cameras is None:
    cameras = [mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_CAMERA.value, i)
               for i in range(mj.ncam)] or [None]
  state = jax.jit(env.reset)(jax.random.PRNGKey(0))
  r = Renderer(env, width=width, height=height)
  frames = {}
  for cam in cameras:
    frames[cam or "free"] = r.render(state.data, camera=cam)
  r.close()
  return frames


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("-e", "--env_name", required=True)
  parser.add_argument("-c", "--cameras", nargs="*", default=None)
  parser.add_argument("-o", "--output", default="./cams")
  parser.add_argument("--tile", action="store_true",
                      help="also write a side-by-side composite")
  args = parser.parse_args(argv)

  import imageio

  import myosuite_tpu

  env = myosuite_tpu.make(args.env_name)
  frames = render_all_cams(env, args.cameras)
  os.makedirs(args.output, exist_ok=True)
  for cam, img in frames.items():
    path = os.path.join(args.output, f"{cam}.png")
    imageio.imwrite(path, img)
    print(f"saved {path}")
  if args.tile and len(frames) > 1:
    tile = np.concatenate(list(frames.values()), axis=1)
    path = os.path.join(args.output, "tiled.png")
    imageio.imwrite(path, tile)
    print(f"saved {path}")
  os._exit(0)


if __name__ == "__main__":
  main()
