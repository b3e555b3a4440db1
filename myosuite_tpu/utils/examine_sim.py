"""examine_sim CLI: load a raw MJCF (or a registered env's model), step the
physics, and dump summary / snapshot frames.

Role-equivalent of the reference's examine_sim viewer
(/root/reference/myosuite/utils/examine_sim.py) minus the interactive
window (headless TPU hosts): prints model stats, steps the TPU engine with
zero/random controls, reports state drift, and optionally renders
snapshot PNGs via the host rasterizer.

Usage:
  python -m myosuite_tpu.utils.examine_sim -m model.xml [-n 100] [--png out]
  python -m myosuite_tpu.utils.examine_sim -e MtxElbowPoseRandom-v0
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("-m", "--model_path", default=None,
                      help="MJCF xml path or string")
  parser.add_argument("-e", "--env_name", default=None,
                      help="registered env id (alternative to -m)")
  parser.add_argument("-n", "--num_steps", type=int, default=100)
  parser.add_argument("--ctrl", choices=["zero", "random"], default="zero")
  parser.add_argument("--seed", type=int, default=0)
  parser.add_argument("--png", default=None, help="snapshot png prefix")
  args = parser.parse_args(argv)

  import jax
  import jax.numpy as jnp

  from myosuite_tpu.physics import forward as F
  from myosuite_tpu.physics import io as pio

  if args.env_name:
    import myosuite_tpu
    env = myosuite_tpu.make(args.env_name)
    m, mj_model = env.model, env.mj_model
  else:
    assert args.model_path, "need -m or -e"
    xml = args.model_path
    if os.path.exists(xml):
      with open(xml) as f:
        xml = f.read()
    m, mj_model = pio.load_model(xml=xml)

  print(f"model: nq={m.nq} nv={m.nv} nu={m.nu} na={m.na} nbody={m.nbody} "
        f"ngeom={m.ngeom} ntendon={m.ntendon} ncon_max={m.ncon_max}")

  d = pio.make_data(m)
  rng = jax.random.PRNGKey(args.seed)
  if args.ctrl == "random":
    rng, r = jax.random.split(rng)
    ctrl = jax.random.uniform(r, (m.nu,))
  else:
    ctrl = jnp.zeros(m.nu)
  d = d.replace(ctrl=ctrl)

  step = jax.jit(lambda dd: F.step(m, dd))
  import time
  t0 = time.perf_counter()
  d = step(d)
  jax.block_until_ready(d.qpos)
  print(f"first step (incl. compile): {time.perf_counter() - t0:.2f}s")
  t0 = time.perf_counter()
  for _ in range(args.num_steps - 1):
    d = step(d)
  jax.block_until_ready(d.qpos)
  dt_step = (time.perf_counter() - t0) / max(args.num_steps - 1, 1)
  print(f"steady-state: {1e3 * dt_step:.3f} ms/step "
        f"({1.0 / max(dt_step, 1e-9):,.0f} steps/s single env)")
  print(f"t={float(d.time):.3f}s |qpos|={float(jnp.linalg.norm(d.qpos)):.4f}"
        f" |qvel|={float(jnp.linalg.norm(d.qvel)):.4f}"
        f" finite={bool(np.isfinite(np.asarray(d.qpos)).all())}")

  if args.png:
    import imageio
    import mujoco

    md = mujoco.MjData(mj_model)
    md.qpos[:] = np.asarray(d.qpos, dtype=np.float64)
    mujoco.mj_forward(mj_model, md)
    renderer = mujoco.Renderer(mj_model, height=480, width=640)
    renderer.update_scene(md, camera=-1)
    path = f"{args.png}.png"
    imageio.imwrite(path, renderer.render())
    renderer.close()
    print(f"saved snapshot: {path}")

  os._exit(0)  # bypass slow TPU-plugin atexit teardown


if __name__ == "__main__":
  main()
