"""Offscreen rendering of TPU engine states via host MuJoCo.

Role-equivalent of the reference's renderer stack
(/root/reference/myosuite/renderer/mj_renderer.py:26): rgb/depth/
segmentation offscreen frames, camera control, mp4 export. Device states
are synced into a host MjData (qpos/qvel/mocap only — the host engine is
used purely as a rasterizer; all dynamics happened on TPU).
"""

from __future__ import annotations

from typing import Iterable, List, Optional

import mujoco
import numpy as np


class Renderer:
  """Offscreen renderer bound to an env's host model."""

  def __init__(self, env, width: int = 640, height: int = 480):
    self._env = env
    self._mj_model = env.mj_model
    self._mj_data = mujoco.MjData(self._mj_model)
    self._renderer = mujoco.Renderer(self._mj_model, height=height,
                                     width=width)

  def sync(self, data) -> None:
    """Copy a device Data (or env State.data) into the host scene."""
    qpos = np.asarray(data.qpos, dtype=np.float64)
    qvel = np.asarray(data.qvel, dtype=np.float64)
    self._mj_data.qpos[:] = qpos
    self._mj_data.qvel[:] = qvel
    if self._mj_model.nmocap:
      self._mj_data.mocap_pos[:] = np.asarray(data.mocap_pos)
      self._mj_data.mocap_quat[:] = np.asarray(data.mocap_quat)
    mujoco.mj_forward(self._mj_model, self._mj_data)

  def render(self, data=None, camera: Optional[str] = None,
             depth: bool = False, segmentation: bool = False) -> np.ndarray:
    if data is not None:
      self.sync(data)
    if depth:
      self._renderer.enable_depth_rendering()
    elif segmentation:
      self._renderer.enable_segmentation_rendering()
    else:
      self._renderer.disable_depth_rendering()
      self._renderer.disable_segmentation_rendering()
    self._renderer.update_scene(
        self._mj_data, camera=camera if camera is not None else -1)
    return self._renderer.render()

  def close(self):
    self._renderer.close()


def render_rollout(env, datas: Iterable, path: str, fps: int = 50,
                   camera: Optional[str] = None) -> str:
  """Render a sequence of Data states to an mp4 (examine_policy role,
  /root/reference/myosuite/envs/env_base.py:917-964)."""
  import imageio

  r = Renderer(env)
  frames: List[np.ndarray] = []
  for d in datas:
    frames.append(r.render(d, camera=camera))
  r.close()
  imageio.mimsave(path, frames, fps=fps)
  return path


def render_qpos_sequence(env, qpos_seq: np.ndarray, path: str, fps: int = 50,
                         camera: Optional[str] = None) -> str:
  """Render a (T, nq) qpos sequence to an mp4 (examine_logs render mode,
  /root/reference/myosuite/logger/examine_logs.py render path)."""
  import imageio

  r = Renderer(env)
  frames: List[np.ndarray] = []
  for t in range(qpos_seq.shape[0]):
    r._mj_data.qpos[:] = np.asarray(qpos_seq[t], dtype=np.float64)
    mujoco.mj_forward(r._mj_model, r._mj_data)
    r._renderer.update_scene(
        r._mj_data, camera=camera if camera is not None else -1)
    frames.append(r._renderer.render())
  r.close()
  imageio.mimsave(path, frames, fps=fps)
  return path
