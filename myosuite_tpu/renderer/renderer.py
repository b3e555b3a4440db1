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


class PassiveViewer:
  """Interactive onscreen viewer streaming device states into a
  mujoco.viewer window.

  Role-equivalent of the reference's passive-viewer path
  (/root/reference/myosuite/renderer/mj_renderer.py:50-79: window with
  pause on SPACE and quit on ESC) and the mjx policy-visualizer loop
  (/root/reference/myosuite/envs/myo/mjx/visu_mjx_env.py:16). The host
  MjData is a pure rasterizer target — dynamics stay on the device.

  Requires a display (or MUJOCO_GL=egl/osmesa); construction raising is
  expected on headless boxes, callers should fall back to offscreen.
  """

  def __init__(self, env, realtime: bool = True):
    import os
    import sys
    # GLFW aborts the whole process (not an exception) when no display is
    # reachable — pre-check so headless callers get a catchable error
    if sys.platform.startswith("linux") and not os.environ.get("DISPLAY"):
      raise RuntimeError("no DISPLAY; onscreen viewer needs an X display")
    import mujoco.viewer
    self._mj_model = env.mj_model
    self._mj_data = mujoco.MjData(self._mj_model)
    self._dt = float(env.dt) if hasattr(env, "dt") else 0.02
    self._realtime = realtime
    self._paused = False
    self._viewer = mujoco.viewer.launch_passive(
        self._mj_model, self._mj_data, key_callback=self._on_key)

  def _on_key(self, keycode):
    if keycode == 32:  # SPACE: toggle pause (reference key handler role)
      self._paused = not self._paused

  def is_running(self) -> bool:
    return self._viewer.is_running()

  def sync(self, data) -> None:
    """Display one device state; blocks while paused, paces realtime."""
    import time
    self._mj_data.qpos[:] = np.asarray(data.qpos, dtype=np.float64)
    self._mj_data.qvel[:] = np.asarray(data.qvel, dtype=np.float64)
    if self._mj_model.nmocap:
      self._mj_data.mocap_pos[:] = np.asarray(data.mocap_pos)
      self._mj_data.mocap_quat[:] = np.asarray(data.mocap_quat)
    mujoco.mj_forward(self._mj_model, self._mj_data)
    self._viewer.sync()
    while self._paused and self._viewer.is_running():
      time.sleep(0.05)
      self._viewer.sync()
    if self._realtime:
      time.sleep(self._dt)

  def close(self):
    self._viewer.close()

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()


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
