"""Visual observations: offscreen camera frames + pluggable encoders.

Role-equivalent of the reference's visual-obs system
(/root/reference/myosuite/envs/env_base.py:222-375 `_setup_rgb_encoders`
and 461-555 `get_visuals`): visual keys are "rgb:<cam>:<H>x<W>:<encoder>"
strings; encoders 1d (flatten) / 2d (pass-through) run anywhere, resnet18/
resnet34 (the reference's rrl18/rrl34 role) load lazily from torchvision
when torch is present. Rendering is host-side (the TPU engine's states are
synced into the rasterizer); encoders with weights run on torch-CPU.

The reference's r3m/vc1 encoders require external checkpoints that are not
redistributable; VisualObs raises a clear error for those keys and accepts
any user-provided callable instead.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np


def parse_visual_key(key: str):
  """"rgb:view_1:224x224:r3m18" -> (channel, cam, (H, W), encoder)."""
  parts = key.split(":")
  assert len(parts) == 4, f"bad visual key {key!r}"
  channel, cam, hw, encoder = parts
  h, w = hw.lower().split("x")
  return channel, cam, (int(h), int(w)), encoder


class VisualObs:
  """Render-and-encode pipeline over an env's host model."""

  def __init__(self, env, visual_keys: List[str],
               custom_encoders: Optional[Dict[str, Callable]] = None):
    from myosuite_tpu.renderer import Renderer

    self._env = env
    self._keys = [(k,) + parse_visual_key(k) for k in visual_keys]
    # renderers are created lazily on first get_visuals so headless hosts
    # can construct visual envs (and hit encoder errors) without GL
    self._renderers: Dict[tuple, Renderer] = {}
    self._encoders: Dict[str, Callable] = {}
    custom = custom_encoders or {}
    for _, channel, cam, hw, enc in self._keys:
      if enc in self._encoders or enc in custom:
        continue
      self._encoders[enc] = self._make_encoder(enc)
    self._encoders.update(custom)

  def _make_encoder(self, name: str) -> Callable:
    if name == "1d":
      return lambda img: np.asarray(img).ravel()
    if name == "2d":
      return lambda img: np.asarray(img)
    if name in ("rrl18", "rrl34", "resnet18", "resnet34"):
      try:
        import torchvision  # noqa: F401 — optional pretrained path
        return _torch_resnet_encoder(name)
      except ImportError:
        # TPU-native default: flax trunk, deterministic init, jitted.
        # This trunk is RANDOMLY initialized (fixed seed), not ImageNet-
        # pretrained — features differ from the torchvision path, so make
        # the substitution loud: policies trained against one encoder do
        # not transfer to the other.
        import warnings
        warnings.warn(
            f"torchvision unavailable: visual encoder {name!r} falls back "
            "to an untrained fixed-seed flax ResNet trunk (random "
            "features, NOT ImageNet-pretrained). Pass a custom_encoders "
            "entry for pretrained features.", RuntimeWarning)
        from myosuite_tpu.envs.visual_nets import make_resnet_encoder
        return make_resnet_encoder(name)
    if name.startswith(("r3m", "vc1")):
      raise ValueError(
          f"encoder {name!r} needs external pretrained checkpoints "
          "(reference env_base.py:222-375 downloads them); pass a "
          "custom_encoders entry instead")
    raise ValueError(f"unknown visual encoder {name!r}")

  def get_visuals(self, data) -> Dict[str, np.ndarray]:
    """Render + encode every visual key for one env state (host-side)."""
    from myosuite_tpu.renderer import Renderer
    out = {}
    synced = set()
    for key, channel, cam, hw, enc in self._keys:
      if hw not in self._renderers:
        h, w = hw
        self._renderers[hw] = Renderer(self._env, width=w, height=h)
      r = self._renderers[hw]
      if hw not in synced:
        r.sync(data)
        synced.add(hw)
      img = r.render(camera=cam if cam not in ("default", "-1") else None,
                     depth=(channel == "d"))
      out[key] = self._encoders[enc](img)
    return out

  def close(self):
    for r in self._renderers.values():
      r.close()


def _torch_resnet_encoder(name: str) -> Callable:
  """Frozen torchvision resnet trunk -> (512,) features (reference rrl
  encoder role, env_base.py visual encoder table)."""
  import torch
  import torchvision

  arch = "resnet18" if "18" in name else "resnet34"
  try:
    model = getattr(torchvision.models, arch)(weights="DEFAULT")
  except Exception:
    # offline host: random-init trunk still gives a deterministic embedding
    model = getattr(torchvision.models, arch)(weights=None)
  model.fc = torch.nn.Identity()
  model.eval()

  mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
  std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)

  @torch.no_grad()
  def encode(img: np.ndarray) -> np.ndarray:
    x = torch.from_numpy(np.ascontiguousarray(img)).float() / 255.0
    x = x.permute(2, 0, 1)
    x = (x - mean) / std
    return model(x[None]).squeeze(0).numpy()

  return encode
