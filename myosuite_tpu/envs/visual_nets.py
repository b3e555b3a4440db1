"""Native flax ResNet feature trunks for visual observations.

The reference's rrl18/rrl34 encoders are frozen torchvision resnets
(/root/reference/myosuite/envs/env_base.py:222-375). TPU-native
equivalent: the same architecture in flax, jitted, deterministic
initialization — usable on hosts without torch/torchvision and on TPU
directly. Pretrained ImageNet weights are license/download-gated, so the
default trunk is deterministically random-initialized (an RRL-style
fixed random feature extractor); callers can `load_params` their own.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class BasicBlock(nn.Module):
  features: int
  strides: int = 1

  @nn.compact
  def __call__(self, x):
    residual = x
    y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                padding=1, use_bias=False)(x)
    y = nn.GroupNorm(num_groups=8)(y)
    y = nn.relu(y)
    y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(y)
    y = nn.GroupNorm(num_groups=8)(y)
    if residual.shape != y.shape:
      residual = nn.Conv(self.features, (1, 1),
                         (self.strides, self.strides), use_bias=False)(x)
      residual = nn.GroupNorm(num_groups=8)(residual)
    return nn.relu(y + residual)


class ResNetTrunk(nn.Module):
  """ResNet-18/34 topology, GroupNorm (batch-size-1 friendly), no head."""
  stage_sizes: Sequence[int]          # (2,2,2,2) = 18; (3,4,6,3) = 34

  @nn.compact
  def __call__(self, x):              # (H, W, 3) float in [0, 1]
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    x = x[None]                       # batch of 1
    x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False)(x)
    x = nn.GroupNorm(num_groups=8)(x)
    x = nn.relu(x)
    x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
    for i, n_blocks in enumerate(self.stage_sizes):
      feats = 64 * (2 ** i)
      for j in range(n_blocks):
        x = BasicBlock(feats, strides=2 if (i > 0 and j == 0) else 1)(x)
    return jnp.mean(x, axis=(1, 2)).squeeze(0)   # (512,)


def make_resnet_encoder(name: str, params: Any = None,
                        image_shape=(224, 224, 3)) -> Callable[[np.ndarray],
                                                               np.ndarray]:
  """Jitted (H, W, 3) uint8 -> (512,) float32 feature fn.

  Params are initialized EAGERLY here (conv init is shape-polymorphic, a
  dummy image suffices), so shared encoder instances are thread-safe and
  the parameter source is fixed at construction. When ``params`` is None
  the trunk uses fixed-seed RANDOM features (PRNGKey(0)) — deterministic
  across hosts but not pretrained; see envs/visual.py fallback warning.
  """
  sizes = (2, 2, 2, 2) if "18" in name else (3, 4, 6, 3)
  net = ResNetTrunk(stage_sizes=sizes)
  if params is None:
    dummy = jnp.zeros(image_shape, jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), dummy)

  apply = jax.jit(net.apply)

  def encode(img: np.ndarray) -> np.ndarray:
    x = jnp.asarray(img, jnp.float32) / 255.0
    return np.asarray(apply(params, x))

  return encode
