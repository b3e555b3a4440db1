"""Ordered obs-dict <-> flat vector codec.

Role-equivalent of the reference's ObsVecDict
(/root/reference/myosuite/envs/obs_vec_dict.py:10): a fixed key ordering
defines the observation vector layout; the codec exposes the index map so
the same reward code can run per-step and batched over (traj, horizon)
paths (reference compute_path_rewards, env_base.py:763-780). jnp-native:
both directions trace under jit/vmap.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ObsVec:
  """Codec fixed at construction from a template obs_dict."""

  def __init__(self, obs_keys: Sequence[str],
               template: Dict[str, jax.Array]):
    self.obs_keys: List[str] = list(obs_keys)
    self._slices: List[Tuple[str, int, int, tuple]] = []
    off = 0
    for k in self.obs_keys:
      arr = np.asarray(template[k])
      n = int(arr.size) if arr.ndim else 1
      self._slices.append((k, off, off + n, arr.shape))
      off += n
    self.size = off

  def obsdict2obsvec(self, obs_dict: Dict[str, jax.Array]) -> jax.Array:
    """Concatenate the ordered keys into one flat float32 vector."""
    parts = [jnp.ravel(jnp.asarray(obs_dict[k], dtype=jnp.float32))
             for k in self.obs_keys]
    return jnp.concatenate(parts) if parts else jnp.zeros(0)

  def obsvec2obsdict(self, obsvec: jax.Array) -> Dict[str, jax.Array]:
    """Split a (..., size) vector back into the keyed dict; leading batch
    dims are preserved (the reference's (traj, horizon, obs) pattern)."""
    out = {}
    for k, lo, hi, shape in self._slices:
      seg = obsvec[..., lo:hi]
      out[k] = seg.reshape(obsvec.shape[:-1] + (shape if shape else (1,)))
    return out

  def index_map(self) -> Dict[str, Tuple[int, int]]:
    return {k: (lo, hi) for k, lo, hi, _ in self._slices}


def compute_path_rewards(obsvec_paths: jax.Array, codec: ObsVec,
                         reward_fn) -> Dict[str, jax.Array]:
  """Vectorized reward recompute over (num_traj, horizon, obs_dim) paths
  (reference env_base.py:763-780): reward_fn maps an obs_dict of batched
  leaves to a dict of reward terms."""
  obs_dict = codec.obsvec2obsdict(obsvec_paths)
  return reward_fn(obs_dict)


def evaluate_success(solved_paths: Sequence[np.ndarray],
                     min_solved_steps: int = 5) -> float:
  """success%% over paths: an episode succeeds when `solved` holds for
  more than `min_solved_steps` steps (reference env_base.py:798-824)."""
  if not len(solved_paths):
    return 0.0
  wins = [float(np.sum(np.asarray(s) > 0) > min_solved_steps)
          for s in solved_paths]
  return 100.0 * float(np.mean(wins))
