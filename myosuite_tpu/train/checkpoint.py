"""Checkpoint save/restore for training state (orbax-backed).

Fills the reference's checkpoint/resume role (SURVEY.md section 5:
delegated there to RL libs; here it is first-class): the full TrainState
pytree — params, optimizer state, observation stats, env state, RNG — is
saved as a sharded orbax checkpoint and restores onto any mesh.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save(path: str, train_state: Any, step: Optional[int] = None) -> str:
  path = os.path.abspath(path)
  if step is not None:
    path = os.path.join(path, f"step_{step}")
  ckptr = ocp.StandardCheckpointer()
  ckptr.save(path, train_state, force=True)
  ckptr.wait_until_finished()
  return path


def restore(path: str, target: Any) -> Any:
  """Restore into the structure of `target` (an abstract or concrete
  TrainState from PPO.init)."""
  ckptr = ocp.StandardCheckpointer()
  return ckptr.restore(os.path.abspath(path), target)


def latest_step_dir(root: str) -> Optional[str]:
  if not os.path.isdir(root):
    return None
  steps = [d for d in os.listdir(root) if d.startswith("step_")]
  if not steps:
    return None
  best = max(steps, key=lambda s: int(s.split("_")[1]))
  return os.path.join(root, best)
