"""Success-threshold curriculum scheduler.

Role-equivalent of the reference's curriculum utils
(/root/reference/myosuite/utils/curriculum_utils.py:2): advance a
difficulty level when a success-rate threshold holds; pure state-in/
state-out so it runs inside jitted training loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CurriculumState(NamedTuple):
  level: jax.Array        # int32 difficulty level
  streak: jax.Array       # consecutive evals above threshold


def init(level: int = 0) -> CurriculumState:
  return CurriculumState(level=jnp.int32(level), streak=jnp.int32(0))


def update(state: CurriculumState, success_rate: jax.Array,
           threshold: float = 0.8, patience: int = 3,
           max_level: int = 10) -> CurriculumState:
  """Advance when success_rate >= threshold for `patience` updates."""
  hit = success_rate >= threshold
  streak = jnp.where(hit, state.streak + 1, jnp.int32(0))
  advance = streak >= patience
  level = jnp.where(advance,
                    jnp.minimum(state.level + 1, max_level), state.level)
  streak = jnp.where(advance, jnp.int32(0), streak)
  return CurriculumState(level=level, streak=streak)
