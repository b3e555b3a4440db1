"""Small vector helpers (reference utils/vector_math.py role), jnp-native."""

from __future__ import annotations

import jax.numpy as jnp


def calculate_cosine(vec1, vec2):
  """Cosine similarity along the last axis; 0 where either norm is 0
  (reference vector_math.py:10)."""
  vec1 = jnp.asarray(vec1)
  vec2 = jnp.asarray(vec2)
  n1 = jnp.linalg.norm(vec1, axis=-1)
  n2 = jnp.linalg.norm(vec2, axis=-1)
  dot = jnp.sum(vec1 * vec2, axis=-1)
  denom = n1 * n2
  return jnp.where(denom > 0, dot / jnp.where(denom > 0, denom, 1.0), 0.0)
