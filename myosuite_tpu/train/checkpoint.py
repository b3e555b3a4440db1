"""Checkpoint save/restore for training state (orbax-backed).

Fills the reference's checkpoint/resume role (SURVEY.md section 5:
delegated there to RL libs; here it is first-class): the full TrainState
pytree — params, optimizer state, observation stats, env state, RNG — is
saved as a sharded orbax checkpoint and restores onto any mesh.

Zero-size leaves (e.g. Data.contact.* on contact-free models) are not
representable by orbax's tensorstore backend; they are dropped at save
and rebuilt from the restore target's (identically zero-size) leaves.

`save(..., learner_only=True)` stores only the learner
(policy/value/opt/obs-stats) — the format used for the shipped
pretrained policies (the reference ships NPG pickles,
/root/reference/myosuite/agents/baslines_NPG/), where per-run env state
would be dead weight.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

_ZERO_SENTINEL = None  # zero-size leaves are saved as None (pruned subtree)


def _prune_zero_size(tree: Any) -> Any:
  return jax.tree.map(
      lambda x: None if getattr(x, "size", 1) == 0 else x, tree)


def _learner_view(train_state: Any) -> Any:
  return {
      "policy_params": train_state.policy_params,
      "value_params": train_state.value_params,
      "opt_state": train_state.opt_state,
      "obs_stats": train_state.obs_stats,
      "env_steps": train_state.env_steps,
  }


def save(path: str, train_state: Any, step: Optional[int] = None,
         learner_only: bool = False) -> str:
  path = os.path.abspath(path)
  if step is not None:
    path = os.path.join(path, f"step_{step}")
  payload = (_learner_view(train_state) if learner_only
             else _prune_zero_size(train_state))
  ckptr = ocp.StandardCheckpointer()
  ckptr.save(path, payload, force=True)
  ckptr.wait_until_finished()
  return path


def restore(path: str, target: Any) -> Any:
  """Restore into the structure of `target` (an abstract or concrete
  TrainState from PPO.init). Zero-size leaves keep the target's values."""
  ckptr = ocp.StandardCheckpointer()
  pruned = _prune_zero_size(target)
  restored = ckptr.restore(os.path.abspath(path), pruned)

  def merge(t, r):
    return t if r is None or getattr(t, "size", 1) == 0 else r

  # tree over the TARGET structure; restored matches its pruned shape
  flat_t, treedef = jax.tree.flatten(target)
  flat_r = jax.tree.leaves(
      restored, is_leaf=lambda x: x is None)
  assert len(flat_t) >= len(flat_r)
  # align: pruned tree dropped the zero-size leaves, so walk both
  out, ri = [], 0
  for t in flat_t:
    if getattr(t, "size", 1) == 0:
      out.append(t)
    else:
      out.append(flat_r[ri])
      ri += 1
  assert ri == len(flat_r)
  return jax.tree.unflatten(treedef, out)


def restore_learner(path: str, train_state: Any,
                    skip_opt: bool = False) -> Any:
  """Restore a learner-only checkpoint into a full TrainState (env state
  and RNG keep the provided fresh values).

  skip_opt: keep the target's fresh optimizer state — required when the
  restoring run uses a different optimizer structure than the saved one
  (e.g. warm-starting a cosine-lr run from a constant-lr checkpoint)."""
  view = _learner_view(train_state)
  if skip_opt:
    del view["opt_state"]
    # partial restore: the saved tree still carries its own opt_state
    with ocp.PyTreeCheckpointer() as ckptr:
      got = ckptr.restore(
          os.path.abspath(path),
          args=ocp.args.PyTreeRestore(item=view, partial_restore=True))
  else:
    ckptr = ocp.StandardCheckpointer()
    got = ckptr.restore(os.path.abspath(path), view)
  return train_state.replace(
      policy_params=got["policy_params"], value_params=got["value_params"],
      opt_state=(train_state.opt_state if skip_opt else got["opt_state"]),
      obs_stats=got["obs_stats"], env_steps=got["env_steps"])


def latest_step_dir(root: str) -> Optional[str]:
  if not os.path.isdir(root):
    return None
  steps = [d for d in os.listdir(root) if d.startswith("step_")]
  if not steps:
    return None
  best = max(steps, key=lambda s: int(s.split("_")[1]))
  return os.path.join(root, best)
