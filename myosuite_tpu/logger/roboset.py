"""RoboSet-schema trace emitter.

Role-equivalent of the reference's RoboSet logger
(/root/reference/myosuite/logger/roboset_logger.py:5): a Trace subclass
whose groups follow the RoboSet dataset layout — per-trial groups named
"Trial<N>" holding `data/...` streams (time, qpos, qvel, ctrl, obs,
rewards) and `env_infos/...` auxiliary streams (solved, done).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from myosuite_tpu.logger.trace import Trace


class RoboSetTrace(Trace):
  """Trace emitting the RoboSet h5 schema."""

  DATA_KEYS = ("time", "qpos", "qvel", "ctrl", "observations", "rewards")
  INFO_KEYS = ("solved", "done")

  def append_step(self, trial: int, *, time, qpos, qvel, ctrl, observations,
                  rewards, solved=0.0, done=0.0) -> None:
    group = f"Trial{trial}"
    if group not in self.trace:
      self.create_group(group)
    vals = dict(time=time, qpos=qpos, qvel=qvel, ctrl=ctrl,
                observations=observations, rewards=rewards)
    for k, v in vals.items():
      self.append_datum(group, f"data/{k}", np.asarray(v))
    self.append_datum(group, "env_infos/solved", np.asarray(solved))
    self.append_datum(group, "env_infos/done", np.asarray(done))

  @classmethod
  def from_paths(cls, paths, name: str = "RoboSet") -> "RoboSetTrace":
    """Pack examine_env-style rollout paths into RoboSet trials."""
    tr = cls(name)
    for i, p in enumerate(paths):
      group = f"Trial{i}"
      tr.create_group(group)
      obs = np.stack(p["obs"]) if isinstance(p["obs"], list) else p["obs"]
      rew = np.asarray(p["reward"])
      tr.trace[group]["data/observations"] = obs
      tr.trace[group]["data/rewards"] = rew
      tr.trace[group]["data/time"] = np.arange(len(rew), dtype=np.float32)
      if "solved" in p:
        tr.trace[group]["env_infos/solved"] = np.asarray(p["solved"])
    return tr
