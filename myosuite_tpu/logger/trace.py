"""Trace: grouped rollout datasets with h5/pickle round-trip.

Behavioral equivalent of the reference's logger
(/root/reference/myosuite/logger/grouped_datasets.py:45): a trace is
{group: {dataset: array-or-list}}; datums are appended per step, stacked,
numpified with configurable dtypes, verified, and saved as gzip'd HDF5 or
pickle. Designed for host-side use on device_get'd rollout pytrees.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Iterable, Optional

import h5py
import numpy as np


class Trace:
  """Grouped rollout datasets (reference Trace semantics)."""

  def __init__(self, name: str = "Trace"):
    self.name = name
    self.root = {name: {}}
    self.trace = self.root[name]
    self._verified = False
    self._stacked = False

  # -- building -----------------------------------------------------------
  def create_group(self, name: str) -> None:
    self.trace[name] = {}

  def create_dataset(self, group_key: str, dataset_key: str,
                     dataset_val: Any = None) -> None:
    if group_key not in self.trace:
      self.create_group(group_key)
    self.trace[group_key][dataset_key] = (
        [] if dataset_val is None else [dataset_val])

  def append_datum(self, group_key: str, dataset_key: str, dataset_val):
    if dataset_key not in self.trace.get(group_key, {}):
      self.create_dataset(group_key, dataset_key)
    self.trace[group_key][dataset_key].append(dataset_val)

  def append_datums(self, group_key: str, dataset_key_val: Dict[str, Any]):
    for k, v in dataset_key_val.items():
      self.append_datum(group_key, k, v)

  # -- processing ---------------------------------------------------------
  def stack(self) -> None:
    for grp in self.trace.values():
      for k, v in grp.items():
        if isinstance(v, list):
          grp[k] = np.stack([np.asarray(x) for x in v])
    self._stacked = True

  def numpify(self, u_res=np.uint8, i_res=np.int8, f_res=np.float32) -> None:
    """Cast datasets to compact dtypes (reference resolutions,
    grouped_datasets.py:309-334)."""
    for grp in self.trace.values():
      for k, v in grp.items():
        arr = np.asarray(v)
        if np.issubdtype(arr.dtype, np.unsignedinteger) and u_res:
          grp[k] = arr.astype(u_res)
        elif np.issubdtype(arr.dtype, np.signedinteger) and i_res:
          grp[k] = arr.astype(i_res)
        elif np.issubdtype(arr.dtype, np.floating) and f_res:
          grp[k] = arr.astype(f_res)
        else:
          grp[k] = arr

  def verify(self) -> bool:
    """All datasets in a group must share the time dimension."""
    for gname, grp in self.trace.items():
      lens = {k: (len(v) if isinstance(v, list) else v.shape[0])
              for k, v in grp.items()}
      if len(set(lens.values())) > 1:
        raise ValueError(f"group {gname} has uneven datasets: {lens}")
    self._verified = True
    return True

  # -- io -----------------------------------------------------------------
  def save(self, path: str, compression="gzip") -> None:
    self.stack()
    self.verify()
    if path.endswith((".pkl", ".pickle")):
      with open(path, "wb") as f:
        pickle.dump(self.root, f)
      return
    if path.endswith(".mtp"):
      # native threaded sink (myosuite_tpu/native/tracepack.cpp): the
      # serializer runs off the Python thread, unlike h5py gzip
      from myosuite_tpu.native import TracePackWriter
      with TracePackWriter(path) as w:
        for gname, grp in self.trace.items():
          for k, v in grp.items():
            w.append(f"{gname}/{k}", np.asarray(v))
      return
    with h5py.File(path, "w") as f:
      for gname, grp in self.trace.items():
        hgrp = f.create_group(gname)
        for k, v in grp.items():
          hgrp.create_dataset(k, data=np.asarray(v), compression=compression)

  @classmethod
  def load(cls, path: str) -> "Trace":
    tr = cls()
    if path.endswith((".pkl", ".pickle")):
      with open(path, "rb") as f:
        tr.root = pickle.load(f)
      tr.name = next(iter(tr.root))
      tr.trace = tr.root[tr.name]
      return tr
    if path.endswith(".mtp"):
      from myosuite_tpu.native import read_tracepack
      tr.trace = {}
      for key, arr in read_tracepack(path).items():
        gname, _, dname = key.partition("/")
        tr.trace.setdefault(gname, {})[dname or "data"] = arr
      tr.root = {tr.name: tr.trace}
      return tr
    with h5py.File(path, "r") as f:
      tr.trace = {}
      for gname in f:
        tr.trace[gname] = {k: np.asarray(f[gname][k]) for k in f[gname]}
      tr.root = {tr.name: tr.trace}
    return tr

  # -- introspection ------------------------------------------------------
  def keys(self):
    return self.trace.keys()

  def __getitem__(self, key):
    return self.trace[key]

  def __repr__(self):
    lines = [f"Trace {self.name}:"]
    for gname, grp in self.trace.items():
      lines.append(f"  {gname}:")
      for k, v in grp.items():
        shape = np.asarray(v).shape if not isinstance(v, list) else len(v)
        lines.append(f"    {k}: {shape}")
    return "\n".join(lines)


def rollout_to_trace(rollout: Dict[str, np.ndarray],
                     group: str = "rollout0") -> Trace:
  """Pack a (T, ...) pytree-of-arrays rollout into a Trace."""
  tr = Trace()
  tr.create_group(group)
  for k, v in rollout.items():
    tr.trace[group][k] = np.asarray(v)
  return tr
