"""Native (C++) runtime components, built on demand with the system g++.

tracepack: threaded binary rollout-trace sink (see tracepack.cpp for the
format and rationale). Python side: TracePackWriter streams numpy arrays
through the native queue; read_tracepack() parses the file back into
{name: array}. Falls back to a pure-Python writer when no compiler is
available (same format, synchronous).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import struct
import subprocess
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "tracepack.cpp")
_DTYPES = [np.float32, np.float64, np.int32, np.int64, np.uint8, np.int8,
           np.uint16, np.float16]
_DTYPE_CODE = {np.dtype(d): i for i, d in enumerate(_DTYPES)}

_lib = None
_lib_tried = False


def _build_lib() -> Optional[ctypes.CDLL]:
  """Compile tracepack.cpp into a cached shared library."""
  with open(_SRC, "rb") as f:
    tag = hashlib.sha256(f.read()).hexdigest()[:16]
  cache_dir = os.environ.get("MTX_NATIVE_CACHE",
                             os.path.join("/tmp", "mtx_native"))
  os.makedirs(cache_dir, exist_ok=True)
  so_path = os.path.join(cache_dir, f"libtracepack-{tag}.so")
  if not os.path.exists(so_path):
    tmp = so_path + ".build"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", tmp]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so_path)
  lib = ctypes.CDLL(so_path)
  lib.mtp_open.restype = ctypes.c_void_p
  lib.mtp_open.argtypes = [ctypes.c_char_p]
  lib.mtp_append.restype = ctypes.c_int
  lib.mtp_append.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                             ctypes.c_uint8, ctypes.c_int,
                             ctypes.POINTER(ctypes.c_uint64),
                             ctypes.c_void_p, ctypes.c_uint64]
  lib.mtp_close.restype = ctypes.c_uint64
  lib.mtp_close.argtypes = [ctypes.c_void_p]
  lib.mtp_queued_bytes.restype = ctypes.c_uint64
  lib.mtp_queued_bytes.argtypes = [ctypes.c_void_p]
  return lib


def _get_lib() -> Optional[ctypes.CDLL]:
  global _lib, _lib_tried
  if not _lib_tried:
    _lib_tried = True
    try:
      _lib = _build_lib()
    except Exception:
      _lib = None
  return _lib


class TracePackWriter:
  """Streaming trace sink; native-threaded when g++ is available."""

  MAGIC = b"MTPK1\x00"

  def __init__(self, path: str):
    self._path = path
    self._lib = _get_lib()
    if self._lib is not None:
      self._h = self._lib.mtp_open(path.encode())
      if not self._h:
        raise OSError(f"mtp_open failed: {path}")
      self._f = None
    else:
      self._h = None
      self._f = open(path, "wb")
      self._f.write(self.MAGIC)
      self._count = 0

  def append(self, name: str, array) -> None:
    arr = np.ascontiguousarray(array)
    code = _DTYPE_CODE.get(arr.dtype)
    if code is None:
      arr = arr.astype(np.float32)
      code = _DTYPE_CODE[arr.dtype]
    if self._h is not None:
      shape = (ctypes.c_uint64 * arr.ndim)(*arr.shape)
      rc = self._lib.mtp_append(
          self._h, name.encode(), code, arr.ndim, shape,
          arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes)
      if rc != 0:
        raise OSError(f"mtp_append failed rc={rc}")
      return
    f = self._f
    nm = name.encode()
    f.write(struct.pack("<I", len(nm)))
    f.write(nm)
    f.write(struct.pack("<BB", code, arr.ndim))
    f.write(struct.pack(f"<{arr.ndim}Q", *arr.shape))
    f.write(struct.pack("<Q", arr.nbytes))
    f.write(arr.tobytes())
    self._count += 1

  def close(self) -> int:
    """Drain and close; returns records written."""
    if self._h is not None:
      n = self._lib.mtp_close(self._h)
      self._h = None
      return int(n)
    if self._f is not None:
      self._f.close()
      self._f = None
      return self._count
    return 0

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()


def read_tracepack(path: str) -> Dict[str, np.ndarray]:
  """Parse a tracepack file; duplicate names get a numeric suffix."""
  out: Dict[str, np.ndarray] = {}
  with open(path, "rb") as f:
    magic = f.read(6)
    assert magic == TracePackWriter.MAGIC, "not a tracepack file"
    while True:
      head = f.read(4)
      if len(head) < 4:
        break
      (name_len,) = struct.unpack("<I", head)
      name = f.read(name_len).decode()
      code, ndim = struct.unpack("<BB", f.read(2))
      shape = struct.unpack(f"<{ndim}Q", f.read(8 * ndim))
      (nbytes,) = struct.unpack("<Q", f.read(8))
      payload = f.read(nbytes)
      if len(payload) < nbytes:
        break  # truncated trailing record (crash mid-write)
      arr = np.frombuffer(payload, dtype=_DTYPES[code]).reshape(shape)
      key = name
      k = 1
      while key in out:
        key = f"{name}.{k}"
        k += 1
      out[key] = arr
  return out


def native_available() -> bool:
  return _get_lib() is not None
