"""ctypes binding to the native C++ runtime (native/libffmpc_native.so).

Provides an independent double-precision FK/RNEA oracle and a wait-free
ring-buffer logger for 1 kHz host control loops.  Builds on demand via
``make -C native`` if the shared object is missing.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "libffmpc_native.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_SO))
    dp = ctypes.POINTER(ctypes.c_double)
    lib.ffmpc_fk.argtypes = [dp, dp, dp]
    lib.ffmpc_rnea.argtypes = [dp, dp, dp, dp]
    lib.ffmpc_mass_matrix.argtypes = [dp, dp]
    lib.ffmpc_gravity.argtypes = [dp, dp]
    lib.ffmpc_logger_create.restype = ctypes.c_void_p
    lib.ffmpc_logger_create.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
    lib.ffmpc_logger_destroy.argtypes = [ctypes.c_void_p]
    lib.ffmpc_logger_push.argtypes = [ctypes.c_void_p, dp]
    lib.ffmpc_logger_drain.restype = ctypes.c_uint64
    lib.ffmpc_logger_drain.argtypes = [ctypes.c_void_p, dp, ctypes.c_uint64]
    lib.ffmpc_logger_dropped.restype = ctypes.c_uint64
    lib.ffmpc_logger_dropped.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def native_fk(q: np.ndarray):
    lib = _load()
    q = np.ascontiguousarray(q, dtype=np.float64)
    pos = np.zeros(3)
    rot = np.zeros(9)
    lib.ffmpc_fk(_p(q), _p(pos), _p(rot))
    return pos, rot.reshape(3, 3)


def native_rnea(q, v, a):
    lib = _load()
    q = np.ascontiguousarray(q, dtype=np.float64)
    v = np.ascontiguousarray(v, dtype=np.float64)
    a = np.ascontiguousarray(a, dtype=np.float64)
    tau = np.zeros(7)
    lib.ffmpc_rnea(_p(q), _p(v), _p(a), _p(tau))
    return tau


def native_mass_matrix(q):
    lib = _load()
    q = np.ascontiguousarray(q, dtype=np.float64)
    M = np.zeros(49)
    lib.ffmpc_mass_matrix(_p(q), _p(M))
    return M.reshape(7, 7)


def native_gravity(q):
    lib = _load()
    q = np.ascontiguousarray(q, dtype=np.float64)
    tau = np.zeros(7)
    lib.ffmpc_gravity(_p(q), _p(tau))
    return tau


class NativeRingLogger:
    """Wait-free single-producer ring logger for fixed-width float64 records."""

    def __init__(self, record_len: int, capacity: int = 1 << 16):
        self._lib = _load()
        self.record_len = int(record_len)
        self.capacity = int(capacity)
        self._h = self._lib.ffmpc_logger_create(self.record_len, self.capacity)

    def push(self, rec: np.ndarray) -> None:
        rec = np.ascontiguousarray(rec, dtype=np.float64)
        assert rec.size == self.record_len
        self._lib.ffmpc_logger_push(self._h, _p(rec))

    def drain(self, max_records: int = 4096) -> np.ndarray:
        out = np.zeros((max_records, self.record_len))
        n = self._lib.ffmpc_logger_drain(self._h, _p(out), max_records)
        return out[:n]

    @property
    def dropped(self) -> int:
        return int(self._lib.ffmpc_logger_dropped(self._h))

    def close(self):
        if self._h:
            self._lib.ffmpc_logger_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
