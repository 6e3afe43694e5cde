"""ctypes bridge to the native asynchronous netCDF writer
(native/fastwriter/ncwriter.cpp) — the runtime equivalent of the
reference's PIO/parallel-write backends (SURVEY.md section 2.9;
io_pio/ice_history_write.F90): the model hands host arrays to a C++ worker
thread and keeps stepping while records are serialized.

The shared library is built on first use with g++ (cached next to the
source); if no compiler is available the caller should fall back to the
synchronous scipy writer in cice5_tpu.io.history.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "fastwriter")
_LIB = None


def _build() -> str:
    so = os.path.join(_SRC, "libncwriter.so")
    cpp = os.path.join(_SRC, "ncwriter.cpp")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(cpp)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             cpp, "-o", so],
            check=True, capture_output=True)
    return so


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        lib.ncw_create.restype = ctypes.c_int
        lib.ncw_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int,
                                   ctypes.c_char_p]
        lib.ncw_append.restype = ctypes.c_int
        lib.ncw_append.argtypes = [ctypes.c_int, ctypes.c_double,
                                   ctypes.POINTER(ctypes.c_float)]
        for f in (lib.ncw_flush, lib.ncw_close, lib.ncw_pending):
            f.restype = ctypes.c_int
            f.argtypes = [ctypes.c_int]
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


class AsyncNetcdfWriter:
    """Append (time, {name: (ny, nx) array}) records to a netCDF file from
    a background C++ thread. Use as a context manager or call close()."""

    def __init__(self, path: str, ny: int, nx: int, varnames):
        self.varnames = tuple(varnames)
        self.ny, self.nx = ny, nx
        h = _lib().ncw_create(path.encode(), ny, nx, len(self.varnames),
                              ",".join(self.varnames).encode())
        if h < 0:
            raise OSError(f"ncw_create failed ({h}) for {path}")
        self._h = h

    def append(self, time: float, fields: dict) -> None:
        buf = np.empty((len(self.varnames), self.ny, self.nx), np.float32)
        for k, name in enumerate(self.varnames):
            buf[k] = np.asarray(fields[name], np.float32)
        rc = _lib().ncw_append(
            self._h, float(time),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise OSError(f"ncw_append failed ({rc})")

    def pending(self) -> int:
        return _lib().ncw_pending(self._h)

    def flush(self) -> None:
        rc = _lib().ncw_flush(self._h)
        if rc != 0:
            raise OSError(f"ncw_flush failed ({rc})")

    def close(self) -> None:
        if self._h is not None:
            rc = _lib().ncw_close(self._h)
            self._h = None
            if rc != 0:
                raise OSError(f"ncw_close failed ({rc})")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
