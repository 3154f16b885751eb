"""ctypes loader for the native oracle inner loop (lazy g++ build, NumPy
fallback when unavailable)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "oracle.cpp")
_SO = os.path.join(_HERE, "liboracle.so")

_lock = threading.Lock()
_lib = None
_tried = False


class _Lib:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)

    def __init__(self, cdll: ctypes.CDLL):
        cdll.oracle_height_pass.restype = None
        cdll.oracle_height_pass.argtypes = [
            self.u8p, ctypes.c_int, ctypes.c_long, self.i32p, self.f64p,
            ctypes.c_int,
        ]
        self.oracle_height_pass = cdll.oracle_height_pass


def native_lib() -> Optional[_Lib]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = os.path.exists(_SO) and os.path.exists(_SRC) and (
            os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        )
        if not os.path.exists(_SO) or stale:  # rebuild on source edits
            try:
                subprocess.run(
                    ["g++", "-O2", "-ffp-contract=off", "-shared", "-fPIC",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            _lib = _Lib(ctypes.CDLL(_SO))
        except OSError:
            _lib = None
        return _lib
