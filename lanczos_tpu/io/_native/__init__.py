"""ctypes loader (with lazy on-demand g++ build) for the native PNG filter
library.  Falls back to None — callers use the NumPy path — if no compiler
or prebuilt .so is available."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pngfilter.cpp")
_SO = os.path.join(_HERE, "libpngfilter.so")
_JPEG_SRC = os.path.join(_HERE, "jpegdec.cpp")
_JPEG_SO = os.path.join(_HERE, "libjpegdec.so")
_LZW_SRC = os.path.join(_HERE, "gif_lzw.cpp")
_LZW_SO = os.path.join(_HERE, "libgiflzw.so")

_lock = threading.Lock()
_lib = None
_tried = False


class _Lib:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)

    def __init__(self, cdll: ctypes.CDLL, jpeg_cdll=None, lzw_cdll=None):
        self._cdll = cdll
        cdll.png_unfilter.restype = ctypes.c_int
        cdll.png_unfilter.argtypes = [
            self.u8p, self.u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int
        ]
        cdll.png_filter.restype = None
        cdll.png_filter.argtypes = [
            self.u8p, self.u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        self.png_unfilter = cdll.png_unfilter
        self.png_filter = cdll.png_filter
        if jpeg_cdll is not None:
            jpeg_cdll.jpeg_decode_scan.restype = ctypes.c_int
            jpeg_cdll.jpeg_decode_scan.argtypes = [
                self.u8p, ctypes.c_long, ctypes.c_int, self.i32p, self.i32p,
                self.i32p, self.i32p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(self.u8p), self.i32p,
            ]
            self.jpeg_decode_scan = jpeg_cdll.jpeg_decode_scan
            jpeg_cdll.jpeg_decode_prog_scan.restype = ctypes.c_int
            jpeg_cdll.jpeg_decode_prog_scan.argtypes = [
                self.u8p, ctypes.c_long, ctypes.c_int, self.i32p,
                self.i32p, self.i32p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(self.i32p),
            ]
            self.jpeg_decode_prog_scan = jpeg_cdll.jpeg_decode_prog_scan
            jpeg_cdll.jpeg_finish_prog.restype = ctypes.c_int
            jpeg_cdll.jpeg_finish_prog.argtypes = [
                self.i32p, self.i32p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, self.u8p, ctypes.c_long,
            ]
            self.jpeg_finish_prog = jpeg_cdll.jpeg_finish_prog
        if lzw_cdll is not None:
            lzw_cdll.gif_lzw_decode.restype = ctypes.c_long
            lzw_cdll.gif_lzw_decode.argtypes = [
                self.u8p, ctypes.c_long, ctypes.c_int, self.u8p,
                ctypes.c_long,
            ]
            self.gif_lzw_decode = lzw_cdll.gif_lzw_decode
            if hasattr(lzw_cdll, "gif_lzw_encode"):  # older prebuilt .so
                lzw_cdll.gif_lzw_encode.restype = ctypes.c_long
                lzw_cdll.gif_lzw_encode.argtypes = [
                    self.u8p, ctypes.c_long, ctypes.c_int, self.u8p,
                    ctypes.c_long,
                ]
                self.gif_lzw_encode = lzw_cdll.gif_lzw_encode


def _build_one(src: str, so: str) -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return so
    except Exception:
        return None


def _build() -> Optional[str]:
    return _build_one(_SRC, _SO)


def native_lib() -> Optional[_Lib]:
    """The loaded native library, building it on first use; None if
    unavailable (callers fall back to NumPy)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True

        def fresh(src_path: str, so_path: str):
            """Reuse the built .so only when it is newer than its source
            (a stale artifact would silently miss new symbols).  A missing
            source (pruned install shipping only the .so) uses the .so."""
            if os.path.exists(so_path) and (
                not os.path.exists(src_path)
                or os.path.getmtime(so_path) >= os.path.getmtime(src_path)
            ):
                return so_path
            return _build_one(src_path, so_path)

        path = fresh(_SRC, _SO)
        if path is None:
            return None
        jpath = fresh(_JPEG_SRC, _JPEG_SO)
        try:
            jdll = ctypes.CDLL(jpath) if jpath else None
        except OSError:
            jdll = None
        lpath = fresh(_LZW_SRC, _LZW_SO)
        try:
            ldll = ctypes.CDLL(lpath) if lpath else None
        except OSError:
            ldll = None
        try:
            _lib = _Lib(ctypes.CDLL(path), jdll, ldll)
        except OSError:
            _lib = None
        return _lib
