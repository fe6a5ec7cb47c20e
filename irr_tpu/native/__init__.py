"""Native (C++) data-loader core, loaded via ctypes.

Compiled on first import with the system toolchain (g++ -O3 -shared); the
.so is cached next to the source. Falls back to None when no compiler is
available — callers keep a pure-Python path.
"""

import ctypes
import logging
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "png16.cc")
_SO = os.path.join(_DIR, "_png16.so")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Returns the ctypes library or None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib or None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.png_defilter.restype = ctypes.c_int
        lib.png_defilter.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.be16_to_u16.restype = None
        lib.be16_to_u16.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logging.debug("native png16 unavailable (%s); using Python path", e)
        _lib = False
    return _lib or None


def defilter_png8(raw: bytes, h: int, stride: int, bpp: int):
    """Defilter an 8-bit PNG stream -> (h * stride,) uint8, or None if the
    native library is unavailable. bpp = bytes per pixel (1 gray / 3 RGB /
    4 RGBA); the C routine is bpp-generic."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(h * stride, np.uint8)
    rc = lib.png_defilter(raw, out.ctypes.data_as(ctypes.c_char_p),
                          h, stride, bpp)
    if rc != 0:
        raise ValueError("unknown PNG filter type")
    return out


def defilter_png16(raw: bytes, h: int, w: int):
    """Defilter + byte-swap a 16-bit RGB PNG stream -> (H, W, 3) uint16,
    or None if the native library is unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    stride = w * 6
    out = np.empty(h * stride, np.uint8)
    rc = lib.png_defilter(raw, out.ctypes.data_as(ctypes.c_char_p), h, stride, 6)
    if rc != 0:
        raise ValueError("unknown PNG filter type")
    u16 = np.empty(h * w * 3, np.uint16)
    lib.be16_to_u16(out.ctypes.data_as(ctypes.c_char_p),
                    u16.ctypes.data_as(ctypes.c_char_p), h * w * 3)
    return u16.reshape(h, w, 3)
