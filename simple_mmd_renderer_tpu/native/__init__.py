"""Native (C++) fast paths, loaded via ctypes with transparent fallback.

Mirrors the reference's split: the heavy binary parsing lives in native code
(libmmd is header-only C++), while orchestration stays in Python. The shared
library is built on demand with g++ and cached next to the source; if the
toolchain is unavailable the pure-Python parsers are used instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pmx_fast.cpp")
_LIB = os.path.join(_DIR, "libpmx_fast.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= src_mtime:
            return True
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """ctypes handle to the native library, or None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.pmx_parse_vertices.restype = ctypes.c_int
        lib.pmx_parse_vertices.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib
