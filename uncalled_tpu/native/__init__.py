"""ctypes loader for the native host-side library (SA-IS suffix array, BWT).

The library is built on demand with `make` (g++); if unavailable, callers
fall back to the pure-numpy implementations in uncalled_tpu.index.build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libuncalled_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_DIR, "saca.cpp")
    ):
        try:
            subprocess.run(
                ["make", "-C", _DIR],
                check=True,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.suffix_array_u8.restype = ctypes.c_int
        lib.suffix_array_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.bwt_from_sa.restype = ctypes.c_int64
        lib.bwt_from_sa.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def suffix_array(text: np.ndarray) -> np.ndarray | None:
    """SA via native SA-IS; None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    text = np.ascontiguousarray(text, dtype=np.uint8)
    n = len(text)
    sa = np.empty(n, dtype=np.int32)
    rc = lib.suffix_array_u8(
        text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return sa


def bwt_from_sa(text: np.ndarray, sa: np.ndarray) -> tuple[np.ndarray, int] | None:
    lib = _load()
    if lib is None:
        return None
    text = np.ascontiguousarray(text, dtype=np.uint8)
    sa = np.ascontiguousarray(sa, dtype=np.int32)
    bwt = np.empty(len(text), dtype=np.uint8)
    primary = lib.bwt_from_sa(
        text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(text),
        bwt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return bwt, int(primary)
