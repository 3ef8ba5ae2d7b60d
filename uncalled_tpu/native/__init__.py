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
    srcs = [os.path.join(_DIR, f) for f in ("saca.cpp", "event_detector.cpp")]
    if not os.path.exists(_LIB_PATH) or any(
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(s) for s in srcs
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
        lib.detect_events_f32.restype = ctypes.c_int64
        lib.detect_events_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
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


def detect_events(signal: np.ndarray, min_mean: float, max_mean: float,
                  calibration=None):
    """Native event detection; None if the library is unavailable.

    Returns the same dict as uncalled_tpu.ops.events.detect_events_np
    (numerically identical; golden-tested against it).

    ``calibration=(offset, range, digitisation)``: the native detector
    creates events unfiltered (wide-open bounds) and the calibration +
    min/max mean filter run here in f32, matching the reference's order
    (calibrate inside create_event, THEN the mean filter —
    event_detector.cpp:107-108, 155-162, 308-309)."""
    lib = _load()
    if lib is None:
        return None
    if calibration is not None:
        ev = detect_events(signal, -3.4e38, 3.4e38)
        if ev is None:
            return None
        cal_off = np.float32(calibration[0])
        cal_coef = np.float32(calibration[1]) / np.float32(calibration[2])
        mean = ((ev["mean"] + cal_off) * cal_coef).astype(np.float32)
        stdv = ((ev["stdv"] + cal_off) * cal_coef).astype(np.float32)
        keep = (mean >= np.float32(min_mean)) & (mean <= np.float32(max_mean))
        return {
            "start": ev["start"][keep],
            "length": ev["length"][keep],
            "mean": mean[keep],
            "stdv": stdv[keep],
            "total_events": ev["total_events"],
            "len_sum": ev["len_sum"],
        }
    sig = np.ascontiguousarray(signal, dtype=np.float32)
    n = len(sig)
    start = np.empty(n, dtype=np.int32)
    length = np.empty(n, dtype=np.float32)
    mean = np.empty(n, dtype=np.float32)
    stdv = np.empty(n, dtype=np.float32)
    total = ctypes.c_int64(0)
    len_sum = ctypes.c_double(0.0)
    ne = lib.detect_events_f32(
        sig.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ctypes.c_float(min_mean),
        ctypes.c_float(max_mean),
        start.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        length.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stdv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(total),
        ctypes.byref(len_sum),
    )
    return {
        "start": start[:ne].astype(np.int64),
        "length": length[:ne].copy(),
        "mean": mean[:ne].copy(),
        "stdv": stdv[:ne].copy(),
        "total_events": int(total.value),
        "len_sum": np.float32(len_sum.value),
    }
