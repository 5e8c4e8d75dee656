"""ctypes bridge to the native threaded scan loader (native/scan_loader.cpp).

Builds the .so on first use if the toolchain is available; otherwise every
call falls back to the pure-numpy decoders in data/readers.py, so the
framework works without a compiler (just slower on IO-bound db builds).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_FMT = {"kitti": 0, "nuscenes": 1, "nclt": 2}
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        so = os.path.join(_native_dir(), "libscanloader.so")
        if not os.path.exists(so):
            try:
                subprocess.run(
                    ["make", "-C", _native_dir()],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(so)
            lib.load_scan_batch.restype = ctypes.c_int
            lib.load_scan_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ]
            _lib = lib
        except OSError:
            _lib_failed = True
        return _lib


def load_scan_batch(
    paths: List[str], fmt: str, max_points: int, num_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode files → ((B, max_points, 4) float32, (B,) counts).

    Uses the native threaded loader when available, numpy otherwise.
    """
    lib = _load_library()
    b = len(paths)
    out = np.zeros((b, max_points, 4), np.float32)
    counts = np.zeros((b,), np.int64)
    if lib is not None:
        c_paths = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
        rc = lib.load_scan_batch(
            c_paths, b, _FMT[fmt],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_points,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            num_threads,
        )
        if rc == 0 and (counts >= 0).all():
            return out, counts
        # fall through to numpy on partial failure
    from gloc3d_tpu.data import readers

    fn = {"kitti": readers.read_kitti_bin,
          "nuscenes": readers.read_nuscenes_bin,
          "nclt": readers.read_nclt_bin}[fmt]
    for i, p in enumerate(paths):
        pts = fn(p)
        n = min(len(pts), max_points)
        out[i, :n] = pts[:n, :4]
        counts[i] = n
    return out, counts


def masks_from_counts(counts: np.ndarray, max_points: int) -> np.ndarray:
    return (np.arange(max_points)[None, :] < counts[:, None]).astype(np.float32)
