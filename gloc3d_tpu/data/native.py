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
            lib.load_scan_batch_pillar_sorted.restype = ctypes.c_int
            lib.load_scan_batch_pillar_sorted.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_int64,
                ctypes.c_float, ctypes.c_float, ctypes.c_int64,
                ctypes.c_float, ctypes.c_float, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_int,
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


def sort_points_by_pillar(
    points: np.ndarray, counts: np.ndarray,
    xbound, ybound, zbound,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Numpy fallback of the native pillar sort: see scan_loader.cpp.

    Returns (points_sorted (B,P,4), valid (B,P), pillar_ids (B,P),
    starts (B, V+1)). Padding and out-of-bounds points alias to pillar 0
    (the reference's voxel-0 quirks, ops/voxelize.py).
    """
    b, p, _ = points.shape
    nx = int(round((xbound[1] - xbound[0]) / xbound[2]))
    ny = int(round((ybound[1] - ybound[0]) / ybound[2]))
    nz = int(round((zbound[1] - zbound[0]) / zbound[2]))
    v = nx * ny * nz
    out_p = np.zeros_like(points)
    out_v = np.zeros((b, p), np.float32)
    out_i = np.zeros((b, p), np.int32)
    out_s = np.zeros((b, v + 1), np.int32)
    for bi in range(b):
        n = int(counts[bi])
        coords = np.trunc(
            (points[bi, :, :3] - [xbound[0], ybound[0], zbound[0]])
            / [xbound[2], ybound[2], zbound[2]]
        ).astype(np.int64)
        ids = coords[:, 0] * ny * nz + coords[:, 1] * nz + coords[:, 2]
        oob = (
            (coords < 0).any(1)
            | (coords[:, 0] >= nx) | (coords[:, 1] >= ny) | (coords[:, 2] >= nz)
        )
        ids = np.where(oob, 0, ids).astype(np.int32)
        ids[n:] = 0
        order = np.argsort(ids, kind="stable")
        out_p[bi] = points[bi, order]
        out_v[bi] = (order < n).astype(np.float32)
        out_i[bi] = ids[order]
        out_s[bi] = np.searchsorted(out_i[bi], np.arange(v + 1), side="left")
    return out_p, out_v, out_i, out_s


def load_scan_batch_pillar_sorted(
    paths: List[str], fmt: str,
    xbound, ybound, zbound,
    max_points: int, num_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode + pillar-sort files in the native threaded loader.

    Host-side sorting during IO turns device-side pillar binning into dense
    cumsum segment sums (ops/voxelize.py::points_to_voxels_presorted).
    """
    lib = _load_library()
    b = len(paths)
    nx = int(round((xbound[1] - xbound[0]) / xbound[2]))
    ny = int(round((ybound[1] - ybound[0]) / ybound[2]))
    nz = int(round((zbound[1] - zbound[0]) / zbound[2]))
    v = nx * ny * nz
    points = np.zeros((b, max_points, 4), np.float32)
    valid = np.zeros((b, max_points), np.float32)
    ids = np.zeros((b, max_points), np.int32)
    starts = np.zeros((b, v + 1), np.int32)
    if lib is not None:
        c_paths = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
        rc = lib.load_scan_batch_pillar_sorted(
            c_paths, b, _FMT[fmt],
            xbound[0], xbound[2], nx,
            ybound[0], ybound[2], ny,
            zbound[0], zbound[2], nz,
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_points, num_threads,
        )
        if rc == 0:
            return points, valid, ids, starts
    raw, counts = load_scan_batch(paths, fmt, max_points, num_threads)
    return sort_points_by_pillar(raw, counts, xbound, ybound, zbound)
