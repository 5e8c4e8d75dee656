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
            _stats_args = [
                ctypes.c_float, ctypes.c_float, ctypes.c_int64,
                ctypes.c_float, ctypes.c_float, ctypes.c_int64,
                ctypes.c_float, ctypes.c_float, ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int,
            ]
            lib.compute_voxel_stats.restype = ctypes.c_int
            lib.compute_voxel_stats.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
            ] + _stats_args
            lib.load_scan_batch_voxel_stats.restype = ctypes.c_int
            lib.load_scan_batch_voxel_stats.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
            ] + _stats_args
            if hasattr(lib, "compute_bev_batch"):
                lib.compute_bev_batch.restype = ctypes.c_int
                lib.compute_bev_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                    ctypes.c_float, ctypes.c_int64, ctypes.c_float,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_float, ctypes.c_float, ctypes.c_float,
                    ctypes.c_float,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int64, ctypes.c_int,
                ]
            if hasattr(lib, "compute_voxel_stats_sorted"):
                lib.compute_voxel_stats_sorted.restype = ctypes.c_int
                # _stats_args + the starts_out pointer before (M, threads)
                lib.compute_voxel_stats_sorted.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ] + _stats_args[:-2] + [
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int64, ctypes.c_int,
                ]
            if hasattr(lib, "compute_voxel_stats_sorted_pp"):
                lib.compute_voxel_stats_sorted_pp.restype = ctypes.c_int
                # sorted args + the pp_out pointer before (M, threads)
                lib.compute_voxel_stats_sorted_pp.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ] + _stats_args[:-2] + [
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_float),
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


def compute_voxel_stats_host(
    points: np.ndarray, counts: np.ndarray,
    xbound, ybound, zbound,
    crop: bool = False, max_points: Optional[int] = None,
    num_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side pillar statistics (scan_loader.cpp::compute_voxel_stats).

    One pass over each scan computes what ``points_to_voxels`` derives with
    its first device scatter: raw per-pillar counts (padding included at
    pillar 0) and centroids. Feeding these to
    ``ops.voxelize.points_to_voxels_hoststats`` removes that ~2 ms XLA
    scatter from the device critical path.

    Args:
      points: (B, N, 4) padded scans; counts: (B,) real rows per scan.
      crop: drop points outside the voxelizer-valid set (serving mode; only
        pillar 0's count/centroid deviate from the uncropped reference path).
      max_points: output row budget (defaults to N).

    Returns (points (B, M, 4), valid (B, M), ids (B, M) int32,
    raw_counts (B, V), centroids (B, V, 3)).
    """
    b, n, _ = points.shape
    m = int(max_points or n)
    nx = int(round((xbound[1] - xbound[0]) / xbound[2]))
    ny = int(round((ybound[1] - ybound[0]) / ybound[2]))
    nz = int(round((zbound[1] - zbound[0]) / zbound[2]))
    v = nx * ny * nz
    out_p = np.zeros((b, m, 4), np.float32)
    out_v = np.zeros((b, m), np.float32)
    out_i = np.zeros((b, m), np.int32)
    out_c = np.zeros((b, v), np.float32)
    out_g = np.zeros((b, v, 3), np.float32)
    lib = _load_library()
    if lib is not None:
        pts = np.ascontiguousarray(points, np.float32)
        cnt = np.ascontiguousarray(counts, np.int64)
        rc = lib.compute_voxel_stats(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), b,
            xbound[0], xbound[2], nx,
            ybound[0], ybound[2], ny,
            zbound[0], zbound[2], nz,
            int(crop),
            out_p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            m, num_threads,
        )
        # NOTE: pts was copied if non-contiguous; the native call wrote only
        # the out_* buffers, so no aliasing concerns.
        if rc == 0:
            return out_p, out_v, out_i, out_c, out_g
    # numpy fallback, same semantics
    lo = np.asarray([xbound[0], ybound[0], zbound[0]], np.float32)
    step = np.asarray([xbound[2], ybound[2], zbound[2]], np.float32)
    dims = np.asarray([nx, ny, nz])
    for bi in range(b):
        nreal = int(counts[bi])
        p = points[bi, :nreal, :].astype(np.float32)
        coords = np.trunc((p[:, :3] - lo) / step).astype(np.int64)
        oob = ((coords < 0) | (coords >= dims)).any(axis=1)
        ids = np.where(oob, 0, coords[:, 0] * ny * nz + coords[:, 1] * nz
                       + coords[:, 2]).astype(np.int32)
        if crop:
            p, ids = p[~oob], ids[~oob]
        w = min(len(p), m)
        out_p[bi, :w] = p[:w]
        out_v[bi, :w] = 1.0
        out_i[bi, :w] = ids[:w]
        np.add.at(out_c[bi], out_i[bi, :w], 1.0)
        out_c[bi, 0] += m - w  # padding rows alias to pillar 0
        np.add.at(out_g[bi], out_i[bi, :w], p[:w, :3])
        out_g[bi] /= np.maximum(out_c[bi], 1.0)[:, None]
    return out_p, out_v, out_i, out_c, out_g


def per_point_stats_table(points, valid, ids, raw_counts, centroids,
                          xbound, ybound, zbound) -> np.ndarray:
    """Per-point (count, centroid xyz) — exactly the device gather
    ``table[ids]`` of ops/voxelize.py::points_to_voxels_hoststats, computed
    on the host (vectorized numpy; the native sorted_pp path emits the same
    array inside its stats pass).

    Pillar 0's count column reports the VALID in-bounds point count (the
    device's masked recount); every other pillar reports its raw count.
    """
    lo = np.asarray([xbound[0], ybound[0], zbound[0]], np.float32)
    step = np.asarray([xbound[2], ybound[2], zbound[2]], np.float32)
    grid = np.asarray(
        [int(round((b_[1] - b_[0]) / b_[2])) for b_ in
         (xbound, ybound, zbound)], np.int64)
    coords = np.trunc(
        (points[..., :3].astype(np.float32) - lo) / step).astype(np.int64)
    inb = np.all((coords >= 0) & (coords < grid), axis=-1)
    valid0 = np.sum((ids == 0) & (valid > 0) & inb, axis=-1)  # (B,)
    ppv = raw_counts.copy()
    ppv[:, 0] = valid0
    table = np.concatenate([ppv[..., None], centroids], axis=-1)  # (B, V, 4)
    return np.take_along_axis(
        table, ids[..., None].astype(np.int64), axis=1).astype(np.float32)


def compute_voxel_stats_host_sorted(
    points: np.ndarray, counts: np.ndarray,
    xbound, ybound, zbound,
    crop: bool = False, max_points: Optional[int] = None,
    num_threads: int = 8, per_point: bool = False,
):
    """compute_voxel_stats_host + host pillar sort: the zero-device-scatter
    serving path.

    Returns (points (B, M, 4) pillar-SORTED, valid, ids, raw_counts,
    centroids, starts (B, V+1)). Feed the model
    ``voxel_stats=(ids, raw_counts, centroids, starts)`` so BOTH device
    segment reductions are replaced: stats by host precompute, the PointNet
    feature mean by the Pallas cumsum segment-sum
    (ops/pallas_scatter.py::segment_sum_sorted_fast).

    With ``per_point=True`` a 7th array pp (B, M, 4) is appended — the
    per-point (count, centroid) table rows the device would otherwise
    gather (voxel_stats 5-tuple ``(ids, counts, centroids, starts, pp)``
    removes that last by-index read from the device program).
    """
    b, n, _ = points.shape
    m = int(max_points or n)
    nx = int(round((xbound[1] - xbound[0]) / xbound[2]))
    ny = int(round((ybound[1] - ybound[0]) / ybound[2]))
    nz = int(round((zbound[1] - zbound[0]) / zbound[2]))
    n_vox = nx * ny * nz
    lib = _load_library()
    want_pp = bool(per_point)
    have_pp = lib is not None and hasattr(lib, "compute_voxel_stats_sorted_pp")
    if lib is not None and hasattr(lib, "compute_voxel_stats_sorted"):
        out_p = np.zeros((b, m, 4), np.float32)
        out_v = np.zeros((b, m), np.float32)
        out_i = np.zeros((b, m), np.int32)
        out_c = np.zeros((b, n_vox), np.float32)
        out_g = np.zeros((b, n_vox, 3), np.float32)
        out_s = np.zeros((b, n_vox + 1), np.int32)
        pts = np.ascontiguousarray(points, np.float32)
        cnt = np.ascontiguousarray(counts, np.int64)
        common = (
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), b,
            xbound[0], xbound[2], nx,
            ybound[0], ybound[2], ny,
            zbound[0], zbound[2], nz,
            int(crop),
            out_p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if want_pp and have_pp:
            out_pp = np.zeros((b, m, 4), np.float32)
            rc = lib.compute_voxel_stats_sorted_pp(
                *common,
                out_pp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                m, num_threads,
            )
            if rc == 0:
                return out_p, out_v, out_i, out_c, out_g, out_s, out_pp
        else:
            rc = lib.compute_voxel_stats_sorted(*common, m, num_threads)
            if rc == 0:
                if not want_pp:
                    return out_p, out_v, out_i, out_c, out_g, out_s
                out_pp = per_point_stats_table(
                    out_p, out_v, out_i, out_c, out_g,
                    xbound, ybound, zbound)
                return out_p, out_v, out_i, out_c, out_g, out_s, out_pp
    # numpy fallback: stats pass + stable argsort (same outputs)
    p, v, i, c, g = compute_voxel_stats_host(
        points, counts, xbound, ybound, zbound,
        crop=crop, max_points=max_points, num_threads=num_threads,
    )
    starts = np.zeros((b, n_vox + 1), np.int32)
    for bi in range(b):
        order = np.argsort(i[bi], kind="stable")
        p[bi] = p[bi][order]
        v[bi] = v[bi][order]
        i[bi] = i[bi][order]
        starts[bi] = np.searchsorted(i[bi], np.arange(n_vox + 1), "left")
    if want_pp:
        pp = per_point_stats_table(p, v, i, c, g, xbound, ybound, zbound)
        return p, v, i, c, g, starts, pp
    return p, v, i, c, g, starts


def load_scan_batch_voxel_stats(
    paths: List[str], fmt: str,
    xbound, ybound, zbound,
    max_points: int, crop: bool = False, num_threads: int = 8,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode files AND compute pillar stats in one threaded native pass."""
    lib = _load_library()
    b = len(paths)
    nx = int(round((xbound[1] - xbound[0]) / xbound[2]))
    ny = int(round((ybound[1] - ybound[0]) / ybound[2]))
    nz = int(round((zbound[1] - zbound[0]) / zbound[2]))
    v = nx * ny * nz
    if lib is not None:
        out_p = np.zeros((b, max_points, 4), np.float32)
        out_v = np.zeros((b, max_points), np.float32)
        out_i = np.zeros((b, max_points), np.int32)
        out_c = np.zeros((b, v), np.float32)
        out_g = np.zeros((b, v, 3), np.float32)
        c_paths = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
        rc = lib.load_scan_batch_voxel_stats(
            c_paths, b, _FMT[fmt],
            xbound[0], xbound[2], nx,
            ybound[0], ybound[2], ny,
            zbound[0], zbound[2], nz,
            int(crop),
            out_p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_points, num_threads,
        )
        if rc == 0:
            return out_p, out_v, out_i, out_c, out_g
    raw, counts = load_scan_batch(paths, fmt, max_points, num_threads)
    return compute_voxel_stats_host(
        raw, counts, xbound, ybound, zbound, crop=crop,
        max_points=max_points, num_threads=num_threads,
    )


def compute_bev_host(points: np.ndarray, counts: np.ndarray, bev_cfg,
                     num_threads: int = 8):
    """Host-side scan→BEV probability images (ops/bev.py::scan_to_bev exact
    semantics, single-sweep fast path, NO ground alignment).

    points: (B, N, ≥3) padded scans; counts: (B,) real rows.
    Returns (images (B, S, S) float32 free=1/occupied=0, origins (B, 2),
    num_occupied (B,) int32). Bit-identical to the device kernel (the
    projection math reduces to integer binning without rotation).
    """
    b, n, _ = points.shape
    s = bev_cfg.image_size
    res = bev_cfg.resolution
    half_xy = int(bev_cfg.max_range / res) + 2
    z_lo = int(bev_cfg.z_min / res)
    nz = int((bev_cfg.z_max - bev_cfg.z_min) / res) + 2
    lib = _load_library()
    if lib is not None and hasattr(lib, "compute_bev_batch"):
        pts4 = np.zeros((b, n, 4), np.float32)
        pts4[..., : min(points.shape[-1], 4)] = points[
            ..., : min(points.shape[-1], 4)]
        pts4 = np.ascontiguousarray(pts4)
        cnt = np.ascontiguousarray(counts, np.int64)
        imgs = np.empty((b, s, s), np.float32)
        origins = np.empty((b, 2), np.float32)
        nocc = np.empty((b,), np.int32)
        rc = lib.compute_bev_batch(
            pts4.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), b,
            res, s, bev_cfg.max_range, z_lo, nz, half_xy,
            bev_cfg.hit_probability, bev_cfg.max_probability,
            bev_cfg.occupied_value, bev_cfg.free_value,
            imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            origins.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nocc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, num_threads,
        )
        if rc == 0:
            return imgs, origins, nocc
    # numpy fallback, same semantics
    imgs = np.full((b, s, s), bev_cfg.free_value, np.float32)
    origins = np.zeros((b, 2), np.float32)
    nocc = np.zeros((b,), np.int32)
    nxy = 2 * half_xy
    for bi in range(b):
        p = points[bi, : int(counts[bi]), :3].astype(np.float32)
        p = p[np.linalg.norm(p, axis=1) <= bev_cfg.max_range]
        cell = np.where(p >= 0, np.floor(p / res + 0.5),
                        np.ceil(p / res - 0.5)).astype(np.int64)
        inz = (cell[:, 2] >= z_lo) & (cell[:, 2] - z_lo < nz)
        cell = cell[inz]
        if len(cell) == 0:
            continue
        vid = ((cell[:, 0] + half_xy) * nxy + cell[:, 1] + half_xy) * nz + (
            cell[:, 2] - z_lo)
        _, first = np.unique(vid, return_index=True)
        cc = cell[first]
        min_x, min_y = cc[:, 0].min(), cc[:, 1].min()
        max_x, max_y = cc[:, 0].max(), cc[:, 1].max()
        w_x, w_y = max_x - min_x + 1, max_y - min_y + 1

        def shift(w):
            return (s - w) // 2 if w <= s else -((w - s) // 2)

        off_x, off_y = shift(w_x) - min_x, shift(w_y) - min_y
        col = cc[:, 0] + off_x
        row = cc[:, 1] + off_y
        keep = (col >= 0) & (col < s) & (row >= 0) & (row < s)
        cnt2 = np.zeros((s, s), np.int32)
        np.add.at(cnt2, (row[keep], col[keep]), 1)
        occ = cnt2 * bev_cfg.hit_probability > bev_cfg.max_probability
        imgs[bi][occ] = bev_cfg.occupied_value
        origins[bi] = (-off_x * res, -off_y * res)
        nocc[bi] = int(occ.sum())
    return imgs, origins, nocc
