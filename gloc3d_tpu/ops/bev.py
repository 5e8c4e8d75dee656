"""Fused scan → gravity-aligned BEV probability image.

This is THE core preprocessing kernel (SURVEY.md §7 "hard parts" #1). The
reference builds it from four C++ stages — per-scan Submap3D occupancy-grid
insertion (range_data_inserter_3d.cpp:57-77), sparse-voxel BEV projection
(submap_3d.cpp:238-326), center crop/pad to 768×768 (loop_detector.cpp:83-106
/ i2i_util.py:53-91), and 1/255 scaling. Here the whole thing is ONE jitted
dataflow of sort/scan/scatter with static shapes.

Derivation of the single-scan fast path (exactly equivalent to the reference
pipeline, which constructs a fresh Submap3D per scan — save_probability_img
.cpp:155-209 and loop_detector.cpp:120-135 both do):

1. Cartographer's update-marker (probability_values.h:82, hybrid_grid.h:508)
   applies the hit lookup table at most once per cell per sweep, and hits are
   inserted before misses with priority (range_data_inserter_3d.cpp:71-76).
   After one sweep every hit cell therefore holds exactly
   p_hit = clamp(odds⁻¹(odds(0.55) · odds(p₀))) with unknown prior → 0.55;
   miss-only cells hold 0.49.
2. The projection keeps only cells with p ≥ 0.501 (submap_3d.cpp:256): all
   hit cells, no miss-only cells. Misses are thus irrelevant to a
   single-sweep BEV image and are skipped entirely here.
3. Each surviving voxel contributes p = 0.55 to its column's probability_sum
   (submap_3d.cpp:302-306); a pixel is occupied iff probability_sum > 0.9
   (submap_3d.cpp:312-324), i.e. iff ≥ 2 distinct occupied voxels project
   into it. "Distinct" is per original grid cell, so the kernel dedupes
   voxel ids by sort + first-occurrence before counting.

Geometry matches the reference bit-for-bit where it can:
  cell index  = round(p / res)                     (hybrid_grid.h:430)
  cell center = index * res                        (hybrid_grid.h:445)
  projected   = round(R_noyaw · center / res)      (submap_3d.cpp:244-275)
  image       = rows ↔ y, cols ↔ x, origin at bbox min; center crop/pad to
                768² with free=255 fill; occupied = 0 (submap_3d.cpp:312-324)

The multi-sweep general path (arbitrary odds accumulation, SLAM submaps)
lives in ops/occupancy.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gloc3d_tpu.config import BEVConfig
from gloc3d_tpu.core.transforms import quat_rotate, remove_yaw

Array = jax.Array


class BEVImage(NamedTuple):
    """A BEV probability image plus the metadata needed for metric matching.

    image: (S, S) float32; free = 1.0, occupied = 0.0 (the reference's uint8
      255/0 pre-scaled by 1/255, ready for the network).
    origin_xy: (2,) metric coordinate of pixel (row 0, col 0): the reference's
      (ox, oy) pair (submap_3d.cpp:283-284) propagated through the center
      crop, so metric_x = origin_xy[0] + col·res, metric_y = origin_xy[1] +
      row·res (loop_detector.cpp:243-249 uses exactly this to lift keypoints).
    resolution: () float32 meters/pixel.
    num_occupied: () int32 — occupied-pixel count (useful as a validity gate).
    """

    image: Array
    origin_xy: Array
    resolution: Array
    num_occupied: Array


def _round_int(x: Array) -> Array:
    """std::lround semantics: round half away from zero (carto_math.h)."""
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5)).astype(jnp.int32)


def scan_to_bev(
    points: Array,
    mask: Array,
    cfg: BEVConfig,
    align_rotation: Optional[Array] = None,
) -> BEVImage:
    """Project one scan to its gravity-aligned BEV probability image.

    Args:
      points: (N, 3) float32 sensor-frame points, padded to a static N.
      mask: (N,) bool/float validity of each point.
      cfg: BEVConfig (resolution, ranges, thresholds).
      align_rotation: optional (4,) wxyz quaternion mapping sensor frame to a
        gravity-aligned frame (from ground estimation). Its yaw is removed
        internally, mirroring submap_3d.cpp:244-247, making the image
        roll-pitch-yaw invariant up to in-plane rotation.

    Fully jit/vmap-compatible; all shapes static.
    """
    res = cfg.resolution
    s = cfg.image_size
    n = points.shape[0]
    valid = (mask > 0) & (jnp.linalg.norm(points, axis=-1) <= cfg.max_range)

    # --- occupancy voxel of each return (hybrid_grid.h:430) ---
    cell = _round_int(points / res)  # (N, 3)

    # Static voxel-id hash bounds: x/y ∈ ±max_range, z ∈ [z_min, z_max].
    half_xy = int(cfg.max_range / res) + 2
    nxy = 2 * half_xy  # e.g. 1004 at 0.2 m / 100 m
    z_lo = int(cfg.z_min / res)
    nz = int((cfg.z_max - cfg.z_min) / res) + 2
    cx = jnp.clip(cell[:, 0] + half_xy, 0, nxy - 1)
    cy = jnp.clip(cell[:, 1] + half_xy, 0, nxy - 1)
    cz = jnp.clip(cell[:, 2] - z_lo, 0, nz - 1)
    in_z = (cell[:, 2] >= z_lo) & (cell[:, 2] - z_lo < nz)
    valid = valid & in_z
    # int32 hash: (1004·1004)·512 ≈ 5.2e8 < 2³¹ at default bounds. Guarded
    # statically so widened configs fail loudly rather than overflow.
    if nxy * nxy * nz >= 2**31 - 1:
        raise ValueError(
            f"voxel hash space {nxy}x{nxy}x{nz} overflows int32; shrink "
            "max_range/z extent or raise resolution"
        )
    sentinel = jnp.iinfo(jnp.int32).max
    vid = (cx * nxy + cy) * nz + cz
    vid = jnp.where(valid, vid, sentinel)

    # --- dedupe: one contribution per occupied grid cell (update marker) ---
    if align_rotation is None:
        # FAST PATH (the serving shape: alignment, when on, is applied to
        # the cloud BEFORE projection — pipeline._extract_impl). With no
        # in-projection rotation, pix == cell exactly: the fp32 round trip
        # round(cell·res/res) can't move by ≥ 0.5 for any cell index the
        # range gate admits (|cell| ≤ 1e4 ⇒ |cell·res/res − cell| ≤
        # |cell|·2⁻²² < 0.5), so the projected index is the decoded hash.
        # A SINGLE-KEY sort (no permutation operand, no gathers) then
        # replaces argsort + two row gathers — measured ~2x cheaper at
        # N = 122,480 on v5e.
        vid_sorted = jnp.sort(vid)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), vid_sorted[1:] != vid_sorted[:-1]]
        )
        occ = first & (vid_sorted != sentinel)  # (N,) occupied-voxel flags
        rem = vid_sorted // nz
        pix2 = jnp.stack(
            [rem // nxy - half_xy, rem % nxy - half_xy], axis=-1
        )  # decoded (x, y) cell index; valid rows are never clipped
        # (half_xy = int(max_range/res)+2 bounds any in-range |cell|)
    else:
        order = jnp.argsort(vid)
        vid_sorted = vid[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), vid_sorted[1:] != vid_sorted[:-1]]
        )
        occ = first & (vid_sorted != sentinel)
        cell_sorted = cell[order]  # (N, 3)

        # --- gravity-aligned, yaw-free projection (submap_3d.cpp:240-275) ---
        center = cell_sorted.astype(points.dtype) * res  # GetCenterOfCell
        q = remove_yaw(align_rotation)
        center = quat_rotate(q[None, :], center)
        pix2 = _round_int(center / res)[:, :2]  # projected voxel index

    big = jnp.int32(2**30)
    px = jnp.where(occ, pix2[:, 0], big)
    py = jnp.where(occ, pix2[:, 1], big)
    min_x = jnp.min(px)
    min_y = jnp.min(py)
    max_x = jnp.max(jnp.where(occ, pix2[:, 0], -big))
    max_y = jnp.max(jnp.where(occ, pix2[:, 1], -big))

    # --- center crop/pad to s×s (crop_pad_occupancy / pad_and_crop) ---
    # Source image spans [min, max] per axis; width w = max - min + 1.
    # w <= s: dst = src + floor((s - w)/2); w > s: dst = src - floor((w - s)/2).
    w_x = max_x - min_x + 1
    w_y = max_y - min_y + 1

    def _shift(w):
        return jnp.where(w <= s, (s - w) // 2, -((w - s) // 2))

    off_x = _shift(w_x) - min_x  # dst_col = pix_x + off_x
    off_y = _shift(w_y) - min_y  # dst_row = pix_y + off_y

    col = pix2[:, 0] + off_x
    row = pix2[:, 1] + off_y
    in_img = occ & (col >= 0) & (col < s) & (row >= 0) & (row < s)
    flat = jnp.where(in_img, row * s + col, s * s)  # overflow bucket at s*s

    # Each distinct occupied voxel adds p_hit to its column's probability_sum
    # (submap_3d.cpp:302-306). Occupied iff sum > max_probability.
    counts = jnp.zeros((s * s + 1,), jnp.float32).at[flat].add(
        jnp.where(in_img, 1.0, 0.0)
    )[: s * s]
    prob_sum = counts * cfg.hit_probability
    occupied = prob_sum > cfg.max_probability
    image = jnp.where(
        occupied.reshape(s, s), cfg.occupied_value, cfg.free_value
    ).astype(jnp.float32)

    # Empty scan → bbox is the ±big sentinels; pin the origin to 0 so the
    # output is always finite/defined (validity is gated by num_occupied).
    any_occ = jnp.any(occ)
    origin_xy = jnp.where(
        any_occ, jnp.stack([-off_x, -off_y]).astype(jnp.float32) * res, 0.0
    )
    return BEVImage(
        image=image,
        origin_xy=origin_xy,
        resolution=jnp.float32(res),
        num_occupied=jnp.sum(occupied).astype(jnp.int32),
    )


def batch_scan_to_bev(
    points: Array, mask: Array, cfg: BEVConfig,
    align_rotation: Optional[Array] = None,
) -> BEVImage:
    """vmapped scan_to_bev over a leading batch axis."""
    if align_rotation is None:
        return jax.vmap(lambda p, m: scan_to_bev(p, m, cfg))(points, mask)
    return jax.vmap(lambda p, m, q: scan_to_bev(p, m, cfg, q))(
        points, mask, align_rotation
    )
