"""General multi-sweep 3-D occupancy grid (log-odds) + BEV projection.

Capability parity with the reference's Cartographer-derived mapping stack —
HybridGrid sparse voxel tree + probability codec + ray inserter + Submap3D
(hybrid_grid.h, probability_values.h, range_data_inserter_3d.cpp,
submap_3d.cpp) — for the SLAM-submap use case where MULTIPLE sweeps
accumulate into one grid. (Single-sweep BEV extraction uses the fused
ops/bev.py kernel, which is exactly equivalent for fresh per-scan submaps.)

TPU re-design: the 3-level sparse voxel tree becomes a dense origin-centered
(X, Y, Z) float32 log-odds tensor — regular memory, no pointer chasing, and
the whole sweep update is two sort/scatter passes:

  hits:   cell = round(p/res); dedupe per sweep (the kUpdateMarker
          semantics, probability_values.h:82) via sort + first-occurrence;
          log_odds += logit(p_hit), clamped to [logit(.1), logit(.9)].
  misses: the last ``num_free_space_voxels`` equidistant samples on each
          origin→hit ray (range_data_inserter_3d.cpp:27-52, C++ truncated
          int division reproduced); deduped; cells hit in the SAME sweep are
          excluded (hits-first priority, range_data_inserter_3d.cpp:71-74).

Probabilities are stored as log-odds directly — mathematically identical to
the uint16 odds lookup tables (probability_values.h:142): applying the odds
table is log_odds += logit(p_update) followed by the clamp.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gloc3d_tpu.config import BEVConfig
from gloc3d_tpu.core.transforms import quat_rotate, remove_yaw

Array = jax.Array


def logit(p: float) -> float:
    return math.log(p / (1.0 - p))


class OccupancyGrid3D(NamedTuple):
    """Dense origin-centered voxel grid state (functional — updates return a
    new value). Cell (i, j, k) covers center ((i, j, k) − half) · res."""

    log_odds: Array        # (X, Y, Z) float32; 0 == unknown
    known: Array           # (X, Y, Z) bool — ever updated
    resolution: float
    half: Tuple[int, int, int]  # index offset of the origin cell

    @staticmethod
    def create(resolution: float, extent_xy: float, z_min: float, z_max: float
               ) -> "OccupancyGrid3D":
        hx = int(round(extent_xy / resolution))
        nz = int(round((z_max - z_min) / resolution))
        hz = int(round(-z_min / resolution))
        shape = (2 * hx, 2 * hx, nz)
        return OccupancyGrid3D(
            log_odds=jnp.zeros(shape, jnp.float32),
            known=jnp.zeros(shape, bool),
            resolution=resolution,
            half=(hx, hx, hz),
        )

    def probabilities(self) -> Array:
        """(X, Y, Z) probabilities; unknown cells → 0 (reference convention:
        kUnknownProbabilityValue reads as minimum, here exactly 0 so callers
        can distinguish)."""
        p = jax.nn.sigmoid(self.log_odds)
        return jnp.where(self.known, p, 0.0)


_CLAMP = (logit(0.1), logit(0.9))


def _cells_of(points: Array, res: float) -> Array:
    return jnp.where(
        points >= 0, jnp.floor(points / res + 0.5), jnp.ceil(points / res - 0.5)
    ).astype(jnp.int32)


def _dedupe_ids(ids: Array, valid: Array, sentinel: int) -> Tuple[Array, Array]:
    """Sort ids; flag first occurrence of each valid id.

    Single-key ``jnp.sort`` — the permutation is never needed for dedupe,
    and dropping the argsort's index operand + gather roughly halves the
    sort cost at mapping scale (122k–368k lanes)."""
    ids = jnp.where(valid, ids, sentinel)
    s = jnp.sort(ids)
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    return s, first & (s != sentinel)


def insert_range_data(
    grid: OccupancyGrid3D,
    points: Array,
    mask: Array,
    origin: Optional[Array] = None,
    hit_probability: float = 0.55,
    miss_probability: float = 0.49,
    max_range: float = 100.0,
    num_free_space_voxels: int = 2,
) -> OccupancyGrid3D:
    """Insert one sweep (points (N, 3), mask (N,)) into the grid.

    Points beyond ``max_range`` become pure misses (their ray still carves
    free space) per point_cloud_to_range_data (loop_detector.cpp:107-119) +
    FilterRangeDataByMaxRange (submap_3d.cpp:43-52): out-of-range returns are
    dropped entirely from hits, and the reference inserts misses only along
    RETURN rays, so out-of-range points contribute nothing at all — matched
    here by masking them out completely.
    """
    res = grid.resolution
    hx, hy, hz = grid.half
    nx, ny, nz = grid.log_odds.shape
    n = points.shape[0]
    valid = (mask > 0) & (jnp.linalg.norm(points, axis=-1) <= max_range)

    if origin is None:
        origin = jnp.zeros(3, points.dtype)

    def cell_ids(cells: Array) -> Tuple[Array, Array]:
        ix = cells[:, 0] + hx
        iy = cells[:, 1] + hy
        iz = cells[:, 2] + hz
        inb = (
            (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
            & (iz >= 0) & (iz < nz)
        )
        flat = (ix * ny + iy) * nz + iz
        return flat, inb

    # ---- hit cells + free-space ray samples, ONE sort for both ----
    # Key = cell_id·2 + is_miss: sorting groups lanes by cell with the hit
    # lane (LSB 0) FIRST within each cell, so first-occurrence-per-cell
    # simultaneously (a) dedupes within the sweep (the kUpdateMarker
    # semantics) and (b) gives hits priority over same-sweep misses
    # (range_data_inserter_3d.cpp:71-74) — replacing the previous two
    # dedupe sorts (N hits + kN misses) + searchsorted exclusion with one
    # (k+1)·N single-key sort, and the 4 grid scatters with 2 (the update
    # value is selected per lane from the key's LSB). Bit-identical result.
    hit_cells = _cells_of(points, res)
    hit_flat, hit_inb = cell_ids(hit_cells)
    hit_ok = valid & hit_inb

    origin_cell = _cells_of(origin[None, :], res)[0]
    delta = hit_cells - origin_cell[None, :]                    # (N, 3)
    num_samples = jnp.max(jnp.abs(delta), axis=-1)              # (N,)
    miss_ids = []
    miss_valids = []
    for k in range(1, num_free_space_voxels + 1):
        pos = num_samples - k                                    # may be < 0
        ok = (pos >= 0) & valid & hit_inb
        # C++ integer division truncates toward zero
        prod = delta * pos[:, None]
        q = jnp.sign(prod) * (jnp.abs(prod) // jnp.maximum(num_samples, 1)[:, None])
        cell = origin_cell[None, :] + q.astype(jnp.int32)
        flat, inb = cell_ids(cell)
        miss_ids.append(flat)
        miss_valids.append(ok & inb)

    total = nx * ny * nz
    ids_all = jnp.concatenate([hit_flat] + miss_ids)
    ok_all = jnp.concatenate([hit_ok] + miss_valids)
    is_miss = jnp.concatenate(
        [jnp.zeros((n,), bool), jnp.ones((n * num_free_space_voxels,), bool)]
    )
    if 2 * total < 2**31:
        key_dtype = jnp.int32
        sentinel = jnp.iinfo(jnp.int32).max
    else:  # huge grids: keys overflow int32 — sort 64-bit
        key_dtype = jnp.int64
        sentinel = jnp.iinfo(jnp.int64).max
    keys = (ids_all.astype(key_dtype) * 2 + is_miss).astype(key_dtype)
    keys = jnp.where(ok_all, keys, sentinel)
    s = jnp.sort(keys)
    cell_sorted = (s >> 1).astype(jnp.int32)
    miss_lane = (s & 1) == 1
    first = jnp.concatenate(
        [jnp.ones((1,), bool), cell_sorted[1:] != cell_sorted[:-1]]
    ) & (s != sentinel)

    # Scatter convention: masked-out lanes get DISTINCT out-of-bounds ids
    # (total + lane) so mode="drop" discards them while unique_indices=True
    # holds strictly — XLA then emits the vectorized scatter instead of the
    # serialized duplicate-safe one (the difference is ~10x on a 40M-cell
    # target grid).
    flat_lo = grid.log_odds.reshape(-1)
    flat_known = grid.known.reshape(-1)
    upd = jnp.where(
        first,
        jnp.where(miss_lane, logit(miss_probability), logit(hit_probability)),
        0.0,
    )
    oob = total + jnp.arange(s.shape[0], dtype=jnp.int32)
    idx = jnp.where(first, cell_sorted, oob)
    flat_lo = flat_lo.at[idx].add(upd, mode="drop", unique_indices=True)
    flat_known = flat_known.at[idx].max(
        first, mode="drop", unique_indices=True)

    flat_lo = jnp.clip(flat_lo, _CLAMP[0], _CLAMP[1])
    return grid._replace(
        log_odds=flat_lo.reshape(nx, ny, nz),
        known=flat_known.reshape(nx, ny, nz),
    )


def project_to_bev(
    grid: OccupancyGrid3D,
    cfg: BEVConfig,
    align_rotation: Optional[Array] = None,
    occupied_threshold: float = 0.501,
) -> Tuple[Array, Array]:
    """Project the grid to the reference BEV probability image.

    Exactly submap_3d.cpp:238-326: keep cells with p ≥ threshold, rotate
    their centers by the yaw-free alignment, accumulate probability_sum per
    (x, y) pixel, binarize at prob_sum > max_probability, center-crop/pad to
    cfg.image_size. Returns (image (S, S) float 0/1, origin_xy (2,)).
    """
    res = grid.resolution
    s = cfg.image_size
    hx, hy, hz = grid.half
    nx, ny, nz = grid.log_odds.shape
    p = grid.probabilities()
    occ = p >= occupied_threshold

    if align_rotation is None:
        # Identity alignment maps cell (i, j, k) to pixel (i−hx, j−hy)
        # exactly (centers = index·res, _cells_of(center) = index), so the
        # projection is a pure z-reduction + shifted crop — no scatter. A
        # 40M-cell grid projects in ~1 ms instead of the general path's
        # 40M-lane scatter (~366 ms measured).
        prob_sum_xy = jnp.sum(jnp.where(occ, p, 0.0), axis=2)   # (X, Y)
        occ_xy = jnp.any(occ, axis=2)
        any_x = jnp.any(occ_xy, axis=1)
        any_y = jnp.any(occ_xy, axis=0)
        has_occ = jnp.any(any_x)
        big = jnp.int32(2**30)
        xs = jnp.arange(nx, dtype=jnp.int32) - hx
        ys = jnp.arange(ny, dtype=jnp.int32) - hy
        min_x = jnp.where(has_occ, jnp.min(jnp.where(any_x, xs, big)), 0)
        max_x = jnp.where(has_occ, jnp.max(jnp.where(any_x, xs, -big)), 0)
        min_y = jnp.where(has_occ, jnp.min(jnp.where(any_y, ys, big)), 0)
        max_y = jnp.where(has_occ, jnp.max(jnp.where(any_y, ys, -big)), 0)
        w_x = max_x - min_x + 1
        w_y = max_y - min_y + 1

        def _shift(w):
            return jnp.where(w <= s, (s - w) // 2, -((w - s) // 2))

        off_x = _shift(w_x) - min_x
        off_y = _shift(w_y) - min_y
        # image[row, col] = prob_sum_xy[col + hx − off_x, row + hy − off_y];
        # pad enough that the dynamic_slice start is always in range
        # (|off| ≤ s + max(nx, ny)/2 by the bbox/shift bounds above).
        pad_x = s + nx // 2 + 1
        pad_y = s + ny // 2 + 1
        padded = jnp.pad(prob_sum_xy, ((pad_x, pad_x), (pad_y, pad_y)))
        sub = jax.lax.dynamic_slice(
            padded, (hx - off_x + pad_x, hy - off_y + pad_y), (s, s))
        occupied = sub.T > cfg.max_probability
        image = jnp.where(occupied, cfg.occupied_value,
                          cfg.free_value).astype(jnp.float32)
        origin_xy = jnp.where(
            has_occ,
            jnp.stack([-off_x, -off_y]).astype(jnp.float32) * res, 0.0)
        return image, origin_xy

    ii, jj, kk = jnp.meshgrid(
        jnp.arange(nx) - hx, jnp.arange(ny) - hy, jnp.arange(nz) - hz,
        indexing="ij",
    )
    centers = jnp.stack([ii, jj, kk], axis=-1).astype(jnp.float32) * res
    if align_rotation is not None:
        q = remove_yaw(align_rotation)
        centers = quat_rotate(q[None, None, None, :], centers)
    pix = _cells_of(centers.reshape(-1, 3), res)
    occ_flat = occ.reshape(-1)
    p_flat = p.reshape(-1)

    big = jnp.int32(2**30)
    px = jnp.where(occ_flat, pix[:, 0], big)
    py = jnp.where(occ_flat, pix[:, 1], big)
    min_x = jnp.min(px)
    min_y = jnp.min(py)
    max_x = jnp.max(jnp.where(occ_flat, pix[:, 0], -big))
    max_y = jnp.max(jnp.where(occ_flat, pix[:, 1], -big))
    w_x = max_x - min_x + 1
    w_y = max_y - min_y + 1

    def _shift(w):
        return jnp.where(w <= s, (s - w) // 2, -((w - s) // 2))

    off_x = _shift(w_x) - min_x
    off_y = _shift(w_y) - min_y
    col = pix[:, 0] + off_x
    row = pix[:, 1] + off_y
    in_img = occ_flat & (col >= 0) & (col < s) & (row >= 0) & (row < s)
    flat = jnp.where(in_img, row * s + col, s * s)
    prob_sum = jnp.zeros((s * s + 1,), jnp.float32).at[flat].add(
        jnp.where(in_img, p_flat, 0.0)
    )[: s * s]
    occupied = prob_sum > cfg.max_probability
    image = jnp.where(occupied.reshape(s, s), cfg.occupied_value,
                      cfg.free_value).astype(jnp.float32)
    origin_xy = jnp.where(
        jnp.any(occ_flat),
        jnp.stack([-off_x, -off_y]).astype(jnp.float32) * res, 0.0,
    )
    return image, origin_xy


def grid_to_points(
    probs: Array, origin_xy: Array, resolution: float,
    threshold: float = 0.501, max_points: int | None = None,
) -> Tuple[Array, Array]:
    """Occupied grid cells → virtual 2-D point cloud (+ mask).

    Parity with the reference's grid→point-cloud extraction
    (fast_correlative_scan_matcher_2d.cpp:78-95 and the contour-based
    variant, global_registration.cpp:441-609): every cell with p ≥ threshold
    becomes a point at its metric center. Static output size = H·W (or
    ``max_points``) with a validity mask; occupied cells are compacted to
    the front by sorting on the mask so callers can truncate.
    """
    h, w = probs.shape
    occ = (probs >= threshold).reshape(-1)
    rows = jnp.repeat(jnp.arange(h), w)
    cols = jnp.tile(jnp.arange(w), h)
    pts = jnp.stack(
        [origin_xy[0] + cols * resolution, origin_xy[1] + rows * resolution],
        axis=1,
    )
    order = jnp.argsort(~occ)  # occupied first, stable
    pts = pts[order]
    mask = occ[order]
    if max_points is not None:
        pts = pts[:max_points]
        mask = mask[:max_points]
    return pts, mask.astype(jnp.float32)


class ProbabilityGrid2D(NamedTuple):
    """Dense 2-D probability grid (grid_2d.{h,cpp} + probability_grid.{h,cpp}
    parity): log-odds cells + (origin, resolution) metadata."""

    log_odds: Array   # (H, W); rows = y, cols = x
    known: Array      # (H, W) bool
    origin_xy: Array  # (2,) metric coords of cell (0, 0) center
    resolution: float

    @staticmethod
    def create(size: int, resolution: float, origin_xy=(0.0, 0.0)
               ) -> "ProbabilityGrid2D":
        return ProbabilityGrid2D(
            jnp.zeros((size, size), jnp.float32),
            jnp.zeros((size, size), bool),
            jnp.asarray(origin_xy, jnp.float32),
            resolution,
        )

    @staticmethod
    def from_bev_image(image: Array, origin_xy: Array, resolution: float
                       ) -> "ProbabilityGrid2D":
        """Binary BEV image (free=1, occupied=0) → grid with p=0.9/0.1."""
        occ = image < 0.5
        lo = jnp.where(occ, _CLAMP[1], _CLAMP[0])
        return ProbabilityGrid2D(
            lo, jnp.ones_like(occ), jnp.asarray(origin_xy, jnp.float32),
            resolution,
        )

    def probabilities(self) -> Array:
        return jnp.where(self.known, jax.nn.sigmoid(self.log_odds), 0.0)

    def apply_odds(self, rows: Array, cols: Array, valid: Array,
                   p_update: float) -> "ProbabilityGrid2D":
        """Batch odds update at (rows, cols) — ApplyLookupTable semantics
        with per-call dedupe (probability_grid.cpp:36-79)."""
        h, w = self.log_odds.shape
        inb = valid & (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
        flat = jnp.where(inb, rows * w + cols, h * w)
        sentinel = jnp.iinfo(jnp.int32).max
        s, first = _dedupe_ids(flat, inb, sentinel)
        idx = jnp.where(first, s, h * w)
        lo = jnp.concatenate([self.log_odds.reshape(-1), jnp.zeros((1,))])
        kn = jnp.concatenate([self.known.reshape(-1), jnp.zeros((1,), bool)])
        lo = lo.at[idx].add(jnp.where(first, logit(p_update), 0.0))
        kn = kn.at[idx].max(first)
        lo = jnp.clip(lo[:-1], _CLAMP[0], _CLAMP[1])
        return self._replace(
            log_odds=lo.reshape(h, w), known=kn[:-1].reshape(h, w)
        )


class Submap3D(NamedTuple):
    """Dual-resolution submap: a high-res and a low-res occupancy grid fed
    by the same sweeps (submap_3d.cpp:153-176 / Submap3D::InsertRangeData).

    The high-res grid receives range data filtered to
    ``high_resolution_max_range`` (loop_detector.h:115: 100 m, so the filter
    is a no-op at the defaults but the knob is honored); the low-res grid
    receives the unfiltered sweep. Functional like OccupancyGrid3D.
    """

    high: OccupancyGrid3D
    low: OccupancyGrid3D
    num_range_data: int

    @staticmethod
    def create(cfg: BEVConfig, extent_xy: float = 60.0) -> "Submap3D":
        return Submap3D(
            high=OccupancyGrid3D.create(cfg.resolution, extent_xy,
                                        cfg.z_min, cfg.z_max),
            low=OccupancyGrid3D.create(cfg.low_resolution, extent_xy,
                                       cfg.z_min, cfg.z_max),
            num_range_data=0,
        )

    def insert(
        self, points: Array, mask: Array,
        origin: Optional[Array] = None,
        cfg: Optional[BEVConfig] = None,
        high_resolution_max_range: float = 100.0,
    ) -> "Submap3D":
        cfg = cfg or BEVConfig()
        common = dict(
            origin=origin,
            hit_probability=cfg.hit_probability,
            miss_probability=cfg.miss_probability,
            num_free_space_voxels=cfg.num_free_space_voxels,
        )
        return Submap3D(
            high=insert_range_data(
                self.high, points, mask,
                max_range=min(high_resolution_max_range, cfg.max_range),
                **common,
            ),
            low=insert_range_data(
                self.low, points, mask, max_range=cfg.max_range, **common,
            ),
            num_range_data=self.num_range_data + 1,
        )

    def project(self, cfg: BEVConfig,
                align_rotation: Optional[Array] = None,
                use_low_resolution: bool = False) -> Tuple[Array, Array]:
        """BEV probability image from either grid (the loop detector
        projects the high-res grid, loop_detector.cpp:137-142; the low-res
        grid backs coarse matching)."""
        grid = self.low if use_low_resolution else self.high
        return project_to_bev(grid, cfg,
                              align_rotation=align_rotation,
                              occupied_threshold=cfg.occupied_threshold)
