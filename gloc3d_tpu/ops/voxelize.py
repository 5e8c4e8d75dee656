"""Point → pillar voxelization as dense JAX scatter/gather ops.

TPU-native reimplementation of the reference voxelizer semantics
(model/voxel.py:23-133, points_to_voxels), which the PointPillar encoder uses
to bin padded point clouds into a 2D pillar grid. Instead of torch_scatter
CUDA kernels, this uses XLA segment sums (``.at[].add``) over a static voxel
count — fully jittable, vmappable over the batch, and differentiable where it
needs to be (the features, not the indices).

Faithfully reproduced reference quirks (they affect trained-weight parity):

* Voxel coordinates truncate toward zero (torch ``.int()``), so points within
  one voxel below the grid minimum alias into bin 0 (voxel.py:55).
* ``voxel_centers`` is computed from the *unclamped* coordinates, before
  padded points are zeroed (voxel.py:73-76).
* ``voxel_centroids`` averages raw ``points_xyz`` with padded points mapped to
  voxel 0, so voxel 0's centroid includes padding (voxel.py:97-101). Padded
  points are masked after the PointNet anyway (pointpillar.py:124).
* Linear index is x-major: ``idx = x * gy * gz + y * gz + z`` (voxel.py:14-20).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def pad_or_trim(x: np.ndarray, num: int, dims: int | None = None,
                pad_val: float = 0.0) -> np.ndarray:
    """Pad with ``pad_val`` / trim rows to exactly ``num`` (voxel.py:6-11)."""
    x = np.asarray(x)
    d = x.shape[1] if dims is None else dims
    out = np.full((num, d), pad_val, dtype=x.dtype)
    n = min(x.shape[0], num)
    out[:n, : min(x.shape[1], d)] = x[:n, : min(x.shape[1], d)]
    return out


def _trunc_int(x: Array) -> Array:
    """Truncate toward zero like torch ``.int()`` / C int casts."""
    return jnp.trunc(x).astype(jnp.int32)


def points_to_voxels(
    points_xyz: Array,
    points_mask: Array,
    xbound: Tuple[float, float, float],
    ybound: Tuple[float, float, float],
    zbound: Tuple[float, float, float],
) -> Dict[str, Array]:
    """Assign points to pillars and compute per-point/per-voxel statistics.

    Args:
      points_xyz: (B, N, 3) padded point coordinates.
      points_mask: (B, N) 1.0 for real points, 0.0 for padding.
      *bound: (min, max, step) per axis; step divides the extent exactly.

    Returns a dict with the same keys/shapes as the reference (voxel.py:113-130).
    """
    if points_xyz.ndim != 3:
        raise ValueError(f"points_xyz must be (B, N, 3), got {points_xyz.shape}")
    b, n, _ = points_xyz.shape

    voxel_size = jnp.asarray(
        [xbound[2], ybound[2], zbound[2]], dtype=points_xyz.dtype
    )
    grid_offset = jnp.asarray(
        [xbound[0], ybound[0], zbound[0]], dtype=points_xyz.dtype
    )
    gx = int(round((xbound[1] - xbound[0]) / xbound[2]))
    gy = int(round((ybound[1] - ybound[0]) / ybound[2]))
    gz = int(round((zbound[1] - zbound[0]) / zbound[2]))
    grid_size = jnp.asarray([gx, gy, gz], dtype=jnp.int32)
    num_voxels = gx * gy * gz

    shifted = points_xyz - grid_offset
    voxel_xyz = shifted / voxel_size
    coords = _trunc_int(voxel_xyz)  # (B, N, 3), truncation per voxel.py:55

    padding = (points_mask < 1.0) | jnp.any(
        (coords >= grid_size) | (coords < 0), axis=-1
    )

    # x-major ravel (voxel.py:14-20)
    idx = coords[..., 0] * (gy * gz) + coords[..., 1] * gz + coords[..., 2]
    idx = jnp.where(padding, 0, idx)

    # voxel_centers from unclamped coords (voxel.py:73: computed pre-where)
    voxel_centers = (coords.astype(points_xyz.dtype) + 0.5) * voxel_size + grid_offset
    coords = jnp.where(padding[..., None], 0, coords)
    voxel_xyz = jnp.where(padding[..., None], 0.0, voxel_xyz)

    valid = 1.0 - padding.astype(points_xyz.dtype)

    # ONE fused scatter for all per-voxel statistics. TPU scatter cost is
    # dominated by per-row index processing, not payload width (measured:
    # a (N, 5) scatter costs the same as a (N, 1) scatter), so packing
    # [valid, 1, x, y, z] into a single payload runs ~2x faster than the
    # three separate scatters a direct translation would use.
    payload = jnp.concatenate(
        [valid[..., None], jnp.ones((b, n, 1), points_xyz.dtype), points_xyz],
        axis=-1,
    )  # (B, N, 5)

    def scatter_add(values, indices):
        return jnp.zeros((num_voxels, values.shape[-1]), values.dtype).at[
            indices
        ].add(values)

    acc = jax.vmap(scatter_add)(payload, idx)  # (B, V, 5)
    points_per_voxel = acc[..., 0]
    # raw count includes padding at voxel 0 (scatter_mean torch semantics,
    # voxel.py:97-101)
    raw_counts = acc[..., 1]
    voxel_centroids = acc[..., 2:] / jnp.maximum(raw_counts, 1.0)[..., None]

    # one fused gather back to points. NOTE: formulated as a vmapped row
    # gather, NOT take_along_axis — on TPU, take_along_axis with a repeated
    # index lowers to a gather that costs ~5 ms at this shape while the row
    # gather costs ~0.2 ms (measured v5e, N=122480).
    table = jnp.concatenate(
        [points_per_voxel[..., None], voxel_centroids], axis=-1
    )  # (B, V, 4)
    g = jax.vmap(lambda t, i: t[i])(table, idx)  # (B, N, 4)
    voxel_point_count = g[..., 0]
    point_centroids = g[..., 1:]
    local_points_xyz = points_xyz - point_centroids

    return {
        "local_points_xyz": local_points_xyz,
        "shifted_points_xyz": shifted,
        "point_centroids": point_centroids,
        "points_xyz": points_xyz,
        "grid_offset": grid_offset,
        "voxel_coords": coords,
        "voxel_centers": voxel_centers,
        "voxel_indices": idx,
        "voxel_paddings": padding.astype(points_xyz.dtype),
        "points_mask": valid,
        "num_voxels": num_voxels,
        "grid_size": grid_size,
        "grid_shape": (gx, gy, gz),  # static python ints — safe under jit
        "voxel_xyz": voxel_xyz,
        "voxel_size": voxel_size,
        "voxel_point_count": voxel_point_count,
        "points_per_voxel": points_per_voxel,
        "raw_counts": raw_counts,  # incl. padding at voxel 0 (scatter_mean denom)
    }


def points_to_voxels_hoststats(
    points_xyz: Array,    # (B, N, 3)
    valid: Array,         # (B, N) 1.0 = real decoded row (OOB rows may be 1)
    ids: Array,           # (B, N) int32 pillar ids (padding/OOB → 0)
    raw_counts: Array,    # (B, V) per-pillar counts incl. padding at pillar 0
    centroids: Array,     # (B, V, 3) per-pillar centroids
    xbound: Tuple[float, float, float],
    ybound: Tuple[float, float, float],
    zbound: Tuple[float, float, float],
    per_point: Array | None = None,  # (B, N, 4) host-gathered (count, cx,
                                     # cy, cz) table rows (data/native.py::
                                     # per_point_stats_table) — removes the
                                     # device (N, 4) gather entirely
) -> Dict[str, Array]:
    """points_to_voxels with the per-pillar reductions precomputed on the
    host (data/native.py::compute_voxel_stats_host) — the device does only
    elementwise math and one (N, 4) gather, no scatters (with ``per_point``
    the gather moves to the host loader pass too: zero by-index reads).

    Outputs match points_to_voxels exactly for the same input rows (the host
    sums and the XLA scatter sums may differ in the last float ulp from
    accumulation order). The valid-point count per pillar equals the raw
    count everywhere except pillar 0 (padding and out-of-bounds rows alias
    there); pillar 0's valid count is recovered with one masked reduction.
    """
    b, n, _ = points_xyz.shape
    voxel_size = jnp.asarray([xbound[2], ybound[2], zbound[2]], points_xyz.dtype)
    grid_offset = jnp.asarray([xbound[0], ybound[0], zbound[0]], points_xyz.dtype)
    gx = int(round((xbound[1] - xbound[0]) / xbound[2]))
    gy = int(round((ybound[1] - ybound[0]) / ybound[2]))
    gz = int(round((zbound[1] - zbound[0]) / zbound[2]))
    grid_size = jnp.asarray([gx, gy, gz], jnp.int32)
    num_voxels = gx * gy * gz

    shifted = points_xyz - grid_offset
    voxel_xyz = shifted / voxel_size
    coords = _trunc_int(voxel_xyz)
    padding = (valid < 1.0) | jnp.any(
        (coords >= grid_size) | (coords < 0), axis=-1
    )
    voxel_centers = (coords.astype(points_xyz.dtype) + 0.5) * voxel_size + grid_offset
    coords = jnp.where(padding[..., None], 0, coords)
    voxel_xyz = jnp.where(padding[..., None], 0.0, voxel_xyz)
    valid_f = 1.0 - padding.astype(points_xyz.dtype)

    # valid-point count: == raw count except at pillar 0
    in_bin0_valid = jnp.sum(valid_f * (ids == 0), axis=-1)  # (B,)
    points_per_voxel = raw_counts.at[:, 0].set(in_bin0_valid)

    if per_point is not None:
        voxel_point_count = per_point[..., 0]
        point_centroids = per_point[..., 1:]
    else:
        table = jnp.concatenate(
            [points_per_voxel[..., None], centroids], axis=-1
        )  # (B, V, 4)
        g = jax.vmap(lambda t, i: t[i])(table, ids)  # row gather, see above
        voxel_point_count = g[..., 0]
        point_centroids = g[..., 1:]

    return {
        "local_points_xyz": points_xyz - point_centroids,
        "shifted_points_xyz": shifted,
        "point_centroids": point_centroids,
        "points_xyz": points_xyz,
        "grid_offset": grid_offset,
        "voxel_coords": coords,
        "voxel_centers": voxel_centers,
        "voxel_indices": ids,
        "voxel_paddings": padding.astype(points_xyz.dtype),
        "points_mask": valid_f,
        "num_voxels": num_voxels,
        "grid_size": grid_size,
        "grid_shape": (gx, gy, gz),
        "voxel_xyz": voxel_xyz,
        "voxel_size": voxel_size,
        "voxel_point_count": voxel_point_count,
        "points_per_voxel": points_per_voxel,
        "raw_counts": raw_counts,
        "voxel_centroids": centroids,
    }


def device_pillar_sort_stats(
    points: Array,   # (N, D>=3) single scan, padded to static N
    valid: Array,    # (N,) 1.0 = real point
    xbound: Tuple[float, float, float],
    ybound: Tuple[float, float, float],
    zbound: Tuple[float, float, float],
) -> Tuple[Array, Array, Array, Array, Array, Array]:
    """Device-side pillar sort + per-pillar statistics, in one jit.

    The in-jit counterpart of the native loader's pillar-sorted pass
    (data/native.py::sort_points_by_pillar / scan_loader.cpp), for clouds
    that only exist on device — after in-jit ground alignment, host
    pre-sorting would need a mid-query round trip. Turns the two ~1 ms XLA
    scatters of the unsorted forward (points_to_voxels stats +
    scatter_mean_to_grid) into ONE single-key sort plus cumsum segment
    sums: the pillar id and the row index pack into one int32 key
    (id << ROW_BITS | row), so the sort is stable AND yields the
    permutation for free with no sort operands.

    Returns (points_sorted, valid_sorted, ids_sorted, starts, raw_counts,
    centroids) ready for DescriptorModel(..., voxel_stats=(ids_sorted,
    raw_counts, centroids, starts)) — the same contract the host stats
    pass feeds (semantics of compute_voxel_stats_host: raw counts include
    padding rows at pillar 0, and pillar 0's centroid keeps the padded-row
    pollution of the reference scatter path, voxel.py:97-101).
    """
    n, _ = points.shape
    voxel_size = jnp.asarray([xbound[2], ybound[2], zbound[2]], points.dtype)
    grid_offset = jnp.asarray([xbound[0], ybound[0], zbound[0]], points.dtype)
    gx = int(round((xbound[1] - xbound[0]) / xbound[2]))
    gy = int(round((ybound[1] - ybound[0]) / ybound[2]))
    gz = int(round((zbound[1] - zbound[0]) / zbound[2]))
    grid_size = jnp.asarray([gx, gy, gz], jnp.int32)
    num_voxels = gx * gy * gz

    xyz = points[..., :3]
    coords = _trunc_int((xyz - grid_offset) / voxel_size)
    padding = (valid < 1.0) | jnp.any(
        (coords >= grid_size) | (coords < 0), axis=-1
    )
    ids = coords[:, 0] * (gy * gz) + coords[:, 1] * gz + coords[:, 2]
    ids = jnp.where(padding, 0, ids).astype(jnp.int32)

    row_bits = max(1, (n - 1).bit_length())
    if num_voxels << row_bits < 2**31:
        # packed single-key stable sort: zero operands, zero extra gathers
        key = (ids << row_bits) | jnp.arange(n, dtype=jnp.int32)
        skey = jnp.sort(key)
        order = skey & ((1 << row_bits) - 1)
        ids_sorted = skey >> row_bits
    else:  # fallback for huge grids/scans: two-operand stable sort
        order = jnp.argsort(ids, stable=True).astype(jnp.int32)
        ids_sorted = ids[order]

    points_sorted = points[order]
    valid_sorted = valid[order]
    starts = jnp.searchsorted(
        ids_sorted, jnp.arange(num_voxels + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    raw_counts = jnp.diff(starts).astype(points.dtype)

    # centroids over ALL rows per segment (padding rows included — the
    # voxel-0 pollution is reference parity); pillar-center-relative cumsum
    # bounds fp32 error exactly as in points_to_voxels_presorted
    cz = ids_sorted % gz
    cy = (ids_sorted // gz) % gy
    cx = ids_sorted // (gy * gz)
    seg_center = (
        jnp.stack([cx, cy, cz], -1).astype(points.dtype) + 0.5
    ) * voxel_size + grid_offset
    rel = points_sorted[:, :3] - seg_center
    # pillar 0 aliases every padding/OOB row, whose |rel| is the full grid
    # half-extent (~35 m): left in the running cumsum that mass raises the
    # boundary-difference error of EVERY later pillar to ~1e-3. Take pillar
    # 0 out of the cumsum and sum it exactly with one masked reduction.
    in_p0 = (ids_sorted == 0)[:, None]
    # z has a single bin spanning the full extent, so rel_z is the raw
    # height and its cumsum would still wander ~|Σz|; subtracting the exact
    # scan mean of rel (one tree reduction) leaves a zero-mean walk (~σ√N)
    # in the cumsum for all three axes.
    rel_nz = jnp.where(in_p0, 0.0, rel)
    n_nz = jnp.maximum(jnp.sum(1.0 - in_p0[:, 0].astype(points.dtype)), 1.0)
    rel_mean = jnp.sum(rel_nz, axis=0) / n_nz
    sums = segment_sum_sorted(
        jnp.where(in_p0, 0.0, rel - rel_mean), starts
    )  # (V, 3); per-segment Σ(rel − m)
    sum0_raw = jnp.sum(
        jnp.where(in_p0, points_sorted[:, :3], 0.0), axis=0
    )  # raw-xyz sum (scatter-path semantics for pillar 0, voxel.py:97-101)
    cell_center = (
        jnp.stack(
            jnp.meshgrid(jnp.arange(gx), jnp.arange(gy), jnp.arange(gz),
                         indexing="ij"), axis=-1
        ).reshape(num_voxels, 3).astype(points.dtype) + 0.5
    ) * voxel_size + grid_offset
    centroids = jnp.where(
        (raw_counts > 0)[..., None],
        sums / jnp.maximum(raw_counts, 1.0)[..., None] + rel_mean
        + cell_center,
        0.0,
    )
    centroids = centroids.at[0].set(
        jnp.where(raw_counts[0] > 0,
                  sum0_raw / jnp.maximum(raw_counts[0], 1.0), 0.0)
    )
    return points_sorted, valid_sorted, ids_sorted, starts, raw_counts, centroids


def segment_sum_sorted(values: Array, starts: Array) -> Array:
    """Segment sums over PRE-SORTED values via cumsum + boundary gather.

    values: (N, C) sorted by segment; starts: (V+1,) start offsets.
    Returns (V, C). Replaces a ~60M-rows/s TPU scatter with one cumsum and a
    V-row gather — the payoff of host-side pillar sorting
    (data/native.py::load_scan_batch_pillar_sorted).
    """
    cs = jnp.concatenate(
        [jnp.zeros((1, values.shape[-1]), values.dtype),
         jnp.cumsum(values, axis=0)], axis=0
    )
    return cs[starts[1:]] - cs[starts[:-1]]


def points_to_voxels_presorted(
    points_xyz: Array,   # (B, N, 3) pillar-sorted
    valid: Array,        # (B, N) decoded-point flag (pre-sort order applied)
    ids: Array,          # (B, N) pillar ids (padding/OOB → 0)
    starts: Array,       # (B, V+1) segment start offsets
    xbound: Tuple[float, float, float],
    ybound: Tuple[float, float, float],
    zbound: Tuple[float, float, float],
) -> Dict[str, Array]:
    """points_to_voxels for pillar-sorted input — identical outputs up to the
    point reordering (mean-pooled consumers are order-invariant).

    Segment reductions run as cumsum + boundary gathers instead of scatters.
    xyz sums use voxel-center-relative values to bound fp32 cumsum error.
    """
    b, n, _ = points_xyz.shape
    voxel_size = jnp.asarray([xbound[2], ybound[2], zbound[2]], points_xyz.dtype)
    grid_offset = jnp.asarray([xbound[0], ybound[0], zbound[0]], points_xyz.dtype)
    gx = int(round((xbound[1] - xbound[0]) / xbound[2]))
    gy = int(round((ybound[1] - ybound[0]) / ybound[2]))
    gz = int(round((zbound[1] - zbound[0]) / zbound[2]))
    grid_size = jnp.asarray([gx, gy, gz], jnp.int32)
    num_voxels = gx * gy * gz

    shifted = points_xyz - grid_offset
    voxel_xyz = shifted / voxel_size
    coords = _trunc_int(voxel_xyz)
    padding = (valid < 1.0) | jnp.any(
        (coords >= grid_size) | (coords < 0), axis=-1
    )
    voxel_centers = (coords.astype(points_xyz.dtype) + 0.5) * voxel_size + grid_offset

    # exact center of the ASSIGNED pillar (id), for bounded-error cumsum
    cz = ids % gz
    cy = (ids // gz) % gy
    cx = ids // (gy * gz)
    seg_center = (
        jnp.stack([cx, cy, cz], -1).astype(points_xyz.dtype) + 0.5
    ) * voxel_size + grid_offset
    rel = points_xyz - seg_center

    valid_f = 1.0 - padding.astype(points_xyz.dtype)
    payload = jnp.concatenate([valid_f[..., None], rel], axis=-1)  # (B,N,4)
    sums = jax.vmap(segment_sum_sorted)(payload, starts)           # (B,V,4)
    points_per_voxel = sums[..., 0]
    raw_counts = jnp.diff(starts, axis=-1).astype(points_xyz.dtype)

    cell_center = (
        jnp.stack(
            jnp.meshgrid(jnp.arange(gx), jnp.arange(gy), jnp.arange(gz),
                         indexing="ij"), axis=-1
        ).reshape(num_voxels, 3).astype(points_xyz.dtype) + 0.5
    ) * voxel_size + grid_offset
    voxel_centroids = jnp.where(
        (raw_counts > 0)[..., None],
        sums[..., 1:] / jnp.maximum(raw_counts, 1.0)[..., None]
        + cell_center[None],
        0.0,
    )

    table = jnp.concatenate(
        [points_per_voxel[..., None], voxel_centroids], axis=-1
    )
    g = jax.vmap(lambda t, i: t[i])(table, ids)  # row gather, see above
    voxel_point_count = g[..., 0]
    point_centroids = g[..., 1:]

    coords_masked = jnp.where(padding[..., None], 0, coords)
    return {
        "local_points_xyz": points_xyz - point_centroids,
        "shifted_points_xyz": shifted,
        "point_centroids": point_centroids,
        "points_xyz": points_xyz,
        "grid_offset": grid_offset,
        "voxel_coords": coords_masked,
        "voxel_centers": voxel_centers,
        "voxel_indices": ids,
        "voxel_paddings": padding.astype(points_xyz.dtype),
        "points_mask": valid_f,
        "num_voxels": num_voxels,
        "grid_size": grid_size,
        "grid_shape": (gx, gy, gz),
        "voxel_xyz": jnp.where(padding[..., None], 0.0, voxel_xyz),
        "voxel_size": voxel_size,
        "voxel_point_count": voxel_point_count,
        "points_per_voxel": points_per_voxel,
        "raw_counts": raw_counts,
        "segment_starts": starts,
    }


def scatter_mean_to_grid(
    features: Array, voxel_indices: Array, num_voxels: int,
    counts: Array | None = None,
) -> Array:
    """Mean-pool per-point features into voxels (pointpillar.py:203-207).

    Matches torch_scatter.scatter_mean semantics exactly: the denominator
    counts every point scattered to the voxel — padding included, since padded
    points carry index 0 (their features are already zeroed by the PointNet
    mask, pointpillar.py:124, but they still dilute voxel 0's mean).

    Args:
      features: (B, N, C) per-point features (padded rows zeroed).
      voxel_indices: (B, N) int32 pillar ids (padding → 0).
      num_voxels: static voxel count.
      counts: optional (B, V) precomputed all-points-per-voxel counts (the
        ``raw_counts`` from points_to_voxels) — passing them skips a second
        count scatter.

    Returns: (B, V, C).
    """
    b, n, c = features.shape

    if counts is None:
        payload = jnp.concatenate(
            [features, jnp.ones((b, n, 1), features.dtype)], axis=-1
        )
    else:
        payload = features

    def one(feat, idx):
        return jnp.zeros((num_voxels, feat.shape[-1]), feat.dtype).at[
            idx
        ].add(feat)

    acc = jax.vmap(one)(payload, voxel_indices)
    if counts is None:
        sums, cnt = acc[..., :c], acc[..., c]
    else:
        sums, cnt = acc, counts.astype(features.dtype)
    return sums / jnp.maximum(cnt, 1.0)[..., None]
