"""Voxelizer tests vs a literal numpy transcription of voxel.py semantics."""

import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.ops.voxelize import pad_or_trim, points_to_voxels, scatter_mean_to_grid

XB = (-35.0, 35.0, 0.5)
YB = (-20.0, 20.0, 0.5)
ZB = (-10.0, 10.0, 20.0)


def golden_points_to_voxels(points, mask, xb, yb, zb):
    """Direct numpy transcription of the reference (voxel.py:23-133)."""
    b, n, _ = points.shape
    vsize = np.array([xb[2], yb[2], zb[2]])
    gsize = np.array(
        [(xb[1] - xb[0]) / xb[2], (yb[1] - yb[0]) / yb[2], (zb[1] - zb[0]) / zb[2]]
    ).astype("int32")
    offset = np.array([xb[0], yb[0], zb[0]])
    nv = int(gsize.prod())

    shifted = points - offset
    vxyz = shifted / vsize
    coords = vxyz.astype(np.int32)  # trunc toward zero, like torch .int()
    pad = (mask < 1.0) | np.any((coords >= gsize) | (coords < 0), axis=-1)
    idx = coords[..., 0] * gsize[1] * gsize[2] + coords[..., 1] * gsize[2] + coords[..., 2]
    idx = np.where(pad, 0, idx)
    centers = (coords + 0.5) * vsize + offset  # pre-zeroing, voxel.py:73
    coords = np.where(pad[..., None], 0, coords)

    ppv = np.zeros((b, nv))
    raw_cnt = np.zeros((b, nv))
    sums = np.zeros((b, nv, 3))
    for bi in range(b):
        for i in range(n):
            ppv[bi, idx[bi, i]] += 0.0 if pad[bi, i] else 1.0
            raw_cnt[bi, idx[bi, i]] += 1.0  # scatter_mean counts everything
            sums[bi, idx[bi, i]] += points[bi, i]
    centroids = sums / np.maximum(raw_cnt, 1)[..., None]
    vpc = np.take_along_axis(ppv, idx, axis=1)
    point_centroids = np.stack(
        [centroids[bi, idx[bi]] for bi in range(b)], axis=0
    )
    return {
        "voxel_indices": idx,
        "voxel_paddings": pad.astype(np.float32),
        "points_per_voxel": ppv,
        "voxel_point_count": vpc,
        "point_centroids": point_centroids,
        "local_points_xyz": points - point_centroids,
        "voxel_centers": centers,
        "num_voxels": nv,
    }


def _rand_scan(seed, b=2, n=512):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-45, 45, size=(b, n, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-15, 15, size=(b, n)).astype(np.float32)
    mask = (rng.uniform(size=(b, n)) > 0.1).astype(np.float32)
    return pts, mask


def test_matches_golden():
    pts, mask = _rand_scan(0)
    out = points_to_voxels(jnp.asarray(pts), jnp.asarray(mask), XB, YB, ZB)
    gold = golden_points_to_voxels(pts.astype(np.float64), mask, XB, YB, ZB)

    np.testing.assert_array_equal(np.asarray(out["voxel_indices"]), gold["voxel_indices"])
    np.testing.assert_array_equal(np.asarray(out["voxel_paddings"]), gold["voxel_paddings"])
    np.testing.assert_allclose(np.asarray(out["points_per_voxel"]), gold["points_per_voxel"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["voxel_point_count"]), gold["voxel_point_count"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["point_centroids"]), gold["point_centroids"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["local_points_xyz"]), gold["local_points_xyz"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["voxel_centers"]), gold["voxel_centers"], atol=1e-4)
    assert out["num_voxels"] == gold["num_voxels"] == 140 * 80 * 1


def test_single_voxel_stats():
    # 3 points in one voxel, 1 padded -> count 3, centroid = mean
    pts = np.zeros((1, 4, 3), np.float32)
    pts[0, :3] = [[0.1, 0.1, 0.0], [0.2, 0.1, 0.0], [0.1, 0.2, 0.0]]
    pts[0, 3] = [0.1, 0.1, 0.0]
    mask = np.array([[1.0, 1.0, 1.0, 0.0]], np.float32)
    out = points_to_voxels(jnp.asarray(pts), jnp.asarray(mask), XB, YB, ZB)
    i0 = int(out["voxel_indices"][0, 0])
    assert (np.asarray(out["voxel_indices"][0, :3]) == i0).all()
    assert int(out["voxel_indices"][0, 3]) == 0  # padded -> voxel 0
    assert float(out["points_per_voxel"][0, i0]) == 3.0
    assert float(out["voxel_point_count"][0, 0]) == 3.0


def test_out_of_bounds_masked():
    pts = np.array([[[100.0, 0.0, 0.0], [0.0, 0.0, 0.0]]], np.float32)
    mask = np.ones((1, 2), np.float32)
    out = points_to_voxels(jnp.asarray(pts), jnp.asarray(mask), XB, YB, ZB)
    assert float(out["voxel_paddings"][0, 0]) == 1.0
    assert float(out["voxel_paddings"][0, 1]) == 0.0


def test_scatter_mean_matches_manual():
    b, n, c, nv = 1, 6, 4, 8
    rng = np.random.RandomState(1)
    feats = rng.randn(b, n, c).astype(np.float32)
    idx = np.array([[0, 0, 1, 3, 3, 3]], np.int32)
    out = scatter_mean_to_grid(jnp.asarray(feats), jnp.asarray(idx), nv)
    np.testing.assert_allclose(np.asarray(out[0, 0]), feats[0, :2].mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[0, 1]), feats[0, 2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[0, 3]), feats[0, 3:].mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[0, 2]), 0.0, atol=1e-6)


def test_pad_or_trim():
    x = np.ones((3, 4), np.float32)
    out = pad_or_trim(x, 5)
    assert out.shape == (5, 4)
    assert (out[3:] == 0).all()
    out2 = pad_or_trim(np.ones((7, 4), np.float32), 5)
    assert out2.shape == (5, 4)


def test_device_pillar_sort_stats_matches_scatter_path():
    """device_pillar_sort_stats (packed-key sort + cumsum segment sums) must
    reproduce the scatter path's per-pillar statistics: raw counts, valid
    counts, centroids (incl. the voxel-0 padding pollution), and a stable
    original-order permutation within each pillar."""
    import jax

    from gloc3d_tpu.ops.voxelize import device_pillar_sort_stats

    rng = np.random.RandomState(3)
    n = 2048
    pts = np.zeros((n, 4), np.float32)
    pts[:1500, 0] = rng.uniform(-36, 36, 1500)  # some OOB rows
    pts[:1500, 1] = rng.uniform(-21, 21, 1500)
    pts[:1500, 2] = rng.uniform(-2, 5, 1500)
    pts[:1500, 3] = rng.uniform(0, 1, 1500)
    mask = np.zeros((n,), np.float32)
    mask[:1500] = 1.0

    ref = points_to_voxels(
        jnp.asarray(pts[None, :, :3]), jnp.asarray(mask[None]), XB, YB, ZB)
    ps, vs, ids, starts, rc, cent = jax.jit(
        lambda p, m: device_pillar_sort_stats(p, m, XB, YB, ZB)
    )(jnp.asarray(pts), jnp.asarray(mask))

    np.testing.assert_array_equal(np.asarray(rc),
                                  np.asarray(ref["raw_counts"][0]))
    np.testing.assert_allclose(
        np.asarray(cent), _scatter_centroids(pts, mask), atol=1e-4)
    # ids sorted ascending; stable within pillar (original order kept)
    sids = np.asarray(ids)
    assert (np.diff(sids) >= 0).all()
    # permutation check: sorted rows are exactly the input rows
    order = np.argsort(
        np.where((mask < 1.0)
                 | _oob(pts), 0, _ids_np(pts)).astype(np.int64), kind="stable")
    np.testing.assert_array_equal(np.asarray(ps), pts[order])
    np.testing.assert_array_equal(np.asarray(vs), mask[order])
    # starts consistent with counts
    np.testing.assert_array_equal(np.diff(np.asarray(starts)),
                                  np.asarray(rc).astype(np.int64))


def _ids_np(pts):
    gsize = np.array([140, 80, 1])
    coords = ((pts[:, :3] - np.array([XB[0], YB[0], ZB[0]], np.float32))
              / np.array([XB[2], YB[2], ZB[2]], np.float32)).astype(np.int32)
    return (coords[:, 0] * gsize[1] * gsize[2]
            + coords[:, 1] * gsize[2] + coords[:, 2])


def _oob(pts):
    gsize = np.array([140, 80, 1])
    coords = ((pts[:, :3] - np.array([XB[0], YB[0], ZB[0]], np.float32))
              / np.array([XB[2], YB[2], ZB[2]], np.float32)).astype(np.int32)
    return ((coords < 0) | (coords >= gsize)).any(1)


def _scatter_centroids(pts, mask):
    """Centroids per the scatter path: mean of raw xyz over ALL rows binned
    to each pillar (padding rows alias pillar 0 — intentional parity)."""
    ids = np.where((mask < 1.0) | _oob(pts), 0, _ids_np(pts))
    nv = 140 * 80
    acc = np.zeros((nv, 3), np.float64)
    cnt = np.zeros((nv,), np.float64)
    np.add.at(acc, ids, pts[:, :3].astype(np.float64))
    np.add.at(cnt, ids, 1.0)
    return (acc / np.maximum(cnt, 1.0)[:, None]).astype(np.float32)
