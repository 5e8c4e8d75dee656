"""Host-precomputed voxel-stats fast path: the native/numpy per-pillar
counts+centroids plus points_to_voxels_hoststats must reproduce the
scatter-based points_to_voxels outputs, and the model descriptor through the
voxel_stats serving path must match the default path."""

import jax
import jax.numpy as jnp
import numpy as np

import gloc3d_tpu.data.native as native
from gloc3d_tpu.data.native import (
    compute_voxel_stats_host, load_scan_batch_voxel_stats,
)
from gloc3d_tpu.models.pointpillar import PointPillar
from gloc3d_tpu.ops.voxelize import points_to_voxels, points_to_voxels_hoststats

XB, YB, ZB = (-10.0, 10.0, 0.5), (-6.0, 6.0, 0.5), (-10.0, 10.0, 20.0)


def _scan(seed=0, b=2, n=512, n_real=420):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, n, 4), np.float32)
    pts[:, :n_real, 0] = rng.uniform(-12, 12, (b, n_real))  # some OOB
    pts[:, :n_real, 1] = rng.uniform(-7, 7, (b, n_real))
    pts[:, :n_real, 2] = rng.uniform(0, 3, (b, n_real))
    pts[:, :n_real, 3] = rng.uniform(0, 1, (b, n_real))
    counts = np.full(b, n_real, np.int64)
    return pts, counts


def _mask(pts, counts):
    return (np.arange(pts.shape[1])[None] < counts[:, None]).astype(np.float32)


def test_native_matches_numpy_fallback(monkeypatch):
    pts, counts = _scan()
    got_native = compute_voxel_stats_host(pts, counts, XB, YB, ZB)
    monkeypatch.setattr(native, "_load_library", lambda: None)
    got_numpy = compute_voxel_stats_host(pts, counts, XB, YB, ZB)
    for a, b in zip(got_native, got_numpy):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_hoststats_matches_scatter_voxelize():
    pts, counts = _scan(seed=1)
    mask = _mask(pts, counts)
    ref = points_to_voxels(jnp.asarray(pts[..., :3]), jnp.asarray(mask),
                           XB, YB, ZB)
    h_p, h_v, h_i, h_c, h_g = compute_voxel_stats_host(
        pts, counts, XB, YB, ZB, crop=False,
    )
    # without cropping the row layout is unchanged
    np.testing.assert_allclose(h_p, pts)
    got = points_to_voxels_hoststats(
        jnp.asarray(h_p[..., :3]), jnp.asarray(h_v), jnp.asarray(h_i),
        jnp.asarray(h_c), jnp.asarray(h_g), XB, YB, ZB,
    )
    np.testing.assert_array_equal(np.asarray(got["voxel_indices"]),
                                  np.asarray(ref["voxel_indices"]))
    np.testing.assert_array_equal(np.asarray(got["points_mask"]),
                                  np.asarray(ref["points_mask"]))
    np.testing.assert_array_equal(np.asarray(got["raw_counts"]),
                                  np.asarray(ref["raw_counts"]))
    np.testing.assert_array_equal(np.asarray(got["points_per_voxel"]),
                                  np.asarray(ref["points_per_voxel"]))
    for key in ("voxel_point_count", "point_centroids", "local_points_xyz",
                "voxel_centers", "voxel_coords"):
        np.testing.assert_allclose(np.asarray(got[key]), np.asarray(ref[key]),
                                   atol=1e-5, err_msg=key)


def test_model_voxel_stats_path_matches_default():
    pts, counts = _scan(seed=2)
    mask = _mask(pts, counts)
    model = PointPillar(xbound=XB, ybound=YB, zbound=ZB,
                        compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                        jnp.asarray(mask))
    want = model.apply(params, jnp.asarray(pts), jnp.asarray(mask),
                       mode="vlad")
    h_p, h_v, h_i, h_c, h_g = compute_voxel_stats_host(
        pts, counts, XB, YB, ZB, crop=False,
    )
    got = model.apply(
        params, jnp.asarray(h_p), jnp.asarray(h_v), mode="vlad",
        voxel_stats=(jnp.asarray(h_i), jnp.asarray(h_c), jnp.asarray(h_g)),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_crop_keeps_exactly_the_valid_set():
    pts, counts = _scan(seed=3)
    mask = _mask(pts, counts)
    ref = points_to_voxels(jnp.asarray(pts[..., :3]), jnp.asarray(mask),
                           XB, YB, ZB)
    n_valid = np.asarray(ref["points_mask"]).sum(axis=1)
    h_p, h_v, h_i, h_c, h_g = compute_voxel_stats_host(
        pts, counts, XB, YB, ZB, crop=True,
    )
    np.testing.assert_array_equal(h_v.sum(axis=1), n_valid)
    # every kept point is in the voxelizer-valid set
    got = points_to_voxels_hoststats(
        jnp.asarray(h_p[..., :3]), jnp.asarray(h_v), jnp.asarray(h_i),
        jnp.asarray(h_c), jnp.asarray(h_g), XB, YB, ZB,
    )
    np.testing.assert_array_equal(np.asarray(got["points_mask"]), h_v)
    # non-zero pillars are untouched by cropping: counts and centroids match
    # the scatter path exactly (only pillar 0 may deviate)
    np.testing.assert_array_equal(np.asarray(got["points_per_voxel"])[:, 1:],
                                  np.asarray(ref["points_per_voxel"])[:, 1:])
    num_voxels = int(ref["num_voxels"])
    ref_sums = jax.vmap(
        lambda p, i: jnp.zeros((num_voxels, 3)).at[i].add(p)
    )(jnp.asarray(pts[..., :3]),
      jnp.asarray(np.asarray(ref["voxel_indices"])))
    ref_centroids = np.asarray(ref_sums) / np.maximum(
        np.asarray(ref["raw_counts"]), 1.0)[..., None]
    np.testing.assert_allclose(h_g[:, 1:], ref_centroids[:, 1:], atol=1e-5)


def test_crop_budget_smaller_than_input():
    pts, counts = _scan(seed=4)
    budget = 300  # < 420 valid rows: first-300 kept, rest dropped
    h_p, h_v, h_i, h_c, h_g = compute_voxel_stats_host(
        pts, counts, XB, YB, ZB, crop=True, max_points=budget,
    )
    assert h_p.shape == (2, budget, 4)
    assert (h_v.sum(axis=1) <= budget).all()
    # counts include the pad rows at pillar 0
    np.testing.assert_allclose(h_c.sum(axis=1), budget)


def test_file_loader_matches_array_path(tmp_path):
    pts, counts = _scan(seed=5)
    paths = []
    for i in range(pts.shape[0]):
        p = str(tmp_path / f"{i}.bin")
        pts[i, : counts[i]].astype(np.float32).tofile(p)
        paths.append(p)
    got = load_scan_batch_voxel_stats(
        paths, "kitti", XB, YB, ZB, max_points=pts.shape[1], crop=True,
    )
    want = compute_voxel_stats_host(pts, counts, XB, YB, ZB, crop=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_model_sorted_stats_path_matches_default():
    """4-tuple voxel_stats (with starts): pillar-sorted input + Pallas
    segment-sum must reproduce the default scatter path (mean pooling is
    order-invariant; fp reassociation only)."""
    from gloc3d_tpu.data.native import compute_voxel_stats_host_sorted

    pts, counts = _scan(seed=4)
    mask = _mask(pts, counts)
    model = PointPillar(xbound=XB, ybound=YB, zbound=ZB,
                        compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                        jnp.asarray(mask))
    want = model.apply(params, jnp.asarray(pts), jnp.asarray(mask),
                       mode="vlad")
    s_p, s_v, s_i, s_c, s_g, s_s = compute_voxel_stats_host_sorted(
        pts, counts, XB, YB, ZB, crop=False,
    )
    got = model.apply(
        params, jnp.asarray(s_p), jnp.asarray(s_v), mode="vlad",
        voxel_stats=(jnp.asarray(s_i), jnp.asarray(s_c), jnp.asarray(s_g),
                     jnp.asarray(s_s)),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-3)


def test_sorted_stats_native_matches_numpy():
    """compute_voxel_stats_sorted (C counting sort) must equal the numpy
    stats+stable-argsort fallback bit for bit."""
    from gloc3d_tpu.data import native as nat

    pts, counts = _scan(seed=5)
    if nat._load_library() is None or not hasattr(
            nat._load_library(), "compute_voxel_stats_sorted"):
        import pytest
        pytest.skip("native library unavailable")
    got = nat.compute_voxel_stats_host_sorted(pts, counts, XB, YB, ZB,
                                              crop=True)
    # force the numpy fallback
    lib, nat._lib = nat._lib, None
    failed = nat._lib_failed
    nat._lib_failed = True
    try:
        want = nat.compute_voxel_stats_host_sorted(pts, counts, XB, YB, ZB,
                                                   crop=True)
    finally:
        nat._lib, nat._lib_failed = lib, failed
    for g, w, name in zip(got, want,
                          ("points", "valid", "ids", "counts", "centroids",
                           "starts")):
        np.testing.assert_array_equal(g, w, err_msg=name)


def test_per_point_stats_match_device_gather():
    """5-tuple voxel_stats (host-gathered per-point table): the descriptor
    must be BIT-IDENTICAL to the 4-tuple path (the pp rows are fp32 copies
    of the very table rows the device gather reads)."""
    from gloc3d_tpu.data.native import compute_voxel_stats_host_sorted

    pts, counts = _scan(seed=6)
    model = PointPillar(xbound=XB, ybound=YB, zbound=ZB,
                        compute_dtype=jnp.float32)
    s_p, s_v, s_i, s_c, s_g, s_s, s_pp = compute_voxel_stats_host_sorted(
        pts, counts, XB, YB, ZB, crop=False, per_point=True,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(s_p),
                        jnp.asarray(s_v))
    base = (jnp.asarray(s_i), jnp.asarray(s_c), jnp.asarray(s_g),
            jnp.asarray(s_s))
    want = model.apply(params, jnp.asarray(s_p), jnp.asarray(s_v),
                       mode="vlad", voxel_stats=base)
    got = model.apply(params, jnp.asarray(s_p), jnp.asarray(s_v),
                      mode="vlad", voxel_stats=base + (jnp.asarray(s_pp),))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_per_point_stats_native_matches_numpy():
    """compute_voxel_stats_sorted_pp (C emission) must equal the numpy
    per_point_stats_table fallback bit for bit, crop on and off."""
    from gloc3d_tpu.data import native as nat

    lib = nat._load_library()
    if lib is None or not hasattr(lib, "compute_voxel_stats_sorted_pp"):
        import pytest
        pytest.skip("native library unavailable")
    pts, counts = _scan(seed=7)
    # push some points out of bounds so crop=False exercises the OOB →
    # pillar-0 aliasing in the valid-count column
    pts[0, :40, 0] = 99.0
    for crop in (True, False):
        got = nat.compute_voxel_stats_host_sorted(
            pts, counts, XB, YB, ZB, crop=crop, per_point=True)
        want_pp = nat.per_point_stats_table(
            got[0], got[1], got[2], got[3], got[4], XB, YB, ZB)
        np.testing.assert_array_equal(got[6], want_pp,
                                      err_msg=f"crop={crop}")
