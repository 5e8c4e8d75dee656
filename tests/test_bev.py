"""BEV projection tests vs a literal transcription of the C++ pipeline.

The golden model replays, in numpy, exactly what the reference does per scan:
hit-cell insertion with update-marker dedupe (range_data_inserter_3d.cpp),
p≥0.501 filtering + yaw-free projection + probability_sum binarization
(submap_3d.cpp:238-326), and the center crop/pad to 768² with 255 fill
(loop_detector.cpp:83-106).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import BEVConfig
from gloc3d_tpu.core.transforms import quat_from_rpy
from gloc3d_tpu.ops.bev import batch_scan_to_bev, scan_to_bev

CFG = BEVConfig(image_size=256, max_points=4096)


def golden_bev(points, size, res=0.2, max_range=100.0, rot=None):
    """Literal numpy transcription of the reference single-scan pipeline."""
    def rnd(x):
        return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(int)

    pts = points[np.linalg.norm(points, axis=1) <= max_range]
    cells = {tuple(c) for c in rnd(pts / res)}  # hit cells, deduped (update marker)
    # project: p = 0.55 each; prob_sum > 0.9 -> occupied
    cols = {}
    if rot is None:
        rot = np.eye(3)
    for c in cells:
        center = np.array(c, float) * res
        p = rnd(rot @ center / res)
        cols[(p[0], p[1])] = cols.get((p[0], p[1]), 0) + 1
    occ = [k for k, v in cols.items() if v * 0.55 > 0.9]
    all_px = list(cols.keys())
    min_x = min(p[0] for p in all_px)
    max_x = max(p[0] for p in all_px)
    min_y = min(p[1] for p in all_px)
    max_y = max(p[1] for p in all_px)
    w, h = max_x - min_x + 1, max_y - min_y + 1
    src = np.full((h, w), 255, np.uint8)  # rows=y, cols=x
    for x, y in occ:
        src[y - min_y, x - min_x] = 0
    # crop_pad_occupancy: center crop/pad with 255 fill
    dst = np.full((size, size), 255, np.uint8)
    cw, ch = min(w, size), min(h, size)
    i_left, i_top = (w - cw) // 2, (h - ch) // 2
    o_left, o_top = (size - cw) // 2, (size - ch) // 2
    dst[o_top:o_top + ch, o_left:o_left + cw] = src[i_top:i_top + ch, i_left:i_left + cw]
    return dst.astype(np.float32) / 255.0


def _pad(pts, n=CFG.max_points):
    out = np.zeros((n, 3), np.float32)
    out[: len(pts)] = pts
    mask = np.zeros((n,), np.float32)
    mask[: len(pts)] = 1.0
    return out, mask


def _rand_cloud(seed, n=2000, spread=20.0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 3, size=n).astype(np.float32)
    return pts


def test_matches_golden_random_cloud():
    pts = _rand_cloud(0)
    padded, mask = _pad(pts)
    out = scan_to_bev(jnp.asarray(padded), jnp.asarray(mask), CFG)
    gold = golden_bev(pts.astype(np.float64), CFG.image_size)
    np.testing.assert_array_equal(np.asarray(out.image), gold)
    assert int(out.num_occupied) == int((gold == 0).sum())


def test_matches_golden_with_rotation():
    from gloc3d_tpu.core.transforms import quat_to_matrix, remove_yaw

    pts = _rand_cloud(1)
    padded, mask = _pad(pts)
    q = quat_from_rpy(jnp.float32(0.04), jnp.float32(-0.03), jnp.float32(0.9))
    out = scan_to_bev(jnp.asarray(padded), jnp.asarray(mask), CFG, align_rotation=q)
    rot = np.asarray(quat_to_matrix(remove_yaw(q)), np.float64)
    gold = golden_bev(pts.astype(np.float64), CFG.image_size, rot=rot)
    # rounding at fp32 vs fp64 can flip borderline cells; allow tiny mismatch
    mismatch = (np.asarray(out.image) != gold).mean()
    assert mismatch < 0.001, f"mismatch fraction {mismatch}"


def test_two_stacked_voxels_make_occupied_pixel():
    # One voxel in a column -> free; two distinct z-voxels -> occupied.
    pts = np.array([[5.0, 5.0, 0.0], [5.0, 5.0, 1.0]], np.float32)
    padded, mask = _pad(pts)
    out = scan_to_bev(jnp.asarray(padded), jnp.asarray(mask), CFG)
    assert int(out.num_occupied) == 1
    single = np.array([[5.0, 5.0, 0.0]], np.float32)
    padded, mask = _pad(single)
    out1 = scan_to_bev(jnp.asarray(padded), jnp.asarray(mask), CFG)
    assert int(out1.num_occupied) == 0


def test_duplicate_points_dedupe():
    # Many points in the SAME voxel count once (update marker semantics).
    pts = np.tile(np.array([[3.0, 3.0, 0.05]], np.float32), (100, 1))
    pts += np.random.RandomState(2).uniform(-0.05, 0.05, pts.shape).astype(np.float32)
    padded, mask = _pad(pts)
    out = scan_to_bev(jnp.asarray(padded), jnp.asarray(mask), CFG)
    assert int(out.num_occupied) == 0  # all in one voxel -> prob_sum 0.55


def test_origin_maps_pixels_to_metric():
    # A known occupied column must appear at metric coords given origin_xy.
    pts = np.array(
        [[8.0, -4.0, 0.0], [8.0, -4.0, 1.0], [0.0, 0.0, 0.0], [-6.0, 7.0, 0.5],
         [-6.0, 7.0, 1.5]], np.float32
    )
    padded, mask = _pad(pts)
    out = scan_to_bev(jnp.asarray(padded), jnp.asarray(mask), CFG)
    img = np.asarray(out.image)
    rows, cols = np.nonzero(img == 0.0)
    ox, oy = np.asarray(out.origin_xy)
    res = float(out.resolution)
    metric = {(round(ox + c * res, 1), round(oy + r * res, 1)) for r, c in zip(rows, cols)}
    assert (8.0, -4.0) in metric
    assert (-6.0, 7.0) in metric


def test_max_range_filter():
    pts = np.array([[150.0, 0.0, 0.0], [150.0, 0.0, 1.0]], np.float32)
    padded, mask = _pad(pts)
    out = scan_to_bev(jnp.asarray(padded), jnp.asarray(mask), CFG)
    assert int(out.num_occupied) == 0


def test_batch_and_jit():
    pts = np.stack([_rand_cloud(3), _rand_cloud(4)])
    padded = np.zeros((2, CFG.max_points, 3), np.float32)
    masks = np.zeros((2, CFG.max_points), np.float32)
    for i in range(2):
        padded[i], masks[i] = _pad(pts[i])
    fn = jax.jit(lambda p, m: batch_scan_to_bev(p, m, CFG))
    out = fn(jnp.asarray(padded), jnp.asarray(masks))
    assert out.image.shape == (2, CFG.image_size, CFG.image_size)
    for i in range(2):
        gold = golden_bev(pts[i].astype(np.float64), CFG.image_size)
        np.testing.assert_array_equal(np.asarray(out.image[i]), gold)


def test_host_bev_matches_device():
    """compute_bev_host (native C++ and numpy fallback) must reproduce
    scan_to_bev exactly — image, origin, and count (no ground alignment)."""
    import jax

    from gloc3d_tpu.data import native as nat
    from gloc3d_tpu.data.native import compute_bev_host

    cfg = BEVConfig(image_size=256, max_points=4096)
    rng = np.random.RandomState(5)
    b = 3
    pts = np.zeros((b, 4096, 4), np.float32)
    counts = np.zeros((b,), np.int64)
    for i in range(b):
        n = rng.randint(1500, 3500)
        pts[i, :n, 0] = rng.uniform(-90, 90, n)
        pts[i, :n, 1] = rng.uniform(-90, 90, n)
        pts[i, :n, 2] = rng.uniform(-3, 6, n)
        counts[i] = n
    masks = (np.arange(4096)[None] < counts[:, None]).astype(np.float32)
    dev = jax.jit(jax.vmap(lambda p, m: scan_to_bev(p, m, cfg)))(
        jnp.asarray(pts[..., :3]), jnp.asarray(masks))

    for force_numpy in (False, True):
        if force_numpy:
            lib, nat._lib = nat._lib, None
            failed = nat._lib_failed
            nat._lib_failed = True
        try:
            imgs, origins, nocc = compute_bev_host(pts, counts, cfg)
        finally:
            if force_numpy:
                nat._lib, nat._lib_failed = lib, failed
        label = "numpy" if force_numpy else "native"
        np.testing.assert_array_equal(
            imgs, np.asarray(dev.image), err_msg=f"{label} image")
        np.testing.assert_allclose(
            origins, np.asarray(dev.origin_xy), atol=1e-6,
            err_msg=f"{label} origin")
        np.testing.assert_array_equal(
            nocc, np.asarray(dev.num_occupied), err_msg=f"{label} count")


def test_fast_path_matches_rotated_identity():
    """The no-rotation FAST path (single-key sort + arithmetic decode) must
    equal the general path bit-for-bit; rotating by the identity quaternion
    forces the general sort+gather+fp-projection code on the same input."""
    rng = np.random.RandomState(11)
    n = 4096
    pts = np.zeros((n, 3), np.float32)
    pts[:3000] = rng.uniform(-40, 40, (3000, 3)).astype(np.float32)
    pts[:3000, 2] = rng.uniform(-2, 6, 3000)
    mask = np.zeros((n,), np.float32)
    mask[:3000] = 1.0
    qid = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    fast = jax.jit(lambda p, m: scan_to_bev(p, m, CFG))(
        jnp.asarray(pts), jnp.asarray(mask))
    slow = jax.jit(lambda p, m: scan_to_bev(p, m, CFG, qid))(
        jnp.asarray(pts), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(fast.image),
                                  np.asarray(slow.image))
    np.testing.assert_allclose(np.asarray(fast.origin_xy),
                               np.asarray(slow.origin_xy), atol=1e-6)
    assert int(fast.num_occupied) == int(slow.num_occupied)
