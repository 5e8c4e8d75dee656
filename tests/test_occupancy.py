"""Multi-sweep occupancy grid + correlative scan matcher tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import BEVConfig
from gloc3d_tpu.ops.bev import scan_to_bev
from gloc3d_tpu.ops.occupancy import (
    OccupancyGrid3D, ProbabilityGrid2D, insert_range_data, logit,
    project_to_bev,
)
from gloc3d_tpu.ops.scan_match import match_scan, max_pyramid, olson_angular_step


def _grid():
    return OccupancyGrid3D.create(resolution=0.2, extent_xy=10.0,
                                  z_min=-2.0, z_max=4.0)


def test_single_hit_probability():
    g = _grid()
    pts = jnp.asarray([[1.0, 1.0, 0.5]])
    g = insert_range_data(g, pts, jnp.ones(1))
    p = g.probabilities()
    # unknown + one hit -> p = 0.55 (odds update from unknown prior)
    assert abs(float(p.max()) - 0.55) < 1e-5
    assert int((p > 0).sum()) >= 1  # hit + some ray misses are known


def test_update_marker_dedupe_within_sweep():
    g = _grid()
    pts = jnp.tile(jnp.asarray([[2.0, 0.0, 0.0]]), (50, 1))
    g = insert_range_data(g, pts, jnp.ones(50))
    p = g.probabilities()
    assert abs(float(p.max()) - 0.55) < 1e-5  # 50 duplicate hits count once


def test_accumulation_across_sweeps_and_clamp():
    g = _grid()
    pts = jnp.asarray([[1.0, 0.0, 0.0]])
    for _ in range(3):
        g = insert_range_data(g, pts, jnp.ones(1))
    # 3 hits: log-odds = 3*logit(0.55) -> p = 0.647...
    expect = 1 / (1 + math.exp(-3 * logit(0.55)))
    assert abs(float(g.probabilities().max()) - expect) < 1e-4
    for _ in range(40):
        g = insert_range_data(g, pts, jnp.ones(1))
    assert abs(float(g.probabilities().max()) - 0.9) < 1e-5  # clamped


def test_miss_carves_free_space_with_hit_priority():
    g = _grid()
    # ray along +x to a hit at 4.0: last 2 free cells before it get misses
    pts = jnp.asarray([[4.0, 0.0, 0.0]])
    g = insert_range_data(g, pts, jnp.ones(1))
    p = np.asarray(g.probabilities())
    hx, hy, hz = g.half
    assert abs(p[hx + 20, hy, hz] - 0.55) < 1e-5       # hit cell
    assert abs(p[hx + 19, hy, hz] - 0.49) < 1e-5       # free-space sample
    assert abs(p[hx + 18, hy, hz] - 0.49) < 1e-5
    assert p[hx + 17, hy, hz] == 0.0                   # only last 2 updated
    # a second point hitting a free-space cell in the SAME sweep wins
    g2 = _grid()
    pts2 = jnp.asarray([[4.0, 0.0, 0.0], [3.8, 0.0, 0.0]])
    g2 = insert_range_data(g2, pts2, jnp.ones(2))
    p2 = np.asarray(g2.probabilities())
    assert abs(p2[hx + 19, hy, hz] - 0.55) < 1e-5      # hit beats miss


def test_projection_matches_fused_bev_kernel():
    """One sweep through the general grid == the fused single-scan kernel."""
    cfg = BEVConfig(image_size=64, max_points=512, max_range=9.0)
    rng = np.random.RandomState(0)
    pts = np.zeros((512, 3), np.float32)
    pts[:300, 0] = rng.uniform(-6, 6, 300)
    pts[:300, 1] = rng.uniform(-6, 6, 300)
    pts[:300, 2] = rng.uniform(0, 2, 300)
    mask = np.zeros(512, np.float32)
    mask[:300] = 1.0

    fused = scan_to_bev(jnp.asarray(pts), jnp.asarray(mask), cfg)

    g = _grid()
    g = insert_range_data(g, jnp.asarray(pts), jnp.asarray(mask),
                          max_range=cfg.max_range)
    img, origin = project_to_bev(g, cfg)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(fused.image))
    np.testing.assert_allclose(np.asarray(origin),
                               np.asarray(fused.origin_xy), atol=1e-5)


def test_probability_grid_2d_updates():
    g = ProbabilityGrid2D.create(32, 0.1)
    rows = jnp.asarray([3, 3, 5], jnp.int32)
    cols = jnp.asarray([4, 4, 6], jnp.int32)
    g = g.apply_odds(rows, cols, jnp.ones(3, bool), 0.55)
    p = np.asarray(g.probabilities())
    assert abs(p[3, 4] - 0.55) < 1e-5  # duplicate deduped
    assert abs(p[5, 6] - 0.55) < 1e-5
    assert p[0, 0] == 0.0


def test_max_pyramid():
    probs = jnp.zeros((16, 16)).at[5, 5].set(0.9)
    levels = max_pyramid(probs, (1, 2, 4))
    assert abs(float(levels[0][5, 5]) - 0.9) < 1e-6 and float(levels[0][4, 4]) == 0.0
    assert abs(float(levels[1][4, 4]) - 0.9) < 1e-6  # window (4..5, 4..5) contains peak
    assert abs(float(levels[2][2, 2]) - 0.9) < 1e-6
    assert float(levels[2][6, 6]) == 0.0  # window starts after the peak


def test_match_scan_recovers_pose():
    """Scan drawn from a map at a known (x, y, θ) offset is recovered."""
    rng = np.random.RandomState(1)
    size, res = 128, 0.2
    # map: occupied cells from wall segments
    img = np.ones((size, size), np.float32)  # free
    for _ in range(12):
        r0, c0 = rng.randint(10, size - 30, 2)
        length = rng.randint(10, 25)
        if rng.rand() < 0.5:
            img[r0, c0:c0 + length] = 0.0
        else:
            img[r0:r0 + length, c0] = 0.0
    origin = np.array([-size * res / 2, -size * res / 2], np.float32)
    grid = ProbabilityGrid2D.from_bev_image(jnp.asarray(img),
                                            jnp.asarray(origin), res)
    # scan points = metric coords of occupied cells, inverse-transformed
    rr, cc = np.nonzero(img == 0.0)
    map_pts = np.stack([origin[0] + cc * res, origin[1] + rr * res], 1)
    gt = np.array([1.4, -0.8, 0.5])
    c, s = np.cos(gt[2]), np.sin(gt[2])
    inv = np.stack([
        c * (map_pts[:, 0] - gt[0]) + s * (map_pts[:, 1] - gt[1]),
        -s * (map_pts[:, 0] - gt[0]) + c * (map_pts[:, 1] - gt[1]),
    ], 1)
    step = olson_angular_step(res, float(np.abs(inv).max()))
    n_rot = int(2 * np.pi / step) + 1  # full Olson angular resolution
    res_m = match_scan(grid, jnp.asarray(inv), jnp.ones(len(inv)),
                       num_rotations=min(n_rot, 1024))
    pose = np.asarray(res_m.pose)
    dyaw = np.arctan2(np.sin(pose[2] - gt[2]), np.cos(pose[2] - gt[2]))
    assert abs(dyaw) < 0.05, pose
    assert abs(pose[0] - gt[0]) < 2 * res and abs(pose[1] - gt[1]) < 2 * res
    assert float(res_m.score) > 0.7


def test_submap3d_dual_resolution():
    """Submap3D feeds both grids per sweep (submap_3d.cpp:162-176): the
    high-res grid equals a standalone insert at cfg.resolution, the low-res
    grid runs at cfg.low_resolution."""
    import jax.numpy as jnp

    from gloc3d_tpu.config import BEVConfig
    from gloc3d_tpu.ops.occupancy import (
        OccupancyGrid3D, Submap3D, insert_range_data,
    )

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-8, 8, (512, 3)).astype(np.float32))
    mask = jnp.ones(512)
    cfg = BEVConfig(resolution=0.2, low_resolution=0.5, z_min=-10.0,
                    z_max=10.0)

    sm = Submap3D.create(cfg, extent_xy=10.0)
    assert sm.high.resolution == 0.2 and sm.low.resolution == 0.5
    sm = sm.insert(pts, mask, cfg=cfg)
    sm = sm.insert(pts + 0.1, mask, cfg=cfg)
    assert sm.num_range_data == 2

    ref = OccupancyGrid3D.create(0.2, 10.0, cfg.z_min, cfg.z_max)
    ref = insert_range_data(ref, pts, mask,
                            hit_probability=cfg.hit_probability,
                            miss_probability=cfg.miss_probability,
                            max_range=cfg.max_range,
                            num_free_space_voxels=cfg.num_free_space_voxels)
    ref = insert_range_data(ref, pts + 0.1, mask,
                            hit_probability=cfg.hit_probability,
                            miss_probability=cfg.miss_probability,
                            max_range=cfg.max_range,
                            num_free_space_voxels=cfg.num_free_space_voxels)
    np.testing.assert_allclose(np.asarray(sm.high.log_odds),
                               np.asarray(ref.log_odds), atol=1e-6)
    # the low grid actually accumulated structure
    assert bool(np.asarray(sm.low.known).any())

    img_hi, org_hi = sm.project(cfg.replace(image_size=128))
    img_lo, org_lo = sm.project(cfg.replace(image_size=128),
                                use_low_resolution=True)
    assert img_hi.shape == img_lo.shape == (128, 128)
    # low-res projection covers the same structure with coarser cells
    assert float((np.asarray(img_lo) < 0.5).sum()) > 0


def test_insert_matches_numpy_reference_randomized():
    """The one-sort/two-scatter insert must equal a brute-force numpy model
    of the reference semantics (per-sweep dedupe, hit priority over misses,
    truncated-div ray samples, clamp) on a random cloud with duplicates."""
    res, ext = 0.2, 10.0
    g = OccupancyGrid3D.create(resolution=res, extent_xy=ext,
                               z_min=-2.0, z_max=4.0)
    hx, hy, hz = g.half
    nx, ny, nz = g.log_odds.shape
    rng = np.random.RandomState(7)
    n = 4096
    pts = rng.uniform(-11, 11, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 4.5, n)
    pts[n // 2:] = pts[: n // 2] + rng.choice(
        [0.0, 0.01], (n - n // 2, 3)).astype(np.float32)  # force duplicates
    mask = (rng.uniform(size=n) > 0.1).astype(np.float32)

    out = jax.jit(lambda gr, p, m: insert_range_data(gr, p, m))(
        g, jnp.asarray(pts), jnp.asarray(mask))

    # numpy reference
    def cells_of(p):
        return np.where(p >= 0, np.floor(p / res + 0.5),
                        np.ceil(p / res - 0.5)).astype(np.int64)

    valid = (mask > 0) & (np.linalg.norm(pts, axis=-1) <= 100.0)
    cell = cells_of(pts)
    ix, iy, iz = cell[:, 0] + hx, cell[:, 1] + hy, cell[:, 2] + hz
    inb = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
           & (iz >= 0) & (iz < nz))
    hit_ids = set(
        (int(a) * ny + int(b)) * nz + int(c)
        for a, b, c, ok in zip(ix, iy, iz, valid & inb) if ok)
    miss_ids = set()
    nsamp = np.abs(cell).max(axis=1)
    for k in (1, 2):
        pos = nsamp - k
        prod = cell * pos[:, None]
        q = np.sign(prod) * (np.abs(prod) // np.maximum(nsamp, 1)[:, None])
        mc = q.astype(np.int64)
        mx, my, mz = mc[:, 0] + hx, mc[:, 1] + hy, mc[:, 2] + hz
        minb = ((mx >= 0) & (mx < nx) & (my >= 0) & (my < ny)
                & (mz >= 0) & (mz < nz))
        for a, b, c, ok in zip(mx, my, mz, (pos >= 0) & valid & inb & minb):
            if ok:
                fid = (int(a) * ny + int(b)) * nz + int(c)
                if fid not in hit_ids:
                    miss_ids.add(fid)
    lo = np.zeros(nx * ny * nz, np.float32)
    for fid in hit_ids:
        lo[fid] += logit(0.55)
    for fid in miss_ids:
        lo[fid] += logit(0.49)
    lo = np.clip(lo, logit(0.1), logit(0.9))
    known = np.zeros(nx * ny * nz, bool)
    for fid in hit_ids | miss_ids:
        known[fid] = True

    np.testing.assert_allclose(
        np.asarray(out.log_odds).reshape(-1), lo, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(out.known).reshape(-1), known)
