"""match_scan_fast: coarse-to-fine MatchFullSubmap equals the exhaustive FFT.

The fast path mirrors the reference's admissible-bound pruning
(fast_correlative_scan_matcher_2d.cpp:112-246) with a batched coarse FFT +
top-K expansion; these tests pin that it returns the SAME optimum as the
exhaustive ``match_scan`` (which is itself the BnB optimum by construction).
"""

import numpy as np
import jax.numpy as jnp

from gloc3d_tpu.ops.occupancy import ProbabilityGrid2D
from gloc3d_tpu.ops.scan_match import match_scan, match_scan_fast


def _random_grid_and_scan(seed, size=96, res=0.25, n_walls=10):
    rng = np.random.RandomState(seed)
    img = np.ones((size, size), np.float32)
    for _ in range(n_walls):
        r0, c0 = rng.randint(5, size - 25, 2)
        length = rng.randint(8, 20)
        if rng.rand() < 0.5:
            img[r0, c0:c0 + length] = 0.0
        else:
            img[r0:r0 + length, c0] = 0.0
    origin = np.array([-size * res / 2, -size * res / 2], np.float32)
    grid = ProbabilityGrid2D.from_bev_image(
        jnp.asarray(img), jnp.asarray(origin), res)
    rr, cc = np.nonzero(img == 0.0)
    map_pts = np.stack([origin[0] + cc * res, origin[1] + rr * res], 1)
    return grid, map_pts.astype(np.float32)


def _offset_scan(map_pts, gt):
    c, s = np.cos(gt[2]), np.sin(gt[2])
    return np.stack([
        c * (map_pts[:, 0] - gt[0]) + s * (map_pts[:, 1] - gt[1]),
        -s * (map_pts[:, 0] - gt[0]) + c * (map_pts[:, 1] - gt[1]),
    ], 1).astype(np.float32)


def test_fast_matches_exhaustive_randomized():
    """Across random maps/offsets the fast optimum == exhaustive optimum."""
    for seed in range(4):
        grid, map_pts = _random_grid_and_scan(seed)
        rng = np.random.RandomState(100 + seed)
        gt = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2),
                       rng.uniform(-np.pi, np.pi)])
        scan = _offset_scan(map_pts, gt)
        m = jnp.ones(len(scan))
        exact = match_scan(grid, jnp.asarray(scan), m, num_rotations=64)
        fast, cert = match_scan_fast(grid, jnp.asarray(scan), m,
                                     num_rotations=64)
        assert bool(cert), f"seed {seed}: certificate failed"
        # same optimum score (pose may differ only under exact ties)
        assert abs(float(fast.score) - float(exact.score)) < 1e-4, (
            seed, float(fast.score), float(exact.score))
        np.testing.assert_allclose(np.asarray(fast.pose),
                                   np.asarray(exact.pose), atol=1e-5)


def test_fast_negative_edge_translation():
    """Optimum in coarse cell Q = -1 (t ∈ [-f, 0)) is not missed — the
    admissibility fix for the negative edge of the bound grid."""
    size, res, f = 64, 0.25, 4
    img = np.ones((size, size), np.float32)
    img[10:50:4, 12:52:5] = 0.0  # sparse dot lattice
    origin = np.array([-size * res / 2, -size * res / 2], np.float32)
    grid = ProbabilityGrid2D.from_bev_image(
        jnp.asarray(img), jnp.asarray(origin), res)
    rr, cc = np.nonzero(img == 0.0)
    map_pts = np.stack([origin[0] + cc * res, origin[1] + rr * res], 1)
    for t in ([-res, -res, 0.0], [-f * res + res, -2 * res, 0.0]):
        gt = np.array(t)
        scan = _offset_scan(map_pts, gt)
        m = jnp.ones(len(scan))
        exact = match_scan(grid, jnp.asarray(scan), m, num_rotations=32)
        fast, cert = match_scan_fast(grid, jnp.asarray(scan), m,
                                     num_rotations=32, coarse_factor=f)
        assert bool(cert)
        assert abs(float(fast.score) - float(exact.score)) < 1e-4, t
        np.testing.assert_allclose(np.asarray(fast.pose),
                                   np.asarray(exact.pose), atol=1e-5)


def test_fast_narrow_window_and_masks():
    """Local-Match semantics (narrow angular window) + masked-out points."""
    grid, map_pts = _random_grid_and_scan(7)
    gt = np.array([0.9, -0.6, 0.12])
    scan = _offset_scan(map_pts, gt)
    # pad with garbage masked-out rows
    pad = np.full((64, 2), 1e3, np.float32)
    pts = np.concatenate([scan, pad])
    m = np.concatenate([np.ones(len(scan)), np.zeros(64)]).astype(np.float32)
    exact = match_scan(grid, jnp.asarray(pts), jnp.asarray(m),
                       num_rotations=32, angular_center=0.1,
                       angular_halfwidth=0.3)
    fast, cert = match_scan_fast(grid, jnp.asarray(pts), jnp.asarray(m),
                                 num_rotations=32, angular_center=0.1,
                                 angular_halfwidth=0.3)
    assert bool(cert)
    assert abs(float(fast.score) - float(exact.score)) < 1e-4
    np.testing.assert_allclose(np.asarray(fast.pose),
                               np.asarray(exact.pose), atol=1e-5)
    assert abs(float(fast.pose[0]) - gt[0]) < 2 * grid.resolution
