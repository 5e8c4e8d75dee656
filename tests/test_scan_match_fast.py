"""match_scan_fast: coarse-to-fine MatchFullSubmap equals the exhaustive FFT.

The fast path mirrors the reference's admissible-bound pruning
(fast_correlative_scan_matcher_2d.cpp:112-246) with a batched coarse FFT +
top-K expansion; these tests pin that it returns the SAME optimum as the
exhaustive ``match_scan`` (which is itself the BnB optimum by construction),
that the certificate slack is calibrated to measured FFT round-off, and that
the ``match_full_submap`` certificate→fallback policy is wired correctly.
"""

import numpy as np
import jax.numpy as jnp

from gloc3d_tpu.ops.occupancy import ProbabilityGrid2D
from gloc3d_tpu.ops.scan_match import (
    match_full_submap, match_scan, match_scan_fast, olson_angular_step,
    score_at,
)


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


def _assert_same_optimum(grid, pts, m, fast, exact, ctx=""):
    """Same optimum = same score; the pose may differ only under an exact
    score tie, so on pose disagreement re-evaluate the fast pose's exact
    score instead of requiring pose identity (quantized probabilities on
    synthetic walls do produce legitimate ties)."""
    assert abs(float(fast.score) - float(exact.score)) < 1e-4, (
        ctx, float(fast.score), float(exact.score))
    if not np.allclose(np.asarray(fast.pose), np.asarray(exact.pose),
                       atol=1e-5):
        refit = float(score_at(grid, pts, m, fast.pose))
        assert abs(refit - float(exact.score)) < 1e-4, (
            ctx, "fast pose is not score-tied with the optimum",
            refit, float(exact.score))


def test_fast_matches_exhaustive_randomized():
    """Across random maps/offsets the fast optimum == exhaustive optimum."""
    for seed in range(4):
        grid, map_pts = _random_grid_and_scan(seed)
        rng = np.random.RandomState(100 + seed)
        gt = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2),
                       rng.uniform(-np.pi, np.pi)])
        scan = _offset_scan(map_pts, gt)
        m = jnp.ones(len(scan))
        pts = jnp.asarray(scan)
        exact = match_scan(grid, pts, m, num_rotations=64)
        fast, cert = match_scan_fast(grid, pts, m, num_rotations=64)
        assert bool(cert), f"seed {seed}: certificate failed"
        _assert_same_optimum(grid, pts, m, fast, exact, ctx=f"seed {seed}")


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
        pts = jnp.asarray(scan)
        exact = match_scan(grid, pts, m, num_rotations=32)
        fast, cert = match_scan_fast(grid, pts, m, num_rotations=32,
                                     coarse_factor=f)
        assert bool(cert)
        _assert_same_optimum(grid, pts, m, fast, exact, ctx=str(t))


def test_fast_narrow_window_and_masks():
    """Local-Match semantics (narrow angular window) + masked-out points."""
    grid, map_pts = _random_grid_and_scan(7)
    gt = np.array([0.9, -0.6, 0.12])
    scan = _offset_scan(map_pts, gt)
    # pad with garbage masked-out rows
    pad = np.full((64, 2), 1e3, np.float32)
    pts = np.concatenate([scan, pad])
    m = np.concatenate([np.ones(len(scan)), np.zeros(64)]).astype(np.float32)
    pts_j, m_j = jnp.asarray(pts), jnp.asarray(m)
    exact = match_scan(grid, pts_j, m_j, num_rotations=32,
                       angular_center=0.1, angular_halfwidth=0.3)
    fast, cert = match_scan_fast(grid, pts_j, m_j, num_rotations=32,
                                 angular_center=0.1, angular_halfwidth=0.3)
    assert bool(cert)
    _assert_same_optimum(grid, pts_j, m_j, fast, exact)
    assert abs(float(fast.pose[0]) - gt[0]) < 2 * grid.resolution


def test_certificate_slack_calibration():
    """The certificate's absolute slack (0.05 counts) exceeds measured FFT
    round-off by >10×: |circular-FFT correlation − direct sum| stays below
    5e-3 counts at test scale. Guards against an XLA FFT regression that
    would silently invalidate certified results."""
    rng = np.random.RandomState(3)
    size, npts = 192, 2000
    pad = size + size // 2
    probs = rng.rand(size, size).astype(np.float32)
    counts = np.zeros((pad, pad), np.float32)
    idx = rng.randint(0, size, (npts, 2))
    np.add.at(counts, (idx[:, 0], idx[:, 1]), 1.0)
    P = jnp.zeros((pad, pad)).at[:size, :size].set(jnp.asarray(probs))
    corr = np.asarray(jnp.fft.irfft2(
        jnp.conj(jnp.fft.rfft2(jnp.asarray(counts))) * jnp.fft.rfft2(P),
        s=(pad, pad)))
    errs = []
    for _ in range(32):
        dy, dx = rng.randint(-size // 2, size // 2, 2)
        rows, cols = idx[:, 0] + dy, idx[:, 1] + dx
        inb = (rows >= 0) & (rows < size) & (cols >= 0) & (cols < size)
        exact = probs[rows[inb], cols[inb]].astype(np.float64).sum()
        errs.append(abs(corr[dy % pad, dx % pad] - exact))
    assert max(errs) < 5e-3, max(errs)


def test_match_full_submap_certified_no_fallback():
    """On a bound-friendly map the policy returns the certified fast result
    without running the exhaustive program."""
    grid, map_pts = _random_grid_and_scan(2)
    gt = np.array([1.0, -0.5, 0.8])
    scan = _offset_scan(map_pts, gt)
    m = jnp.ones(len(scan))
    pts = jnp.asarray(scan)
    res = match_full_submap(grid, pts, m, num_rotations=64)
    assert res.certified and not res.used_fallback
    exact = match_scan(grid, pts, m, num_rotations=64)
    assert abs(float(res.score) - float(exact.score)) < 1e-4


def _carpet_grid_and_scan(seed=11, size=96, res=0.25):
    """Realistic-submap regime: free space is mostly KNOWN (p=0.1 carpet),
    which loosens the coarse bound — the documented certificate-killer."""
    rng = np.random.RandomState(seed)
    img = np.ones((size, size), np.float32)  # free = 1.0 in BEV convention
    for _ in range(14):
        r0, c0 = rng.randint(5, size - 25, 2)
        length = rng.randint(8, 20)
        if rng.rand() < 0.5:
            img[r0, c0:c0 + length] = 0.0
        else:
            img[r0:r0 + length, c0] = 0.0
    origin = np.array([-size * res / 2, -size * res / 2], np.float32)
    grid = ProbabilityGrid2D.from_bev_image(
        jnp.asarray(img), jnp.asarray(origin), res)
    # from_bev_image marks free pixels known at p=0.1 — verify the carpet
    # regime holds, else this test guards nothing
    probs = np.asarray(grid.probabilities())
    assert (probs > 0.05).mean() > 0.9, "carpet regime not established"
    rr, cc = np.nonzero(img == 0.0)
    map_pts = np.stack([origin[0] + cc * res, origin[1] + rr * res], 1)
    return grid, map_pts.astype(np.float32)


def _noisy_scan(map_pts, gt, seed=5, sigma=0.35):
    """An imperfect (noisy) scan: raw score < the 0.9-probability ceiling,
    so loose carpet bounds on unexpanded cells exceed it and the
    certificate goes False — the realistic-submap failure regime."""
    rng = np.random.RandomState(seed)
    return (_offset_scan(map_pts, gt)
            + rng.normal(0, sigma, map_pts.shape).astype(np.float32))


def test_match_full_submap_fallback_exact_on_carpet():
    """When the certificate fails the 'full' policy returns the exhaustive
    optimum (verified: this configuration does fail the certificate)."""
    grid, map_pts = _carpet_grid_and_scan()
    gt = np.array([0.75, -1.25, 2.1])
    scan = _noisy_scan(map_pts, gt)
    m = jnp.ones(len(scan))
    pts = jnp.asarray(scan)
    res = match_full_submap(grid, pts, m, num_rotations=48)
    assert res.used_fallback and not res.certified, (
        "certificate unexpectedly held — the fallback branch is untested")
    exact = match_scan(grid, pts, m, num_rotations=48)
    np.testing.assert_allclose(np.asarray(res.pose),
                               np.asarray(exact.pose), atol=1e-5)
    assert abs(float(res.score) - float(exact.score)) < 1e-4


def test_match_full_submap_theta_and_none_policies():
    grid, map_pts = _carpet_grid_and_scan(seed=13)
    gt = np.array([-0.5, 0.5, -1.3])
    scan = _noisy_scan(map_pts, gt, seed=6)
    m = jnp.ones(len(scan))
    pts = jnp.asarray(scan)
    kw = dict(num_rotations=48)
    r_none = match_full_submap(grid, pts, m, fallback="none", **kw)
    r_theta = match_full_submap(grid, pts, m, fallback="theta", **kw)
    assert not r_none.certified and not r_none.used_fallback
    assert r_theta.used_fallback
    # theta fallback can only improve on the fast result
    assert float(r_theta.score) >= float(r_none.score) - 1e-6
    exact = match_scan(grid, pts, m, num_rotations=48)
    # and never exceeds the global optimum
    assert float(r_theta.score) <= float(exact.score) + 1e-4


def test_match_full_submap_large_r_goes_exhaustive():
    """Above R=512 the auto policy skips the fast attempt (certificate
    rate measured 0/20 in that regime) and returns the exhaustive optimum
    directly."""
    grid, map_pts = _random_grid_and_scan(9)
    gt = np.array([0.4, 0.9, 1.7])
    scan = _offset_scan(map_pts, gt)
    m = jnp.ones(len(scan))
    pts = jnp.asarray(scan)
    res = match_full_submap(grid, pts, m, num_rotations=600)
    assert res.used_fallback and not res.certified
    exact = match_scan(grid, pts, m, num_rotations=600)
    np.testing.assert_allclose(np.asarray(res.pose),
                               np.asarray(exact.pose), atol=1e-6)


def test_rotation_chunked_exhaustive_identical():
    """match_scan with rotation_chunk (the memory-bounded path for
    Olson-scale R) returns bit-identical pose and score to the one-shot
    evaluation, including when chunk does not divide R."""
    grid, map_pts = _random_grid_and_scan(4)
    gt = np.array([0.6, 1.1, -2.0])
    scan = _offset_scan(map_pts, gt)
    m = jnp.ones(len(scan))
    pts = jnp.asarray(scan)
    full = match_scan(grid, pts, m, num_rotations=50)
    for chunk in (7, 16, 50, 64):
        ch = match_scan(grid, pts, m, num_rotations=50,
                        rotation_chunk=chunk)
        np.testing.assert_array_equal(np.asarray(ch.pose),
                                      np.asarray(full.pose))
        np.testing.assert_array_equal(np.asarray(ch.score),
                                      np.asarray(full.score))


def test_sharded_rotation_matcher_equals_single_device():
    """match_scan_fast_sharded (θ axis over the 8-device mesh) returns the
    same certified optimum as the single-device matcher."""
    import jax
    from jax.sharding import Mesh

    from gloc3d_tpu.ops.scan_match import match_scan_fast_sharded

    mesh = Mesh(np.array(jax.devices()), ("data",))
    grid, map_pts = _random_grid_and_scan(3)
    gt = np.array([1.2, 0.4, -0.7])
    scan = _offset_scan(map_pts, gt)
    m = jnp.ones(len(scan))
    pts = jnp.asarray(scan)
    single, cert_s = match_scan_fast(grid, pts, m, num_rotations=64)
    shard, cert_m = match_scan_fast_sharded(mesh, grid, pts, m,
                                            num_rotations=64)
    assert bool(cert_s) and bool(cert_m)
    assert abs(float(shard.score) - float(single.score)) < 1e-4
    _assert_same_optimum(grid, pts, m, shard, single)
    # R not divisible by the mesh axis is an explicit error
    import pytest
    with pytest.raises(ValueError):
        match_scan_fast_sharded(mesh, grid, pts, m, num_rotations=60)


def test_olson_rotation_count_default():
    """num_rotations=None derives the Olson-bound count: 512² @ 0.2 m,
    50 m range → ~1570 rotations for 360° (fast_correlative_scan_matcher_2d
    .cpp:248-268 via correlative_scan_matcher_2d.cpp:47-51)."""
    step = olson_angular_step(0.2, 50.0)
    n = int(np.ceil(2 * np.pi / step))
    assert 1500 <= n <= 1650, n
