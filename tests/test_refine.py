"""ICP / NDT / ergodic-sweep refinement tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import BEVConfig, MatchConfig
from gloc3d_tpu.core.transforms import (
    Rigid3, quat_from_rpy, quat_to_angle_axis, transform_points,
)
from gloc3d_tpu.ops.refine import (
    build_ndt_grid, ergodic_rp_sweep_match, icp_point_to_point, ndt_score,
)


def _cloud(seed=0, n=800):
    rng = np.random.RandomState(seed)
    pts = []
    for _ in range(10):
        x0, y0 = rng.uniform(-8, 8, 2)
        ang = rng.uniform(0, np.pi)
        ts = rng.uniform(0, 6, n // 10)
        pts.append(np.stack([
            x0 + np.cos(ang) * ts, y0 + np.sin(ang) * ts,
            rng.uniform(0, 2, n // 10),
        ], 1))
    return np.concatenate(pts).astype(np.float32)


def test_icp_refines_perturbed_pose():
    src = jnp.asarray(_cloud(0))
    true = Rigid3(
        quat_from_rpy(jnp.float32(0.02), jnp.float32(-0.03), jnp.float32(0.3)),
        jnp.array([0.8, -0.5, 0.1]),
    )
    dst = transform_points(true, src)
    # perturbed init (what the 2-D match would hand over)
    init = Rigid3(
        quat_from_rpy(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.25)),
        jnp.array([0.6, -0.3, 0.0]),
    )
    mask = jnp.ones(src.shape[0])
    res = icp_point_to_point(src, mask, dst, mask, init, iterations=25,
                             max_corr_dist=1.5)
    # refined transform must match the true one
    err_t = np.linalg.norm(np.asarray(res.transform.translation - true.translation))
    moved = transform_points(res.transform, src)
    assert float(jnp.abs(moved - dst).max()) < 0.05
    assert err_t < 0.05
    assert float(res.rmse) < 0.05


def test_ndt_score_peaks_at_truth():
    pts = jnp.asarray(_cloud(1))[:, :2]
    mask = jnp.ones(pts.shape[0])
    grid = build_ndt_grid(pts, mask, size=64, cell_size=0.5,
                          origin_xy=(-16.0, -16.0))
    s_true = float(ndt_score(grid, pts, mask, jnp.array([0.0, 0.0, 0.0])))
    s_off = float(ndt_score(grid, pts, mask, jnp.array([1.5, 1.0, 0.2])))
    # E[exp(-chi2_2/2)] = 0.5 for true Gaussian samples; regularized cells
    # score higher. The point is the sharp peak at the true pose.
    assert s_true > 0.5
    assert s_true > 2.0 * s_off


def test_ergodic_sweep_picks_consistent_tilt():
    bev_cfg = BEVConfig(image_size=128, max_points=1024)
    match_cfg = MatchConfig(image_size=128, min_score=0.1,
                            min_overlap_pixels=16, num_rotations=60)
    cloud = _cloud(2)[:1024]
    padded = np.zeros((1024, 3), np.float32)
    padded[: len(cloud)] = cloud
    mask = np.zeros(1024, np.float32)
    mask[: len(cloud)] = 1.0
    # db image: the same scene, un-tilted
    from gloc3d_tpu.ops.bev import scan_to_bev

    db = scan_to_bev(jnp.asarray(padded), jnp.asarray(mask), bev_cfg)
    # query scan tilted by (2°, -1°): the sweep should undo it
    q_tilt = quat_from_rpy(jnp.deg2rad(jnp.float32(2.0)),
                           jnp.deg2rad(jnp.float32(-1.0)), jnp.float32(0.0))
    from gloc3d_tpu.core.transforms import quat_conj, quat_rotate

    tilted = quat_rotate(quat_conj(q_tilt)[None], jnp.asarray(padded))
    res, rp = ergodic_rp_sweep_match(
        tilted, jnp.asarray(mask), db.image, db.origin_xy,
        bev_cfg, match_cfg, half_deg=3.0, step_deg=1.0,
    )
    assert bool(res.success)
    # The sweep's contract (matching the reference's use of it,
    # global_registration.cpp:1338-1350) is to find SOME tilt whose BEV
    # registers confidently — small tilts barely change a BEV, so the argmax
    # tilt itself is not identifiable. What must hold: the recovered planar
    # transform is the true one (identity here) regardless of picked tilt.
    xy_yaw = np.asarray(res.xy_yaw)
    assert np.abs(xy_yaw[:2]).max() < 0.6, xy_yaw
    assert abs(np.arctan2(np.sin(xy_yaw[2]), np.cos(xy_yaw[2]))) < 0.1
    assert np.abs(np.rad2deg(np.asarray(rp))).max() <= 3.0 + 1e-6


def test_icp_planar_recovers_exact_transform():
    from gloc3d_tpu.ops.refine import icp_planar

    src2d = jnp.asarray(_cloud(3)[:, :2])
    mask = jnp.ones(src2d.shape[0])
    th, tx, ty = 0.12, 0.7, -0.4
    c, s = np.cos(th), np.sin(th)
    dst = jnp.asarray(
        np.asarray(src2d) @ np.array([[c, s], [-s, c]], np.float32)
        + np.array([tx, ty], np.float32)
    )
    init = jnp.array([0.5, -0.2, 0.05])  # coarse, grid-quantized-ish guess
    # full-overlap clouds: trimming off isolates the Kabsch-update math
    res = icp_planar(src2d, mask, dst, mask, init, iterations=15,
                     trim_fraction=1.0)
    got = np.asarray(res.xy_yaw)
    # point-to-point on wall-like clouds plateaus ~1 cm (sliding ambiguity
    # along segments); that is already far below the 0.2 m grid cell
    assert abs(got[2] - th) < 5e-3
    np.testing.assert_allclose(got[:2], [tx, ty], atol=0.02)
    assert float(res.rmse) < 0.05
    assert np.isfinite(float(res.rmse))


def test_refine_match_icp_beats_grid_quantization():
    """Virtual-cloud planar ICP pulls a grid-rounded match below one cell."""
    from gloc3d_tpu.ops.bev import scan_to_bev
    from gloc3d_tpu.ops.refine import refine_match_icp

    cfg = BEVConfig(image_size=128, max_points=4096)
    cloud = _cloud(4, n=1600)
    pad = np.zeros((4096, 3), np.float32)
    pad[: len(cloud)] = cloud
    mask = np.zeros(4096, np.float32)
    mask[: len(cloud)] = 1.0

    # db view and a query view offset by a NON-grid-multiple transform
    th, tx, ty = 0.07, 0.73, -0.31  # resolution is 0.2 m → sub-cell parts
    c, s = np.cos(-th), np.sin(-th)
    qc = cloud.copy()
    qc[:, 0] -= tx
    qc[:, 1] -= ty
    qx = c * qc[:, 0] - s * qc[:, 1]
    qy = s * qc[:, 0] + c * qc[:, 1]
    qpad = pad.copy()
    qpad[: len(cloud), 0] = qx
    qpad[: len(cloud), 1] = qy

    bev_db = scan_to_bev(jnp.asarray(pad), jnp.asarray(mask), cfg)
    bev_q = scan_to_bev(jnp.asarray(qpad), jnp.asarray(mask), cfg)

    # grid-rounded initial guess (one-cell quantization error)
    init = jnp.array([round(tx / 0.2) * 0.2, round(ty / 0.2) * 0.2, 0.06])
    res = refine_match_icp(
        bev_q.image, bev_q.origin_xy, bev_db.image, bev_db.origin_xy,
        init, cfg.resolution, budget=2048, iterations=12,
        max_corr_dist=0.8,
    )
    got = np.asarray(res.xy_yaw)
    err_init = np.hypot(float(init[0]) - tx, float(init[1]) - ty)
    err_ref = np.hypot(got[0] - tx, got[1] - ty)
    assert err_ref < err_init, (err_ref, err_init)
    assert err_ref < 0.1  # half a cell
    assert abs(got[2] - th) < 0.02


def test_contour_cloud_jittable():
    import functools

    from gloc3d_tpu.ops.contour import contour_virtual_cloud

    img = np.ones((64, 64), np.float32)
    img[10:30, 10:30] = 0.0
    fn = jax.jit(functools.partial(contour_virtual_cloud, budget=512,
                                   min_area=50))
    pts, valid = fn(jnp.asarray(img), jnp.zeros(2), 0.2)
    assert pts.shape == (512, 2)
    assert 200 < float(valid.sum()) < 400  # eroded 18x18 = 324


def test_ndt3d_score_peaks_at_truth():
    from gloc3d_tpu.ops.refine import build_ndt_grid_3d, ndt_score_3d

    pts = jnp.asarray(_cloud(7))
    mask = jnp.ones(pts.shape[0])
    grid = build_ndt_grid_3d(pts, mask, origin=(-15.0, -15.0, -2.0),
                             dims=(60, 60, 10), cell_size=0.5)
    truth = jnp.zeros(6)
    s0 = float(ndt_score_3d(grid, pts, mask, truth))
    for d in ([0.4, 0, 0, 0, 0, 0], [0, 0.4, 0, 0, 0, 0],
              [0, 0, 0, 0, 0, 0.06]):
        s = float(ndt_score_3d(grid, pts, mask, truth + jnp.asarray(d)))
        assert s < s0, (d, s, s0)


def test_ndt3d_refine_improves_perturbed_init():
    from gloc3d_tpu.core.transforms import quat_from_rpy, transform_points
    from gloc3d_tpu.ops.refine import build_ndt_grid_3d, ndt_refine_3d, ndt_score_3d

    src = jnp.asarray(_cloud(8))
    mask = jnp.ones(src.shape[0])
    true = Rigid3(
        quat_from_rpy(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.08)),
        jnp.array([0.45, -0.3, 0.05]),
    )
    dst = transform_points(true, src)
    grid = build_ndt_grid_3d(dst, mask, origin=(-15.0, -15.0, -2.0),
                             dims=(60, 60, 10), cell_size=0.5)
    init = jnp.array([0.2, -0.1, 0.0, 0.0, 0.0, 0.02])
    pose, score = ndt_refine_3d(grid, src, mask, init, iterations=40)
    s_init = float(ndt_score_3d(grid, src, mask, init))
    assert float(score) > s_init
    got = np.asarray(pose)
    err_init = np.linalg.norm(np.asarray(init[:2]) - np.array([0.45, -0.3]))
    err_ref = np.linalg.norm(got[:2] - np.array([0.45, -0.3]))
    assert err_ref < err_init, (err_ref, err_init)
    assert abs(got[5] - 0.08) < abs(0.02 - 0.08)
