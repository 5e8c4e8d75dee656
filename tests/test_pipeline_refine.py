"""Optional ICP refinement of accepted matches (cfg.match.refine_icp).

The reference's registration path can polish a pose with
pcl::IterativeClosestPoint (global_registration.cpp:1388-1398); here the
flag stores a downsampled 3-D cloud per keyframe and refines the dense
match with the vectorized ICP, projected back to the planar contract.
"""

import numpy as np

from gloc3d_tpu.pipeline import GlobalLocalizer
from test_pipeline import CFG, localizer, scan_at  # noqa: F401


def _expected_xy(db_pose, wx, wy):
    """GT planar translation of the q→db match for a query at world
    (wx, wy): t = R(db_yaw)⁻¹ (q_pos − db_pos) in the db frame."""
    x, y, yaw = db_pose
    c, s = np.cos(-yaw), np.sin(-yaw)
    rx, ry = wx - x, wy - y
    return np.array([c * rx - s * ry, s * rx + c * ry])


def test_refine_icp_tightens_position_error(localizer):  # noqa: F811
    cfg = CFG.replace(match=CFG.match.replace(
        refine_icp=True, refine_icp_points=2048, refine_icp_iters=15,
        refine_icp_max_corr=1.0,
    ))
    refined_loc = GlobalLocalizer(cfg, localizer.model, localizer.params)
    db = np.stack([scan_at(*p)[0] for p in localizer.db_poses])
    mk = np.stack([scan_at(*p)[1] for p in localizer.db_poses])
    refined_loc.add_keyframes(db, mk)  # stores per-keyframe clouds
    assert refined_loc.keyframes[0].cloud is not None
    assert refined_loc.keyframes[0].cloud.shape == (2048, 4)

    errs_plain, errs_ref = [], []
    rng = np.random.RandomState(5)
    for _ in range(6):
        dbi = rng.randint(0, len(localizer.db_poses))
        dx, dy = rng.uniform(-1, 1, 2)
        dyaw = rng.uniform(-0.15, 0.15)
        x, y, yaw = localizer.db_poses[dbi]
        c, s = np.cos(yaw), np.sin(yaw)
        wx, wy = x + c * dx - s * dy, y + s * dx + c * dy
        pts, mask = scan_at(wx, wy, yaw + dyaw)

        r_plain = localizer.locate(pts, mask)
        r_ref = refined_loc.locate(pts, mask)
        assert r_plain.success and r_ref.success
        if r_plain.db_index != r_ref.db_index:
            continue  # registered against different (both valid) frames
        want = _expected_xy(localizer.db_poses[r_plain.db_index], wx, wy)
        errs_plain.append(np.linalg.norm(
            np.asarray(r_plain.match_xy_yaw)[:2] - want))
        errs_ref.append(np.linalg.norm(
            np.asarray(r_ref.match_xy_yaw)[:2] - want))

    assert len(errs_ref) >= 4
    assert np.mean(errs_ref) < np.mean(errs_plain), (errs_ref, errs_plain)
    assert np.mean(errs_ref) < 0.12, errs_ref


def test_refine_clouds_survive_save_load(localizer, tmp_path):  # noqa: F811
    cfg = CFG.replace(match=CFG.match.replace(
        refine_icp=True, refine_icp_points=512))
    loc = GlobalLocalizer(cfg, localizer.model, localizer.params)
    db = np.stack([scan_at(*p)[0] for p in localizer.db_poses[:2]])
    mk = np.stack([scan_at(*p)[1] for p in localizer.db_poses[:2]])
    loc.add_keyframes(db, mk)
    out = str(tmp_path / "db")
    loc.save(out)
    loc2 = GlobalLocalizer(cfg, localizer.model, localizer.params)
    loc2.load(out)
    assert loc2.keyframes[0].cloud is not None
    np.testing.assert_allclose(loc2.keyframes[1].cloud,
                               loc.keyframes[1].cloud)
