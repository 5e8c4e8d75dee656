"""Smoke tests on the real KITTI scan shipped with the reference.

The reference checks in one genuine KITTI velodyne frame
(s2s_libtorch/000000.bin, used by its C++ benchmarks at
s2s_feature_extract.cpp:141). We read it from the mounted reference tree at
test time (never copied) and push it through the real-data path: native
decode → fused BEV kernel → s2s descriptor. Skipped when the reference tree
is absent, keeping the repo standalone.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SCAN = "/root/reference/s2s_libtorch/000000.bin"
pytestmark = pytest.mark.skipif(
    not os.path.exists(SCAN), reason="reference scan not mounted"
)


@pytest.fixture(scope="module")
def scan():
    from gloc3d_tpu.data.native import load_scan_batch, masks_from_counts

    pts, counts = load_scan_batch([SCAN], "kitti", max_points=122480)
    assert counts[0] == 122480  # scan has 124668 points; trimmed to pad size
    return pts[0], masks_from_counts(counts, 122480)[0]


def test_real_scan_bev(scan):
    from gloc3d_tpu.config import BEVConfig
    from gloc3d_tpu.ops.bev import scan_to_bev

    pts, mask = scan
    cfg = BEVConfig()
    out = scan_to_bev(jnp.asarray(pts[:, :3]), jnp.asarray(mask), cfg)
    img = np.asarray(out.image)
    occupied_frac = float((img == 0).mean())
    # a real urban scan: meaningful structure, mostly free space —
    # consistent with the prob-image statistics the reference measured
    # (mean 0.9875, get_data_stats.py)
    assert 0.002 < occupied_frac < 0.08, occupied_frac
    assert int(out.num_occupied) > 1000
    # origin should place the sensor (0,0) inside the image
    ox, oy = np.asarray(out.origin_xy)
    assert ox < 0 < ox + 768 * 0.2
    assert oy < 0 < oy + 768 * 0.2


def test_real_scan_descriptor(scan):
    from gloc3d_tpu.config import ModelConfig, VoxelConfig
    from gloc3d_tpu.models import build_model

    pts, mask = scan
    cfg = ModelConfig(encoder="pointpillar", encoder_dim=128,
                      compute_dtype="float32")
    model = build_model(cfg, VoxelConfig())
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    d = model.apply(params, jnp.asarray(pts[None]), jnp.asarray(mask[None]))
    assert d.shape == (1, 128)
    assert bool(jnp.isfinite(d).all())
    assert float(jnp.abs(d).max()) > 0


def test_real_scan_self_registration(scan):
    """The real scan registered against a shifted copy of itself."""
    from gloc3d_tpu.config import BEVConfig, MatchConfig
    from gloc3d_tpu.ops.bev import scan_to_bev
    from gloc3d_tpu.ops.bev_match import match_bev

    pts, mask = scan
    cfg = BEVConfig(image_size=384)
    m_cfg = MatchConfig(image_size=384)
    xyz = pts[:, :3].copy()
    bev_q = scan_to_bev(jnp.asarray(xyz), jnp.asarray(mask), cfg)
    c, s = np.cos(0.6), np.sin(0.6)
    moved = xyz.copy()
    moved[:, 0] = c * xyz[:, 0] - s * xyz[:, 1] + 4.0
    moved[:, 1] = s * xyz[:, 0] + c * xyz[:, 1] - 2.0
    bev_db = scan_to_bev(jnp.asarray(moved), jnp.asarray(mask), cfg)
    res = match_bev(bev_q, bev_db, m_cfg)
    assert bool(res.success), float(res.score)
    got = np.asarray(res.xy_yaw)
    assert abs(got[2] - 0.6) < 0.05
    assert abs(got[0] - 4.0) < 0.6 and abs(got[1] + 2.0) < 0.6, got


def test_real_scan_full_pipeline_locate(scan):
    """Full locate() on a db built from posed copies of the real scan.

    All keyframes share content (copies of one scan), so any candidate is a
    plausible match — the invariant is that the composed pose agrees with the
    ground truth of WHICHEVER keyframe was matched.
    """
    from gloc3d_tpu.config import (
        BEVConfig, IndexConfig, MatchConfig, ModelConfig, PipelineConfig,
        VoxelConfig,
    )
    from gloc3d_tpu.core.transforms import Rigid3, quat_from_rpy
    from gloc3d_tpu.eval import registration_errors
    from gloc3d_tpu.models import build_model
    from gloc3d_tpu.pipeline import GlobalLocalizer

    n = 16384
    pts_full, _ = scan
    rng = np.random.RandomState(0)
    sub = pts_full[rng.choice(len(pts_full), n, replace=False), :3]

    cfg = PipelineConfig(
        bev=BEVConfig(image_size=256, max_points=n),
        voxel=VoxelConfig(max_points=n),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                          compute_dtype="float32"),
        index=IndexConfig(dim=128, top_k=4, capacity=8),
        match=MatchConfig(image_size=256),
    )

    def at_pose(x, y, yaw):
        """The scan observed from world pose (x, y, yaw): world→sensor."""
        c, s = np.cos(-yaw), np.sin(-yaw)
        out = sub.copy()
        # treat `sub` as the world; sensor at (x, y, yaw)
        px, py = sub[:, 0] - x, sub[:, 1] - y
        out[:, 0] = c * px - s * py
        out[:, 1] = s * px + c * py
        return out.astype(np.float32)

    db_poses = [(0.0, 0.0, 0.0), (6.0, -4.0, 0.8), (-5.0, 5.0, -1.2),
                (10.0, 8.0, 2.4)]
    db_pts = np.stack([at_pose(*p) for p in db_poses])
    masks = np.ones((4, n), np.float32)

    model = build_model(cfg.model, cfg.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(db_pts[:1]), jnp.asarray(masks[:1])
    )
    loc = GlobalLocalizer(cfg, model, params)
    loc.add_keyframes(db_pts, masks)

    q_pose = (2.0, -1.5, 0.4)
    res = loc.locate(at_pose(*q_pose), masks[0])
    assert res.success

    def pose2(x, y, th):
        return Rigid3(
            quat_from_rpy(jnp.zeros(()), jnp.zeros(()), jnp.float32(th)),
            jnp.array([x, y, 0.0]),
        )

    gt = pose2(*db_poses[res.db_index]).inverse().compose(pose2(*q_pose))
    err_pos, err_rot = registration_errors(
        Rigid3(jnp.asarray(res.pose.rotation), jnp.asarray(res.pose.translation)),
        gt,
    )
    assert float(err_pos) < 1.0, float(err_pos)
    assert float(err_rot) < 5.0, float(err_rot)
