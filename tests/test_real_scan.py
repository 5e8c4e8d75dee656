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
