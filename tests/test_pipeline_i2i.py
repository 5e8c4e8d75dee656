"""i2i (VGG16) pipeline slice: scan → BEV image → VGG descriptor → locate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gloc3d_tpu.config import (
    BEVConfig, IndexConfig, MatchConfig, ModelConfig, PipelineConfig, VoxelConfig,
)
from gloc3d_tpu.models import build_model
from gloc3d_tpu.pipeline import GlobalLocalizer
from test_pipeline import scan_at

N_PTS = 4096

CFG = PipelineConfig(
    bev=BEVConfig(image_size=128, max_points=N_PTS),
    voxel=VoxelConfig(max_points=N_PTS),
    model=ModelConfig(encoder="vgg16", encoder_dim=512,
                      compute_dtype="float32"),
    index=IndexConfig(dim=512, top_k=3, capacity=16),
    match=MatchConfig(image_size=128, min_score=0.15, min_overlap_pixels=16),
)


@pytest.fixture(scope="module")
def localizer():
    model = build_model(CFG.model, CFG.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )
    loc = GlobalLocalizer(CFG, model, params)
    db_poses = [(-30, -30, 0.0), (0, -30, 0.3), (30, 0, 1.6), (0, 30, 3.1)]
    scans = [scan_at(*p) for p in db_poses]
    loc.add_keyframes(
        np.stack([s[0][:, :3] for s in scans]), np.stack([s[1] for s in scans])
    )
    loc.db_poses = db_poses
    return loc


def test_i2i_db_and_detect(localizer):
    assert len(localizer.bank) == 4
    pts, mask = scan_at(*localizer.db_poses[2])
    d2, idx, bev, _ = localizer.detect(pts[None, :, :3], mask[None])
    assert idx[0, 0] == 2
    assert d2[0, 0] < 1e-4
    assert bev.image.shape == (1, 128, 128)


def test_i2i_locate(localizer):
    x, y, yaw = localizer.db_poses[1]
    pts, mask = scan_at(x + 2.0, y - 1.0, yaw + 0.25)
    res = localizer.locate(pts[:, :3], mask)
    assert res.success
    got = np.asarray(res.match_xy_yaw)
    # relative yaw recovered
    assert abs(np.arctan2(np.sin(got[2] - 0.25), np.cos(got[2] - 0.25))) < 0.05
