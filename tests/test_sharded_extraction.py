"""Data-parallel extraction over the mesh must equal single-device output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gloc3d_tpu.config import (
    BEVConfig, IndexConfig, MatchConfig, ModelConfig, PipelineConfig, VoxelConfig,
)
from gloc3d_tpu.models import build_model
from gloc3d_tpu.parallel import make_mesh
from gloc3d_tpu.config import MeshConfig
from gloc3d_tpu.pipeline import GlobalLocalizer
from test_pipeline import scan_at

N_PTS = 2048


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig(
        bev=BEVConfig(image_size=128, max_points=N_PTS),
        voxel=VoxelConfig(max_points=N_PTS),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                          compute_dtype="float32"),
        index=IndexConfig(dim=128, top_k=3, capacity=32),
        match=MatchConfig(image_size=128, min_score=0.1,
                          min_overlap_pixels=16),
    )
    model = build_model(cfg.model, cfg.voxel)
    p0, m0 = scan_at(0, 0, 0, n=N_PTS)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(p0[None]), jnp.asarray(m0[None])
    )
    return cfg, model, params


def test_sharded_extraction_matches_single(setup):
    cfg, model, params = setup
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(MeshConfig(num_devices=8))

    scans = [scan_at(x * 7.0 - 28, (x % 3) * 9.0 - 9, 0.3 * x, n=N_PTS)
             for x in range(8)]
    pts = np.stack([s[0] for s in scans])
    masks = np.stack([s[1] for s in scans])

    base = GlobalLocalizer(cfg, model, params)
    d0, bev0, _ = base.extract(pts, masks)

    dp = GlobalLocalizer(cfg, model, params)
    dp.shard_extraction(mesh)
    d1, bev1, _ = dp.extract(pts, masks)

    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bev0.image), np.asarray(bev1.image),
                               atol=1e-6)


def test_sharded_extraction_build_then_locate(setup):
    cfg, model, params = setup
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(MeshConfig(num_devices=8))
    loc = GlobalLocalizer(cfg, model, params)
    loc.shard_extraction(mesh)
    poses = [(-30, -30, 0.0), (25, 5, 1.2), (0, 0, 0.5), (10, -10, 2.0),
             (-15, 10, 0.9), (30, 0, 1.5), (-5, -20, 0.2), (15, 20, 2.5)]
    scans = [scan_at(*p, n=N_PTS) for p in poses]
    loc.add_keyframes(np.stack([s[0] for s in scans]),
                      np.stack([s[1] for s in scans]))
    assert len(loc.bank) == 8
    res = loc.locate(*scan_at(25, 5, 1.2, n=N_PTS))
    assert res.success and res.db_index == 1


def test_sharded_extraction_composes_with_host_stats(setup):
    cfg, model, params = setup
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(MeshConfig(num_devices=8))
    scans = [scan_at(x * 7.0 - 28, 5.0, 0.2 * x, n=N_PTS) for x in range(8)]
    pts = np.stack([s[0] for s in scans])
    masks = np.stack([s[1] for s in scans])

    base = GlobalLocalizer(cfg, model, params, host_stats=True)
    d0, bev0, _ = base.extract(pts, masks)

    dp = GlobalLocalizer(cfg, model, params, host_stats=True)
    dp.shard_extraction(mesh)
    d1, bev1, _ = dp.extract(pts, masks)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(bev0.image),
                                  np.asarray(bev1.image))
