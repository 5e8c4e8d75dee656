"""Spatial-partition (SP) extraction must equal the single-device forward.

One image's conv stack is computed by all 8 virtual devices (height-sharded
input; GSPMD inserts the 3×3 halo exchanges and the NetVLAD psum). New
capability vs the reference (SURVEY §2.3); correctness is bit-level for the
conv slabs and reduction-order-level for the pooled descriptor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gloc3d_tpu.config import (
    BEVConfig, IndexConfig, MatchConfig, MeshConfig, ModelConfig,
    PipelineConfig, VoxelConfig,
)
from gloc3d_tpu.models import build_model
from gloc3d_tpu.parallel import make_mesh, spatial_sharded_apply
from gloc3d_tpu.parallel.spatial import check_divisible
from gloc3d_tpu.pipeline import GlobalLocalizer

S = 128  # 128 rows over 8 devices → 16-row slabs; 8 rows entering conv5


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig(
        bev=BEVConfig(image_size=S, max_points=512),
        voxel=VoxelConfig(max_points=512),
        model=ModelConfig(encoder="vgg16", encoder_dim=512, num_clusters=8,
                          compute_dtype="float32"),
        index=IndexConfig(dim=512, top_k=3, capacity=16),
        match=MatchConfig(image_size=S, min_score=0.05, min_overlap_pixels=4),
    )
    model = build_model(cfg.model, cfg.voxel)
    rng = np.random.RandomState(0)
    img = (rng.rand(1, S, S, 3) > 0.02).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(img))
    return cfg, model, params


def test_spatial_sharded_apply_matches_single(setup):
    cfg, model, params = setup
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(MeshConfig(num_devices=8))

    rng = np.random.RandomState(1)
    imgs = (rng.rand(2, S, S, 3) > 0.02).astype(np.float32)

    ref = jax.jit(model.apply)(params, jnp.asarray(imgs))
    fn = spatial_sharded_apply(mesh, model)
    out = fn(params, jnp.asarray(imgs))

    # convs are exact under halo exchange; the VLAD spatial sums reduce in a
    # different (per-shard, then psum) order → fp tolerance only there
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_shard_spatial_pipeline_equal(setup):
    """GlobalLocalizer.shard_spatial: the i2i image path localizes to the
    same keyframes/poses as the single-device pipeline."""
    cfg, model, params = setup
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(MeshConfig(num_devices=8))

    rng = np.random.RandomState(2)
    # structured synthetic "BEV occupancy" images: random wall segments
    def wall_img(seed):
        r = np.random.RandomState(seed)
        img = np.ones((S, S), np.float32)
        for _ in range(12):
            x0, y0 = r.randint(10, S - 10, 2)
            dx, dy = r.randint(-1, 2), r.randint(-1, 2)
            if dx == 0 and dy == 0:
                dx = 1
            for t in range(r.randint(10, 40)):
                x, y = x0 + dx * t, y0 + dy * t
                if 0 <= x < S and 0 <= y < S:
                    img[y, x] = 0.0
        return img

    db = np.stack([wall_img(s) for s in range(8)])
    db3 = np.repeat(db[..., None], 3, axis=-1)
    q3 = db3[:2].copy()

    base = GlobalLocalizer(cfg, model, params)
    base.add_keyframes(db3)
    res_base = base.locate_batch(q3)

    sp = GlobalLocalizer(cfg, model, params)
    sp.shard_spatial(mesh)
    sp.add_keyframes(db3)
    res_sp = sp.locate_batch(q3)

    for rb, rs in zip(res_base, res_sp):
        assert rb.success == rs.success
        assert rb.db_index == rs.db_index
        # the psum reduces the VLAD spatial sum in a different order, so
        # near-tied candidate distances may swap ranks below the top hit —
        # require the same top-1 and the same candidate SET
        assert rb.candidates[0] == rs.candidates[0]
        assert set(rb.candidates.tolist()) == set(rs.candidates.tolist())
        if rb.success:
            np.testing.assert_allclose(
                np.asarray(rs.pose.translation),
                np.asarray(rb.pose.translation), atol=1e-4)


def test_check_divisible():
    check_divisible(768, 8)   # 48 rows at conv5 over 8 → 6-row slabs: fine
    with pytest.raises(ValueError):
        check_divisible(192, 8, n_pools=4)  # 12 rows at conv5 won't tile 8
    with pytest.raises(ValueError):
        check_divisible(100, 8)


def test_shard_spatial_rejects_pointpillar():
    cfg = PipelineConfig.s2s()
    cfg = cfg.replace(voxel=cfg.voxel.replace(max_points=256),
                      bev=cfg.bev.replace(max_points=256, image_size=64))
    model = build_model(cfg.model, cfg.voxel)
    pts = np.zeros((1, 256, 4), np.float32)
    mask = np.zeros((1, 256), np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(mask))
    loc = GlobalLocalizer(cfg, model, params)
    mesh = make_mesh(MeshConfig(num_devices=min(8, jax.device_count())))
    with pytest.raises(ValueError):
        loc.shard_spatial(mesh)
