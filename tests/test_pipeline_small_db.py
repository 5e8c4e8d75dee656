"""Regression: locate with top_k larger than the database must not crash."""

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import (
    BEVConfig, IndexConfig, MatchConfig, ModelConfig, PipelineConfig, VoxelConfig,
)
from gloc3d_tpu.models import build_model
from gloc3d_tpu.pipeline import GlobalLocalizer
from test_pipeline import scan_at

N_PTS = 2048


def test_locate_with_db_smaller_than_topk():
    cfg = PipelineConfig(
        bev=BEVConfig(image_size=128, max_points=N_PTS),
        voxel=VoxelConfig(max_points=N_PTS),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                          compute_dtype="float32"),
        index=IndexConfig(dim=128, top_k=20, capacity=32),  # top_k >> db size
        match=MatchConfig(image_size=128, min_score=0.1, min_overlap_pixels=16),
    )
    model = build_model(cfg.model, cfg.voxel)
    pts, mask = scan_at(0, 0, 0, n=N_PTS)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    loc = GlobalLocalizer(cfg, model, params)
    scans = [scan_at(-30, -30, 0.0, n=N_PTS), scan_at(30, 0, 1.5, n=N_PTS)]
    loc.add_keyframes(np.stack([s[0] for s in scans]),
                      np.stack([s[1] for s in scans]))
    assert len(loc.bank) == 2
    res = loc.locate(*scan_at(30, 0, 1.5, n=N_PTS))  # identical to db[1]
    assert res.success
    assert res.db_index == 1
    # filler candidates were clamped, not out of range
    assert (np.asarray(res.candidates) < 32).all()


def test_locate_on_empty_database():
    """locate/locate_batch before any add_keyframes must fail gracefully."""
    cfg = PipelineConfig(
        bev=BEVConfig(image_size=128, max_points=N_PTS),
        voxel=VoxelConfig(max_points=N_PTS),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                          compute_dtype="float32"),
        index=IndexConfig(dim=128, top_k=5, capacity=16),
        match=MatchConfig(image_size=128),
    )
    model = build_model(cfg.model, cfg.voxel)
    pts, mask = scan_at(0, 0, 0, n=N_PTS)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    loc = GlobalLocalizer(cfg, model, params)
    res = loc.locate(pts, mask)
    assert not res.success and res.db_index == -1
    batch = loc.locate_batch(pts[None], mask[None])
    assert len(batch) == 1 and not batch[0].success


def test_staged_matching_equivalence():
    """locate() with staged_first on/off must return identical results."""
    base = PipelineConfig(
        bev=BEVConfig(image_size=128, max_points=N_PTS),
        voxel=VoxelConfig(max_points=N_PTS),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                          compute_dtype="float32"),
        index=IndexConfig(dim=128, top_k=4, capacity=32),
        match=MatchConfig(image_size=128, min_score=0.1,
                          min_overlap_pixels=16),
    )
    model = build_model(base.model, base.voxel)
    pts, mask = scan_at(0, 0, 0, n=N_PTS)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    poses = [(-30, -30, 0.0), (25, 5, 1.2), (0, 0, 0.5), (30, 0, 1.5)]
    queries = [scan_at(25, 5, 1.2, n=N_PTS),          # clean hit
               scan_at(60, 60, 0.0, n=N_PTS)]          # likely no match
    results = []
    for staged in (True, False):
        cfg = base.replace(match=base.match.replace(staged_first=staged))
        loc = GlobalLocalizer(cfg, model, params)
        scans = [scan_at(*p, n=N_PTS) for p in poses]
        loc.add_keyframes(np.stack([s[0] for s in scans]),
                          np.stack([s[1] for s in scans]))
        results.append([loc.locate(*q) for q in queries])
    for a, b in zip(*results):
        assert a.success == b.success and a.db_index == b.db_index
        if a.success:
            np.testing.assert_allclose(a.match_xy_yaw, b.match_xy_yaw,
                                       atol=1e-5)
            np.testing.assert_allclose(a.match_score, b.match_score,
                                       rtol=1e-5)
