"""host_stats serving mode: zero-device-scatter extraction must reproduce
the default GlobalLocalizer results (descriptors up to fp reassociation,
BEV images exactly — the projection is order-invariant)."""

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


def _cfg():
    return PipelineConfig(
        bev=BEVConfig(image_size=128, max_points=N_PTS),
        voxel=VoxelConfig(max_points=N_PTS),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                          compute_dtype="float32"),
        index=IndexConfig(dim=128, top_k=3, capacity=32),
        match=MatchConfig(image_size=128, min_score=0.1,
                          min_overlap_pixels=16),
    )


def test_host_stats_extract_matches_default():
    cfg = _cfg()
    model = build_model(cfg.model, cfg.voxel)
    pts, mask = scan_at(3, -5, 0.7, n=N_PTS)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    base = GlobalLocalizer(cfg, model, params)
    fast = GlobalLocalizer(cfg, model, params, host_stats=True)
    assert fast.host_stats

    d0, bev0, _ = base.extract(pts[None], mask[None])
    d1, bev1, _ = fast.extract(pts[None], mask[None])
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_array_equal(np.asarray(bev0.image),
                                  np.asarray(bev1.image))
    np.testing.assert_allclose(np.asarray(bev0.origin_xy),
                               np.asarray(bev1.origin_xy), atol=1e-6)


def test_host_stats_locate_end_to_end():
    cfg = _cfg()
    model = build_model(cfg.model, cfg.voxel)
    pts, mask = scan_at(0, 0, 0, n=N_PTS)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    loc = GlobalLocalizer(cfg, model, params, host_stats=True)
    scans = [scan_at(-30, -30, 0.0, n=N_PTS), scan_at(25, 5, 1.2, n=N_PTS)]
    loc.add_keyframes(np.stack([s[0] for s in scans]),
                      np.stack([s[1] for s in scans]))
    res = loc.locate(*scan_at(25, 5, 1.2, n=N_PTS))
    assert res.success and res.db_index == 1


def test_host_stats_guards():
    """host_stats is dropped for non-pointpillar encoders (image encoders
    have no voxel stats to precompute); align_ground now COMPOSES."""
    cfg = _cfg()
    icfg = cfg.replace(model=cfg.model.replace(encoder="vgg16",
                                               encoder_dim=512))
    imodel = build_model(icfg.model, icfg.voxel)
    img = np.zeros((1, 128, 128, 3), np.float32)
    iparams = jax.jit(imodel.init)(jax.random.PRNGKey(0), jnp.asarray(img))
    loc = GlobalLocalizer(icfg, imodel, iparams, host_stats=True)
    assert not loc.host_stats


def test_host_stats_composes_with_align_ground():
    """GlobalLocalizer(host_stats=True, align_ground=True): the device
    aligns the cloud, the host bins the aligned floats — results match the
    all-device aligned path (global_localization.cpp:419-449 aligned db
    construction on the serving fast path)."""
    cfg = _cfg()
    model = build_model(cfg.model, cfg.voxel)
    # a scan with a dense tilted ground plane so the estimate is stable
    rng = np.random.RandomState(0)
    n_g = N_PTS // 2
    gx = rng.uniform(-15, 15, n_g)
    gy = rng.uniform(-15, 15, n_g)
    gz = 0.06 * gx - 0.04 * gy - 1.5  # tilted plane under the sensor
    walls, wmask = scan_at(3, -5, 0.7, n=N_PTS)
    pts = walls.copy()
    pts[:n_g, 0], pts[:n_g, 1], pts[:n_g, 2] = gx, gy, gz
    mask = np.maximum(wmask, np.concatenate(
        [np.ones(n_g, np.float32), np.zeros(N_PTS - n_g, np.float32)]))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    base = GlobalLocalizer(cfg, model, params, align_ground=True, seed=7)
    fast = GlobalLocalizer(cfg, model, params, align_ground=True,
                           host_stats=True, seed=7)
    assert fast.host_stats and fast.align_ground

    d0, bev0, g0 = base.extract(pts[None], mask[None])
    d1, bev1, g1 = fast.extract(pts[None], mask[None])
    assert g1 is not None
    # same jitted ground program + same key sequence -> same transform
    np.testing.assert_allclose(
        np.asarray(g0.transform.rotation), np.asarray(g1.transform.rotation),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g0.transform.translation),
        np.asarray(g1.transform.translation), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(bev0.image),
                                  np.asarray(bev1.image))
    np.testing.assert_allclose(np.asarray(bev0.origin_xy),
                               np.asarray(bev1.origin_xy), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               atol=2e-4, rtol=2e-3)
