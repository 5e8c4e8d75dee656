"""locate_fused: one-device-call localization == the two-call locate().

The fused program runs extraction → bank search → HBM-store candidate
gather → staged registration in a single jit; staged_first becomes a
lax.cond (the full-K branch only executes on device when the top candidate
fails). Results must be identical to locate() in every case: staged
success, staged failure + fallback, and total failure.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gloc3d_tpu.config import (
    BEVConfig, IndexConfig, MatchConfig, ModelConfig, PipelineConfig,
    VoxelConfig,
)
from gloc3d_tpu.models import build_model
from gloc3d_tpu.pipeline import GlobalLocalizer
from test_pipeline import scan_at

N_PTS = 2048


def _cfg(**match_kw):
    return PipelineConfig(
        bev=BEVConfig(image_size=128, max_points=N_PTS),
        voxel=VoxelConfig(max_points=N_PTS),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                          compute_dtype="float32"),
        index=IndexConfig(dim=128, top_k=3, capacity=32),
        match=MatchConfig(image_size=128, min_score=0.1,
                          min_overlap_pixels=16, **match_kw),
    )


def _build(cfg, **kw):
    model = build_model(cfg.model, cfg.voxel)
    pts, mask = scan_at(0, 0, 0, n=N_PTS)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    loc = GlobalLocalizer(cfg, model, params, device_keyframes=True, **kw)
    scans = [scan_at(-30, -30, 0.0, n=N_PTS), scan_at(30, 0, 1.5, n=N_PTS),
             scan_at(0, 35, 2.8, n=N_PTS)]
    loc.add_keyframes(np.stack([s[0] for s in scans]),
                      np.stack([s[1] for s in scans]))
    return loc


def _assert_equal(rf, rl):
    assert rf.success == rl.success
    assert rf.db_index == rl.db_index
    np.testing.assert_array_equal(rf.candidates, rl.candidates)
    if rl.success:
        np.testing.assert_allclose(rf.match_score, rl.match_score,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(rf.match_xy_yaw, rl.match_xy_yaw,
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(rf.pose.translation), np.asarray(rl.pose.translation),
            atol=1e-4)


def test_fused_equals_locate():
    loc = _build(_cfg())
    for q in [scan_at(30.5, 0.4, 1.45, n=N_PTS),        # staged success
              scan_at(-29.0, -30.5, 0.1, n=N_PTS),
              scan_at(500.0, 500.0, 0.0, n=N_PTS)]:     # fails everywhere
        rl = loc.locate(*q)
        rf = loc.locate_fused(*q)
        _assert_equal(rf, rl)


def test_fused_unstaged_and_host_stats():
    # staged_first off: fused runs the full-K match directly
    loc = _build(_cfg(staged_first=False))
    q = scan_at(30.5, 0.4, 1.45, n=N_PTS)
    _assert_equal(loc.locate_fused(*q), loc.locate(*q))

    # host_stats serving variant: stats/BEV at IO time + one device call
    loc_h = _build(_cfg(), host_stats=True)
    _assert_equal(loc_h.locate_fused(*q), loc_h.locate(*q))


def test_fused_int8_bank():
    cfg = _cfg()
    cfg = cfg.replace(index=cfg.index.replace(quantize="int8"))
    loc = _build(cfg)
    assert loc.bank._quantized
    q = scan_at(30.5, 0.4, 1.45, n=N_PTS)
    _assert_equal(loc.locate_fused(*q), loc.locate(*q))


def test_fused_guards():
    cfg = _cfg()
    model = build_model(cfg.model, cfg.voxel)
    pts, mask = scan_at(0, 0, 0, n=N_PTS)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    loc = GlobalLocalizer(cfg, model, params)   # no device store
    loc.add_keyframes(pts[None], mask[None])
    with pytest.raises(RuntimeError, match="device_keyframes"):
        loc.locate_fused(pts, mask)


def test_fused_ivf_backend():
    """City-scale composition: IVF routing (+int8 cells) inside the fused
    program; results match the classic IVF locate()."""
    cfg = _cfg()
    cfg = cfg.replace(index=cfg.index.replace(
        backend="ivf", quantize="int8", ivf_num_cells=4,
        ivf_cell_capacity=16, ivf_nprobe=4, ivf_train_sample=16))
    loc = _build(cfg)
    q = scan_at(30.5, 0.4, 1.45, n=N_PTS)
    rl = loc.locate(*q)
    rf = loc.locate_fused(*q)
    _assert_equal(rf, rl)   # which keyframe wins depends on the tiny
    # 4-cell quantizer — parity with locate() is the contract here
    assert rf.success
