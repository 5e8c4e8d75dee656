"""Device-resident keyframe store (GlobalLocalizer(device_keyframes=True)).

Keyframe occupancy lives in HBM as a bit-packed (cap, S, S/8) uint8 array and
the match jit gathers candidates by index — no per-query host image stack.
Packing binarizes at the same <0.5 threshold the matcher itself applies
(ops/bev_match.py::_occupancy), so results must be IDENTICAL to the host
path. The reference keeps grids host-side and re-uploads per match
(loop_detector.cpp:183-288); HBM residency is the TPU-native serving design.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import (
    BEVConfig, IndexConfig, MatchConfig, ModelConfig, PipelineConfig,
    VoxelConfig,
)
from gloc3d_tpu.models import build_model
from gloc3d_tpu.pipeline import GlobalLocalizer, _pack_bits, _unpack_bits
from test_pipeline import scan_at

N_PTS = 2048


def _cfg(top_k=3):
    return PipelineConfig(
        bev=BEVConfig(image_size=128, max_points=N_PTS),
        voxel=VoxelConfig(max_points=N_PTS),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                          compute_dtype="float32"),
        index=IndexConfig(dim=128, top_k=top_k, capacity=32),
        match=MatchConfig(image_size=128, min_score=0.1,
                          min_overlap_pixels=16),
    )


def _build_pair(cfg, device_keyframes):
    model = build_model(cfg.model, cfg.voxel)
    pts, mask = scan_at(0, 0, 0, n=N_PTS)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pts[None]), jnp.asarray(mask[None])
    )
    return GlobalLocalizer(cfg, model, params,
                           device_keyframes=device_keyframes), model, params


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    img = (rng.rand(2, 64, 64) > 0.1).astype(np.float32)  # free=1, occ=0
    packed = np.asarray(jax.jit(_pack_bits)(jnp.asarray(img)))
    assert packed.shape == (2, 64, 8) and packed.dtype == np.uint8
    unpacked = np.asarray(jax.jit(_unpack_bits)(jnp.asarray(packed)))
    np.testing.assert_array_equal(unpacked, img)


def test_device_store_matches_host_path():
    cfg = _cfg()
    loc_h, model, params = _build_pair(cfg, device_keyframes=False)
    loc_d = GlobalLocalizer(cfg, model, params, device_keyframes=True)

    scans = [scan_at(-30, -30, 0.0, n=N_PTS), scan_at(30, 0, 1.5, n=N_PTS),
             scan_at(0, 35, 2.8, n=N_PTS)]
    pts = np.stack([s[0] for s in scans])
    masks = np.stack([s[1] for s in scans])
    loc_h.add_keyframes(pts, masks)
    loc_d.add_keyframes(pts, masks)
    assert loc_d._kf_store is not None and loc_d._kf_cap >= 3

    q = scan_at(30.5, 0.4, 1.45, n=N_PTS)
    rh = loc_h.locate(*q)
    rd = loc_d.locate(*q)
    assert rh.success and rd.success
    assert rh.db_index == rd.db_index == 1
    np.testing.assert_allclose(rd.match_score, rh.match_score, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(rd.match_xy_yaw, rh.match_xy_yaw, rtol=1e-5, atol=1e-4)

    # batch path, mixed success (staged splice), identical results
    q2 = scan_at(-29.0, -30.5, 0.1, n=N_PTS)
    far = scan_at(500.0, 500.0, 0.0, n=N_PTS)  # fails everywhere
    batch_pts = np.stack([q[0], q2[0], far[0]])
    batch_masks = np.stack([q[1], q2[1], far[1]])
    out_h = loc_h.locate_batch(batch_pts, batch_masks)
    out_d = loc_d.locate_batch(batch_pts, batch_masks)
    for a, b in zip(out_h, out_d):
        assert a.success == b.success
        assert a.db_index == b.db_index
        if a.success:
            np.testing.assert_allclose(b.match_score, a.match_score, rtol=1e-5, atol=1e-5)


def test_device_store_save_load_roundtrip(tmp_path):
    cfg = _cfg()
    loc, model, params = _build_pair(cfg, device_keyframes=True)
    scans = [scan_at(-30, -30, 0.0, n=N_PTS), scan_at(30, 0, 1.5, n=N_PTS)]
    loc.add_keyframes(np.stack([s[0] for s in scans]),
                      np.stack([s[1] for s in scans]))
    out = str(tmp_path / "db")
    loc.save(out)

    loc2 = GlobalLocalizer(cfg, model, params, device_keyframes=True)
    loc2.load(out)
    assert loc2._kf_store is not None
    np.testing.assert_array_equal(
        np.asarray(loc2._kf_store[:2]), np.asarray(loc._kf_store[:2]))
    res = loc2.locate(*scan_at(30, 0, 1.5, n=N_PTS))
    assert res.success and res.db_index == 1


def test_device_store_capacity_growth():
    cfg = _cfg(top_k=2)
    loc, _, _ = _build_pair(cfg, device_keyframes=True)
    # force growth past the first allocation
    loc._ensure_kf_capacity(1, 128)
    cap0 = loc._kf_cap
    base = scan_at(0, 0, 0, n=N_PTS)
    for i in range(3):
        loc.add_keyframes(base[0][None], base[1][None])
    loc._ensure_kf_capacity(cap0 + 1, 128)
    assert loc._kf_cap == cap0 * 2
    # rows written before growth survive it
    res = loc.locate(*base)
    assert res.success


def test_sharded_store_matches_single_device():
    """shard_keyframes(mesh): the bit-packed store shards on the keyframe
    axis; the match jit's by-index gather crosses the mesh via SPMD and
    results stay identical; post-shard adds keep the sharded layout."""
    from jax.sharding import Mesh

    cfg = _cfg()
    loc, model, params = _build_pair(cfg, device_keyframes=True)
    scans = [scan_at(-30, -30, 0.0, n=N_PTS), scan_at(30, 0, 1.5, n=N_PTS),
             scan_at(0, 35, 2.8, n=N_PTS)]
    loc.add_keyframes(np.stack([s[0] for s in scans]),
                      np.stack([s[1] for s in scans]))
    q = scan_at(30.5, 0.4, 1.45, n=N_PTS)
    r0 = loc.locate(*q)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    loc.shard_keyframes(mesh)
    assert len(loc._kf_store.sharding.device_set) == 8
    r1 = loc.locate(*q)
    assert r1.success and r1.db_index == r0.db_index
    np.testing.assert_allclose(r1.match_score, r0.match_score,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(r1.match_xy_yaw, r0.match_xy_yaw,
                               rtol=1e-6, atol=1e-6)

    # post-shard add lands sharded and is locatable
    extra = scan_at(29.5, 0.5, 1.4, n=N_PTS)  # near kf 1's features, so
    # the scan is non-empty; identical-scan query makes rank-1 = 3 exactly
    loc.add_keyframes(extra[0][None], extra[1][None])
    assert len(loc._kf_store.sharding.device_set) == 8
    row = np.asarray(loc._kf_store[3])
    want = np.asarray(jax.jit(_pack_bits)(jnp.asarray(
        loc.keyframes[3].image.astype(np.float32)[None] / 255.0)))[0]
    np.testing.assert_array_equal(row, want)   # post-shard add landed
    r2 = loc.locate(*extra)
    assert r2.success and r2.db_index == 3


def test_pack_binarizes_at_matcher_threshold():
    """Grayscale i2i probability images binarize in the store exactly as
    the matcher's own <0.5 occupancy threshold would (lossless for
    matching even though packing is 1-bit)."""
    rng = np.random.RandomState(3)
    img = rng.rand(1, 64, 64).astype(np.float32)      # full grayscale range
    img[0, 0, :8] = [0.0, 0.499, 0.5, 0.501, 1.0, 0.25, 0.75, 0.4999]
    unpacked = np.asarray(jax.jit(
        lambda x: _unpack_bits(_pack_bits(x)))(jnp.asarray(img)))
    want = np.where(img < 0.5, 0.0, 1.0)
    np.testing.assert_array_equal(unpacked, want)
    # matcher occupancy of the unpacked image == occupancy of the original
    np.testing.assert_array_equal(unpacked < 0.5, img < 0.5)


def test_host_mirror_off_matches_and_persists(tmp_path):
    """host_mirror=False (map-scale ingest): keyframe images live ONLY in
    the HBM store — no host RAM copy and no per-batch device→host image
    fetch. locate results must equal the mirrored store; save() must
    reconstruct binarized images from the store so a mirrored localizer
    can load the map."""
    import pytest

    cfg = _cfg()
    loc_m, model, params = _build_pair(cfg, device_keyframes=True)
    loc_n = GlobalLocalizer(cfg, model, params, device_keyframes=True,
                            host_mirror=False)

    with pytest.raises(ValueError):
        GlobalLocalizer(cfg, model, params, host_mirror=False)

    scans = [scan_at(-30, -30, 0.0, n=N_PTS), scan_at(30, 0, 1.5, n=N_PTS),
             scan_at(0, 35, 2.8, n=N_PTS)]
    pts = np.stack([s[0] for s in scans])
    masks = np.stack([s[1] for s in scans])
    loc_m.add_keyframes(pts, masks)
    loc_n.add_keyframes(pts, masks)
    assert loc_n.keyframes[0].image is None
    assert loc_m.keyframes[0].image is not None

    q = scan_at(30.5, 0.4, 1.45, n=N_PTS)
    rm = loc_m.locate(*q)
    rn = loc_n.locate(*q)
    assert rm.success and rn.success and rm.db_index == rn.db_index
    np.testing.assert_allclose(rn.match_score, rm.match_score,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(rn.match_xy_yaw, rm.match_xy_yaw,
                               rtol=1e-6, atol=1e-6)

    # one-program serving composes: locate_fused never touches host images
    rf = loc_n.locate_fused(*q)
    assert rf.success and rf.db_index == rm.db_index
    np.testing.assert_allclose(rf.match_score, rm.match_score,
                               rtol=1e-5, atol=1e-5)

    # save() reconstructs (binarized) images from the HBM store
    out = str(tmp_path / "map")
    loc_n.save(out)
    loc_2 = GlobalLocalizer(cfg, model, params, device_keyframes=True)
    loc_2.load(out)
    assert loc_2.keyframes[0].image is not None  # mirrored loader rehydrates
    want = np.where(loc_m.keyframes[1].image.astype(np.float32) / 255.0
                    < 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(loc_2.keyframes[1].image, want)
    r2 = loc_2.locate(*q)
    assert r2.success and r2.db_index == rm.db_index
    np.testing.assert_allclose(r2.match_score, rm.match_score,
                               rtol=1e-6, atol=1e-6)
