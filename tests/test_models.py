"""Model tests: shapes, invariants, and reference-semantics checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gloc3d_tpu.config import ModelConfig, VoxelConfig
from gloc3d_tpu.models import NetVLAD, PointPillar, VGG16Encoder, build_model
from gloc3d_tpu.models.losses import (
    batched_quadruplet_loss,
    batched_triplet_loss,
    pose_loss,
    training_triplet_loss,
    triplet_margin_loss,
)
from gloc3d_tpu.models.netvlad import init_netvlad_params
from gloc3d_tpu.models.pointpillar import resize_bilinear_align_corners

KEY = jax.random.PRNGKey(0)


# -------------------- NetVLAD --------------------

def test_netvlad_fc_shape_and_norm_structure():
    m = NetVLAD(num_clusters=8, dim=16, use_fc=True)
    x = jax.random.normal(KEY, (2, 6, 6, 16))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == (2, 16)


def test_netvlad_classic_is_unit_norm():
    m = NetVLAD(num_clusters=8, dim=16, use_fc=False)
    x = jax.random.normal(KEY, (3, 4, 4, 16))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == (3, 8 * 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-4)


def test_netvlad_matches_loop_formula():
    """The einsum aggregation equals the reference's per-cluster loop."""
    k, d = 4, 8
    m = NetVLAD(num_clusters=k, dim=d, use_fc=False, normalize_input=True)
    x = jax.random.normal(KEY, (2, 3, 3, d))
    params = m.init(KEY, x)
    out = np.asarray(m.apply(params, x))

    # reference loop (netvlad_fc.py:80-102) in numpy
    p = params["params"]
    w = np.asarray(p["conv_weight"])          # (C, K)
    c = np.asarray(p["centroids"])            # (K, C)
    xf = np.asarray(x).reshape(2, -1, d)
    xf = xf / np.linalg.norm(xf, axis=-1, keepdims=True)
    logits = xf @ w                           # (B, HW, K)
    a = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    vlad = np.zeros((2, k, d))
    for b in range(2):
        for ki in range(k):
            residual = xf[b] - c[ki]          # (HW, C)
            vlad[b, ki] = (residual * a[b, :, ki : ki + 1]).sum(0)
    vlad /= np.maximum(np.linalg.norm(vlad, axis=2, keepdims=True), 1e-12)
    vlad = vlad.reshape(2, -1)
    vlad /= np.maximum(np.linalg.norm(vlad, axis=1, keepdims=True), 1e-12)
    np.testing.assert_allclose(out, vlad, atol=2e-3)


def test_netvlad_init_params_vladv1():
    k, d = 8, 16
    m = NetVLAD(num_clusters=k, dim=d, use_fc=True)
    x = jax.random.normal(KEY, (1, 4, 4, d))
    params = m.init(KEY, x)
    rng = np.random.RandomState(0)
    clsts = rng.randn(k, d).astype(np.float32)
    descs = rng.randn(100, d).astype(np.float32)
    new = init_netvlad_params(params["params"], clsts, descs, vladv2=False)
    np.testing.assert_allclose(np.asarray(new["centroids"]), clsts, atol=1e-6)
    # conv weight must be alpha * normalized centroids (transposed)
    w = np.asarray(new["conv_weight"])
    norm_c = clsts / np.linalg.norm(clsts, axis=1, keepdims=True)
    ratios = w.T / norm_c
    assert np.allclose(ratios, ratios.flat[0], atol=1e-3)  # single alpha
    m.apply({"params": new}, x)  # still runs


# -------------------- PointPillar --------------------

def test_pointpillar_shapes():
    vc = VoxelConfig()
    m = PointPillar(xbound=vc.xbound, ybound=vc.ybound, zbound=vc.zbound,
                    compute_dtype=jnp.float32)
    pts = jax.random.uniform(KEY, (1, 256, 4), minval=-20, maxval=20)
    mask = jnp.ones((1, 256))
    params = m.init(KEY, pts, mask, mode="both")  # create both heads' params
    out = m.apply(params, pts, mask, mode="vlad")
    # grid 140x80, swapped spatial axes -> (B, 80, 140, 128)
    assert out.shape == (1, 80, 140, 128)
    both = m.apply(params, pts, mask, mode="both")
    assert both[0].shape == both[1].shape == (1, 80, 140, 128)
    clustered = m.apply(params, pts, mask, mode="cluster")
    norms = np.linalg.norm(np.asarray(clustered), axis=-1)
    # norms are <= 1: ~1 where features are nonzero, -> 0 on (near-)empty
    # cells where the normalization eps dominates (torch F.normalize ditto)
    assert norms.max() <= 1.0 + 1e-3
    assert (np.abs(norms - 1.0) < 1e-3).any()


def test_pointpillar_mask_invariance():
    """Padded points must not change the descriptor map.

    BN uses batch stats over all points (reference quirk), so compare in eval
    mode with running averages where padding truly is inert after the mask.
    """
    vc = VoxelConfig()
    m = PointPillar(xbound=vc.xbound, ybound=vc.ybound, zbound=vc.zbound,
                    compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    real = rng.uniform(-15, 15, (128, 4)).astype(np.float32)
    a = np.zeros((1, 256, 4), np.float32)
    a[0, :128] = real
    mask_a = np.zeros((1, 256), np.float32)
    mask_a[0, :128] = 1
    b = a.copy()
    b[0, 128:] = rng.uniform(-15, 15, (128, 4))  # different padding CONTENT
    params = m.init(KEY, jnp.asarray(a), jnp.asarray(mask_a))
    out_a = m.apply(params, jnp.asarray(a), jnp.asarray(mask_a), mode="vlad")
    out_b = m.apply(params, jnp.asarray(b), jnp.asarray(mask_a), mode="vlad")
    # NOTE: reference quirk — padded rows still pollute PointNet BN stats in
    # train mode and voxel-0 centroid/counts. In eval mode (running stats)
    # masked rows are zeroed after the PointNet, but their presence in
    # scatter_mean denominators only affects voxel 0. Everything else equal:
    diff = np.abs(np.asarray(out_a) - np.asarray(out_b))
    assert np.median(diff) < 1e-5


def test_resize_align_corners_matches_torch_semantics():
    # 1D ramp: align_corners=True keeps endpoints exactly.
    x = jnp.arange(4.0).reshape(1, 4, 1, 1)
    out = resize_bilinear_align_corners(x, 2)
    assert out.shape == (1, 8, 2, 1)
    v = np.asarray(out[0, :, 0, 0])
    assert v[0] == 0.0 and v[-1] == 3.0
    expected = np.arange(8) * 3.0 / 7.0
    np.testing.assert_allclose(v, expected, atol=1e-5)


# -------------------- VGG16 --------------------

def test_vgg16_shape():
    m = VGG16Encoder(compute_dtype=jnp.float32)
    x = jax.random.uniform(KEY, (1, 96, 96, 3))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == (1, 6, 6, 512)  # stride 16


def test_descriptor_model_i2i():
    cfg = ModelConfig(encoder="vgg16", encoder_dim=512, compute_dtype="float32")
    m = build_model(cfg)
    x = jax.random.uniform(KEY, (2, 96, 96, 3))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == (2, 512)


def test_vgg16_pack_width_matches_direct():
    """Width-pair-packed first block (PackedPairConv): identical parameter
    tree + init draws, and fp32 outputs equal to the direct conv up to
    accumulation-order noise (models/vgg.py; measured exact on TPU in
    tools/profile_i2i_pack.py)."""
    mp = VGG16Encoder(compute_dtype=jnp.float32)  # pack_width=True default
    md = VGG16Encoder(compute_dtype=jnp.float32, pack_width=False)
    x = jax.random.uniform(KEY, (1, 64, 64, 3))
    pp = mp.init(KEY, x)
    pd = md.init(KEY, x)
    jax.tree_util.tree_map(np.testing.assert_array_equal, pp, pd)
    yp = mp.apply(pp, x)
    yd = md.apply(pd, x)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yd),
                               rtol=1e-5, atol=1e-5)


def test_vgg16_pack_width_odd_size_falls_back():
    """Odd image sizes can't column-pair; the packed encoder must fall back
    to the direct path with the same parameter tree."""
    m = VGG16Encoder(compute_dtype=jnp.float32)
    x = jax.random.uniform(KEY, (1, 33, 33, 3))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == (1, 2, 2, 512)  # floor pools: 33→16→8→4→2


def test_vgg16_pack_width_grads_flow_to_canonical_params():
    """Gradients through the packed rearrangement land on the canonical
    (3, 3, C, 64) kernels (training with pack_width on is supported)."""
    m = VGG16Encoder(compute_dtype=jnp.float32)
    x = jax.random.uniform(KEY, (1, 32, 32, 3))
    params = m.init(KEY, x)

    g = jax.grad(lambda p: m.apply(p, x).sum())(params)
    g0 = np.asarray(g["params"]["conv0"]["kernel"])
    assert g0.shape == (3, 3, 3, 64)
    assert np.abs(g0).max() > 0.0


def test_descriptor_model_s2s():
    cfg = ModelConfig(encoder="pointpillar", encoder_dim=128, compute_dtype="float32")
    m = build_model(cfg)
    pts = jax.random.uniform(KEY, (2, 128, 4), minval=-20, maxval=20)
    mask = jnp.ones((2, 128))
    params = m.init(KEY, pts, mask)
    out = m.apply(params, pts, mask)
    assert out.shape == (2, 128)


# -------------------- losses --------------------

def test_triplet_margin_loss_zero_when_easy():
    a = jnp.zeros((2, 4))
    p = jnp.zeros((2, 4))
    n = jnp.ones((2, 4)) * 10
    assert float(triplet_margin_loss(a, p, n, margin=0.316)) < 1e-2


def test_training_triplet_loss_mask():
    q = jnp.zeros((1, 4))
    pos = jnp.ones((1, 4)) * 0.5
    negs = jnp.stack([jnp.ones((4,)) * 0.1, jnp.ones((4,)) * 99.0])[None]
    m_all = jnp.ones((1, 2))
    m_one = jnp.asarray([[1.0, 0.0]])
    l_all = float(training_triplet_loss(q, pos, negs, m_all, 0.316))
    l_one = float(training_triplet_loss(q, pos, negs, m_one, 0.316))
    # the hard negative (0.1) violates the margin; masking the easy one
    # doubles the per-negative normalization weight
    assert l_one == pytest.approx(2 * l_all, rel=1e-4)


def test_batched_losses_run():
    rng = jax.random.PRNGKey(1)
    q = jax.random.normal(rng, (3, 8))
    pos = jax.random.normal(rng, (3, 2, 8))
    negs = jax.random.normal(rng, (3, 5, 8))
    on = jax.random.normal(rng, (3, 8))
    for lazy in (False, True):
        for izl in (False, True):
            l1 = batched_triplet_loss(q, pos, negs, 0.5, lazy=lazy, ignore_zero_loss=izl)
            l2 = batched_quadruplet_loss(q, pos, negs, on, 0.5, 0.2, lazy=lazy, ignore_zero_loss=izl)
            assert jnp.isfinite(l1) and jnp.isfinite(l2)


def test_pose_loss_zero_at_identity():
    gt = jnp.asarray([[0.1, 0.2, -0.1, 1.0, 2.0, 3.0]])
    assert float(pose_loss(gt, gt)) < 1e-4
    pred = gt.at[0, 3].add(1.0)
    assert float(pose_loss(pred, gt)) == pytest.approx(1.0, abs=1e-3)
