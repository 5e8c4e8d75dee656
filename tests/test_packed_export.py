"""Packed-model equivalence and export round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.models.packed import PointPillarPacked, PoseHead, pack_points
from gloc3d_tpu.models.pointpillar import PointPillar

XB, YB, ZB = (-10.0, 10.0, 0.5), (-6.0, 6.0, 0.5), (-10.0, 10.0, 20.0)


def _scan(seed=0, b=1, n=256):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(-9, 9, (b, n))
    pts[..., 1] = rng.uniform(-5, 5, (b, n))
    pts[..., 2] = rng.uniform(0, 3, (b, n))
    pts[..., 3] = rng.uniform(0, 1, (b, n))
    mask = (rng.uniform(size=(b, n)) > 0.1).astype(np.float32)
    return jnp.asarray(pts), jnp.asarray(mask)


def test_packed_equals_fused():
    """pack_points → PointPillarPacked == PointPillar end to end."""
    pts, mask = _scan()
    fused = PointPillar(xbound=XB, ybound=YB, zbound=ZB,
                        compute_dtype=jnp.float32)
    params = fused.init(jax.random.PRNGKey(0), pts, mask)
    want = fused.apply(params, pts, mask, mode="vlad")

    packed_model = PointPillarPacked(xbound=XB, ybound=YB, zbound=ZB,
                                     compute_dtype=jnp.float32)
    packed = pack_points(pts, mask, XB, YB, ZB)
    assert packed.shape[-1] == 16
    # same parameter tree transfers directly
    got = packed_model.apply(params, packed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pose_head():
    rng = jax.random.PRNGKey(1)
    enc_q = jax.random.normal(rng, (2, 16, 16, 32))
    enc_p = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 32))
    head = PoseHead()
    params = head.init(rng, enc_q, enc_p)
    out = head.apply(params, enc_q, enc_p)
    assert out.shape == (2, 6)
    assert bool(jnp.isfinite(out).all())


def test_export_roundtrip():
    from gloc3d_tpu.export import export_fn, load_exported

    def fn(x, y):
        return jnp.tanh(x) @ y

    x = jnp.ones((4, 8))
    y = jnp.ones((8, 3))
    blob = export_fn(fn, x, y)
    assert isinstance(blob, (bytes, bytearray))
    restored = load_exported(bytes(blob))
    np.testing.assert_allclose(
        np.asarray(restored(x, y)), np.asarray(fn(x, y)), atol=1e-6
    )


def test_export_descriptor_model():
    from gloc3d_tpu.config import ModelConfig, VoxelConfig
    from gloc3d_tpu.export import export_descriptor_model, load_exported
    from gloc3d_tpu.models import build_model

    cfg = ModelConfig(encoder="pointpillar", encoder_dim=128,
                      compute_dtype="float32")
    vc = VoxelConfig(max_points=256, xbound=XB, ybound=YB, zbound=ZB)
    model = build_model(cfg, vc)
    pts, mask = _scan()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pts, mask)
    blob = export_descriptor_model(model, params, pts, mask)
    fn = load_exported(bytes(blob))
    want = model.apply(params, pts, mask)
    np.testing.assert_allclose(np.asarray(fn(pts, mask)), np.asarray(want),
                               atol=1e-5)
