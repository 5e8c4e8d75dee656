"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import MeshConfig
from gloc3d_tpu.ops.topk import l2_topk
from gloc3d_tpu.parallel import ShardedBank, make_mesh, shard_batch, sharded_topk


def test_mesh_has_8_devices(devices):
    mesh = make_mesh(MeshConfig())
    assert mesh.devices.size == 8


def test_sharded_topk_matches_single_chip(devices):
    mesh = make_mesh()
    rng = np.random.RandomState(0)
    q = rng.randn(4, 32).astype(np.float32)
    bank = rng.randn(640, 32).astype(np.float32)
    d2_ref, idx_ref = l2_topk(jnp.asarray(q), jnp.asarray(bank), 10)
    d2, idx = sharded_topk(mesh, jnp.asarray(q), jnp.asarray(bank), 10)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2_ref), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))


def test_sharded_topk_with_validity(devices):
    mesh = make_mesh()
    rng = np.random.RandomState(1)
    q = rng.randn(2, 16).astype(np.float32)
    bank = np.tile(q[0], (64, 1)).astype(np.float32)  # all rows identical
    valid = np.zeros(64, bool)
    valid[5] = valid[50] = True
    d2, idx = sharded_topk(mesh, jnp.asarray(q), jnp.asarray(bank), 2,
                           jnp.asarray(valid))
    assert set(np.asarray(idx[0]).tolist()) == {5, 50}


def test_sharded_bank(devices):
    mesh = make_mesh()
    bank = ShardedBank(mesh, dim=16, capacity=64)
    rng = np.random.RandomState(2)
    feats = rng.randn(40, 16).astype(np.float32)
    bank.add(feats)
    assert len(bank) == 40
    d2, idx = bank.query(feats[7], k=3)
    assert idx[0, 0] == 7 and d2[0, 0] < 1e-5
    # never returns unwritten slots
    assert (idx < 40).all()


def test_shard_batch_placement(devices):
    mesh = make_mesh()
    x = np.zeros((16, 4), np.float32)
    placed = shard_batch(mesh, {"a": x})
    shard_shapes = [s.data.shape for s in placed["a"].addressable_shards]
    assert all(s == (2, 4) for s in shard_shapes)


def test_sharded_bank_incremental_add_and_truncate(devices):
    """Device-side appends (no host round-trip) match a flat bank, and
    truncate/exclude_after bound the searchable prefix."""
    import jax.numpy as jnp

    from gloc3d_tpu.ops.topk import l2_topk
    from gloc3d_tpu.parallel import make_mesh
    from gloc3d_tpu.parallel.sharding import ShardedBank

    rng = np.random.RandomState(3)
    rows = rng.randn(48, 16).astype(np.float32)
    bank = ShardedBank(make_mesh(), dim=16, capacity=64)
    for i in range(0, 48, 5):  # ragged incremental batches
        bank.add(rows[i:i + 5])
    assert len(bank) == 48
    np.testing.assert_allclose(bank.to_host(), rows, atol=0)

    q = rows[7:9] + 0.01
    d2, idx = bank.query(q, k=4)
    d2_ref, idx_ref = l2_topk(jnp.asarray(q), jnp.asarray(rows), 4)
    np.testing.assert_array_equal(idx, np.asarray(idx_ref))
    np.testing.assert_allclose(d2, np.asarray(d2_ref), rtol=1e-5, atol=1e-6)

    # exclude_after: rows >= 8 unsearchable (SLAM window semantics)
    d2x, idxx = bank.query(q, k=4, exclude_after=8)
    assert (np.asarray(idxx) < 8).all()
    d2_ref2, idx_ref2 = l2_topk(
        jnp.asarray(q), jnp.asarray(rows), 4,
        jnp.arange(48) < 8,
    )
    np.testing.assert_array_equal(idxx, np.asarray(idx_ref2))

    bank.truncate(10)
    assert len(bank) == 10
    _, idxt = bank.query(q, k=4)
    assert (np.asarray(idxt) < 10).all()


def test_sharded_bank_int8_matches_flat_int8(devices):
    """int8-quantized sharded bank: identical results to the single-device
    int8 bank (same codes, same merge) and >=9/10 top-10 overlap with exact
    fp32 ranking."""
    from gloc3d_tpu.config import IndexConfig
    from gloc3d_tpu.index import DescriptorBank

    mesh = make_mesh()
    rng = np.random.RandomState(5)
    d = rng.randn(640, 64).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    q = d[:8] + 0.01 * rng.randn(8, 64).astype(np.float32)

    sb = ShardedBank(mesh, dim=64, capacity=640, quantize="int8")
    sb.add(d)
    d2_s, idx_s = sb.query(q, k=10)

    flat = DescriptorBank(IndexConfig(dim=64, capacity=640, quantize="int8"))
    flat.add(jnp.asarray(d))
    d2_f, idx_f = flat.query(q, k=10)

    np.testing.assert_array_equal(idx_s, idx_f)
    np.testing.assert_allclose(d2_s, d2_f, rtol=1e-5, atol=1e-5)

    d2_fp, idx_fp = l2_topk(jnp.asarray(q), jnp.asarray(d), 10)
    overlap = np.mean([
        len(set(a) & set(b)) for a, b in zip(idx_s, np.asarray(idx_fp))])
    assert overlap >= 9.0, overlap

    # dequantized host copy round-trips to code precision
    assert np.abs(sb.to_host() - d).max() < np.abs(d).max() / 127.0
