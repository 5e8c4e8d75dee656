"""Index layer tests: exact top-k vs numpy, k-means quality, bank semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import IndexConfig
from gloc3d_tpu.index import DescriptorBank, kmeans
from gloc3d_tpu.ops.topk import l2_topk


def test_l2_topk_matches_numpy():
    rng = np.random.RandomState(0)
    q = rng.randn(7, 32).astype(np.float32)
    b = rng.randn(100, 32).astype(np.float32)
    d2, idx = l2_topk(jnp.asarray(q), jnp.asarray(b), 5)
    ref = ((q[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    ref_idx = np.argsort(ref, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(
        np.asarray(d2), np.take_along_axis(ref, ref_idx, 1), rtol=1e-4, atol=1e-3
    )


def test_l2_topk_valid_mask():
    rng = np.random.RandomState(1)
    q = rng.randn(1, 8).astype(np.float32)
    b = np.tile(q, (10, 1))  # all identical -> dist 0
    valid = np.zeros(10, bool)
    valid[3] = valid[7] = True
    d2, idx = l2_topk(jnp.asarray(q), jnp.asarray(b), 2, jnp.asarray(valid))
    assert set(np.asarray(idx[0]).tolist()) == {3, 7}


def test_kmeans_separates_blobs():
    rng = np.random.RandomState(2)
    centers = rng.randn(4, 16) * 10
    data = np.concatenate(
        [c + rng.randn(50, 16) * 0.1 for c in centers]
    ).astype(np.float32)
    cents, assign = kmeans(jax.random.PRNGKey(0), jnp.asarray(data), 4, 50)
    assign = np.asarray(assign)
    # each blob maps to exactly one cluster
    for i in range(4):
        blob = assign[i * 50 : (i + 1) * 50]
        assert len(set(blob.tolist())) == 1
    # and clusters are distinct
    assert len(set(assign.tolist())) == 4
    # centroids near blob centers
    d = ((np.asarray(cents)[:, None, :] - centers[None]) ** 2).sum(-1).min(0)
    assert (d < 0.5).all()


def test_bank_add_query_roundtrip(tmp_path):
    cfg = IndexConfig(dim=16, top_k=3, capacity=8)
    bank = DescriptorBank(cfg)
    rng = np.random.RandomState(3)
    feats = rng.randn(20, 16).astype(np.float32)  # forces capacity doubling
    for f in feats:
        bank.add(f)
    assert len(bank) == 20
    d2, idx = bank.query(feats[5], k=1)
    assert idx[0, 0] == 5 and d2[0, 0] < 1e-6

    p = str(tmp_path / "bank.npz")
    bank.save(p)
    loaded = DescriptorBank.load(p)
    assert len(loaded) == 20
    d2, idx = loaded.query(feats[17], k=1)
    assert idx[0, 0] == 17


def test_bank_exclude_recent():
    cfg = IndexConfig(dim=8, top_k=2, num_exclude_recent=5, capacity=64)
    bank = DescriptorBank(cfg)
    rng = np.random.RandomState(4)
    feats = rng.randn(20, 8).astype(np.float32)
    bank.add(jnp.asarray(feats))
    # query with the very last entry; excluded window hides itself
    d2, idx = bank.query(feats[-1], exclude_recent=True)
    assert (idx < 15).all()
    d2_all, idx_all = bank.query(feats[-1], exclude_recent=False)
    assert idx_all[0, 0] == 19


def test_detect_loop_gate():
    cfg = IndexConfig(dim=8, top_k=2, num_exclude_recent=3,
                      metric_dist_threshold=0.5, capacity=64)
    bank = DescriptorBank(cfg)
    rng = np.random.RandomState(5)
    base = rng.randn(8).astype(np.float32)
    # not enough keyframes yet -> None
    bank.add(base)
    assert bank.detect_loop(base) is None
    for _ in range(10):
        bank.add(rng.randn(8).astype(np.float32) * 10)
    # a revisit: same descriptor as entry 0
    hit = bank.detect_loop(base + 0.01)
    assert hit is not None and hit[0] == 0
    miss = bank.detect_loop(rng.randn(8).astype(np.float32) * 100)
    assert miss is None


def test_int8_bank_rank_parity(tmp_path):
    """int8-quantized bank (IndexConfig.quantize='int8'): recall@k overlap
    with the exact fp32 ranking on unit-norm NetVLAD-like descriptors, exact
    self-match at rank 1, and a lossless save/load round-trip."""
    rng = np.random.RandomState(7)
    d = rng.randn(600, 128).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    cfg = IndexConfig(dim=128, capacity=64)  # also exercises growth
    fp = DescriptorBank(cfg)
    q8 = DescriptorBank(cfg.replace(quantize="int8"))
    fp.add(jnp.asarray(d))
    q8.add(jnp.asarray(d))

    queries = d[:40] + rng.randn(40, 128).astype(np.float32) * 0.01
    d2_fp, idx_fp = fp.query(queries, k=10)
    d2_q8, idx_q8 = q8.query(queries, k=10)

    # rank-1 (the near-duplicate) must agree exactly
    np.testing.assert_array_equal(idx_fp[:, 0], idx_q8[:, 0])
    # top-10 sets overlap >= 9/10 on average (quantization only perturbs
    # near-ties deep in the list)
    overlap = np.mean([
        len(set(a) & set(b)) for a, b in zip(idx_fp, idx_q8)])
    assert overlap >= 9.0, overlap
    # distances agree to quantization precision: the cross-term error is a
    # ~√D random walk of per-element code errors ≈ 2·|x|·(scale/2)·√D ≈
    # 2.5e-3 here — far below O(1) inter-descriptor distances (the tiny
    # absolute d2 in this test comes from the near-duplicate queries)
    np.testing.assert_allclose(d2_q8[:, 0], d2_fp[:, 0], atol=1e-2)

    # dequantized .data reproduces descriptors to code precision
    deq = np.asarray(q8.data)
    assert np.abs(deq - d).max() < (np.abs(d).max() / 127.0)

    # save/load round-trip is bit-exact on codes
    path = str(tmp_path / "bank_q.npz")
    q8.save(path)
    q8b = DescriptorBank.load(path)
    assert q8b._quantized and len(q8b) == len(q8)
    d2b, idxb = q8b.query(queries, k=10)
    np.testing.assert_array_equal(idxb, idx_q8)
    np.testing.assert_allclose(d2b, d2_q8, rtol=1e-5, atol=1e-6)


def test_int8_bank_exclude_recent():
    rng = np.random.RandomState(8)
    cfg = IndexConfig(dim=16, capacity=64, num_exclude_recent=4,
                      quantize="int8")
    bank = DescriptorBank(cfg)
    d = rng.randn(12, 16).astype(np.float32)
    bank.add(jnp.asarray(d))
    _, idx = bank.query(d[-1], k=3, exclude_recent=True)
    assert (idx < 8).all()


def test_blocked_topk_exact_at_map_scale():
    """Above _BLOCK_TOPK_MIN_N the selection runs two-stage (per-block
    top-k + merge); results must be IDENTICAL to single-pass lax.top_k,
    including the non-divisible-N padded tail and the valid-mask contract."""
    from gloc3d_tpu.ops import topk as tk

    rng = np.random.RandomState(11)
    n = tk._BLOCK_TOPK_MIN_N + 1234          # exercises the padded tail
    d = 16
    bank = rng.randn(n, d).astype(np.float32)
    q = bank[[5, n - 1000]] + 0.01

    d2, idx = jax.jit(lambda a, b: tk.l2_topk(a, b, 10))(
        jnp.asarray(q), jnp.asarray(bank))
    negs, flat_idx = jax.jit(lambda a, b: jax.lax.top_k(
        -((jnp.sum(a * a, 1)[:, None] - 2.0 * a @ b.T
           + jnp.sum(b * b, 1)[None, :])), 10))(
        jnp.asarray(q), jnp.asarray(bank))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(flat_idx))
    np.testing.assert_allclose(np.asarray(d2), np.maximum(-np.asarray(negs), 0),
                               rtol=1e-5, atol=1e-5)

    # valid-mask: masked rows never surface even at scale
    valid = np.ones(n, bool)
    valid[np.asarray(idx)[0, :5]] = False
    d2m, idxm = jax.jit(lambda a, b, v: tk.l2_topk(a, b, 10, v))(
        jnp.asarray(q), jnp.asarray(bank), jnp.asarray(valid))
    assert not set(np.asarray(idxm)[0]) & set(np.asarray(idx)[0, :5])

    # int8 variant goes through the same blocked selection
    codes, scales, bsq = jax.jit(tk.quantize_rows)(jnp.asarray(bank))
    d28, idx8 = jax.jit(lambda a, bq, s, n2: tk.l2_topk_int8(
        a, bq, s, n2, 10))(jnp.asarray(q), codes, scales, bsq)
    assert np.asarray(idx8)[0, 0] == 5 and np.asarray(idx8)[1, 0] == n - 1000
