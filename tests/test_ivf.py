"""IVF partitioned index tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.index.ivf import IVFBank
from gloc3d_tpu.ops.topk import l2_topk


def _data(n=2000, d=32, seed=0):
    rng = np.random.RandomState(seed)
    # clustered data (IVF's regime)
    centers = rng.randn(16, d) * 5
    return (centers[rng.randint(0, 16, n)] + rng.randn(n, d)).astype(np.float32)


def test_full_probe_is_exact():
    data = _data()
    bank = IVFBank(dim=32, num_cells=16, cell_capacity=64)
    bank.train(data[:500])
    bank.add(data)
    assert len(bank) == 2000
    q = data[123:128]
    d2, idx = bank.query(q, k=5, nprobe=16)  # probe all cells == exact
    d2_ref, idx_ref = l2_topk(jnp.asarray(q), jnp.asarray(data), 5)
    np.testing.assert_array_equal(idx, np.asarray(idx_ref))
    np.testing.assert_allclose(d2, np.asarray(d2_ref), rtol=1e-4, atol=1e-3)


def test_narrow_probe_high_recall():
    data = _data(seed=1)
    bank = IVFBank(dim=32, num_cells=16, cell_capacity=64, nprobe=4)
    bank.train(data[:500])
    bank.add(data)
    q = data[:50]
    _, idx = bank.query(q, k=1)
    # self-query: descriptor is its own nearest neighbour; nprobe=4 on
    # well-clustered data should almost always find it
    hits = (idx[:, 0] == np.arange(50)).mean()
    assert hits >= 0.95, hits


def test_cell_overflow_grows():
    rng = np.random.RandomState(2)
    data = rng.randn(300, 8).astype(np.float32) * 0.01  # all in one cell
    bank = IVFBank(dim=8, num_cells=4, cell_capacity=16)
    bank.train(data[:100])
    bank.add(data)
    assert len(bank) == 300
    assert bank.cell_capacity >= 300 / 4
    _, idx = bank.query(data[7], k=1, nprobe=4)
    assert idx[0, 0] == 7


def test_bulk_add_matches_small_batches():
    data = _data(seed=3)
    a = IVFBank(dim=32, num_cells=16, cell_capacity=256)
    a.train(data[:500])
    a.add(data)  # one bulk ingest
    b = IVFBank(dim=32, num_cells=16, cell_capacity=256)
    b.train(data[:500])
    for i in range(0, len(data), 37):  # many ragged batches
        b.add(data[i:i + 37])
    assert len(a) == len(b) == len(data)
    q = data[200:232]
    d2a, ia = a.query(q, k=5, nprobe=16)
    d2b, ib = b.query(q, k=5, nprobe=16)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(d2a, d2b, rtol=1e-5)


def test_save_load_roundtrip(tmp_path):
    data = _data(seed=4)
    bank = IVFBank(dim=32, num_cells=16, cell_capacity=64, nprobe=4)
    bank.train(data[:500])
    bank.add(data)
    p = str(tmp_path / "ivf.npz")
    bank.save(p)
    back = IVFBank.load(p)
    assert len(back) == len(bank)
    assert back.nprobe == 4
    q = data[:16]
    d2a, ia = bank.query(q, k=3)
    d2b, ib = back.query(q, k=3)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(d2a, d2b, rtol=1e-6)


def test_bulk_ingest_scale():
    """Map-scale ingest is vectorized: 200k rows land in one bulk write."""
    import time

    rng = np.random.RandomState(9)
    data = rng.randn(200_000, 32).astype(np.float32)
    bank = IVFBank(dim=32, num_cells=64, cell_capacity=8192, nprobe=8)
    bank.train(data[:4096])
    t0 = time.time()
    bank.add(data)
    dt = time.time() - t0
    assert len(bank) == 200_000
    # the old per-row loop took minutes at this size; the vectorized path is
    # a couple of numpy passes — generous bound to stay CI-stable
    assert dt < 30.0, f"bulk add took {dt:.1f}s"
    _, idx = bank.query(data[:8], k=1, nprobe=64)
    assert (np.asarray(idx)[:, 0] == np.arange(8)).all()
