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
