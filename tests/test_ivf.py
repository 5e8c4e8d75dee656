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


def _mesh(n=8):
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:n]), ("data",))


def test_sharded_ivf_matches_single_device():
    """ShardedIVF over the 8-device mesh returns the single-device IVFBank's
    results bitwise (cells shard, centroids replicate, one owner per cell)."""
    from gloc3d_tpu.index.ivf import ShardedIVF

    data = _data(n=1600, seed=3)
    bank = IVFBank(dim=32, num_cells=16, cell_capacity=256, nprobe=4)
    bank.train(data[:500], key=jax.random.PRNGKey(1))
    bank.add(data)
    q = data[200:216] + 0.01

    d2_ref, idx_ref = bank.query(q, k=7)
    sh = ShardedIVF(_mesh(), bank)
    d2_sh, idx_sh = sh.query(q, k=7)
    np.testing.assert_array_equal(idx_sh, idx_ref)
    np.testing.assert_array_equal(d2_sh, d2_ref)

    # full probe == exact, through the sharded path too
    d2e, idxe = sh.query(q, k=7, nprobe=16)
    d2f, idxf = l2_topk(jnp.asarray(q), jnp.asarray(data), 7)
    np.testing.assert_array_equal(idxe, np.asarray(idxf))


def test_sharded_ivf_exclude_recent_and_add():
    """exclude_after masks inside the sharded scan; post-shard adds ingest
    via the host mirror and re-scatter on the next query."""
    from gloc3d_tpu.index.ivf import ShardedIVF

    data = _data(n=800, seed=4)
    bank = IVFBank(dim=32, num_cells=16, cell_capacity=128, nprobe=16)
    bank.train(data[:300], key=jax.random.PRNGKey(2))
    bank.add(data[:700])
    sh = ShardedIVF(_mesh(), bank)

    q = data[690:691] + 0.005
    _, idx_all = sh.query(q, k=3)
    assert idx_all[0, 0] == 690
    d2_w, idx_w = sh.query(q, k=3, exclude_after=650)
    assert (idx_w[0] < 650).all()
    ref = IVFBank(dim=32, num_cells=16, cell_capacity=128, nprobe=16)
    ref.centroids = bank.centroids
    ref.add(data[:700])
    d2_rw, idx_rw = ref.query(q, k=3, exclude_after=650)
    np.testing.assert_array_equal(idx_w, idx_rw)
    np.testing.assert_array_equal(d2_w, d2_rw)

    # post-shard add: new rows become queryable
    sh.add(data[700:800])
    assert len(sh) == 800
    q2 = data[750:751] + 0.005
    _, idx2 = sh.query(q2, k=1)
    assert idx2[0, 0] == 750


def test_ivf_exclude_limit_in_jit():
    """IVFBank.query(exclude_after=...) bounds ids inside the jit; filler
    slots report -1."""
    data = _data(n=100, seed=5)
    bank = IVFBank(dim=32, num_cells=4, cell_capacity=64, nprobe=4)
    bank.train(data[:50], key=jax.random.PRNGKey(0))
    bank.add(data)
    q = data[10:11]
    d2, idx = bank.query(q, k=5, exclude_after=11)
    assert idx[0, 0] == 10
    assert (idx[0] < 11).all()
    # excluding everything yields -1 filler with inf distances
    d2e, idxe = bank.query(q, k=5, exclude_after=0)
    assert (idxe[0] == -1).all() and np.isinf(d2e[0]).all()


def _unit_data(n=1500, d=64, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.randn(16, d) * 5
    x = (centers[rng.randint(0, 16, n)] + rng.randn(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_ivf_int8_rank_parity():
    """int8 IVF cells (IndexConfig quantize='int8' + backend='ivf'): exact
    rank-1 on unit-norm descriptors, high top-k overlap vs the fp32 IVF."""
    data = _unit_data()
    f32 = IVFBank(dim=64, num_cells=16, cell_capacity=256, nprobe=16)
    f32.train(data[:500], key=jax.random.PRNGKey(0))
    f32.add(data)
    q8 = IVFBank(dim=64, num_cells=16, cell_capacity=256, nprobe=16,
                 quantize="int8")
    q8.centroids = f32.centroids          # same routing
    q8.add(data)
    assert q8._cells.dtype == np.int8

    q = data[100:140] + 0.003
    d2f, idxf = f32.query(q, k=10)
    d2q, idxq = q8.query(q, k=10)
    np.testing.assert_array_equal(idxq[:, 0], idxf[:, 0])  # rank-1 exact
    overlap = np.mean([
        len(set(idxq[i]) & set(idxf[i])) / 10 for i in range(len(q))])
    assert overlap >= 0.9, overlap
    np.testing.assert_allclose(d2q, d2f, atol=5e-3)

    # exclude-recent works through the int8 scan too
    _, idx_w = q8.query(data[900:901], k=3, exclude_after=500)
    assert (idx_w[0] < 500).all()


def test_ivf_int8_save_load_and_sharded(tmp_path):
    """int8 IVF roundtrips through save/load and shards over the mesh with
    bitwise-equal results."""
    from gloc3d_tpu.index.ivf import ShardedIVF

    data = _unit_data(seed=8)
    bank = IVFBank(dim=64, num_cells=16, cell_capacity=256, nprobe=4,
                   quantize="int8")
    bank.train(data[:500], key=jax.random.PRNGKey(1))
    bank.add(data)
    p = str(tmp_path / "ivf8.npz")
    bank.save(p)
    back = IVFBank.load(p)
    assert back.quantize == "int8"
    q = data[50:66] + 0.002
    d2a, ia = bank.query(q, k=5)
    d2b, ib = back.query(q, k=5)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(d2a, d2b, rtol=1e-6)

    sh = ShardedIVF(_mesh(), bank)
    d2s, idxs = sh.query(q, k=5)
    np.testing.assert_array_equal(idxs, ia)
    np.testing.assert_allclose(d2s, d2a, atol=1e-6)


def test_ivf_adapter_int8_wiring():
    """IndexConfig(backend='ivf', quantize='int8') reaches the IVFBank."""
    from gloc3d_tpu.config import IndexConfig
    from gloc3d_tpu.pipeline import _IVFBankAdapter

    cfg = IndexConfig(dim=64, backend="ivf", quantize="int8",
                      ivf_num_cells=8, ivf_cell_capacity=64, ivf_nprobe=8,
                      ivf_train_sample=256)
    ad = _IVFBankAdapter(cfg, dim=64)
    assert ad._ivf.quantize == "int8"
    data = _unit_data(n=300, seed=9)
    ad.add(data)
    d2, idx = ad.query(data[10:11], k=3)
    assert idx[0, 0] == 10


def test_bounded_capacity_spills_instead_of_growing():
    # all 300 rows want the same cell; the bound keeps capacity at 16 and
    # spill places the overflow in the next-nearest cells instead of
    # doubling the whole (C, P, D) tensor to 512 rows/cell
    rng = np.random.RandomState(4)
    data = rng.randn(300, 8).astype(np.float32) * 0.01
    bank = IVFBank(dim=8, num_cells=32, cell_capacity=16,
                   max_cell_capacity=16, spill_probes=32)
    bank.train(rng.randn(200, 8).astype(np.float32))
    bank.add(data)
    assert bank.cell_capacity == 16
    assert len(bank) == 300
    assert bank.spilled > 0
    # every row stored exactly once
    ids = bank._ids[bank._ids >= 0]
    assert sorted(ids.tolist()) == list(range(300))
    # full probe still finds every row exactly (spill never loses rows,
    # it only moves them to a cell that a wide-enough probe covers)
    _, idx = bank.query(data[:50], k=1, nprobe=32)
    assert (idx[:, 0] == np.arange(50)).all()


def test_spill_overflow_last_resort_and_full_error():
    rng = np.random.RandomState(5)
    data = rng.randn(60, 8).astype(np.float32) * 0.01
    bank = IVFBank(dim=8, num_cells=4, cell_capacity=16,
                   max_cell_capacity=16, spill_probes=2)
    bank.train(rng.randn(100, 8).astype(np.float32))
    bank.add(data)  # 60 rows > 2 probed cells * 16 -> last-resort placement
    assert len(bank) == 60
    assert bank.spill_overflow > 0
    ids = bank._ids[bank._ids >= 0]
    assert sorted(ids.tolist()) == list(range(60))
    import pytest
    with pytest.raises(RuntimeError, match="IVFBank full"):
        bank.add(rng.randn(10, 8).astype(np.float32) * 0.01)  # 60+10 > 64


def test_unbounded_default_behavior_unchanged():
    rng = np.random.RandomState(6)
    data = rng.randn(300, 8).astype(np.float32) * 0.01
    bank = IVFBank(dim=8, num_cells=4, cell_capacity=16)
    bank.train(data[:100])
    bank.add(data)
    assert bank.cell_capacity >= 75 and bank.spilled == 0
    assert bank.spill_overflow == 0
