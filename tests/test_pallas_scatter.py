"""Pallas binning kernel vs XLA scatter (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.ops.pallas_scatter import pillar_bin_mean, pillar_bin_sums


def test_pillar_bin_sums_matches_scatter():
    rng = np.random.RandomState(0)
    n, v, c = 1024, 300, 8
    idx = jnp.asarray(rng.randint(0, v, n).astype(np.int32))
    feats = jnp.asarray(rng.randn(n, c).astype(np.float32))
    sums, cnt = pillar_bin_sums(feats, idx, v, chunk=256)
    ref = jnp.zeros((v, c)).at[idx].add(feats)
    ref_cnt = jnp.zeros((v,)).at[idx].add(jnp.ones((n,)))
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(ref_cnt))
    np.testing.assert_allclose(np.asarray(sums), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)  # bf16 feature rounding


def test_pillar_bin_mean_batched():
    rng = np.random.RandomState(1)
    b, n, v, c = 2, 512, 100, 4
    idx = jnp.asarray(rng.randint(0, v, (b, n)).astype(np.int32))
    feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    out = pillar_bin_mean(feats, idx, v)
    from gloc3d_tpu.ops.voxelize import scatter_mean_to_grid

    ref = scatter_mean_to_grid(feats, idx, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_segment_sum_sorted_fast_matches_xla():
    from gloc3d_tpu.ops.pallas_scatter import segment_sum_sorted_fast
    from gloc3d_tpu.ops.voxelize import segment_sum_sorted

    rng = np.random.RandomState(2)
    for n, c, v in ((1000, 64, 37), (4096, 128, 100), (777, 32, 13)):
        ids = np.sort(rng.randint(0, v, n)).astype(np.int32)
        starts = np.searchsorted(ids, np.arange(v + 1), side="left")
        x = jnp.asarray(rng.randn(n, c).astype(np.float32))
        got = segment_sum_sorted_fast(x, jnp.asarray(starts.astype(np.int32)),
                                      chunk=64)
        ref = segment_sum_sorted(x, jnp.asarray(starts.astype(np.int32)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


def test_segment_sum_sorted_fast_empty_segments():
    from gloc3d_tpu.ops.pallas_scatter import segment_sum_sorted_fast

    # segments 0 and 3 empty; all rows in segments 1, 2, 4
    ids = np.array([1, 1, 2, 2, 2, 4], np.int32)
    starts = np.searchsorted(ids, np.arange(6), side="left").astype(np.int32)
    x = jnp.asarray(np.arange(6 * 64, dtype=np.float32).reshape(6, 64))
    got = np.asarray(segment_sum_sorted_fast(x, jnp.asarray(starts), chunk=8))
    assert (got[0] == 0).all() and (got[3] == 0).all()
    np.testing.assert_allclose(got[1], np.asarray(x[:2].sum(0)))
    np.testing.assert_allclose(got[2], np.asarray(x[2:5].sum(0)))
    np.testing.assert_allclose(got[4], np.asarray(x[5]))
