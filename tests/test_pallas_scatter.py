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
