"""Pallas pillar-binning kernel: segment-sum as one-hot MXU matmuls.

XLA's TPU scatter processes rows near-serially (~2.2 ms for 122k rows
regardless of payload width). This kernel reformulates pillar binning as
dense compute the MXU can eat: for each chunk of points, build a one-hot
(chunk, V) assignment in VMEM and accumulate

    acc (V, C+1) += one_hotᵀ @ [features | 1]

over the grid's chunk axis in a VMEM accumulator (the pillar grid is small:
11200×65 fp32 ≈ 2.9 MB). One matmul per chunk — 88 GFLOP total for the KITTI
shape, bandwidth-trivial, no scatter anywhere.

The one-hot is bf16 (values exactly 0/1 — no quantization), features are
cast to bf16 for the MXU with fp32 accumulation: worst-case feature
rounding is 2^-8 relative, below the BN/conv noise floor of the network that
consumes the result. Use the XLA scatter path where exact fp32 sums matter.

MEASURED (v5e, KITTI shape N=122480, V=11200, C=64): this kernel runs
3.5 ms vs 2.0 ms for the XLA scatter — the per-chunk one-hot construction
(VPU compares over chunk×V) dominates at C=64, so the default pipeline keeps
the scatter. The crossover favors this kernel as C grows (scatter cost is
per-ROW and flat in C; this kernel's matmul scales with C but its compare
cost doesn't), so it is kept for wide-feature binning and as the template
for future Mosaic scatter work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@partial(jax.jit, static_argnames=("num_voxels", "chunk"))
def pillar_bin_sums(
    features: Array,     # (N, C) per-point features (padded rows zeroed)
    voxel_indices: Array,  # (N,) int32 pillar ids ∈ [0, num_voxels)
    num_voxels: int,
    chunk: int = 256,
) -> tuple[Array, Array]:
    """Returns (sums (V, C), counts (V,)) — counts include every row, like
    torch_scatter's denominator (padding rows land in voxel 0)."""
    n, c = features.shape
    v_pad = _round_up(num_voxels, 128)
    c_pad = _round_up(c + 1, 128)
    n_pad = _round_up(n, chunk)

    feats = jnp.zeros((n_pad, c_pad), jnp.float32)
    feats = feats.at[:n, :c].set(features.astype(jnp.float32))
    feats = feats.at[:n, c].set(1.0)  # count column
    # out-of-range sentinel for padded rows → no one-hot match
    idx = jnp.full((n_pad,), v_pad, jnp.int32).at[:n].set(voxel_indices)

    num_chunks = n_pad // chunk

    def kernel(idx_ref, feats_ref, out_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        ids = idx_ref[:]  # (chunk, 1)
        vids = jax.lax.broadcasted_iota(jnp.int32, (chunk, v_pad), 1)
        onehot = (ids == vids).astype(jnp.bfloat16)  # (chunk, v_pad)
        f = feats_ref[:].astype(jnp.bfloat16)        # (chunk, c_pad)
        acc_ref[:] += jax.lax.dot_general(
            onehot, f, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (v_pad, c_pad)

        @pl.when(step == num_chunks - 1)
        def _():
            out_ref[:] = acc_ref[:]

    out = pl.pallas_call(
        kernel,
        grid=(num_chunks,),
        interpret=jax.default_backend() == "cpu",  # CPU tests interpret
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((v_pad, c_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v_pad, c_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((v_pad, c_pad), jnp.float32)],
    )(idx.reshape(n_pad, 1), feats)

    return out[:num_voxels, :c], out[:num_voxels, c]


def pillar_bin_mean(
    features: Array, voxel_indices: Array, num_voxels: int,
    counts: Array | None = None, chunk: int = 256,
) -> Array:
    """Batched drop-in for scatter_mean_to_grid using the Pallas kernel.

    features (B, N, C), voxel_indices (B, N) → (B, V, C).
    """
    def one(f, i):
        sums, cnt = pillar_bin_sums(f, i, num_voxels, chunk)
        return sums, cnt

    sums, cnt = jax.vmap(one)(features, voxel_indices)
    if counts is not None:
        cnt = counts.astype(sums.dtype)
    return sums / jnp.maximum(cnt, 1.0)[..., None]
