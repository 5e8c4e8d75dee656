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


@partial(jax.jit, static_argnames=("chunk",))
def _cumsum_rows_128(x2: Array, chunk: int = 512) -> Array:
    """Single-pass running column-cumsum of a (R, 128) fp32 array.

    XLA's TPU cumsum at this shape runs ~23 ms (log-pass HBM traffic);
    this kernel streams the array once with a (1, 128) carry in VMEM:
    read 63 MB + write 63 MB ≈ 0.16 ms at v5e HBM bandwidth. The grid is
    sequential on TPU, so the carry is well-defined.
    """
    r = x2.shape[0]
    num = -(-r // chunk)  # non-divisible grids allowed; see in-kernel mask

    def kernel(x_ref, o_ref, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)

        # rows past r in the (padded) last block hold garbage which can be
        # NaN — and 0·NaN = NaN, so the triangular zeros would NOT mask it
        # out of the matmul. Zero them explicitly.
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 0)
        x = jnp.where(i * chunk + rows < r, x_ref[:], 0.0)
        # in-block inclusive scan as a lower-triangular matmul on the MXU
        # (the cumsum primitive has no Mosaic lowering, and sublane-roll
        # log-scans measure 10x slower). Exact fp32: tri entries are 0/1 and
        # accumulation is fp32.
        row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
        tri = (row >= col).astype(jnp.float32)
        cs = jax.lax.dot_general(
            tri, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + carry[:]
        o_ref[:] = cs
        carry[:] = cs[-1:, :]

    extra = {}
    if jax.default_backend() != "cpu":
        # cap the kernel's VMEM reservation (in/out blocks double-buffered +
        # tri + carry ≈ 2.3 MB): without a cap Mosaic reserves a large
        # default budget, which starves XLA's convs of VMEM in the SAME
        # program — measured +1.1 ms on the surrounding conv stack. The cap
        # leaves headroom over the exactly-1-MB stack need: under vmap (a
        # batched db build) the kernel's stack grows ~512 B past 1 MB and a
        # tight cap fails compilation (scoped-vmem OOM).
        extra = dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=1536 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * num * chunk * chunk * 128,
                bytes_accessed=2 * r * 128 * 4,
                transcendentals=0),
        )
    return pl.pallas_call(
        kernel,
        grid=(num,),
        interpret=jax.default_backend() == "cpu",
        in_specs=[pl.BlockSpec((chunk, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        **extra,
    )(x2)


@partial(jax.jit, static_argnames=("chunk",))
def segment_sum_sorted_fast(values: Array, starts: Array,
                            chunk: int = 512) -> Array:
    """Drop-in for ops.voxelize.segment_sum_sorted backed by the Pallas
    single-pass cumsum (serving path; no VJP — use the XLA variant when
    gradients are needed).

    values: (N, C) fp32 sorted by segment, 128 % C == 0; starts: (V+1,).
    Returns (V, C). The (N, C) array is viewed as (N/k, 128) with k = 128/C
    (row-major: new row q holds old rows q·k..q·k+k−1 side by side), so the
    kernel runs at full 128-lane width; the inclusive prefix through an
    arbitrary old row r is then recovered from k boundary gathers:
        S(r) = Σ_m P[(r − m) // k, mC:(m+1)C]   (terms with r < m are 0).
    """
    n, c = values.shape
    assert 128 % c == 0, f"C={c} must divide 128"
    k = 128 // c
    x = values.astype(jnp.float32)
    n_pad = -(-n // k) * k  # only k-alignment; chunk handled by the grid
    if n_pad != n:
        x = jnp.concatenate(
            [x, jnp.zeros((n_pad - n, c), jnp.float32)], axis=0)
    cum = _cumsum_rows_128(x.reshape(n_pad // k, 128), chunk)  # (R, 128)

    r_idx = starts.astype(jnp.int32) - 1          # (V+1,) inclusive ends
    s_all = jnp.zeros((starts.shape[0], c), jnp.float32)
    for m in range(k):
        q = (r_idx - m) // k
        rows = cum[jnp.maximum(q, 0)]             # (V+1, 128) row gather
        part = jax.lax.dynamic_slice_in_dim(rows, m * c, c, axis=1)
        s_all = s_all + jnp.where((r_idx >= m)[:, None], part, 0.0)
    return s_all[1:] - s_all[:-1]


@jax.custom_vjp
def segment_sum_sorted_grad(values: Array, starts: Array,
                            ids: Array) -> Array:
    """segment_sum_sorted_fast with a custom VJP — the training-path
    variant (the Pallas cumsum kernel itself has no differentiation rule).

    The backward of a segment sum is exact and cheap: every row's cotangent
    is its segment's output cotangent, d_values[i] = g[ids[i]] — one row
    gather, no accumulation (ops/gather.py::row_gather keeps it off XLA's
    slow fancy-index lowering at the (N, C) read size). ``ids`` must be the
    per-row segment ids consistent with ``starts`` (the pillar-sorted
    voxel_indices the host stats pass already produces).
    """
    return segment_sum_sorted_fast(values, starts)


def _ssg_fwd(values, starts, ids):
    return segment_sum_sorted_fast(values, starts), (starts.shape, ids)


def _ssg_bwd(res, g):
    import numpy as np  # float0 cotangents for the integer operands

    from gloc3d_tpu.ops.gather import row_gather

    starts_shape, ids = res
    return (row_gather(g, ids),
            np.zeros(starts_shape, jax.dtypes.float0),
            np.zeros(ids.shape, jax.dtypes.float0))


segment_sum_sorted_grad.defvjp(_ssg_fwd, _ssg_bwd)


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
