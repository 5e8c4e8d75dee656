"""Exact L2 top-k over a descriptor bank — the TPU-native ANN index.

Replaces both faiss.IndexFlatL2 (main.py:317-324) and the vendored nanoflann
KD-tree (loop_detector.cpp:36, nanoflann.hpp). On TPU the right structure is
no structure: a (N, D) bank resident in HBM, scored by one MXU matmul, with
``lax.top_k`` selection. Exact (not approximate), batched over queries, and
trivially sharded over the bank dimension (parallel/sharding.py adds the
cross-chip merge).

Throughput: a 1M × 512 bank is one 512-MFLOP matmul per query row — ~µs-scale
on a v5e chip; the reference's KD-tree over 512-d descriptors degenerates to
near-linear scan anyway (curse of dimensionality), on CPU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# Above this bank size, selection switches to the exact two-stage blocked
# top-k: lax.top_k over a (Q, N) row is sort-bound and dominates bank
# queries at EVERY scale on this hardware (tools/tune_topk.py sweep on
# v5e: flat 0.6 ms at N=10k, 1.9 ms at 262k, 12.3 ms at 1M; blocked is at
# the ≤0.05 ms noise floor throughout). Blocking reduces the sorted length
# from N to block per row (vectorized over blocks) + nblocks·k.
_BLOCK_TOPK_MIN_N = 8192
_BLOCK = 1024


def _neg_topk(negd2: Array, k: int) -> Tuple[Array, Array]:
    """Exact top-k of ``negd2`` (Q, N) rows, two-stage when N is large.

    Stage 1 runs lax.top_k on (Q·nblocks, block) rows — every global top-k
    element is necessarily in its own block's top-k — and stage 2 selects
    over the (Q, nblocks·k) survivors. Tie-breaking matches single-pass
    lax.top_k (earliest index wins): blocks are concatenated in index order
    and within-block order is preserved.
    """
    q, n = negd2.shape
    if n < _BLOCK_TOPK_MIN_N or k > _BLOCK:
        neg, idx = jax.lax.top_k(negd2, k)
        return neg, idx
    nb = -(-n // _BLOCK)
    pad = nb * _BLOCK - n
    if pad:
        negd2 = jnp.pad(negd2, ((0, 0), (0, pad)),
                        constant_values=-jnp.inf)
    blk = negd2.reshape(q * nb, _BLOCK)
    neg1, idx1 = jax.lax.top_k(blk, k)                 # (Q·nb, k)
    base = (jnp.arange(q * nb, dtype=jnp.int32) % nb) * _BLOCK
    # clamp pad slots to a real row: they only surface when a row has
    # fewer than k finite entries, where the contract is (inf, any id)
    gidx1 = jnp.minimum(idx1 + base[:, None], n - 1)
    neg1 = neg1.reshape(q, nb * k)
    gidx1 = gidx1.reshape(q, nb * k)
    neg2, sel = jax.lax.top_k(neg1, k)                 # (Q, k)
    return neg2, jnp.take_along_axis(gidx1, sel, axis=1)


def l2_topk(
    queries: Array,
    bank: Array,
    k: int,
    valid: Array | None = None,
) -> Tuple[Array, Array]:
    """Exact k-nearest (squared-L2) bank rows for each query.

    Args:
      queries: (Q, D).
      bank: (N, D) — static capacity; use ``valid`` to mask unused slots.
      k: number of neighbours.
      valid: optional (N,) bool; False rows are never returned.

    Returns:
      dists²: (Q, k) squared L2 distances (ascending).
      indices: (Q, k) bank row ids.

    Matches the reference contract: faiss returns squared L2 (main.py:324),
    and nanoflann's out_dists_sqr likewise (loop_detector.cpp:44).
    """
    q32 = queries.astype(jnp.float32)
    b32 = bank.astype(jnp.float32)
    # ‖q−b‖² = ‖q‖² − 2 q·b + ‖b‖²; the q·b term is the MXU matmul.
    dots = jax.lax.dot_general(
        q32, b32, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, N)
    b_sq = jnp.sum(b32 * b32, axis=-1)  # (N,)
    q_sq = jnp.sum(q32 * q32, axis=-1, keepdims=True)  # (Q, 1)
    d2 = q_sq - 2.0 * dots + b_sq[None, :]
    if valid is not None:
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
    neg, idx = _neg_topk(-d2, k)
    return jnp.maximum(-neg, 0.0), idx


def quantize_rows(x: Array) -> Tuple[Array, Array, Array]:
    """Per-row symmetric int8 quantization of (M, D) descriptors.

    Returns (int8 codes, f32 per-row scales, f32 exact squared norms). The
    exact ‖b‖² is kept in fp32 so only the cross term q·b of the distance
    carries quantization error — the rank-relevant part degrades by
    ~s_q·s_b·√D ≪ typical inter-descriptor gaps for unit-norm NetVLAD
    descriptors (validated in tests/test_index.py).
    """
    x = x.astype(jnp.float32)
    m = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(m, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale, jnp.sum(x * x, axis=-1)


def l2_topk_int8(
    queries: Array,
    bank_q: Array,
    scales: Array,
    b_sq: Array,
    k: int,
    valid: Array | None = None,
) -> Tuple[Array, Array]:
    """Top-k over an int8-quantized bank (beyond-reference map-scale mode).

    The reference's index is fp32 faiss/nanoflann; this is the TPU-native
    scaling move for million-scan maps: int8 codes cut HBM traffic 4× (the
    flat query is bandwidth-bound at map scale) and the MXU runs int8×int8→
    int32 at twice its bf16 rate. Queries are quantized per-row on the fly;
    distances use exact stored norms, so only the cross term is approximate.

    Args match :func:`l2_topk` with the bank replaced by
    (bank_q int8 (N, D), scales f32 (N,), b_sq f32 (N,)).
    """
    qq, q_scale, q_sq = quantize_rows(jnp.atleast_2d(queries))
    idots = jax.lax.dot_general(
        qq, bank_q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (Q, N) int32
    dots = idots.astype(jnp.float32) * (q_scale[:, None] * scales[None, :])
    d2 = q_sq[:, None] - 2.0 * dots + b_sq[None, :]
    if valid is not None:
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
    neg, idx = _neg_topk(-d2, k)
    return jnp.maximum(-neg, 0.0), idx


