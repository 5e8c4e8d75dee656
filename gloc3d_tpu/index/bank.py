"""HBM-resident descriptor bank: build, serialize, query.

The TPU-native replacement for the reference's per-keyframe feature store +
KD-tree (loop_detector.{h,cpp}): descriptors live in one (capacity, D) device
array; queries are exact tiled-matmul top-k (ops/topk.py). There is no index
build step at all — "rebuild the tree every 30 adds" (loop_detector.cpp:66-71)
degenerates to updating a validity mask, and the SLAM-mode exclude-recent
window (num_exclude_recent_, loop_detector.h:101) becomes an index bound.

Capacity is static for jit stability and doubles on overflow (one recompile
per doubling, amortized).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import IndexConfig
from gloc3d_tpu.ops.topk import l2_topk, l2_topk_int8, quantize_rows

Array = jax.Array


@partial(jax.jit, static_argnames=("k",))
def _query(bank: Array, size: Array, queries: Array, k: int,
           exclude_after: Array) -> Tuple[Array, Array]:
    n = bank.shape[0]
    ids = jnp.arange(n)
    valid = (ids < size) & (ids < exclude_after)
    return l2_topk(queries, bank, k, valid)


@partial(jax.jit, static_argnames=("k",))
def _query_int8(bank_q: Array, scales: Array, b_sq: Array, size: Array,
                queries: Array, k: int, exclude_after: Array,
                ) -> Tuple[Array, Array]:
    n = bank_q.shape[0]
    ids = jnp.arange(n)
    valid = (ids < size) & (ids < exclude_after)
    return l2_topk_int8(queries, bank_q, scales, b_sq, k, valid)


class DescriptorBank:
    """Append-only descriptor store with exact top-k query.

    Host-side shell around device arrays; all compute is jitted. Also usable
    as the training feature cache (replacing the HDF5 cache, main.py:103-118).
    """

    def __init__(self, cfg: IndexConfig, dim: Optional[int] = None):
        self.cfg = cfg
        self.dim = dim or cfg.dim
        self._capacity = cfg.capacity
        self._quantized = cfg.quantize == "int8"
        if self._quantized:
            # int8 codes + per-row scale + exact fp32 squared norm: 4× less
            # HBM traffic per query at map scale (beyond-reference mode; the
            # reference's faiss/nanoflann indexes are fp32-only)
            self._bank = jnp.zeros((self._capacity, self.dim), jnp.int8)
            self._scales = jnp.zeros((self._capacity,), jnp.float32)
            self._bsq = jnp.zeros((self._capacity,), jnp.float32)
        else:
            self._bank = jnp.zeros((self._capacity, self.dim), jnp.float32)
        self._size = 0

    # ------------------------------------------------------------------ build
    def __len__(self) -> int:
        return self._size

    @property
    def data(self) -> Array:
        """The live (size, D) slice (device array view; dequantized in int8
        mode — migration paths like shard_bank() re-ingest fp32 rows)."""
        if self._quantized:
            return (self._bank[: self._size].astype(jnp.float32)
                    * self._scales[: self._size, None])
        return self._bank[: self._size]

    def truncate(self, n: int) -> None:
        """Drop entries beyond n (e.g. padded batch tails from a db build)."""
        if not 0 <= n <= self._size:
            raise ValueError(f"truncate({n}) outside [0, {self._size}]")
        self._size = n

    def add(self, feats: Array) -> None:
        """Append (M, D) or (D,) descriptors."""
        feats = jnp.atleast_2d(jnp.asarray(feats, jnp.float32))
        m = feats.shape[0]
        while self._size + m > self._capacity:
            self._capacity *= 2
            dt = jnp.int8 if self._quantized else jnp.float32
            grown = jnp.zeros((self._capacity, self.dim), dt)
            self._bank = grown.at[: self._bank.shape[0]].set(self._bank)
            if self._quantized:
                self._scales = jnp.zeros((self._capacity,), jnp.float32
                                         ).at[: self._scales.shape[0]].set(self._scales)
                self._bsq = jnp.zeros((self._capacity,), jnp.float32
                                      ).at[: self._bsq.shape[0]].set(self._bsq)
        if self._quantized:
            codes, scales, bsq = quantize_rows(feats)
            self._bank = jax.lax.dynamic_update_slice(
                self._bank, codes, (self._size, 0))
            self._scales = jax.lax.dynamic_update_slice(
                self._scales, scales, (self._size,))
            self._bsq = jax.lax.dynamic_update_slice(
                self._bsq, bsq, (self._size,))
        else:
            self._bank = jax.lax.dynamic_update_slice(
                self._bank, feats, (self._size, 0)
            )
        self._size += m

    # ------------------------------------------------------------------ query
    def query(
        self, queries: Array, k: Optional[int] = None,
        exclude_recent: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k search. Returns (dists² (Q, k), indices (Q, k)).

        exclude_recent=True applies the SLAM-mode window: the most recent
        ``cfg.num_exclude_recent`` entries are not searchable
        (loop_detector.cpp:66-68 searches db[:-num_exclude_recent]).
        """
        k = k or self.cfg.top_k
        queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        limit = self._size - self.cfg.num_exclude_recent if exclude_recent else self._size
        if self._quantized:
            d2, idx = _query_int8(
                self._bank, self._scales, self._bsq, jnp.int32(self._size),
                queries, k, jnp.int32(max(limit, 0)),
            )
        else:
            d2, idx = _query(
                self._bank, jnp.int32(self._size), queries, k,
                jnp.int32(max(limit, 0)),
            )
        return np.asarray(d2), np.asarray(idx)

    def detect_loop(self, query: Array) -> Optional[Tuple[int, float]]:
        """SLAM loop detection against the non-recent database.

        Returns (db_index, dist²) if the nearest neighbour clears the metric
        gate (loop_detector.cpp:46-58: dist² < loop_metric_dist_th_), else
        None. Requires enough non-recent keyframes, mirroring
        loop_detector.cpp:63.
        """
        if self._size <= self.cfg.num_exclude_recent + self.cfg.top_k:
            return None
        d2, idx = self.query(query, k=1, exclude_recent=True)
        if float(d2[0, 0]) < self.cfg.metric_dist_threshold:
            return int(idx[0, 0]), float(d2[0, 0])
        return None

    # -------------------------------------------------------------- serialize
    def save(self, path: str) -> None:
        extra = {}
        if self._quantized:
            # store codes/scales/exact norms verbatim (4× smaller on disk
            # too; re-quantizing a dequantized bank would lose the exact b²)
            extra = dict(
                bank_q=np.asarray(self._bank[: self._size]),
                scales=np.asarray(self._scales[: self._size]),
                bsq=np.asarray(self._bsq[: self._size]),
            )
            np.savez(path, dim=self.dim, cfg=self.cfg.to_json(), **extra)
        else:
            np.savez(
                path, bank=np.asarray(self.data), dim=self.dim,
                cfg=self.cfg.to_json(),
            )

    @classmethod
    def load(cls, path: str, cfg: Optional[IndexConfig] = None) -> "DescriptorBank":
        data = np.load(path, allow_pickle=False)
        if cfg is None:
            cfg = IndexConfig.from_json(str(data["cfg"]))
        if "bank_q" in data and cfg.quantize != "int8":
            cfg = cfg.replace(quantize="int8")
        bank = cls(cfg, dim=int(data["dim"]))
        if "bank_q" in data:
            n = data["bank_q"].shape[0]
            if n:
                while n > bank._capacity:
                    bank._capacity *= 2
                bank._bank = jnp.zeros((bank._capacity, bank.dim), jnp.int8
                                       ).at[:n].set(jnp.asarray(data["bank_q"]))
                bank._scales = jnp.zeros((bank._capacity,), jnp.float32
                                         ).at[:n].set(jnp.asarray(data["scales"]))
                bank._bsq = jnp.zeros((bank._capacity,), jnp.float32
                                      ).at[:n].set(jnp.asarray(data["bsq"]))
                bank._size = n
            return bank
        arr = data["bank"]
        if arr.shape[0]:
            bank.add(jnp.asarray(arr))
        return bank
