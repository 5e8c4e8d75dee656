"""Sharding: distributed descriptor bank and batch placement.

The descriptor bank shards across the mesh on the database dimension — a
tensor parallelism over N (SURVEY.md §5 "long-context analog": the scaling
axis of this workload is database size). A query computes a LOCAL top-k on
each chip's shard (matmul rides the MXU, no communication), then a single
``all_gather`` of (k per chip) candidates merges globally — k ≪ shard size,
so the collective moves O(devices·k) floats, not O(N).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gloc3d_tpu.ops.topk import l2_topk, l2_topk_int8, quantize_rows

Array = jax.Array


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place pytree leaves with their leading axis sharded over the mesh."""
    def place(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def replicate(mesh: Mesh, tree):
    """Replicate pytree leaves across the mesh."""
    def place(x):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, tree)


def sharded_topk(
    mesh: Mesh,
    queries: Array,
    bank: Array,
    k: int,
    valid: Optional[Array] = None,
    axis: str = "data",
) -> Tuple[Array, Array]:
    """Exact global top-k over a bank sharded on its row axis.

    bank: (N, D) with N divisible by mesh size (pad + mask the tail via
    ``valid``). Per-chip: local top-k over the shard; then all_gather the
    (devices · k) candidates and reduce. Results are bitwise-identical to the
    single-chip l2_topk (same distances; ties broken by global index order
    because gather preserves shard order).
    """
    n = bank.shape[0]
    n_dev = mesh.devices.size
    if n % n_dev != 0:
        raise ValueError(f"bank rows {n} not divisible by mesh size {n_dev}")
    shard = n // n_dev

    def local(q, bank_shard, valid_shard):
        me = jax.lax.axis_index(axis)
        d2, idx = l2_topk(q, bank_shard, k, valid_shard[0])
        gid = idx + me * shard
        d2_all = jax.lax.all_gather(d2, axis)      # (ndev, Q, k)
        gid_all = jax.lax.all_gather(gid, axis)
        d2_cat = jnp.moveaxis(d2_all, 0, 1).reshape(q.shape[0], n_dev * k)
        gid_cat = jnp.moveaxis(gid_all, 0, 1).reshape(q.shape[0], n_dev * k)
        neg, sel = jax.lax.top_k(-d2_cat, k)
        return -neg, jnp.take_along_axis(gid_cat, sel, axis=1)

    if valid is None:
        valid = jnp.ones((n,), bool)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, bank, valid.reshape(n_dev, shard))


def sharded_topk_int8(
    mesh: Mesh,
    queries: Array,
    bank_q: Array,
    scales: Array,
    b_sq: Array,
    k: int,
    valid: Optional[Array] = None,
    axis: str = "data",
) -> Tuple[Array, Array]:
    """:func:`sharded_topk` over an int8-quantized bank (codes + per-row
    scales + exact norms, see ops.topk.l2_topk_int8). Same merge; the local
    scoring matmul runs int8×int8→int32 on each shard."""
    n = bank_q.shape[0]
    n_dev = mesh.devices.size
    if n % n_dev != 0:
        raise ValueError(f"bank rows {n} not divisible by mesh size {n_dev}")
    shard = n // n_dev

    def local(q, bq, sc, bs, valid_shard):
        me = jax.lax.axis_index(axis)
        d2, idx = l2_topk_int8(q, bq, sc[0], bs[0], k, valid_shard[0])
        gid = idx + me * shard
        d2_all = jax.lax.all_gather(d2, axis)
        gid_all = jax.lax.all_gather(gid, axis)
        d2_cat = jnp.moveaxis(d2_all, 0, 1).reshape(q.shape[0], n_dev * k)
        gid_cat = jnp.moveaxis(gid_all, 0, 1).reshape(q.shape[0], n_dev * k)
        neg, sel = jax.lax.top_k(-d2_cat, k)
        return -neg, jnp.take_along_axis(gid_cat, sel, axis=1)

    if valid is None:
        valid = jnp.ones((n,), bool)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, bank_q, scales.reshape(n_dev, shard),
              b_sq.reshape(n_dev, shard), valid.reshape(n_dev, shard))


class ShardedBank:
    """A descriptor bank distributed over the mesh rows.

    Build-side: each chip extracts and stores its shard (here: a host array
    scattered once). Query-side: ``query`` runs the local-topk + gather merge.
    ``quantize='int8'`` stores per-row int8 codes + exact norms per shard
    (4× less HBM per chip at map scale; see ops.topk.l2_topk_int8).
    """

    def __init__(self, mesh: Mesh, dim: int, capacity: int, axis: str = "data",
                 quantize: str = "none"):
        self.mesh = mesh
        self.axis = axis
        self.dim = dim
        self.quantize = quantize
        n_dev = mesh.devices.size
        self.capacity = ((capacity + n_dev - 1) // n_dev) * n_dev
        row_sharding = NamedSharding(mesh, P(axis, None))
        vec_sharding = NamedSharding(mesh, P(axis))
        if quantize == "int8":
            self._bank = jax.device_put(
                jnp.zeros((self.capacity, dim), jnp.int8), row_sharding)
            self._scales = jax.device_put(
                jnp.zeros((self.capacity,), jnp.float32), vec_sharding)
            self._bsq = jax.device_put(
                jnp.zeros((self.capacity,), jnp.float32), vec_sharding)
        else:
            self._bank = jax.device_put(
                jnp.zeros((self.capacity, dim), jnp.float32), row_sharding)
        self._size = 0
        self._update = None  # jitted appender, built on first add

    def __len__(self) -> int:
        return self._size

    def add(self, feats) -> None:
        """Device-side append: a jitted dynamic_update_slice into the sharded
        array (XLA lowers the cross-shard write to masked per-shard updates).
        No host round-trip — incremental million-row builds stay O(batch),
        not O(bank)."""
        feats = np.atleast_2d(np.asarray(feats, np.float32))
        if self._size + len(feats) > self.capacity:
            raise ValueError("sharded bank capacity exceeded")
        row_sharding = NamedSharding(self.mesh, P(self.axis, None))
        if self.quantize == "int8":
            if self._update is None:
                vec_sharding = NamedSharding(self.mesh, P(self.axis))

                def upd(bank, sc, bs, rows, off):
                    codes, scales, bsq = quantize_rows(rows)
                    return (
                        jax.lax.dynamic_update_slice(bank, codes, (off, 0)),
                        jax.lax.dynamic_update_slice(sc, scales, (off,)),
                        jax.lax.dynamic_update_slice(bs, bsq, (off,)),
                    )

                self._update = jax.jit(
                    upd,
                    out_shardings=(row_sharding, vec_sharding, vec_sharding),
                    donate_argnums=(0, 1, 2),
                )
            self._bank, self._scales, self._bsq = self._update(
                self._bank, self._scales, self._bsq,
                jnp.asarray(feats), jnp.int32(self._size),
            )
        else:
            if self._update is None:
                self._update = jax.jit(
                    lambda bank, rows, off: jax.lax.dynamic_update_slice(
                        bank, rows, (off, 0)
                    ),
                    out_shardings=row_sharding,
                    donate_argnums=(0,),
                )
            self._bank = self._update(
                self._bank, jnp.asarray(feats), jnp.int32(self._size)
            )
        self._size += len(feats)

    def truncate(self, n: int) -> None:
        """Drop entries beyond n (padded db-build tails)."""
        if not 0 <= n <= self._size:
            raise ValueError(f"truncate({n}) outside [0, {self._size}]")
        self._size = n

    def query(self, queries, k: int, exclude_after: Optional[int] = None,
              ) -> Tuple[np.ndarray, np.ndarray]:
        """Global exact top-k. ``exclude_after`` bounds the searchable prefix
        (the SLAM-mode exclude-recent window as a global-index validity
        mask — loop_detector.cpp:62-81 semantics on the sharded store)."""
        queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        limit = self._size if exclude_after is None else min(
            exclude_after, self._size)
        valid = jnp.arange(self.capacity) < max(limit, 0)
        if self.quantize == "int8":
            d2, idx = sharded_topk_int8(
                self.mesh, queries, self._bank, self._scales, self._bsq,
                k, valid, self.axis,
            )
        else:
            d2, idx = sharded_topk(
                self.mesh, queries, self._bank, k, valid, self.axis
            )
        return np.asarray(d2), np.asarray(idx)

    def to_host(self) -> np.ndarray:
        """The live (size, D) rows as one host array (for persistence;
        dequantized in int8 mode)."""
        if self.quantize == "int8":
            return (np.asarray(self._bank)[: self._size].astype(np.float32)
                    * np.asarray(self._scales)[: self._size, None])
        return np.asarray(self._bank)[: self._size]
