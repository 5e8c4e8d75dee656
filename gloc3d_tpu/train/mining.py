"""On-device hard-negative mining.

Replaces the reference's HDF5 feature cache + per-sample sklearn KNN inside
DataLoader workers (i2i_util.py:271-343) with one batched device computation:
the feature cache is an HBM array refreshed by a jitted forward sweep, and a
whole query batch is mined in a single call.

Reference semantics preserved:
  - hardest positive: nearest nontrivial positive (≤10 m) by FEATURE distance
    (i2i_util.py:293-299);
  - negatives: sample ``n_sample`` random potential negatives (>20 m) plus the
    query's negCache, rank by feature distance, keep those violating
    d_neg < d_pos + margin, take the first ``n_neg`` (i2i_util.py:301-335);
  - queries with no violating negative are skipped (loss masks them out).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class MinedTriplets(NamedTuple):
    pos_idx: Array     # (B,) hardest positive db index
    neg_idx: Array     # (B, n_neg) selected negative db indices
    neg_valid: Array   # (B, n_neg) 1.0 where the slot holds a real violator
    valid: Array       # (B,) query has ≥1 positive and ≥1 violating negative
    d_pos: Array       # (B,) feature distance to the hardest positive


@partial(jax.jit, static_argnames=("n_neg", "n_sample"))
def mine_triplets(
    cache_db: Array,       # (Ndb, D) db feature cache
    cache_q: Array,        # (Nq, D) query feature cache
    query_idx: Array,      # (B,) query ids to mine
    pos_mask: Array,       # (Nq, Ndb) nontrivial-positive mask
    neg_mask: Array,       # (Nq, Ndb) potential-negative mask
    neg_cache: Array,      # (Nq, n_neg) previously-selected negatives
    key: Array,
    margin: float,
    n_neg: int = 10,
    n_sample: int = 1000,
) -> MinedTriplets:
    b = query_idx.shape[0]
    ndb = cache_db.shape[0]
    qf = cache_q[query_idx]                          # (B, D)
    pmask = pos_mask[query_idx]                      # (B, Ndb)
    nmask = neg_mask[query_idx]

    # distances query→db, one MXU matmul
    d2 = (
        jnp.sum(qf * qf, 1)[:, None]
        - 2.0 * qf @ cache_db.T
        + jnp.sum(cache_db * cache_db, 1)[None, :]
    )  # (B, Ndb)
    d2 = jnp.maximum(d2, 0.0)

    # hardest (nearest-in-feature-space) positive
    d2_pos = jnp.where(pmask, d2, jnp.inf)
    pos_idx = jnp.argmin(d2_pos, axis=1)
    d_pos = jnp.sqrt(jnp.take_along_axis(d2_pos, pos_idx[:, None], 1)[:, 0])
    has_pos = jnp.isfinite(d_pos)

    # sample negatives: n_sample random potential negatives ∪ negCache
    logits = jnp.where(nmask, 0.0, -jnp.inf)
    samp = jax.random.categorical(key, logits, axis=-1, shape=(n_sample, b)).T
    cand = jnp.concatenate([samp, neg_cache[query_idx]], axis=1)  # (B, S+n_neg)
    d2_cand = jnp.take_along_axis(d2, cand, axis=1)
    # candidates that are not actually potential negatives (e.g. stale cache)
    cand_ok = jnp.take_along_axis(nmask, cand, axis=1)
    d2_cand = jnp.where(cand_ok, d2_cand, jnp.inf)

    # rank ascending by feature distance, keep margin violators, first n_neg
    order = jnp.argsort(d2_cand, axis=1)
    cand_sorted = jnp.take_along_axis(cand, order, axis=1)
    d_sorted = jnp.sqrt(jnp.take_along_axis(d2_cand, order, axis=1))
    violating = d_sorted < (d_pos[:, None] + jnp.sqrt(margin))
    # stable-select the first n_neg violating entries per row
    rank = jnp.cumsum(violating, axis=1) - 1          # index among violators
    sel = jnp.where(violating & (rank < n_neg), rank, n_neg)  # n_neg = dropped
    neg_idx = _scatter_first(cand_sorted, sel, n_neg)
    n_violating = jnp.sum(violating, axis=1)
    neg_valid = (
        jnp.arange(n_neg)[None, :] < jnp.minimum(n_violating, n_neg)[:, None]
    ).astype(jnp.float32)
    valid = has_pos & (n_violating > 0)
    return MinedTriplets(pos_idx, neg_idx, neg_valid, valid, d_pos)


def mine_other_negative(
    neg_mask: Array, query_idx: Array, neg_idx: Array, key: Array
) -> Array:
    """Sample the quadruplet loss's 'other negative' per query: a db entry
    that is a potential negative of the query AND not among its selected
    negatives (the PointNetVLAD sampling the reference's quadruplet_loss,
    loss.py:49-93, expects)."""
    nmask = neg_mask[query_idx]  # (B, Ndb)
    b, ndb = nmask.shape
    onehot_sel = jax.nn.one_hot(neg_idx, ndb, dtype=bool).any(axis=1)
    eligible = nmask & ~onehot_sel
    logits = jnp.where(eligible, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1)


def _scatter_first(cand_sorted: Array, sel: Array, n_neg: int) -> Array:
    """Place the j-th margin-violating candidate at slot j (j < n_neg)."""
    b, s = cand_sorted.shape

    def one(cs, sl):
        out = jnp.zeros((n_neg + 1,), cs.dtype)
        return out.at[sl].set(cs, mode="drop")[:n_neg]

    return jax.vmap(one)(cand_sorted, sel)
