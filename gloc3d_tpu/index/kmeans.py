"""Lloyd's k-means on TPU — replaces faiss.Kmeans for NetVLAD centroid init.

The reference clusters 50k × 512 sampled descriptors into 64 centroids with
faiss (main.py:394-397, niter=100). Here assignment is one MXU matmul + argmax
and the update is a segment-sum, the whole loop under ``lax.fori_loop`` in a
single jit. Empty clusters are re-seeded from the point farthest from its
centroid (faiss does random re-init; deterministic farthest-point is stabler).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def kmeans(
    key: jax.Array,
    data: Array,
    num_clusters: int,
    num_iters: int = 100,
) -> Tuple[Array, Array]:
    """Cluster data (N, D) → (centroids (K, D), assignments (N,))."""
    n, d = data.shape
    k = num_clusters
    data = data.astype(jnp.float32)
    x_sq = jnp.sum(data * data, axis=-1)  # (N,)

    # k-means++ seeding: next seed drawn ∝ squared distance to nearest seed.
    # (faiss uses random init + redo; ++ gives equal-or-better quality in one
    # pass and is deterministic given the key.)
    key, k0 = jax.random.split(key)
    first = data[jax.random.randint(k0, (), 0, n)]

    def seed_step(carry, subkey):
        cents_sofar, mind2 = carry
        p = mind2 / jnp.maximum(jnp.sum(mind2), 1e-12)
        nxt = data[jax.random.categorical(subkey, jnp.log(p + 1e-20))]
        d2_new = x_sq - 2.0 * data @ nxt + jnp.sum(nxt * nxt)
        return (nxt, jnp.minimum(mind2, jnp.maximum(d2_new, 0.0))), nxt

    d2_first = jnp.maximum(x_sq - 2.0 * data @ first + jnp.sum(first * first), 0.0)
    (_, _), rest = jax.lax.scan(
        seed_step, (first, d2_first), jax.random.split(key, k - 1)
    )
    centroids = jnp.concatenate([first[None, :], rest], axis=0)

    def assign(cents: Array) -> Tuple[Array, Array]:
        dots = jax.lax.dot_general(
            data, cents, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, K)
        c_sq = jnp.sum(cents * cents, axis=-1)
        d2 = x_sq[:, None] - 2.0 * dots + c_sq[None, :]
        a = jnp.argmin(d2, axis=-1)
        return a, jnp.min(d2, axis=-1)

    def step(_, cents):
        a, dist = assign(cents)
        sums = jnp.zeros((k, d), jnp.float32).at[a].add(data)
        cnts = jnp.zeros((k,), jnp.float32).at[a].add(1.0)
        new = sums / jnp.maximum(cnts, 1.0)[:, None]
        # re-seed empties with the globally farthest point
        far = data[jnp.argmax(dist)]
        new = jnp.where((cnts > 0)[:, None], new, far[None, :])
        return new

    centroids = jax.lax.fori_loop(0, num_iters, step, centroids)
    assignments, _ = assign(centroids)
    return centroids, assignments
