"""Tune the blocked top-k: lax.top_k vs two-stage at several (N, block).

Selection cost sets the floor for every bank query (the 1M flat query was
12.7 ms of pure top_k before blocking). This sweeps N × block on the real
chip to place _BLOCK_TOPK_MIN_N and _BLOCK (ops/topk.py) by measurement.

Usage: python tools/tune_topk.py
"""

import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GLOC3D_COMPILE_CACHE", "/tmp/gloc3d_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_bank import log, marginal

K = 20


def blocked(neg, k, block):
    q, n = neg.shape
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        neg = jnp.pad(neg, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    blk = neg.reshape(q * nb, block)
    n1, i1 = jax.lax.top_k(blk, k)
    base = (jnp.arange(q * nb, dtype=jnp.int32) % nb) * block
    g1 = jnp.minimum(i1 + base[:, None], n - 1)
    n2, sel = jax.lax.top_k(n1.reshape(q, nb * k), k)
    return n2, jnp.take_along_axis(g1.reshape(q, nb * k), sel, axis=1)


def main():
    rng = np.random.RandomState(0)
    for n in (10_000, 65_536, 262_144, 1_000_000):
        scores = jnp.asarray(rng.randn(1, n).astype(np.float32))

        def flat(s, c):
            v, i = jax.lax.top_k(s * (1.0 + c * 1e-30), K)
            return v.sum() * 1e-6 + i[0, 0] * 1e-9

        ms_flat = marginal(flat, scores)
        line = f"N={n}: flat {ms_flat:.3f} ms"
        for block in (512, 1024, 2048, 4096):
            if block >= n:
                continue

            def blk(s, c, b=block):
                v, i = blocked(s * (1.0 + c * 1e-30), K, b)
                return v.sum() * 1e-6 + i[0, 0] * 1e-9

            # correctness vs flat
            vf, inf_ = jax.jit(lambda s: jax.lax.top_k(s, K))(scores)
            vb, ib = jax.jit(lambda s, b=block: blocked(s, K, b))(scores)
            assert np.array_equal(np.asarray(inf_), np.asarray(ib)), block
            ms = marginal(blk, scores)
            line += f" | b{block} {ms:.3f}"
        log(line)


if __name__ == "__main__":
    main()
