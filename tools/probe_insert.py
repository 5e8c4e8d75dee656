"""Micro-probe: what dominates insert_range_data at 122k pts / 40M cells?

Decides the redesign of the submap inserter's per-sweep dedupe:
  (a) current: argsort-based dedupe (sorts of 122k + 245k int32 per grid)
  (b) candidate: marker-grid — non-unique scatter-max of ones into the
      full grid, then dense elementwise application (no sorts at all).
(b) wins iff XLA's TPU scatter with duplicate indices and a max combiner
is vectorized (max is idempotent, duplicates are harmless semantically —
the question is purely whether the compiled scatter serializes).

Usage: python tools/probe_insert.py
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

from bench import marginal_chained  # noqa: E402

TOTAL = 1000 * 1000 * 40
N = 122_880
M = 2 * N


def main():
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, TOTAL, N).astype(np.int32))
    ids_m = jnp.asarray(rng.randint(0, TOTAL, M).astype(np.int32))
    grid = jnp.zeros(TOTAL, jnp.float32)

    def t(name, f1, f4, *args):
        t0 = time.time()
        ms, call = marginal_chained(f1, f4, *args, n=8)
        print(f"{name:45s} {ms:7.2f} ms ({call:.2f}/call, "
              f"{time.time()-t0:.0f}s)", flush=True)

    # (1) argsort 122k int32
    def s1(ids, prev):
        x = jnp.argsort(ids + (prev * 0).astype(ids.dtype))[0]
        return x.astype(jnp.float32), x.astype(jnp.float32)

    def s4(ids, prev):
        x = prev
        for _ in range(4):
            x = jnp.argsort(ids + (x * 0).astype(ids.dtype))[0] \
                .astype(jnp.float32)
        return x, x
    t("argsort 122k int32", s1, s4, ids, )

    # (2) argsort 245k int32
    t("argsort 245k int32", s1, s4, ids_m)

    # (3) sort (values only) 122k int32
    def v1(ids, prev):
        x = jnp.sort(ids + (prev * 0).astype(ids.dtype))[0]
        return x.astype(jnp.float32), x.astype(jnp.float32)

    def v4(ids, prev):
        x = prev
        for _ in range(4):
            x = jnp.sort(ids + (x * 0).astype(ids.dtype))[0] \
                .astype(jnp.float32)
        return x, x
    t("sort 122k int32", v1, v4, ids)

    # (4) non-unique scatter-max 122k -> 40M
    def m1(grid, ids, prev):
        g = grid.at[ids].max(1.0 + prev * 0.0, mode="drop")
        x = g[0]
        return x, x

    def m4(grid, ids, prev):
        x = prev
        for _ in range(4):
            g = grid.at[ids].max(1.0 + x * 0.0, mode="drop")
            x = g[0]
        return x, x
    t("scatter-max non-unique 122k -> 40M", m1, m4, grid, ids)

    # (5) same with unique_indices=True (correctness-unsafe with dupes for
    # add, fine for max on equal updates) — the vectorized upper bound
    def u1(grid, ids, prev):
        g = grid.at[ids].max(1.0 + prev * 0.0, mode="drop",
                             unique_indices=True)
        x = g[0]
        return x, x

    def u4(grid, ids, prev):
        x = prev
        for _ in range(4):
            g = grid.at[ids].max(1.0 + x * 0.0, mode="drop",
                                 unique_indices=True)
            x = g[0]
        return x, x
    t("scatter-max unique-claimed 122k -> 40M", u1, u4, grid, ids)

    # (6) dense elementwise pass over 40M f32 (the application floor)
    def d1(grid, prev):
        g = jnp.maximum(grid + prev * 0.0, 0.1) * 0.99
        x = g[0]
        return x, x

    def d4(grid, prev):
        x = prev
        for _ in range(4):
            x = (jnp.maximum(grid + x * 0.0, 0.1) * 0.99)[0]
        return x, x
    t("dense elementwise 40M f32", d1, d4, grid)


if __name__ == "__main__":
    main()
