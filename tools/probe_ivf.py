"""Isolate the slow stage of the IVF probed scan at D=512 (real TPU).

Observed: the full query is 0.1 ms at D=128 but ~13 ms at D=512 (fp32) /
2.6 ms (int8) — ~10 GB/s effective on the (Q, nprobe) cell gather. This
times each formulation with ONE jit per variant (the relay pays minutes
per compile, so no chained timing here): per-call wall including a small
fetch, min over repeats — differences at the 3-13 ms scale dominate the
~1 ms dispatch noise.

Usage: python tools/probe_ivf.py
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

from tools.bench_bank import log

C, P, NPROBE = 1024, 2048, 32
D = 512


def timeit(jfn, *args, n=30, reps=3):
    out = jfn(*args)
    _ = np.asarray(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n):
            out = jfn(*args)
        _ = np.asarray(out)
        best = min(best, (time.time() - t0) / n * 1000.0)
    return best


def main():
    rng = np.random.RandomState(0)
    probe = jnp.asarray(
        rng.choice(C, (1, NPROBE), replace=False).astype(np.int32))
    cells = jnp.asarray(rng.randn(C, P, D).astype(np.float32))
    cells8 = jnp.asarray(
        np.clip(np.round(rng.randn(C, P, D) * 30), -127, 127).astype(np.int8))
    q = jnp.asarray(rng.randn(1, D).astype(np.float32))

    @jax.jit
    def g_fancy(cl, pr):
        return cl[pr].astype(jnp.float32).sum() * 1e-9

    @jax.jit
    def g_fancy8(cl, pr):
        return cl[pr].astype(jnp.float32).sum() * 1e-9

    @jax.jit
    def g_vslice(cl, pr):
        def one(j):
            return jax.lax.dynamic_slice(cl, (j, 0, 0), (1, P, D))
        return jax.vmap(one)(pr[0]).astype(jnp.float32).sum() * 1e-9

    @jax.jit
    def dot_nogather(cl, qq):
        cand = jax.lax.dynamic_slice(
            cl, (0, 0, 0), (NPROBE, P, D)).reshape(1, NPROBE * P, D)
        dots = jax.lax.dot_general(cand, qq, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)
        return dots.sum() * 1e-9

    @jax.jit
    def g_fancy_dot(cl, pr, qq):
        cand = cl[pr].reshape(1, NPROBE * P, D)
        dots = jax.lax.dot_general(cand, qq, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)
        return dots.sum() * 1e-9

    log(f"f32 fancy gather (134 MB):      {timeit(g_fancy, cells, probe):.2f} ms")
    log(f"int8 fancy gather (33 MB):      {timeit(g_fancy8, cells8, probe):.2f} ms")
    log(f"f32 vmap dynamic_slice:         {timeit(g_vslice, cells, probe):.2f} ms")
    log(f"f32 dot WITHOUT gather:         {timeit(dot_nogather, cells, q):.2f} ms")
    log(f"f32 fancy gather + dot:         {timeit(g_fancy_dot, cells, probe, q):.2f} ms")


if __name__ == "__main__":
    main()
