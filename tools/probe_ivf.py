"""Isolate the slow stage of the IVF probed scan at D=512 (real TPU).

Observed: the full query is 0.1 ms at D=128 but ~13 ms at D=512 (fp32) /
3.3 ms (int8) — ~10 GB/s effective on the (Q, nprobe) cell gather. This
times each stage and several gather formulations to find the fast one.

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

from tools.bench_bank import log, marginal

C, P, NPROBE, K = 1024, 2048, 32, 20


def main():
    rng = np.random.RandomState(0)
    probe_np = rng.choice(C, (1, NPROBE), replace=False).astype(np.int32)
    probe = jnp.asarray(probe_np)

    for d, dt in ((512, np.float32), (512, np.int8), (128, np.float32)):
        cells = jnp.asarray(
            (rng.randn(C, P, d) * 10).astype(dt))
        q = jnp.asarray(rng.randn(1, d).astype(np.float32))
        mb = C and probe_np.size * P * d * np.dtype(dt).itemsize / 1e6

        def g_fancy(cl, pr, c):
            cand = cl[pr + (c * 1e-30).astype(pr.dtype)]
            return cand.astype(jnp.float32).sum() * 1e-9

        def g_flat(cl, pr, c):
            f = cl.reshape(C, P * d)
            cand = jnp.take(f, pr[0] + (c * 1e-30).astype(pr.dtype), axis=0)
            return cand.astype(jnp.float32).sum() * 1e-9

        def g_onehot_dot(cl, qq, c):
            # scoring reference WITHOUT a gather: dot over the contiguous
            # first NPROBE cells — isolates matvec cost from gather cost
            cand = jax.lax.dynamic_slice(
                cl, (0, 0, 0), (NPROBE, P, d)).reshape(1, NPROBE * P, d)
            if dt is np.float32:
                rhs = qq * (1.0 + c * 1e-30)
                pet = jnp.float32
            else:
                rhs = jnp.clip(jnp.round(qq * (1.0 + c * 1e-30)), -127,
                               127).astype(jnp.int8)
                pet = jnp.int32
            dots = jax.lax.dot_general(
                cand, rhs, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=pet)
            return dots.astype(jnp.float32).sum() * 1e-9

        def g_vmap_slice(cl, pr, c):
            # one dynamic_slice per probe (vmapped): start indices are
            # traced scalars, not a gather
            def one(j):
                return jax.lax.dynamic_slice(cl, (j, 0, 0), (1, P, d))

            cand = jax.vmap(one)(pr[0] + (c * 1e-30).astype(pr.dtype))
            return cand.astype(jnp.float32).sum() * 1e-9

        ms1 = marginal(g_fancy, cells, probe)
        ms2 = marginal(g_flat, cells, probe)
        ms3 = marginal(g_onehot_dot, cells, q)
        ms4 = marginal(g_vmap_slice, cells, probe)
        log(f"D={d} {np.dtype(dt).name} ({mb:.0f} MB probed): "
            f"fancy {ms1:.2f} | flat-take {ms2:.2f} | "
            f"slice+dot(no gather) {ms3:.2f} | vmap-slice {ms4:.2f} ms")


if __name__ == "__main__":
    main()
