"""Primitive-cost microbenchmarks for the aligned-path redesign (real TPU).

profile_aligned.py attributes the 11.5 ms aligned located query as
align 1.7 / bev 3.1 / forward 3.0 / tail 2.4. The bev and forward stages
are built from sorts, scatters, and gathers at N = 122,480; this tool
measures each primitive in isolation (paired-marginal methodology,
CLAUDE.md) so the redesign can be costed BEFORE refactoring:

  argsort     — two-operand key/iota sort (what jnp.argsort lowers to)
  key sort    — single-operand int32 sort (coords decoded from the key
                arithmetically; the planned replacement in scan_to_bev)
  packed sort — single-key sort of (id << 17 | row): stable pillar sort
                AND permutation in one key (the planned device-sorted
                forward; V=11,200 pillars * 2^17 rows < 2^31)
  scatters    — the (N,) -> 589k image count scatter and the (N,5) ->
                11,200 pillar stats scatter they would replace/keep
  gathers     — (N,4) row gather by permutation; starts searchsorted

Usage: python tools/micro_primitives.py
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

import bench as B

N = 122_480
V = 11_200          # pillar grid 140 x 80 x 1
S2 = 768 * 768      # BEV image pixels


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, V, size=N).astype(np.int32))
    vids = jnp.asarray(rng.randint(0, 5_2 * 10**8 // 100, size=N).astype(np.int32))
    pts = jnp.asarray(rng.randn(N, 4).astype(np.float32))
    feats = jnp.asarray(rng.randn(N, 64).astype(np.float32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    sids = jnp.sort(ids)

    def mk(fn, *args):
        def f1(*a):
            *xs, prev = a
            out = fn(*xs, prev)
            return out, out.reshape(-1)[0].astype(jnp.float32)

        def f4(*a):
            *xs, prev = a
            acc = jnp.float32(0.0)
            x = prev
            for _ in range(4):
                out = fn(*xs, x)
                x = out.reshape(-1)[0].astype(jnp.float32)
                acc = acc + x * 1e-30
            return out, acc

        lat, call = B.marginal_chained(f1, f4, *args, n=20, reps=7)
        return lat, call

    cases = [
        ("argsort int32 (key+iota)", lambda k, p: jnp.argsort(
            k + p.astype(jnp.int32) * 0), (vids,)),
        ("single-key sort int32", lambda k, p: jnp.sort(
            k + p.astype(jnp.int32) * 0), (vids,)),
        ("packed sort (id<<17|row)", lambda k, p: jnp.sort(
            ((k + p.astype(jnp.int32) * 0) << 17)
            | jnp.arange(N, dtype=jnp.int32)), (ids,)),
        ("scatter_add (N,)->589k", lambda k, p: jnp.zeros(
            (S2 + 1,), jnp.float32).at[k % (S2 + 1)].add(1.0 + p * 0.0),
         (vids,)),
        ("scatter_add (N,5)->11200", lambda i, x, p: jnp.zeros(
            (V, 5), jnp.float32).at[i].add(
                jnp.concatenate([x + p * 0.0, jnp.ones((N, 1))], -1)),
         (ids, pts)),
        ("scatter_add (N,64)->11200", lambda i, x, p: jnp.zeros(
            (V, 64), jnp.float32).at[i].add(x + p * 0.0), (ids, feats)),
        ("row gather (N,4) by perm", lambda x, o, p: (x + p * 0.0)[o],
         (pts, perm)),
        ("searchsorted 11201 in N", lambda s, p: jnp.searchsorted(
            s + p.astype(jnp.int32) * 0, jnp.arange(V + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32), (sids,)),
        ("cumsum (N,64) fp32", lambda x, p: jnp.cumsum(
            x + p * 0.0, axis=0), (feats,)),
        ("cumsum (N,) fp32", lambda x, p: jnp.cumsum(
            x[:, 0] + p * 0.0), (feats,)),
    ]
    for name, fn, args in cases:
        try:
            lat, call = mk(fn, *args)
            log(f"{name:28s}: {lat:6.3f} ms device ({call:.3f}/call)")
        except Exception as e:
            log(f"{name:28s}: FAILED {e!r}")


if __name__ == "__main__":
    main()

# CAVEAT (round 4): the marginal-chained harness consumes only element 0 of
# each op's output, which lets XLA legally rewrite a SORT to a min-reduction
# — the sort rows above therefore measure ~0 and are invalid. Scatters and
# gathers cannot be simplified that way and measure correctly. For
# sort-vs-scatter decisions use the end-to-end forward A/B in
# tools/profile_aligned.py (6.42 ms sorted vs 2.98 ms scatter at N=122,480).
