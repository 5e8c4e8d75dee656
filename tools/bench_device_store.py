"""Serving-path cost of host-side keyframes vs the HBM store (real TPU).

The host path re-stacks K candidate images on the host and uploads a
(K, S, S) f32 tensor per located query (47 MB at 768², K=20) — the analog
of loop_detector.cpp:183-288's per-match grid handling. The device store
(GlobalLocalizer(device_keyframes=True)) keeps bit-packed occupancy in HBM
and uploads only a (K,) int32 index vector. Both paths run the identical
match jit, so per-call WALL time difference isolates stack+upload cost.

Methodology: per-call wall time including one small result fetch (the fetch
round trip is common to both paths), min over repeats.

Usage: python tools/bench_device_store.py [--k 20] [--size 768]
"""

import argparse
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

from gloc3d_tpu.config import MatchConfig
from gloc3d_tpu.ops.bev import BEVImage
from gloc3d_tpu.ops import bev_match
from gloc3d_tpu.pipeline import _pack_bits, _unpack_bits
from tools.bench_matcher import log, real_scan_bev, perturbed_stack


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--size", type=int, default=768)
    ap.add_argument("--n-store", type=int, default=64)
    args = ap.parse_args()

    log("building BEVs...")
    (q_img, q_origin, res), cfg, raw = real_scan_bev(args.size)
    db_imgs, db_origins = perturbed_stack(raw, cfg, args.n_store)
    log(f"{args.n_store} keyframes built")

    mcfg = MatchConfig(image_size=args.size, fine_downsample=2,
                       coarse_rot_downsample=8, fine_top_f=4,
                       coarse_mode="fm")

    q_img_d = jnp.asarray(q_img)
    q_origin_d = jnp.asarray(q_origin)

    # HBM store: bit-packed occupancy + origins
    store = jax.jit(_pack_bits)(jnp.asarray(db_imgs))
    store_origins = jnp.asarray(db_origins)
    store.block_until_ready()

    def match_host(qi, qo, db, do):
        query = BEVImage(image=qi, origin_xy=qo,
                         resolution=jnp.float32(res),
                         num_occupied=jnp.sum(qi < 0.5).astype(jnp.int32))
        r = bev_match.match_bev_topk(query, db, do, mcfg, resolution=res)
        return r.score

    def match_store(qi, qo, idx, st, so):
        return match_host(qi, qo, _unpack_bits(st[idx]), so[idx])

    j_host = jax.jit(match_host)
    j_store = jax.jit(match_store)

    idx_np = np.arange(args.k, dtype=np.int32)
    host_np = db_imgs[:args.k]          # host-resident keyframe images
    ho_np = db_origins[:args.k]

    # correctness: identical scores
    s_h = np.asarray(j_host(q_img_d, q_origin_d, jnp.asarray(host_np),
                            jnp.asarray(ho_np)))
    s_s = np.asarray(j_store(q_img_d, q_origin_d, jnp.asarray(idx_np),
                             store, store_origins))
    np.testing.assert_allclose(s_s, s_h, rtol=1e-5, atol=1e-5)
    log(f"scores identical: {s_h.min():.3f}-{s_h.max():.3f}")

    def time_host():
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            n = 10
            for _ in range(n):
                out = j_host(q_img_d, q_origin_d, jnp.asarray(host_np),
                             jnp.asarray(ho_np))
            _ = np.asarray(out)
            best = min(best, (time.time() - t0) / n * 1000.0)
        return best

    def time_store():
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            n = 10
            for _ in range(n):
                out = j_store(q_img_d, q_origin_d, jnp.asarray(idx_np),
                              store, store_origins)
            _ = np.asarray(out)
            best = min(best, (time.time() - t0) / n * 1000.0)
        return best

    _ = time_host(); _ = time_store()   # warm
    ms_h = time_host()
    ms_s = time_store()
    mb = host_np.nbytes / 1e6
    log(f"K={args.k} at {args.size}²: host stack+upload path "
        f"{ms_h:.1f} ms/call ({mb:.0f} MB/query), device store "
        f"{ms_s:.1f} ms/call ({idx_np.nbytes} B/query) — "
        f"{ms_h - ms_s:.1f} ms upload cost eliminated "
        f"({ms_h / max(ms_s, 1e-9):.2f}x)")

    # staged K=1 case (the common located query)
    idx1 = idx_np[:1]; h1 = host_np[:1]; o1 = ho_np[:1]
    j_host1 = jax.jit(match_host)
    s_h1 = np.asarray(j_host1(q_img_d, q_origin_d, jnp.asarray(h1),
                              jnp.asarray(o1)))
    j_store1 = jax.jit(match_store)
    s_s1 = np.asarray(j_store1(q_img_d, q_origin_d, jnp.asarray(idx1),
                               store, store_origins))
    np.testing.assert_allclose(s_s1, s_h1, rtol=1e-5, atol=1e-5)

    def t_once(fn, *a):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            n = 10
            for _ in range(n):
                out = fn(*a)
            _ = np.asarray(out)
            best = min(best, (time.time() - t0) / n * 1000.0)
        return best

    def host1():
        return j_host1(q_img_d, q_origin_d, jnp.asarray(h1), jnp.asarray(o1))
    def store1():
        return j_store1(q_img_d, q_origin_d, jnp.asarray(idx1), store,
                        store_origins)

    _ = t_once(lambda: host1()); _ = t_once(lambda: store1())
    ms_h1 = t_once(lambda: host1())
    ms_s1 = t_once(lambda: store1())
    log(f"K=1 staged: host {ms_h1:.1f} ms/call ({h1.nbytes/1e6:.1f} MB), "
        f"store {ms_s1:.1f} ms/call — {ms_h1 - ms_s1:.1f} ms eliminated")


if __name__ == "__main__":
    main()
