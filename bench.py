"""Benchmark: end-to-end query detection latency on one TPU chip.

Measures the reference's "query detect latency" quantity
(global_localization.cpp:500-508: feature extraction + top-20 database
search) for the flagship s2s path: raw padded scan → PointPillar+NetVLAD-FC
descriptor → exact L2 top-20 over a 10k-scan descriptor bank.

Prints ONE JSON line:
  {"metric": "query_detect_latency_ms", "value": <median ms>, "unit": "ms",
   "vs_baseline": <2.0 / value>}
vs_baseline is measured against the north-star target of 2 ms median
(BASELINE.md: <2 ms on v5e-8; here a single chip does the whole query).
Component timings go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from gloc3d_tpu.config import PipelineConfig
    from gloc3d_tpu.models import build_model
    from gloc3d_tpu.ops.topk import l2_topk

    cfg = PipelineConfig.s2s()
    n_pts = cfg.voxel.max_points  # 122480, the reference KITTI pad size
    model = build_model(cfg.model, cfg.voxel)

    rng = np.random.RandomState(0)
    pts = np.zeros((1, n_pts, 4), np.float32)
    n_real = 100000
    pts[0, :n_real, 0] = rng.uniform(-35, 35, n_real)
    pts[0, :n_real, 1] = rng.uniform(-20, 20, n_real)
    pts[0, :n_real, 2] = rng.uniform(-2, 3, n_real)
    pts[0, :n_real, 3] = rng.uniform(0, 1, n_real)
    mask = np.zeros((1, n_pts), np.float32)
    mask[0, :n_real] = 1.0
    pts_d = jnp.asarray(pts)
    mask_d = jnp.asarray(mask)

    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pts_d, mask_d)
    log(f"init: {time.time()-t0:.1f}s")

    bank = jnp.asarray(rng.randn(10000, cfg.index.dim).astype(np.float32))

    @jax.jit
    def detect(params, points, mask, bank):
        desc = model.apply(params, points, mask)
        return l2_topk(desc, bank, 20)

    t0 = time.time()
    d2, idx = detect(params, pts_d, mask_d, bank)
    _ = np.asarray(d2)  # host fetch = real completion barrier on axon
    log(f"compile+first run: {time.time()-t0:.1f}s")

    # NOTE on methodology: through the axon relay, block_until_ready returns
    # immediately (fully async dispatch) and a per-call host fetch costs a
    # ~2 s relay round-trip. True device-side timing therefore uses:
    #  (a) throughput: queue N calls, fetch once, divide;
    #  (b) latency: chain each call's input on the previous output so calls
    #      serialize on-device, fetch once, divide.
    n_it = 50
    d2, idx = detect(params, pts_d, mask_d, bank)
    _ = np.asarray(d2)
    t0 = time.time()
    for _ in range(n_it):
        d2, idx = detect(params, pts_d, mask_d, bank)
    _ = np.asarray(d2)
    thr = (time.time() - t0) / n_it * 1000.0
    log(f"throughput (pipelined): {thr:.2f} ms/query")

    @jax.jit
    def detect_chained(params, points, mask, bank, prev):
        # fold the previous result into the input INSIDE the jit so chaining
        # costs no extra eager launches, only the data dependency
        d2, idx = detect(params, points + prev * 0.0, mask, bank)
        return d2, idx, d2[0, 0]

    prev = jnp.float32(0.0)
    d2, idx, prev = detect_chained(params, pts_d, mask_d, bank, prev)
    _ = np.asarray(d2)
    t0 = time.time()
    for _ in range(n_it):
        d2, idx, prev = detect_chained(params, pts_d, mask_d, bank, prev)
    _ = np.asarray(d2)
    med = (time.time() - t0) / n_it * 1000.0
    log(f"latency (chained): {med:.2f} ms/query")

    # component timings (stderr only)
    @jax.jit
    def search_chained(q, bank, prev):
        d2, idx = l2_topk(q + prev * 0.0, bank, 20)
        return d2, idx, d2[0, 0]

    q = jnp.asarray(rng.randn(1, cfg.index.dim).astype(np.float32))
    prev = jnp.float32(0.0)
    d2s, _, prev = search_chained(q, bank, prev)
    _ = np.asarray(d2s)
    t0 = time.time()
    for _ in range(200):
        d2s, _, prev = search_chained(q, bank, prev)
    _ = np.asarray(d2s)
    log(f"search-only (10k bank): {(time.time()-t0)/200*1000:.3f} ms")

    # context: the 2 ms north star is stated for a v5e-8; with the bank
    # sharded and queries distributed, 8 chips serve 8 queries concurrently
    log(f"projected v5e-8 per-query rate: {med/8:.2f} ms/query "
        f"(8 concurrent single-chip queries)")

    print(json.dumps({
        "metric": "query_detect_latency_ms",
        "value": round(med, 3),
        "unit": "ms",
        "vs_baseline": round(2.0 / med, 4),
    }))


if __name__ == "__main__":
    main()
