"""Training-step throughput at reference scale (real TPU).

The reference trains s2s with SGD triplet steps over (B queries + B
positives + B·nNeg negatives) full-size scans (main.py:630-645, batchSize 2,
nNeg 10, 122480-pt KITTI pads). This measures the same step on one v5e:
queue-N-fetch-once over the state chain (each step consumes the previous
state, so the dependency chain is the timing chain — no artificial
coupling needed).

Usage: python tools/bench_train.py [--batch 2] [--steps 20]
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

from gloc3d_tpu.config import PipelineConfig
from gloc3d_tpu.data.dataset import TripletDataset
from gloc3d_tpu.models import build_model
from gloc3d_tpu.train.trainer import Trainer
from tools.bench_bank import log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--host-stats", action="store_true",
                    help="bench the zero-device-scatter train step "
                         "(TrainConfig.host_stats): host pillar stats + "
                         "sort, Pallas segment-sum with row-gather VJP")
    args = ap.parse_args()

    cfg = PipelineConfig.s2s()
    cfg = cfg.replace(train=cfg.train.replace(
        batch_size=args.batch, host_stats=args.host_stats))
    t = cfg.train
    n_pts = cfg.voxel.max_points
    b, n_neg = args.batch, t.n_neg

    # real scan + jittered copies as the synthetic corpus
    try:
        raw = np.fromfile("/root/reference/s2s_libtorch/000000.bin",
                          np.float32).reshape(-1, 4)
    except OSError:
        raw = np.random.RandomState(0).randn(100000, 4).astype(np.float32)
    base = np.zeros((n_pts, 4), np.float32)
    m = min(len(raw), n_pts)
    base[:m] = raw[:m]
    mask = np.zeros(n_pts, np.float32)
    mask[:m] = 1.0

    rng = np.random.RandomState(1)

    def scans(k):
        out = np.repeat(base[None], k, 0)
        out[:, :m, :3] += rng.normal(0, 0.02, (k, m, 3)).astype(np.float32)
        return out

    n_db = 8
    ds = TripletDataset(
        db_inputs=scans(n_db), q_inputs=scans(4),
        utm_db=rng.rand(n_db, 2) * 5, utm_q=rng.rand(4, 2) * 5,
        db_masks=np.repeat(mask[None], n_db, 0),
        q_masks=np.repeat(mask[None], 4, 0),
    )
    model = build_model(cfg.model, cfg.voxel)
    trainer = Trainer(cfg, model, ds, workdir="/tmp/bench_train")

    q_in = jnp.asarray(scans(b))
    p_in = jnp.asarray(scans(b))
    n_in = jnp.asarray(scans(b * n_neg))
    mk = jnp.asarray(np.repeat(mask[None], b, 0))
    n_mk = jnp.asarray(np.repeat(mask[None], b * n_neg, 0))
    neg_valid = jnp.ones((b, n_neg), jnp.float32)
    q_valid = jnp.ones((b,), jnp.float32)

    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), q_in, mk)
    state = trainer.init_state(params["params"],
                               params.get("batch_stats"))
    log(f"init {time.time()-t0:.1f}s")

    host_ms = 0.0
    if args.host_stats:
        cat = np.concatenate(
            [np.asarray(q_in), np.asarray(p_in), np.asarray(n_in)], axis=0)
        cat_mk = np.concatenate(
            [np.asarray(mk), np.asarray(mk), np.asarray(n_mk)], axis=0)
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            p_sorted, vl, vs = trainer._host_sorted(cat, cat_mk)
        host_ms = (time.time() - t0) / reps * 1000.0
        log(f"host stats+sort pass ({len(cat)} scans): {host_ms:.1f} ms "
            f"(this container has {os.cpu_count()} CPU core(s); threads "
            f"scale it and input pipelines overlap it with device work)")

        def step(state):
            return trainer._train_step_hs(state, p_sorted, vl, vs,
                                          neg_valid, q_valid)
    else:
        def step(state):
            return trainer._train_step(state, q_in, mk, p_in, mk, n_in, n_mk,
                                       neg_valid, q_valid,
                                       jax.random.PRNGKey(2))

    t0 = time.time()
    state, loss = step(state)
    _ = float(loss)
    log(f"first step (compile): {time.time()-t0:.1f}s, loss {float(loss):.4f}")

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(args.steps):
            state, loss = step(state)
        _ = float(loss)
        best = min(best, (time.time() - t0) / args.steps * 1000.0)
    scans_per_step = b * (2 + n_neg)
    tag = "host-stats " if args.host_stats else ""
    log(f"{tag}train step (B={b}, nNeg={n_neg}, {scans_per_step} full scans "
        f"fwd+bwd): {best:.1f} ms/step device = "
        f"{scans_per_step / best * 1000:.0f} scans/s; loss {float(loss):.4f}"
        + (f"; + host pass {host_ms:.1f} ms/step sequential "
           f"(pipelined serving overlaps it)" if args.host_stats else ""))


if __name__ == "__main__":
    main()
