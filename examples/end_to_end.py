#!/usr/bin/env python
"""End-to-end gloc3d_tpu walkthrough on a self-contained synthetic world.

Runs the complete workflow in a few minutes on one TPU chip (or CPU):
  1. build a synthetic world and scan it from db/query poses;
  2. VLAD cluster init → triplet training with on-device mining;
  3. full evaluation: recognition recall + 6-DoF registration stats.

    python examples/end_to_end.py [--epochs 8] [--out /tmp/gloc_example]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import (
    BEVConfig, IndexConfig, MatchConfig, ModelConfig, PipelineConfig,
    TrainConfig, VoxelConfig,
)
from gloc3d_tpu.data.dataset import TripletDataset
from gloc3d_tpu.data.viz import plot_split_trajectory
from gloc3d_tpu.eval.evaluator import evaluate_split
from gloc3d_tpu.models import build_model
from gloc3d_tpu.pipeline import GlobalLocalizer
from gloc3d_tpu.train import Trainer
from gloc3d_tpu.train.cluster import init_vlad_from_data

N_PTS = 4096


def make_world(seed=7, n_walls=160, extent=200.0):
    rng = np.random.RandomState(seed)
    walls = []
    for _ in range(n_walls):
        x0, y0 = rng.uniform(-extent, extent, 2)
        ang = rng.uniform(0, np.pi)
        ts = rng.uniform(0, rng.uniform(4, 12), 220)
        walls.append(np.stack([x0 + np.cos(ang) * ts, y0 + np.sin(ang) * ts,
                               rng.uniform(0, 3, 220)], 1))
    return np.concatenate(walls).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--out", default="/tmp/gloc_example")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg = PipelineConfig(
        bev=BEVConfig(image_size=256, max_points=N_PTS),
        voxel=VoxelConfig(max_points=N_PTS),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128),
        index=IndexConfig(dim=128, top_k=10, capacity=128),
        # the synthetic world's BEVs are sparse (~100 occupied pixels vs
        # thousands on real scans): scale the overlap floor down and let the
        # peak-sharpness ratio gate carry the accept decision (RESULTS.md
        # calibration: true matches ≳ 1.1, negatives ≤ 1.08)
        match=MatchConfig(image_size=256, min_overlap_pixels=24,
                          min_peak_ratio=1.1),
        train=TrainConfig(batch_size=4, n_neg=5, n_neg_sample=64,
                          cache_refresh_rate=40, lr=2e-3, eval_every=1),
    )
    world = make_world()
    rng = np.random.RandomState(0)

    def scan_at(x, y, yaw, seed):
        r = np.random.RandomState(seed)
        rel = world[:, :2] - np.array([x, y])
        pts = world[np.linalg.norm(rel, axis=1) < 35]
        c, s = np.cos(-yaw), np.sin(-yaw)
        px, py = pts[:, 0] - x, pts[:, 1] - y
        out = np.stack([c * px - s * py, s * px + c * py, pts[:, 2]], 1)
        out = np.concatenate(
            [out + r.normal(0, 0.03, out.shape),
             r.uniform(0, 1, (len(out), 1))], 1
        ).astype(np.float32)
        pad = np.zeros((N_PTS, 4), np.float32)
        sel = (r.choice(len(out), N_PTS, replace=False)
               if len(out) > N_PTS else np.arange(len(out)))
        pad[: len(sel)] = out[sel]
        mask = np.zeros(N_PTS, np.float32)
        mask[: len(sel)] = 1.0
        return pad, mask

    def pose(p):
        t = np.eye(4)
        c, s = np.cos(p[2]), np.sin(p[2])
        t[:2, :2] = [[c, -s], [s, c]]
        t[0, 3], t[1, 3] = p[0], p[1]
        return t

    grid = np.linspace(-160, 160, 8)
    db_poses = [(x, y, rng.uniform(0, 2 * np.pi)) for x in grid for y in grid]
    q_poses = []
    for _ in range(32):
        x, y, yaw = db_poses[rng.randint(len(db_poses))]
        q_poses.append((x + rng.uniform(-5, 5), y + rng.uniform(-5, 5),
                        yaw + rng.uniform(-0.4, 0.4)))
    db = [scan_at(*p, seed=i) for i, p in enumerate(db_poses)]
    q = [scan_at(*p, seed=1000 + j) for j, p in enumerate(q_poses)]
    ds = TripletDataset(
        db_inputs=np.stack([s[0] for s in db]),
        q_inputs=np.stack([s[0] for s in q]),
        utm_db=np.array([(p[0], p[1]) for p in db_poses]),
        utm_q=np.array([(p[0], p[1]) for p in q_poses]),
        db_masks=np.stack([s[1] for s in db]),
        q_masks=np.stack([s[1] for s in q]),
        db_poses=np.stack([pose(p) for p in db_poses]),
        q_poses=np.stack([pose(p) for p in q_poses]),
    )
    plot_split_trajectory(ds.utm_db, ds.utm_q,
                          os.path.join(args.out, "trajectory.png"))
    print(f"dataset: {ds.num_db} db / {ds.num_q} queries")

    model = build_model(cfg.model, cfg.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(ds.db_inputs[:1]),
        jnp.asarray(ds.db_masks[:1]),
    )
    print("cluster init (k-means over encoder descriptors)...")
    params, _, _ = init_vlad_from_data(
        cfg, model, params, ds.db_inputs, ds.db_masks, jax.random.PRNGKey(5),
        num_images=64, per_image=100,
    )
    trainer = Trainer(cfg, model, ds, args.out)
    state = trainer.init_state(params["params"], params.get("batch_stats"))
    state = trainer.fit(state, epochs=args.epochs)
    best = trainer.load_checkpoint("best", state)

    variables = {"params": best.params}
    if best.batch_stats:
        variables["batch_stats"] = best.batch_stats
    loc = GlobalLocalizer(cfg, model, variables)
    report = evaluate_split(loc, ds, out_dir=args.out, batch=8)
    print(report.to_json())
    print(f"artifacts in {args.out}")


if __name__ == "__main__":
    main()
