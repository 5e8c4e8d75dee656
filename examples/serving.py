#!/usr/bin/env python
"""Production-serving recipe: the fast query path end to end.

Composes the serving opt-ins on a synthetic world (swap in real scans via
data/native.py loaders):

  1. BN folding (models/fold.py) — eval BatchNorm folded into conv weights.
  2. host_stats extraction — the native loader counting-sorts each scan by
     pillar and precomputes per-pillar stats during IO; the device runs ZERO
     scatters (stats become gathers, the feature mean runs as the Pallas
     cumsum segment-sum).
  3. staged registration — the top candidate registers alone first
     (first-success-wins); the batched top-k only runs on failure.

  4. fast_match registration preset — coarse-score candidate pruning,
     pooled theta-argmax, half-resolution fine stage.

Measured on one TPU v5e (RESULTS.md): 1.9 ms/query device compute for
detect (122 480-pt scan → descriptor → exact top-20); staged
single-candidate registration 3.5 ms and full top-20 fallback 18.4 ms at
768² with the fast_match(fm=True) preset — 5.4 ms device for a full
located query, issued as ONE device program (locate_fused).

    python examples/serving.py [--n-db 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from gloc3d_tpu.config import (
    BEVConfig, IndexConfig, MatchConfig, ModelConfig, PipelineConfig,
    VoxelConfig,
)
from gloc3d_tpu.models import build_model
from gloc3d_tpu.models.fold import fold_batch_norm
from gloc3d_tpu.pipeline import GlobalLocalizer

N_PTS = 32768  # dense enough for ≥2-point BEV column stacking


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


def scan_at(world, x, y, yaw, seed):
    r = np.random.RandomState(seed)
    rel = world[:, :2] - np.array([x, y])
    sel = world[np.linalg.norm(rel, axis=1) < 35]
    c, s = np.cos(-yaw), np.sin(-yaw)
    px, py = sel[:, 0] - x, sel[:, 1] - y
    out = np.stack([c * px - s * py, s * px + c * py, sel[:, 2]], 1)
    pts = np.zeros((N_PTS, 4), np.float32)
    m = np.zeros(N_PTS, np.float32)
    k = min(len(out), N_PTS)
    j = r.choice(len(out), k, replace=len(out) < N_PTS)
    pts[:k, :3] = out[j] + r.normal(0, 0.03, (k, 3))
    m[:k] = 1.0
    return pts, m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-db", type=int, default=32)
    ap.add_argument("--map-scale", action="store_true",
                    help="use the map-scale index (IVF cells + int8 codes) "
                         "instead of the exact flat bank")
    args = ap.parse_args()

    cfg = PipelineConfig(
        bev=BEVConfig(image_size=256, max_points=N_PTS),
        voxel=VoxelConfig(max_points=N_PTS),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128),
        index=IndexConfig(dim=128, top_k=10, capacity=max(64, args.n_db),
                          # --map-scale: IVF-partitioned int8 cells — the
                          # million-scan configuration (1M x 128 on v5e:
                          # 0.02 ms/query vs 1.1 ms exact flat; RESULTS.md)
                          backend="ivf" if args.map_scale else "flat",
                          quantize="int8" if args.map_scale else "none",
                          ivf_num_cells=8, ivf_cell_capacity=64,
                          ivf_nprobe=4, ivf_train_sample=max(64, args.n_db)),
        # staged_first defaults on. The synthetic world's BEVs are sparse
        # (~80 occupied pixels vs thousands on real scans), so the overlap
        # floor scales down and the peak-sharpness ratio gate (calibrated in
        # RESULTS.md: true matches ≳ 1.1, negatives ≤ 1.08) keeps the
        # accept decision sound.
        match=MatchConfig(image_size=256, min_overlap_pixels=24,
                          min_peak_ratio=1.1),
    ).fast_match(fm=True)  # serving matcher preset: Fourier-Mellin coarse
    # rotation, coarse-score pruning, half-res fine (RESULTS.md round 3:
    # 206 -> 18.4 ms full top-20 at 768^2; staged single candidate 3.5 ms)
    world = make_world()

    # --- train-time model init (stands in for a trained checkpoint) --------
    model = build_model(cfg.model, cfg.voxel)
    p0, m0 = scan_at(world, 0, 0, 0, 0)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), p0[None], m0[None])

    # VLAD cluster init (the reference's mandatory --mode=cluster step;
    # load a trained checkpoint here instead for real deployments)
    from gloc3d_tpu.train.cluster import init_vlad_from_data

    rng0 = np.random.RandomState(0)
    calib = [scan_at(world, x, rng0.uniform(-40, 40), 0.0, 500 + i)
             for i, x in enumerate(np.linspace(-100, 100, 12))]
    variables, _, _ = init_vlad_from_data(
        cfg, model, variables, np.stack([s[0] for s in calib]),
        np.stack([s[1] for s in calib]), jax.random.PRNGKey(3),
        num_images=12, per_image=200,
    )

    # --- serving conversion: fold BN, switch to the folded model -----------
    folded_cfg = cfg.replace(model=cfg.model.replace(fold_bn=True))
    folded_model = build_model(folded_cfg.model, folded_cfg.voxel)
    folded_params = {"params": fold_batch_norm(
        variables["params"], variables["batch_stats"])}

    # device_keyframes: keyframe occupancy bitmaps live in HBM next to the
    # descriptor bank; the match jit gathers candidates by index — no
    # (K, S, S) f32 host→device stack per located query
    loc = GlobalLocalizer(folded_cfg, folded_model, folded_params,
                          host_stats=True, device_keyframes=True)
    print(f"host_stats serving path active: {loc.host_stats}; "
          f"device keyframe store: {loc.device_keyframes}; "
          f"index: {cfg.index.backend}/{cfg.index.quantize}")

    # --- index build -------------------------------------------------------
    rng = np.random.RandomState(1)
    poses = np.stack([
        np.linspace(-120, 120, args.n_db),
        rng.uniform(-40, 40, args.n_db),
        rng.uniform(-0.4, 0.4, args.n_db),
    ], 1)
    scans = [scan_at(world, *p, 100 + i) for i, p in enumerate(poses)]
    t0 = time.time()
    loc.add_keyframes(np.stack([s[0] for s in scans]),
                      np.stack([s[1] for s in scans]))
    print(f"indexed {len(loc.bank)} keyframes "
          f"({(time.time()-t0)/args.n_db*1000:.0f} ms/scan incl. compile)")

    # --- queries -----------------------------------------------------------
    hits = 0
    t0 = time.time()
    n_q = 8
    for qi in range(n_q):
        gi = rng.randint(args.n_db)
        x, y, yaw = poses[gi]
        qx, qy = x + rng.uniform(-4, 4), y + rng.uniform(-4, 4)
        q = scan_at(world, qx, qy, yaw + rng.uniform(-0.3, 0.3), 10_000 + qi)
        # one device program per query: extraction -> search -> HBM-store
        # gather -> staged registration (lax.cond fallback)
        res = loc.locate_fused(*q)
        if res.success:  # hit = matched keyframe within the positive radius
            dx, dy = poses[res.db_index, :2] - (qx, qy)
            hits += bool(np.hypot(dx, dy) < 20.0)
    dt = (time.time() - t0) / n_q * 1000
    print(f"localized {hits}/{n_q} queries within the 20 m positive radius "
          f"(untrained demo weights — train via examples/end_to_end.py; "
          f"{dt:.0f} ms/query through this runtime, see bench.py for the "
          f"async-safe device-latency methodology)")


if __name__ == "__main__":
    main()
