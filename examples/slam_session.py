"""Online SLAM loop-closure session (the reference's SLAM mode, end to end).

The reference's loop detector runs ONLINE inside a SLAM system: every new
keyframe queries the database built so far — excluding the most recent
frames — and a loop closure fires when the nearest non-recent descriptor
clears the metric gate (loop_detector.cpp:22-81: periodic rebuild every 30
adds, exclude 30 recent, dist² gate); the closure's relative pose comes from
the 2-D matcher (loop_detector.cpp:183-288).

This demo drives the same capability TPU-natively on a synthetic world:

1. gate calibration on a held-out validation set (an untrained model's
   descriptor scale is arbitrary; a deployment tunes loop_metric_dist_th_
   on a validation run exactly like this),
2. lap 1 around a square course — every frame runs detect→add under the
   calibrated gate; no closure may fire (all places are new),
3. lap 2 with pose noise — each frame's ``bank.detect_loop`` names the
   lap-1 revisit and ``GlobalLocalizer.match_keyframe`` registers against
   it; recovered relative SE(2) poses are checked against ground truth.

Run: python examples/slam_session.py   (TPU or CPU; ~1 min on CPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import (
    BEVConfig, IndexConfig, MatchConfig, ModelConfig, PipelineConfig,
    VoxelConfig,
)
from gloc3d_tpu.models import build_model
from gloc3d_tpu.pipeline import GlobalLocalizer

N_PTS = 4096


def make_world(seed=7, n_walls=160, extent=120.0):
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
    pts = world[np.linalg.norm(rel, axis=1) < 35]
    c, s = np.cos(-yaw), np.sin(-yaw)
    px, py = pts[:, 0] - x, pts[:, 1] - y
    out = np.stack([c * px - s * py, s * px + c * py, pts[:, 2]], 1)
    out = np.concatenate(
        [out + r.normal(0, 0.03, out.shape), r.uniform(0, 1, (len(out), 1))],
        1).astype(np.float32)
    pad = np.zeros((N_PTS, 4), np.float32)
    sel = (r.choice(len(out), N_PTS, replace=False)
           if len(out) > N_PTS else np.arange(len(out)))
    pad[: len(sel)] = out[sel]
    mask = np.zeros(N_PTS, np.float32)
    mask[: len(sel)] = 1.0
    return pad, mask


def square_lap(n, half=60.0):
    """n poses around a square course, heading along the track."""
    poses = []
    for t in np.linspace(0, 1, n, endpoint=False):
        if t < 0.25:
            poses.append((-half + 8 * half * t, -half, 0.0))
        elif t < 0.5:
            poses.append((half, -half + 8 * half * (t - 0.25), np.pi / 2))
        elif t < 0.75:
            poses.append((half - 8 * half * (t - 0.5), half, np.pi))
        else:
            poses.append((-half, half - 8 * half * (t - 0.75), -np.pi / 2))
    return poses


def main():
    cfg = PipelineConfig(
        bev=BEVConfig(image_size=256, max_points=N_PTS),
        voxel=VoxelConfig(max_points=N_PTS),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128),
        index=IndexConfig(dim=128, top_k=3, num_exclude_recent=6,
                          capacity=128),
        match=MatchConfig(image_size=256, min_overlap_pixels=24,
                          min_peak_ratio=1.1),
    )
    world = make_world()
    model = build_model(cfg.model, cfg.voxel)
    p0, m0 = scan_at(world, 0, 0, 0, 0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(p0[None]), jnp.asarray(m0[None]))
    loc = GlobalLocalizer(cfg, model, params, device_keyframes=True)

    lap = square_lap(20)
    rng = np.random.RandomState(1)

    # ---- calibrate the metric gate on held-out validation poses ----------
    # (loop_metric_dist_th_ tuning, loop_detector.h:102): gate between the
    # same-place revisit distance and the closest distinct-place pair.
    val_poses = [(rng.uniform(-55, 55), rng.uniform(-55, 55),
                  rng.uniform(0, 2 * np.pi)) for _ in range(12)]
    vdesc = []
    for i, (x, y, yaw) in enumerate(val_poses):
        pts, mask = scan_at(world, x, y, yaw, seed=5000 + i)
        d, _, _ = loc.extract(pts[None], mask[None])
        vdesc.append(np.asarray(d[0]))
    vdesc = np.stack(vdesc)
    d2v = ((vdesc[:, None] - vdesc[None]) ** 2).sum(-1)
    min_interplace = d2v[np.triu_indices(len(val_poses), k=1)].min()
    x, y, yaw = val_poses[0]
    pts, mask = scan_at(world, x + 1.0, y - 0.5, yaw + 0.1, seed=6000)
    d, _, _ = loc.extract(pts[None], mask[None])
    revisit_d2 = float(((np.asarray(d[0]) - vdesc[0]) ** 2).sum())
    # with matcher verification downstream the gate tunes for RECALL: admit
    # generously (4× the closest distinct-place validation pair) and let
    # registration reject the aliases
    gate = 4.0 * float(min_interplace)
    loc.bank.cfg = loc.bank.cfg.replace(metric_dist_threshold=gate)
    print(f"gate calibrated on 12 validation poses: {gate:.3e} "
          f"(revisit d² {revisit_d2:.3e}, min inter-place "
          f"{min_interplace:.3e})")

    # ---- lap 1: build the map online; no VERIFIED closure may fire -------
    # The descriptor gate PROPOSES and the registration matcher VERIFIES —
    # the reference's own contract (detect → match → first-success-wins,
    # global_localization.cpp:511-524). An untrained descriptor may alias
    # two distinct places past the metric gate; the matcher must reject it.
    def propose(desc):
        """Gated top-3 candidates, best first (detect → try-in-order is the
        reference's first-success-wins loop, global_localization.cpp:511)."""
        if len(loc.bank) <= cfg.index.num_exclude_recent + cfg.index.top_k:
            return []
        d2c, idxc = loc.bank.query(jnp.asarray(desc), k=3,
                                   exclude_recent=True)
        d2c, idxc = np.asarray(d2c[0]), np.asarray(idxc[0])
        return [int(j) for j, d in zip(idxc, d2c) if d < gate]

    kf_poses = []  # true (x, y, yaw) of every keyframe added, by db index
    proposals, verified_lap1 = 0, []
    for i, (x, y, yaw) in enumerate(lap):
        pts, mask = scan_at(world, x, y, yaw, seed=i)
        desc, bev, grd = loc.extract(pts[None], mask[None])
        for db_idx in propose(desc):
            proposals += 1
            res = loc.match_keyframe(db_index=db_idx, bev=bev, ground=grd)
            if res.success:
                verified_lap1.append((i, db_idx))
                break
        loc.add_keyframes(pts[None], mask[None])
        kf_poses.append((x, y, yaw))
    assert not verified_lap1, (
        f"lap 1 must not verify closures: {verified_lap1}")
    print(f"lap 1: {len(lap)} keyframes mapped, {proposals} descriptor "
          f"proposals, 0 verified (matcher rejected every alias)")

    # ---- lap 2: revisit with pose noise; closures must fire + register ---
    closures, pos_errs, yaw_errs = 0, [], []
    for i, (x, y, yaw) in enumerate(lap):
        dx, dy = rng.uniform(-2, 2, 2)
        dyaw = rng.uniform(-0.3, 0.3)
        pts, mask = scan_at(world, x + dx, y + dy, yaw + dyaw,
                            seed=1000 + i)
        desc, bev, grd = loc.extract(pts[None], mask[None])
        cands = propose(desc)
        loc.add_keyframes(pts[None], mask[None])
        kf_poses.append((x + dx, y + dy, yaw + dyaw))
        res, db_idx = None, -1
        for db_idx in cands:
            res = loc.match_keyframe(db_index=db_idx, bev=bev, ground=grd)
            if res.success:
                break
        if res is None or not res.success:
            continue
        closures += 1
        # ground truth: query pose relative to the matched keyframe
        kx, ky, kyaw = kf_poses[db_idx]
        gx, gy = x + dx - kx, y + dy - ky
        c, s = np.cos(-kyaw), np.sin(-kyaw)
        gt_xy = np.array([c * gx - s * gy, s * gx + c * gy])
        gt_yaw = (yaw + dyaw) - kyaw
        mx, my, myaw = res.match_xy_yaw
        pos_errs.append(float(np.hypot(mx - gt_xy[0], my - gt_xy[1])))
        yerr = (myaw - gt_yaw + np.pi) % (2 * np.pi) - np.pi
        yaw_errs.append(abs(float(yerr)))

    print(f"lap 2: {closures}/{len(lap)} loop closures registered")
    if closures:
        print(f"  relative-pose error: mean {np.mean(pos_errs):.3f} m / "
              f"{np.degrees(np.mean(yaw_errs)):.2f}°, "
              f"max {np.max(pos_errs):.3f} m / "
              f"{np.degrees(np.max(yaw_errs)):.2f}°")
    assert closures >= int(0.8 * len(lap)), "too few closures"
    assert np.max(pos_errs) < 1.0 and np.degrees(np.max(yaw_errs)) < 5.0, (
        "closure poses outside the reference success gate (1 m / 5°)")
    print("OK: online SLAM session closed its loops within the 1 m / 5° gate")


if __name__ == "__main__":
    main()
