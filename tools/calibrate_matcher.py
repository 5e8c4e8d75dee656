"""Matcher calibration in the 12-25 m offset regime on the real KITTI scan.

Round-2 calibration covered SE(2) perturbations to ±12 m; the coarse
stage's alias-free window extends to ~±25 m and place-recognition
candidates live within posDistThr = 20 m — this fills the 12-25 m gap
(round-2 VERDICT weak #8). For each offset radius × heading × yaw, the
perturbed copy of s2s_libtorch/000000.bin is registered against the
original; we record score, peak ratio, and pose-recovery error, for the
default matcher and the fast_match() serving preset.

Negatives (unrelated synthetic worlds) are re-scored at the same settings
so the gate margin is stated against the same config.

``--aligned`` re-runs the calibration through the GROUND-ALIGNED path (the
reference evaluator's headline mode, global_localization.cpp:423-437 +
511-574): every cloud — query and each displaced copy — gets an
independent roll/pitch tilt up to ±3° (the reference's ergodic sweep
range, global_registration.cpp:1267-1295) and is then gravity-aligned by
the device ground estimator (ops/ground.py) before BEV projection, so the
matcher sees what it sees in aligned serving. Negatives gain a synthetic
ground disk so their alignment is well-posed.

Usage: python tools/calibrate_matcher.py [--aligned]
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

from gloc3d_tpu.config import BEVConfig, MatchConfig, PipelineConfig
from gloc3d_tpu.ops.bev import BEVImage, scan_to_bev
from gloc3d_tpu.ops.bev_match import match_bev_topk


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bev_of(pts3, cfg, f):
    pad = np.zeros((cfg.max_points, 3), np.float32)
    n = min(len(pts3), cfg.max_points)
    pad[:n] = pts3[:n]
    mask = np.zeros(cfg.max_points, np.float32)
    mask[:n] = 1.0
    b = f(jnp.asarray(pad), jnp.asarray(mask))
    return (np.asarray(b.image), np.asarray(b.origin_xy))


def synth_world(seed, n_walls=40):
    rng = np.random.RandomState(seed)
    pts = []
    for _ in range(n_walls):
        x0, y0 = rng.uniform(-40, 40, 2)
        ang = rng.uniform(0, np.pi)
        ts = rng.uniform(0, rng.uniform(4, 12), 600)
        pts.append(np.stack([x0 + np.cos(ang) * ts, y0 + np.sin(ang) * ts,
                             rng.uniform(0, 3, 600)], 1))
    return np.concatenate(pts).astype(np.float32)


def tilt_cloud(pts3, roll, pitch):
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]], np.float32)
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]], np.float32)
    return pts3 @ (ry @ rx).T


def make_aligner(n_pad):
    from gloc3d_tpu.config import GroundConfig
    from gloc3d_tpu.core.transforms import transform_points
    from gloc3d_tpu.ops.ground import estimate_ground

    gcfg = GroundConfig()

    @jax.jit
    def _align(pad, mask, key):
        est = estimate_ground(pad, mask, gcfg, key)
        return transform_points(est.transform, pad), est.valid

    def align_cloud(pts3, seed):
        pad = np.zeros((n_pad, 3), np.float32)
        n = min(len(pts3), n_pad)
        pad[:n] = pts3[:n]
        mask = np.zeros(n_pad, np.float32)
        mask[:n] = 1.0
        out, valid = _align(jnp.asarray(pad), jnp.asarray(mask),
                            jax.random.PRNGKey(seed))
        assert bool(valid), f"ground estimate invalid (seed {seed})"
        return np.asarray(out)[:n]

    return align_cloud


def main():
    aligned = "--aligned" in sys.argv
    raw = np.fromfile(
        "/root/reference/s2s_libtorch/000000.bin", np.float32
    ).reshape(-1, 4)[:, :3]
    cfg = BEVConfig(image_size=768, max_points=131072)
    f = jax.jit(lambda p, m: scan_to_bev(p, m, cfg))
    align_cloud = make_aligner(cfg.max_points) if aligned else None
    if aligned:
        # the query gets its own tilt + independent alignment
        raw_q = align_cloud(tilt_cloud(raw, 0.034, -0.047), 0)
        q_img, q_org = bev_of(raw_q, cfg, f)
        log("aligned mode: ±3° tilts + per-cloud device ground alignment")
    else:
        q_img, q_org = bev_of(raw, cfg, f)

    # min_peak_ratio=1e-6 turns the ratio COLUMN on without ever gating
    # (true ratios are ≳ 1; the matcher skips the ratio max entirely at 0.0)
    configs = {
        "default": MatchConfig(image_size=768, min_peak_ratio=1e-6),
        "fast": PipelineConfig().fast_match().match.replace(
            image_size=768, min_peak_ratio=1e-6),
        "fast_fm": PipelineConfig().fast_match(fm=True).match.replace(
            image_size=768, min_peak_ratio=1e-6),
    }

    jits = {}

    def run_match(name, db_img, db_org):
        c = configs[name]
        if name not in jits:
            def impl(qi, qo, db, do, c=c):
                q = BEVImage(image=qi, origin_xy=qo,
                             resolution=jnp.float32(0.2),
                             num_occupied=jnp.sum(qi < 0.5).astype(jnp.int32))
                return match_bev_topk(q, db, do, c, resolution=0.2)
            jits[name] = jax.jit(impl)
        r = jits[name](jnp.asarray(q_img), jnp.asarray(q_org),
                       jnp.asarray(db_img[None]), jnp.asarray(db_org[None]))
        return (float(np.asarray(r.score)[0]), float(np.asarray(r.ratio)[0]),
                np.asarray(r.xy_yaw)[0], bool(np.asarray(r.success)[0]))

    log("radius | heading yaw | cfg | score ratio | pos_err m | yaw_err deg")
    worst = {k: (0.0, 0.0) for k in configs}  # worst pos/yaw err
    scores = {k: [] for k in configs}
    for radius in (12.0, 15.0, 20.0, 24.0):
        for hi, heading in enumerate((0.3, 1.8, 3.6, 5.1)):
            yaw = (hi * 1.7 + radius * 0.37) % (2 * np.pi) - np.pi
            dx = radius * np.cos(heading)
            dy = radius * np.sin(heading)
            c, s = np.cos(yaw), np.sin(yaw)
            moved = raw.copy()
            moved[:, 0] = c * raw[:, 0] - s * raw[:, 1] + dx
            moved[:, 1] = s * raw[:, 0] + c * raw[:, 1] + dy
            if aligned:
                # independent tilt per db copy, removed by its own alignment
                rr = 0.052 * np.sin(radius + heading)       # ≤ ±3°
                rp = 0.052 * np.cos(2.3 * heading - radius)
                moved = align_cloud(tilt_cloud(moved, rr, rp),
                                    int(radius * 10 + hi))
            db_img, db_org = bev_of(moved, cfg, f)
            for name in configs:
                sc, ra, xyy, ok = run_match(name, db_img, db_org)
                pe = float(np.hypot(xyy[0] - dx, xyy[1] - dy))
                ye = float(np.degrees(abs(np.arctan2(
                    np.sin(xyy[2] - yaw), np.cos(xyy[2] - yaw)))))
                scores[name].append(sc)
                worst[name] = (max(worst[name][0], pe),
                               max(worst[name][1], ye))
                log(f"{radius:5.1f} | {heading:4.1f} {yaw:+5.2f} | "
                    f"{name:7s} | {sc:.3f} {ra:.2f} | {pe:6.3f} | {ye:5.2f}"
                    f"{'' if ok else '  ** GATE FAIL'}")

    # negatives at the same settings
    neg_max = {k: 0.0 for k in configs}
    for seed in range(6):
        w = synth_world(100 + seed)
        if aligned:
            # synthetic walls have no floor; give negatives a ground disk so
            # their alignment is well-posed, then tilt + align like the rest
            rng = np.random.RandomState(seed)
            gx = rng.uniform(-18, 18, (8000, 1))
            gy = rng.uniform(-18, 18, (8000, 1))
            gz = rng.normal(0.0, 0.02, (8000, 1)) - 1.73
            w = np.concatenate(
                [w, np.concatenate([gx, gy, gz], 1).astype(np.float32)])
            w = align_cloud(tilt_cloud(w, 0.03 * np.sin(seed), 0.03),
                            500 + seed)
        db_img, db_org = bev_of(w, cfg, f)
        for name in configs:
            sc, ra, _, ok = run_match(name, db_img, db_org)
            neg_max[name] = max(neg_max[name], sc)
            assert not ok, f"negative passed the gate ({name}, seed {seed})"

    for name in configs:
        log(f"[{name}] positives 12-24 m: score {min(scores[name]):.3f}-"
            f"{max(scores[name]):.3f}, worst pos err {worst[name][0]:.3f} m, "
            f"worst yaw err {worst[name][1]:.2f} deg | strongest negative "
            f"{neg_max[name]:.3f} | margin "
            f"{min(scores[name]) / max(neg_max[name], 1e-6):.1f}x over "
            f"negatives, gate 0.22")


if __name__ == "__main__":
    main()
