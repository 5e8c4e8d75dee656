"""Refinement QUALITY study: pose error before/after refine on the 12-24 m
calibration pairs (tilted and untilted), on the real TPU chip.

The reference treats refinement as an optional post-step of registration:
PCL ICP (global_registration.cpp:1388-1398), NDT (:250-416), and the
ergodic ±3° roll/pitch sweep for bad ground estimates (:1267-1295). The
latency rows live in tools/bench_refine.py; this tool answers the QUALITY
question the serving default depends on:

  scenario A (untilted): matcher → planar ICP polish → 3-D NDT polish;
    pose error and success (err_pos < 1 m && err_yaw < 5°,
    global_localization.cpp:306-311) before/after each refiner.
  scenario B (tilted + ground-aligned): the aligned serving path —
    same refiners after per-cloud ±3° tilt + device ground alignment.
  scenario C (tilted, alignment FAILED): query rendered under a wrong
    gravity (2.5°/−1.8° residual tilt, no alignment) — the regime the
    ergodic sweep exists for; before = plain match, after = best of the
    49-image ergodic sweep.

Pairs: the real KITTI scan vs itself displaced by radius ∈ {12, 15, 20,
24} m × 4 headings with varied yaws (the round-4 calibration grid,
tools/calibrate_matcher.py).

Usage: python tools/study_refine_quality.py [--skip-c]
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

from tools.calibrate_matcher import (  # noqa: E402
    bev_of, make_aligner, tilt_cloud,
)
from gloc3d_tpu.config import BEVConfig, MatchConfig, PipelineConfig  # noqa: E402
from gloc3d_tpu.ops.bev import BEVImage, scan_to_bev  # noqa: E402
from gloc3d_tpu.ops.bev_match import match_bev_topk  # noqa: E402
from gloc3d_tpu.ops.refine import (  # noqa: E402
    build_ndt_grid_3d, ergodic_rp_sweep_match, ndt_refine_3d,
    refine_match_icp,
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def err(xyy, dx, dy, yaw):
    pe = float(np.hypot(xyy[0] - dx, xyy[1] - dy))
    ye = float(np.degrees(abs(np.arctan2(np.sin(xyy[2] - yaw),
                                         np.cos(xyy[2] - yaw)))))
    return pe, ye


def stats(rows, tag):
    pe = np.array([r[0] for r in rows])
    ye = np.array([r[1] for r in rows])
    ok = np.mean((pe < 1.0) & (ye < 5.0))
    log(f"  {tag:28s}: pos err mean {pe.mean():.3f} max {pe.max():.3f} m | "
        f"yaw err mean {ye.mean():.2f} max {ye.max():.2f} deg | "
        f"success {ok*100:.0f}%")
    return pe.mean(), ok


def main():
    raw = np.fromfile(
        "/root/reference/s2s_libtorch/000000.bin", np.float32
    ).reshape(-1, 4)[:, :3]
    cfg = BEVConfig(image_size=768, max_points=131072)
    f = jax.jit(lambda p, m: scan_to_bev(p, m, cfg))
    mcfg = PipelineConfig().fast_match(fm=True).match.replace(image_size=768)
    align_cloud = make_aligner(cfg.max_points)

    def pad_cloud(pts3):
        pad = np.zeros((cfg.max_points, 3), np.float32)
        n = min(len(pts3), cfg.max_points)
        pad[:n] = pts3[:n]
        mask = np.zeros(cfg.max_points, np.float32)
        mask[:n] = 1.0
        return pad, mask

    @jax.jit
    def jmatch(qi, qo, db, do):
        q = BEVImage(image=qi, origin_xy=qo, resolution=jnp.float32(0.2),
                     num_occupied=jnp.sum(qi < 0.5).astype(jnp.int32))
        return match_bev_topk(q, db, do, mcfg, resolution=0.2)

    @jax.jit
    def jicp(qi, qo, di, do, seed):
        return refine_match_icp(qi, qo, di, do, seed, 0.2,
                                budget=4096, iterations=10)

    dims = (100, 100, 12)
    ndt_origin = (-60.0, -60.0, -4.0)

    @jax.jit
    def jndt(db_pad, db_mask, q_pad, q_mask, init6):
        # NDT cells 1.2 m: the map cloud spans ±(50+24) m after displacement
        g = build_ndt_grid_3d(db_pad, db_mask, ndt_origin, dims, 1.2)
        return ndt_refine_3d(g, q_pad, q_mask, init6, iterations=35)

    @jax.jit
    def jergodic(q_pad, q_mask, di, do):
        return ergodic_rp_sweep_match(q_pad, q_mask, di, do, cfg, mcfg)

    pairs = []
    for radius in (12.0, 15.0, 20.0, 24.0):
        for hi, heading in enumerate((0.3, 1.8, 3.6, 5.1)):
            yaw = (hi * 1.7 + radius * 0.37) % (2 * np.pi) - np.pi
            pairs.append((radius, heading, yaw,
                          radius * np.cos(heading), radius * np.sin(heading)))

    def displace(pts3, dx, dy, yaw):
        c, s = np.cos(yaw), np.sin(yaw)
        out = pts3.copy()
        out[:, 0] = c * pts3[:, 0] - s * pts3[:, 1] + dx
        out[:, 1] = s * pts3[:, 0] + c * pts3[:, 1] + dy
        return out

    # ---------------- scenario A + B -----------------------------------
    for scen, tilted in (("A untilted", False), ("B tilted+aligned", True)):
        t0 = time.time()
        if tilted:
            q_cloud = align_cloud(tilt_cloud(raw, 0.034, -0.047), 0)
        else:
            q_cloud = raw
        q_img, q_org = bev_of(q_cloud, cfg, f)
        q_pad, q_mask = pad_cloud(q_cloud)
        before, after_icp, after_ndt = [], [], []
        z_errs = []
        for i, (radius, heading, yaw, dx, dy) in enumerate(pairs):
            moved = displace(q_cloud, dx, dy, yaw)
            if tilted:
                rr = 0.052 * np.sin(radius + heading)
                rp = 0.052 * np.cos(2.3 * heading - radius)
                moved = align_cloud(tilt_cloud(moved, rr, rp),
                                    int(radius * 10) + i)
                # alignment re-zeroes each cloud's own frame; GT stays the
                # planar (dx, dy, yaw) up to the alignment residual
            db_img, db_org = bev_of(moved, cfg, f)
            r = jmatch(jnp.asarray(q_img), jnp.asarray(q_org),
                       jnp.asarray(db_img[None]), jnp.asarray(db_org[None]))
            xyy = np.asarray(r.xy_yaw)[0]
            assert bool(np.asarray(r.success)[0]), (scen, radius, heading)
            before.append(err(xyy, dx, dy, yaw))
            ri = jicp(jnp.asarray(q_img), jnp.asarray(q_org),
                      jnp.asarray(db_img), jnp.asarray(db_org),
                      jnp.asarray(xyy))
            after_icp.append(err(np.asarray(ri.xy_yaw), dx, dy, yaw))
            db_pad, db_mask = pad_cloud(moved)
            init6 = jnp.asarray([xyy[0], xyy[1], 0, 0, 0, xyy[2]],
                                jnp.float32)
            p6, score = jndt(jnp.asarray(db_pad), jnp.asarray(db_mask),
                             jnp.asarray(q_pad), jnp.asarray(q_mask), init6)
            p6 = np.asarray(p6)
            after_ndt.append(err([p6[0], p6[1], p6[5]], dx, dy, yaw))
            z_errs.append(abs(float(p6[2])))
        log(f"scenario {scen} (16 pairs, 12-24 m; {time.time()-t0:.0f}s):")
        stats(before, "matcher (before)")
        stats(after_icp, "+ planar ICP")
        m_ndt, _ = stats(after_ndt, "+ 3-D NDT (from matcher)")
        log(f"  {'':28s}  NDT z-err mean {np.mean(z_errs):.3f} max "
            f"{np.max(z_errs):.3f} m (GT z = 0)")

    # ---------------- scenario C: ergodic rescue -----------------------
    if "--skip-c" in sys.argv:
        return
    t0 = time.time()
    # query rendered under a WRONG gravity: residual tilt that alignment
    # failed to remove
    q_bad = tilt_cloud(raw, 0.0436, -0.0314)  # 2.5 deg, -1.8 deg
    q_img_b, q_org_b = bev_of(q_bad, cfg, f)
    q_pad_b, q_mask_b = pad_cloud(q_bad)
    before, after = [], []
    for i, (radius, heading, yaw, dx, dy) in enumerate(pairs):
        moved = displace(raw, dx, dy, yaw)
        db_img, db_org = bev_of(moved, cfg, f)
        r = jmatch(jnp.asarray(q_img_b), jnp.asarray(q_org_b),
                   jnp.asarray(db_img[None]), jnp.asarray(db_org[None]))
        xyy = np.asarray(r.xy_yaw)[0]
        before.append(err(xyy, dx, dy, yaw) + (bool(np.asarray(r.success)[0]),))
        re, rp_best = jergodic(jnp.asarray(q_pad_b), jnp.asarray(q_mask_b),
                               jnp.asarray(db_img), jnp.asarray(db_org))
        xyy2 = np.asarray(re.xy_yaw)
        after.append(err(xyy2, dx, dy, yaw) + (True,))
    log(f"scenario C: query under 2.5deg/-1.8deg residual tilt, no "
        f"alignment ({time.time()-t0:.0f}s):")
    gate_b = np.mean([b[2] for b in before])
    stats([b[:2] for b in before], f"matcher (gate pass {gate_b*100:.0f}%)")
    stats([a[:2] for a in after], "ergodic 49-image sweep")


if __name__ == "__main__":
    main()
