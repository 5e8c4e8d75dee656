"""SLAM-submap stack on the real TPU chip (round-3 VERDICT weak #3).

Measures the two submap-path device costs that previously had CPU tests
only:

1. Multi-sweep Submap3D insert (the online SLAM accumulate case,
   submap_3d.cpp:162-177): ms/sweep of ``Submap3D.insert`` at KITTI scale —
   the real 122k-point scan, 0.2 m high-res / 0.5 m low-res dual grid over
   a ±100 m x/y extent (1000×1000×40 + 400×400×16 cells), 10 sweeps at
   SE(2)-offset poses.
2. ``project_to_bev`` of the accumulated high-res grid → 768² probability
   image (submap_3d.cpp:238-326).
3. ``match_scan`` MatchFullSubmap parity (fast_correlative_scan_matcher_2d
   .cpp:248-268): full-360° FFT correlation of a 4096-point virtual scan
   against the submap's 2D probability grid at 512², R ∈ {64, 256}
   rotations, plus the narrow local-Match window (R=32, ±0.15 rad).

All timings use the paired x1/x4 marginal-chained methodology (bench.py):
through the axon relay, block_until_ready does not block and each call
carries ~0.7 ms dispatch, so the marginal cost of an extra iteration
chained inside the jit isolates device compute.

Usage: python tools/bench_submap.py
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

from bench import chained, load_query_scan, marginal_chained  # noqa: E402
from gloc3d_tpu.config import BEVConfig  # noqa: E402
from gloc3d_tpu.ops.occupancy import (  # noqa: E402
    ProbabilityGrid2D, Submap3D,
)
from gloc3d_tpu.ops.scan_match import (  # noqa: E402
    match_scan, match_scan_fast, olson_angular_step, score_at,
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    # KITTI scale: the scan reaches ~80 m; z stays within a few meters of
    # the sensor. 0.2 m xy/z resolution, ±100 m extent, z in [-4, 4].
    cfg = BEVConfig(z_min=-4.0, z_max=4.0)
    n_pts = cfg.max_points
    pts, mask, n_real = load_query_scan(n_pts)
    pts3 = pts[0, :, :3]
    m = mask[0]
    log(f"scan: {n_real} real points, grid high 1000x1000x40 @0.2m, "
        f"low 400x400x16 @0.5m")

    # 10 SE(2)-offset sweep poses (a vehicle moving through the submap)
    sweeps = []
    for i in range(10):
        yaw = 0.06 * i
        dx, dy = 1.5 * i, 0.4 * i
        c, s = np.cos(yaw), np.sin(yaw)
        p = pts3.copy()
        p[:, 0] = c * pts3[:, 0] - s * pts3[:, 1] + dx
        p[:, 1] = s * pts3[:, 0] + c * pts3[:, 1] + dy
        sweeps.append(p)
    origins = np.array([[1.5 * i, 0.4 * i, 0.0] for i in range(10)],
                       np.float32)

    submap0 = Submap3D.create(cfg, extent_xy=100.0)

    def as_submap(hlo, hkn, llo, lkn):
        return Submap3D(submap0.high._replace(log_odds=hlo, known=hkn),
                        submap0.low._replace(log_odds=llo, known=lkn), 1)

    def insert1(hlo, hkn, llo, lkn, p, mk, org, prev):
        sm = as_submap(hlo, hkn, llo, lkn)
        sm = sm.insert(p + prev * 0.0, mk, origin=org, cfg=cfg)
        x = sm.high.log_odds[500, 500, 20]
        return x, x

    def insert4(hlo, hkn, llo, lkn, p, mk, org, prev):
        sm = as_submap(hlo, hkn, llo, lkn)
        x = prev
        for _ in range(4):
            sm = sm.insert(p + x * 0.0, mk, origin=org, cfg=cfg)
            x = sm.high.log_odds[500, 500, 20]
        return x, x

    match_only = "--match-only" in sys.argv
    p_d = jnp.asarray(sweeps[0])
    m_d = jnp.asarray(m)
    o_d = jnp.asarray(origins[0])
    if not match_only:
        t0 = time.time()
        ins_ms, ins_call = marginal_chained(
            insert1, insert4, submap0.high.log_odds, submap0.high.known,
            submap0.low.log_odds, submap0.low.known, p_d, m_d, o_d, n=10)
        log(f"submap insert (dual-grid, 122k-pt sweep): {ins_ms:.2f} ms/sweep "
            f"device ({ins_call:.2f}/relay call; compile+bench "
            f"{time.time()-t0:.0f}s)")

    # accumulate the real 10-sweep submap for projection/matching
    @jax.jit
    def build(high, low, ps, mks, orgs):
        sm = Submap3D(high, low, 0)

        def body(sm, x):
            p, mk, org = x
            return sm.insert(p, mk, origin=org, cfg=cfg), 0.0

        sm, _ = jax.lax.scan(
            body, sm, (ps, mks, orgs))
        return sm.high, sm.low

    ps = jnp.asarray(np.stack(sweeps))
    mks = jnp.asarray(np.repeat(m[None], 10, 0))
    orgs = jnp.asarray(origins)
    high, low = build(submap0.high, submap0.low, ps, mks, orgs)
    hk = int(jnp.sum(high.known))
    log(f"10-sweep submap accumulated: {hk} known high-res cells")

    from gloc3d_tpu.ops.occupancy import project_to_bev

    def sm_project(g):
        return project_to_bev(g, cfg)

    def proj1(lo, kn, prev):
        g = high._replace(log_odds=lo + prev * 0.0, known=kn)
        img, org = sm_project(g)
        return img[0, 0], jnp.sum(img)

    def proj4(lo, kn, prev):
        x = prev
        for _ in range(4):
            g = high._replace(log_odds=lo + x * 0.0, known=kn)
            img, org = sm_project(g)
            x = jnp.sum(img)
        return img[0, 0], x

    if not match_only:
        t0 = time.time()
        prj_ms, prj_call = marginal_chained(
            proj1, proj4, high.log_odds, high.known, n=10)
        log(f"project_to_bev (40M-cell grid -> 768^2): {prj_ms:.2f} ms device "
            f"({prj_call:.2f}/relay call; compile+bench {time.time()-t0:.0f}s)")

    # ---- MatchFullSubmap: FFT correlation over the submap's 2D grid ----
    img, org = jax.jit(sm_project)(high)
    # occupancy probability grid at 512 (center crop of the 768 image —
    # the matcher's alias-free window is what matters, not the pad ring)
    img512 = np.asarray(img)[128:640, 128:640]
    org512 = np.asarray(org) + 128 * cfg.resolution
    grid = ProbabilityGrid2D.from_bev_image(
        jnp.asarray(img512),  # free=1/occupied=0, the BEV convention
        jnp.asarray(org512, dtype=jnp.float32), cfg.resolution)

    # virtual scan: the occupied pixels of sweep-0's own BEV (the
    # grid→virtual-cloud trick, fast_correlative_scan_matcher_2d.cpp:78-95)
    img0, org0 = jax.jit(
        lambda p, mk: project_to_bev(
            Submap3D.create(cfg, extent_xy=100.0).insert(
                p, mk, cfg=cfg).high, cfg))(p_d, m_d)
    occ = np.argwhere(np.asarray(img0) < 0.5)
    rng = np.random.RandomState(0)
    sel = rng.choice(len(occ), 4096, replace=len(occ) < 4096)
    vpts = (occ[sel][:, ::-1] * cfg.resolution
            + np.asarray(org0)[None, :]).astype(np.float32)
    vmask = np.ones(4096, np.float32)
    log(f"virtual scan: {len(occ)} occupied px -> 4096 sampled")

    vp_d, vm_d = jnp.asarray(vpts), jnp.asarray(vmask)

    if "--olson" in sys.argv:
        olson_study(cfg, grid, img, org, high, sweeps, m)
        return

    fast_only = "--fast-only" in sys.argv
    for tag, nrot, hw in (("MatchFullSubmap R=64", 64, np.pi),
                          ("MatchFullSubmap R=256", 256, np.pi),
                          ("local Match R=32 ±0.15rad", 32, 0.15)):
        def m1(lo, kn, p, mk, prev, nrot=nrot, hw=hw):
            g = grid._replace(log_odds=lo, known=kn)
            r = match_scan(g, p + prev * 0.0, mk, num_rotations=nrot,
                           angular_halfwidth=hw)
            return r.pose, r.score

        def m4(lo, kn, p, mk, prev, nrot=nrot, hw=hw):
            x = prev
            for _ in range(4):
                g = grid._replace(log_odds=lo, known=kn)
                r = match_scan(g, p + x * 0.0, mk, num_rotations=nrot,
                               angular_halfwidth=hw)
                x = r.score
            return r.pose, x

        if not fast_only:
            t0 = time.time()
            ms, call = marginal_chained(
                m1, m4, grid.log_odds, grid.known, vp_d, vm_d, n=8)
            r = jax.jit(m1)(grid.log_odds, grid.known, vp_d, vm_d,
                            jnp.float32(0.0))
            pose = np.asarray(r[0])
            log(f"match_scan {tag} (512^2 grid): {ms:.2f} ms device "
                f"({call:.2f}/relay call) pose=({pose[0]:+.2f}, "
                f"{pose[1]:+.2f}, {np.degrees(pose[2]):+.1f}deg) "
                f"score={float(r[1]):.3f} "
                f"[compile+bench {time.time()-t0:.0f}s]")

        # coarse-to-fine variant: same optimum (certified), ~f² cheaper FFT
        def f1(lo, kn, p, mk, prev, nrot=nrot, hw=hw):
            g = grid._replace(log_odds=lo, known=kn)
            r, cert = match_scan_fast(g, p + prev * 0.0, mk,
                                      num_rotations=nrot,
                                      angular_halfwidth=hw)
            out = jnp.concatenate([r.pose, cert[None].astype(jnp.float32)])
            return out, r.score

        def f4(lo, kn, p, mk, prev, nrot=nrot, hw=hw):
            x = prev
            for _ in range(4):
                g = grid._replace(log_odds=lo, known=kn)
                r, cert = match_scan_fast(g, p + x * 0.0, mk,
                                          num_rotations=nrot,
                                          angular_halfwidth=hw)
                x = r.score
                out = jnp.concatenate(
                    [r.pose, cert[None].astype(jnp.float32)])
            return out, x

        t0 = time.time()
        fms, fcall = marginal_chained(
            f1, f4, grid.log_odds, grid.known, vp_d, vm_d, n=8)
        o4, fs = jax.jit(f1)(grid.log_odds, grid.known, vp_d, vm_d,
                             jnp.float32(0.0))
        fp, fc = np.asarray(o4)[:3], bool(np.asarray(o4)[3])
        log(f"match_scan_fast {tag} (512^2 grid, f=4 K=128): {fms:.2f} ms "
            f"device ({fcall:.2f}/relay call) pose=({fp[0]:+.2f}, "
            f"{fp[1]:+.2f}, {np.degrees(fp[2]):+.1f}deg) "
            f"score={float(fs):.3f} certified={fc} "
            f"[compile+bench {time.time()-t0:.0f}s]")


def olson_study(cfg, grid512, img768, org768, high, sweeps, mask):
    """MatchFullSubmap at the reference's own angular guarantee.

    The reference derives its full-submap rotation count from the Olson
    sub-cell bound (fast_correlative_scan_matcher_2d.cpp:248-268 via
    correlative_scan_matcher_2d.cpp:47-51): δθ = acos(1 − res²/(2·d²)) at
    the scan's max range — ~0.23° → ~1570 rotations for 360° at 0.2 m and
    ~50 m. Rows produced:

    1. match_scan_fast at R_olson on the 512² accumulated-submap grid
       (f=4, K=128): device ms + certificate.
    2. chunked exhaustive match_scan at the same R (safe FFT chunk):
       device ms + pose/score equality vs fast (same-optimum check at the
       reference's own guarantee).
    3. certificate rate over 20 realistic queries (10 sweeps × 2 noise
       levels, random SE(2) offsets; the single-sweep virtual scan vs the
       10-sweep map is the imperfect-match regime of real relocalization),
       with the 'full' fallback verified exact wherever the certificate
       fails.
    4. the same fast-vs-exhaustive pair at the 768² serving size.
    """
    from gloc3d_tpu.ops.occupancy import project_to_bev

    res = cfg.resolution
    rng = np.random.RandomState(0)

    # per-sweep virtual scans from each sweep's OWN single-sweep BEV
    proj1 = jax.jit(lambda p, mk: project_to_bev(
        Submap3D.create(cfg, extent_xy=100.0).insert(p, mk, cfg=cfg).high,
        cfg))
    vscans = []
    for i, sw in enumerate(sweeps):
        img_i, org_i = proj1(jnp.asarray(sw), jnp.asarray(mask))
        occ = np.argwhere(np.asarray(img_i) < 0.5)
        sel = np.random.RandomState(i).choice(
            len(occ), 4096, replace=len(occ) < 4096)
        vscans.append((occ[sel][:, ::-1] * res
                       + np.asarray(org_i)[None, :]).astype(np.float32))
    vmask = jnp.ones(4096)

    def offset_query(v, T, alpha, sigma, seed):
        """q = R_α⁻¹(v − T): matching q against the map must recover pose
        (T, α); σ is per-point noise (odometry/rolling-shutter realism)."""
        c, s = np.cos(alpha), np.sin(alpha)
        q = np.stack([c * (v[:, 0] - T[0]) + s * (v[:, 1] - T[1]),
                      -s * (v[:, 0] - T[0]) + c * (v[:, 1] - T[1])], 1)
        if sigma > 0:
            q = q + np.random.RandomState(seed).normal(0, sigma, q.shape)
        return q.astype(np.float32)

    r_max = float(np.max(np.linalg.norm(vscans[0], axis=1)))
    step = olson_angular_step(res, r_max)
    n_rot = int(np.ceil(2 * np.pi / step))
    log(f"Olson bound: res {res} m, r_max {r_max:.1f} m -> dtheta "
        f"{np.degrees(step):.3f} deg, R = {n_rot} rotations for 360 deg")

    gt = (np.array([4.0, -2.0]), 0.35)
    q0 = offset_query(vscans[0], *gt, 0.10, 100)
    q0_d = jnp.asarray(q0)
    K = max(128, min(n_rot, 2048))  # the match_full_submap auto-K policy
    log(f"fast-matcher expansion budget K = {K}")

    # ---- 1. fast at R_olson, 512² ----------------------------------------
    def f1(lo, kn, p, mk, prev):
        g = grid512._replace(log_odds=lo, known=kn)
        r, cert = match_scan_fast(g, p + prev * 0.0, mk,
                                  num_rotations=n_rot, num_candidates=K)
        out = jnp.concatenate([r.pose, cert[None].astype(jnp.float32),
                               r.score[None]])
        return out, r.score

    t0 = time.time()
    fms = chained(f1)(grid512.log_odds, grid512.known, q0_d, vmask,
                      n=8, reps=3)
    o = np.asarray(jax.jit(f1)(grid512.log_odds, grid512.known, q0_d,
                               vmask, jnp.float32(0.0))[0])
    fpose, fcert, fscore = o[:3], bool(o[3]), float(o[4])
    log(f"match_scan_fast R={n_rot} (512^2, f=4 K={K}): {fms:.2f} ms/call "
        f"pose=({fpose[0]:+.2f},{fpose[1]:+.2f},"
        f"{np.degrees(fpose[2]):+.2f}deg) score={fscore:.3f} "
        f"certified={fcert} [compile+bench {time.time()-t0:.0f}s]")

    # ---- 2. chunked exhaustive at R_olson, 512² --------------------------
    def e1(lo, kn, p, mk, prev):
        g = grid512._replace(log_odds=lo, known=kn)
        r = match_scan(g, p + prev * 0.0, mk, num_rotations=n_rot)
        return jnp.concatenate([r.pose, r.score[None]]), r.score

    t0 = time.time()
    ems = chained(e1)(grid512.log_odds, grid512.known, q0_d, vmask,
                      n=3, reps=2)
    eo = np.asarray(jax.jit(e1)(grid512.log_odds, grid512.known, q0_d,
                                vmask, jnp.float32(0.0))[0])
    epose, escore = eo[:3], float(eo[3])
    log(f"match_scan exhaustive R={n_rot} (512^2, safe chunk): {ems:.2f} "
        f"ms/call pose=({epose[0]:+.2f},{epose[1]:+.2f},"
        f"{np.degrees(epose[2]):+.2f}deg) score={escore:.3f} "
        f"[compile+bench {time.time()-t0:.0f}s]  "
        f"speedup fast/exhaustive = {ems/fms:.1f}x")
    same = (abs(fscore - escore) < 1e-3
            and np.allclose(fpose, epose, atol=1e-4))
    gt_ok = (abs(fpose[0] - gt[0][0]) < 2 * res
             and abs(fpose[1] - gt[0][1]) < 2 * res
             and abs(fpose[2] - gt[1]) < 2 * step)
    log(f"  same optimum: {same} (d_score={abs(fscore-escore):.2e}); "
        f"GT recovered within 2 cells / 2 dtheta: {gt_ok}")

    # ---- 3. certificate rate over 20 realistic queries -------------------
    jf = jax.jit(f1)
    je = jax.jit(e1)
    jscore = jax.jit(lambda lo, kn, p, mk, pose: score_at(
        grid512._replace(log_odds=lo, known=kn), p, mk, pose))
    n_cert = n_fb_exact = n_fb = 0
    worst = 0.0
    for i, sigma in [(i, s) for s in (0.05, 0.15) for i in range(10)]:
        r2 = np.random.RandomState(1000 + i + int(sigma * 100))
        T = r2.uniform(-10, 10, 2)
        alpha = r2.uniform(-np.pi, np.pi)
        q = jnp.asarray(offset_query(vscans[i], T, alpha, sigma,
                                     2000 + i))
        o = np.asarray(jf(grid512.log_odds, grid512.known, q, vmask,
                          jnp.float32(0.0))[0])
        cert = bool(o[3])
        if cert:
            n_cert += 1
            continue
        # fallback policy: exhaustive at the same R must agree or beat
        n_fb += 1
        eo = np.asarray(je(grid512.log_odds, grid512.known, q, vmask,
                           jnp.float32(0.0))[0])
        d = abs(float(o[4]) - float(eo[3]))
        worst = max(worst, d)
        if d < 1e-3:
            n_fb_exact += 1
    log(f"certificate rate on realistic queries (10-sweep map, "
        f"single-sweep scans, sigma 0.05/0.15 m, R={n_rot}): "
        f"{n_cert}/20 certified; {n_fb} fallbacks, fast score matched "
        f"exhaustive in {n_fb_exact}/{n_fb} "
        f"(max |d_score| {worst:.2e} over fallbacks)")

    # ---- 4. 768² serving size --------------------------------------------
    grid768 = ProbabilityGrid2D.from_bev_image(
        img768, jnp.asarray(np.asarray(org768), jnp.float32), res)

    def f768(lo, kn, p, mk, prev):
        g = grid768._replace(log_odds=lo, known=kn)
        r, cert = match_scan_fast(g, p + prev * 0.0, mk,
                                  num_rotations=n_rot, num_candidates=K)
        out = jnp.concatenate([r.pose, cert[None].astype(jnp.float32),
                               r.score[None]])
        return out, r.score

    def e768(lo, kn, p, mk, prev):
        g = grid768._replace(log_odds=lo, known=kn)
        r = match_scan(g, p + prev * 0.0, mk, num_rotations=n_rot)
        return jnp.concatenate([r.pose, r.score[None]]), r.score

    t0 = time.time()
    fms8 = chained(f768)(grid768.log_odds, grid768.known, q0_d, vmask,
                         n=6, reps=3)
    o8 = np.asarray(jax.jit(f768)(grid768.log_odds, grid768.known, q0_d,
                                  vmask, jnp.float32(0.0))[0])
    log(f"match_scan_fast R={n_rot} (768^2 serving size): {fms8:.2f} "
        f"ms/call pose=({o8[0]:+.2f},{o8[1]:+.2f},"
        f"{np.degrees(o8[2]):+.2f}deg) score={float(o8[4]):.3f} "
        f"certified={bool(o8[3])} [compile+bench {time.time()-t0:.0f}s]")
    t0 = time.time()
    ems8 = chained(e768)(grid768.log_odds, grid768.known, q0_d, vmask,
                         n=2, reps=2)
    eo8 = np.asarray(jax.jit(e768)(grid768.log_odds, grid768.known, q0_d,
                                   vmask, jnp.float32(0.0))[0])
    log(f"match_scan exhaustive R={n_rot} (768^2, safe chunk): {ems8:.2f} "
        f"ms/call pose=({eo8[0]:+.2f},{eo8[1]:+.2f},"
        f"{np.degrees(eo8[2]):+.2f}deg) score={float(eo8[3]):.3f} "
        f"[compile+bench {time.time()-t0:.0f}s]  d_score="
        f"{abs(float(o8[4])-float(eo8[3])):.2e} "
        f"speedup {ems8/fms8:.1f}x")


if __name__ == "__main__":
    main()
