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

from bench import load_query_scan, marginal_chained  # noqa: E402
from gloc3d_tpu.config import BEVConfig  # noqa: E402
from gloc3d_tpu.ops.occupancy import (  # noqa: E402
    ProbabilityGrid2D, Submap3D,
)
from gloc3d_tpu.ops.scan_match import match_scan, match_scan_fast  # noqa: E402


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


if __name__ == "__main__":
    main()
