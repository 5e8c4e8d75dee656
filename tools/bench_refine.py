"""Registration-refinement ops on the real TPU chip.

The reference's global_registration study exercises cloud refiners beyond
the correlative matcher: PCL ICP (global_registration.cpp:441-609), PCL NDT
(:250-416), and the ergodic roll/pitch sweep (:1267-1295). The ops have had
CPU parity tests since round 2 (tests/test_refine.py) but no device-latency
rows; this tool measures them at serving-representative scales with the
paired x1/x4 marginal-chained methodology (bench.py).

Rows:
1. icp_point_to_point — 3-D trimmed ICP, 4096 vs 4096 points, 20 iters
   (one (N, M) matmul NN search per iter: the KD-tree replaced by the MXU).
2. refine_match_icp — planar ICP between virtual clouds of two real-scan
   768² BEVs (budget 4096, 10 iters): the matcher post-refinement step.
3. build_ndt_grid_3d — 122k-point scan → 100×100×12 @1 m NDT map
   (one fused 13-wide scatter).
4. ndt_refine_3d — 35 gradient-ascent iterations of the 122k-point scan
   against that map (jax.grad of the likelihood; no hand Hessian).
5. ergodic_rp_sweep_match — 49 roll/pitch-perturbed BEVs matched against a
   db BEV in one batched program (the bad-ground-estimate fallback).

Usage: python tools/bench_refine.py [--skip-ergodic]
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
from gloc3d_tpu.config import BEVConfig, MatchConfig  # noqa: E402
from gloc3d_tpu.core.transforms import Rigid3, quat_from_rpy  # noqa: E402
from gloc3d_tpu.ops.bev import scan_to_bev  # noqa: E402
from gloc3d_tpu.ops.refine import (  # noqa: E402
    build_ndt_grid_3d, ergodic_rp_sweep_match, icp_point_to_point,
    ndt_refine_3d, refine_match_icp,
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    bcfg = BEVConfig(image_size=768)
    n_pts = bcfg.max_points
    pts, mask, n_real = load_query_scan(n_pts)
    pts3 = pts[0, :, :3]
    m = mask[0]
    rng = np.random.RandomState(0)

    # known offset: src = scan, dst = scan moved by (1.2, -0.8, 0.3) yaw 0.15
    yaw = 0.15
    c, s = np.cos(yaw), np.sin(yaw)
    dst3 = pts3.copy()
    dst3[:, 0] = c * pts3[:, 0] - s * pts3[:, 1] + 1.2
    dst3[:, 1] = s * pts3[:, 0] + c * pts3[:, 1] - 0.8
    dst3[:, 2] += 0.3

    # ---- 1. 3-D ICP at virtual-cloud scale --------------------------------
    sel = rng.choice(n_real, 4096, replace=False)
    src_s = jnp.asarray(pts3[sel])
    dst_s = jnp.asarray(dst3[sel])
    ones = jnp.ones(4096)
    init = Rigid3.identity()

    def icp1(src, dst, prev):
        r = icp_point_to_point(src + prev * 0.0, ones, dst, ones, init,
                               iterations=20, max_corr_dist=2.0)
        return r.transform.translation, r.rmse

    def icp4(src, dst, prev):
        x = prev
        for _ in range(4):
            r = icp_point_to_point(src + x * 0.0, ones, dst, ones, init,
                                   iterations=20, max_corr_dist=2.0)
            x = r.rmse
        return r.transform.translation, x

    t0 = time.time()
    ms, call = marginal_chained(icp1, icp4, src_s, dst_s, n=8)
    r = jax.jit(icp1)(src_s, dst_s, jnp.float32(0.0))
    t = np.asarray(r[0])
    log(f"icp_point_to_point 3-D (4096 vs 4096, 20 iters): {ms:.2f} ms "
        f"device ({call:.2f}/relay call) t=({t[0]:+.2f},{t[1]:+.2f},"
        f"{t[2]:+.2f}) rmse={float(r[1]):.3f} "
        f"[compile+bench {time.time()-t0:.0f}s]")

    # ---- 2. planar virtual-cloud ICP on real-scan BEVs --------------------
    mk_bev = jax.jit(lambda p, mm: scan_to_bev(p, mm, bcfg))
    q_bev = mk_bev(jnp.asarray(pts3), jnp.asarray(m))
    d_bev = mk_bev(jnp.asarray(dst3), jnp.asarray(m))
    init3 = jnp.asarray([1.2, -0.8, yaw], jnp.float32)  # matcher seed

    def pl1(qi, di, prev):
        r = refine_match_icp(qi * (1.0 + prev * 1e-30), q_bev.origin_xy,
                             di, d_bev.origin_xy, init3, bcfg.resolution,
                             budget=4096, iterations=10)
        return r.xy_yaw, r.rmse

    def pl4(qi, di, prev):
        x = prev
        for _ in range(4):
            r = refine_match_icp(qi * (1.0 + x * 1e-30), q_bev.origin_xy,
                                 di, d_bev.origin_xy, init3, bcfg.resolution,
                                 budget=4096, iterations=10)
            x = r.rmse
        return r.xy_yaw, x

    t0 = time.time()
    ms, call = marginal_chained(pl1, pl4, q_bev.image, d_bev.image, n=8)
    r = jax.jit(pl1)(q_bev.image, d_bev.image, jnp.float32(0.0))
    xyz = np.asarray(r[0])
    log(f"refine_match_icp planar (768² BEVs, 4096-pt virtual clouds, 10 "
        f"iters): {ms:.2f} ms device ({call:.2f}/relay call) "
        f"xy_yaw=({xyz[0]:+.2f},{xyz[1]:+.2f},{np.degrees(xyz[2]):+.1f}deg) "
        f"[compile+bench {time.time()-t0:.0f}s]")

    # ---- 3+4. NDT: build map from dst scan, refine src against it ---------
    dims = (100, 100, 12)
    origin = (-50.0, -50.0, -4.0)
    pts_d = jnp.asarray(pts3)
    dst_d = jnp.asarray(dst3)
    m_d = jnp.asarray(m)

    def bld1(p, prev):
        g = build_ndt_grid_3d(p + prev * 0.0, m_d, origin, dims, 1.0)
        return g.mean[0], jnp.sum(g.mean)

    def bld4(p, prev):
        x = prev
        for _ in range(4):
            g = build_ndt_grid_3d(p + x * 0.0, m_d, origin, dims, 1.0)
            x = jnp.sum(g.mean)
        return g.mean[0], x

    t0 = time.time()
    ms, call = marginal_chained(bld1, bld4, dst_d, n=8)
    log(f"build_ndt_grid_3d (122k pts -> 100x100x12 @1m): {ms:.2f} ms "
        f"device ({call:.2f}/relay call) "
        f"[compile+bench {time.time()-t0:.0f}s]")

    grid = jax.jit(
        lambda p: build_ndt_grid_3d(p, m_d, origin, dims, 1.0))(dst_d)
    init6 = jnp.zeros(6)

    def ndt1(p, prev):
        pose, score = ndt_refine_3d(grid, p + prev * 0.0, m_d, init6,
                                    iterations=35)
        return pose, score

    def ndt4(p, prev):
        x = prev
        for _ in range(4):
            pose, score = ndt_refine_3d(grid, p + x * 0.0, m_d, init6,
                                        iterations=35)
            x = score
        return pose, x

    t0 = time.time()
    ms, call = marginal_chained(ndt1, ndt4, pts_d, n=6)
    r = jax.jit(ndt1)(pts_d, jnp.float32(0.0))
    p6 = np.asarray(r[0])
    log(f"ndt_refine_3d (122k pts vs 120k-voxel map, 35 grad iters): "
        f"{ms:.2f} ms device ({call:.2f}/relay call) "
        f"pose=({p6[0]:+.2f},{p6[1]:+.2f},{p6[2]:+.2f}|"
        f"{np.degrees(p6[5]):+.1f}deg yaw) score={float(r[1]):.3f} "
        f"[compile+bench {time.time()-t0:.0f}s]")

    # ---- 5. ergodic roll/pitch sweep --------------------------------------
    if "--skip-ergodic" in sys.argv:
        return
    mcfg = MatchConfig(image_size=768, fine_downsample=2,
                       coarse_rot_downsample=8, fine_top_f=4,
                       fine_argmax_downsample=2, coarse_mode="fm")

    def erg1(p, di, prev):
        res, rp = ergodic_rp_sweep_match(p + prev * 0.0, m_d, di,
                                         d_bev.origin_xy, bcfg, mcfg)
        return res.xy_yaw, res.score + rp[0] * 0.0

    def erg4(p, di, prev):
        x = prev
        for _ in range(4):
            res, rp = ergodic_rp_sweep_match(p + x * 0.0, m_d, di,
                                             d_bev.origin_xy, bcfg, mcfg)
            x = res.score + rp[0] * 0.0
        return res.xy_yaw, x

    t0 = time.time()
    ms, call = marginal_chained(erg1, erg4, pts_d, d_bev.image, n=4)
    r = jax.jit(erg1)(pts_d, d_bev.image, jnp.float32(0.0))
    xyz = np.asarray(r[0])
    log(f"ergodic_rp_sweep_match (49 BEVs 768² + 49 matches, fm preset): "
        f"{ms:.2f} ms device ({call:.2f}/relay call) "
        f"xy_yaw=({xyz[0]:+.2f},{xyz[1]:+.2f},{np.degrees(xyz[2]):+.1f}deg) "
        f"score={float(r[1]):.3f} [compile+bench {time.time()-t0:.0f}s]")


if __name__ == "__main__":
    main()
