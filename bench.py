"""Benchmark: end-to-end query detection latency on one TPU chip.

Measures the reference's "query detect latency" quantity
(global_localization.cpp:500-508: feature extraction + top-20 database
search) for the flagship s2s path: raw padded scan → PointPillar+NetVLAD-FC
descriptor → exact L2 top-20 over a 10k-scan descriptor bank.

The headline number is the median on-device latency of ONE query through the
production serving path (host-precomputed voxel stats: the native loader
computes per-pillar counts/centroids during IO, the device runs gather +
PointNet + one scatter + CNN + VLAD + top-k). The host stats pass costs
~1 ms/scan single-threaded; in steady-state serving it overlaps with the
previous query's device work, and for a single cold query it adds to the
critical path — both stated explicitly below, no throughput number is
dressed up as a latency.

Prints ONE JSON line:
  {"metric": "query_detect_latency_ms", "value": <median ms>, "unit": "ms",
   "vs_baseline": <2.0 / value>}
vs_baseline is measured against the north-star target of 2 ms median
(BASELINE.md). Component timings and an MFU estimate go to stderr.
"""

import json
import os
import sys
import time

import jax

# persistent compilation cache: the ~6 model-scale jits dominate bench wall
# time (~100 s each through the axon remote-compile tunnel on first run);
# cached reruns finish in ~1 min.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GLOC3D_COMPILE_CACHE", "/tmp/gloc3d_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

# v5e (TPU v5 lite) peak bf16 matmul throughput, used for the MFU estimate.
V5E_PEAK_BF16_FLOPS = 197e12


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def chained(fn):
    """Latency timer for the axon relay: block_until_ready does not block
    and per-call fetches cost ~2 s, so each call's input is chained on the
    previous output INSIDE the jit and one final fetch closes the pipeline."""
    jfn = jax.jit(fn)

    def run(*args, n=50, reps=3):
        prev = jnp.float32(0.0)
        out, prev = jfn(*args, prev)
        _ = np.asarray(out)  # compile + warm
        best = float("inf")
        for _ in range(reps):  # min over repeats: relay jitter is one-sided
            t0 = time.time()
            for _ in range(n):
                out, prev = jfn(*args, prev)
            _ = np.asarray(out)
            best = min(best, (time.time() - t0) / n * 1000.0)
        return best

    return run


def marginal_chained(fn1, fn4, *args, n=50, reps=6):
    """Device-compute latency via the PAIRED x1/x4 marginal: each rep times
    the 1-chained and 4-chained programs back-to-back; the per-rep
    difference /3 is reported as the MEDIAN over reps. Min-ing the two
    measurements independently (the old way) inflates the difference when
    relay/host load drifts between them (observed 1.6 vs 2.5 ms on the same
    program under a concurrent CPU-bound suite); min-ing the paired
    differences deflates it by picking the most favorable drift. The median
    of interleaved pairs is drift-robust in both directions. Returns
    (marginal_ms, call_ms); call_ms stays min-over-reps (relay jitter on a
    single queue drain is one-sided)."""
    j1, j4 = jax.jit(fn1), jax.jit(fn4)
    for j in (j1, j4):  # compile + warm both before any timing
        out, _ = j(*args, jnp.float32(0.0))
        _ = np.asarray(out)
    diffs, best_call = [], float("inf")
    for _ in range(reps):
        t0 = time.time()
        prev = jnp.float32(0.0)
        for _ in range(n):
            out, prev = j1(*args, prev)
        _ = np.asarray(out)
        t1 = (time.time() - t0) / n * 1000.0
        t0 = time.time()
        prev = jnp.float32(0.0)
        for _ in range(n):
            out, prev = j4(*args, prev)
        _ = np.asarray(out)
        t4 = (time.time() - t0) / n * 1000.0
        diffs.append((t4 - t1) / 3.0)
        best_call = min(best_call, t1)
    return float(np.median(diffs)), best_call


def load_query_scan(n_pts):
    """The real KITTI scan shipped with the reference benchmark, padded to
    the reference budget (s2s_libtorch/000000.bin); synthetic fallback."""
    pts = np.zeros((1, n_pts, 4), np.float32)
    try:
        raw = np.fromfile(
            "/root/reference/s2s_libtorch/000000.bin", np.float32
        ).reshape(-1, 4)
        n_real = min(len(raw), n_pts)
        pts[0, :n_real] = raw[:n_real]
    except (FileNotFoundError, OSError):
        rng = np.random.RandomState(0)
        n_real = 100000
        pts[0, :n_real, 0] = rng.uniform(-35, 35, n_real)
        pts[0, :n_real, 1] = rng.uniform(-20, 20, n_real)
        pts[0, :n_real, 2] = rng.uniform(-2, 3, n_real)
        pts[0, :n_real, 3] = rng.uniform(0, 1, n_real)
    mask = np.zeros((1, n_pts), np.float32)
    mask[0, :n_real] = 1.0
    return pts, mask, n_real


def main(full: bool = False):
    from gloc3d_tpu.config import PipelineConfig
    from gloc3d_tpu.data.native import (
        compute_voxel_stats_host, compute_voxel_stats_host_sorted,
    )
    from gloc3d_tpu.models import build_model
    from gloc3d_tpu.ops.topk import l2_topk

    cfg = PipelineConfig.s2s()
    n_pts = cfg.voxel.max_points  # 122480, the reference KITTI pad size
    model = build_model(cfg.model, cfg.voxel)
    vc = cfg.voxel

    pts, mask, n_real = load_query_scan(n_pts)
    counts = np.asarray(mask.sum(axis=1), np.int64)

    # host stats pass (the loader-side half of the production path)
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        h_p, h_v, h_i, h_c, h_g = compute_voxel_stats_host(
            pts, counts, vc.xbound, vc.ybound, vc.zbound,
            crop=True, num_threads=1,
        )
    host_ms = (time.time() - t0) / reps * 1000.0
    log(f"host voxel-stats pass: {host_ms:.2f} ms/scan (1 thread; "
        f"overlaps device work in steady-state serving)")

    # host stats + counting sort + per-point table (native single pass):
    # the production path
    t0 = time.time()
    for _ in range(reps):
        s_p, s_v, s_i, s_c, s_g, s_s, s_pp = compute_voxel_stats_host_sorted(
            pts, counts, vc.xbound, vc.ybound, vc.zbound,
            crop=True, num_threads=1, per_point=True,
        )
    host_sorted_ms = (time.time() - t0) / reps * 1000.0
    log(f"host stats+sort+pp pass: {host_sorted_ms:.2f} ms/scan (1 thread; "
        f"overlaps device work in steady-state serving)")

    pts_d, mask_d = jnp.asarray(pts), jnp.asarray(mask)
    hp_d, hv_d = jnp.asarray(h_p), jnp.asarray(h_v)
    vs_d = (jnp.asarray(h_i), jnp.asarray(h_c), jnp.asarray(h_g))
    sp_d, sv_d = jnp.asarray(s_p), jnp.asarray(s_v)
    vs4_d = (jnp.asarray(s_i), jnp.asarray(s_c), jnp.asarray(s_g),
             jnp.asarray(s_s))
    vs5_d = vs4_d + (jnp.asarray(s_pp),)

    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pts_d, mask_d)
    log(f"init: {time.time()-t0:.1f}s")

    rng = np.random.RandomState(0)
    bank = jnp.asarray(rng.randn(10000, cfg.index.dim).astype(np.float32))

    # --- production path: host-precomputed voxel stats ---------------------
    def detect_host(params, points, mask, vs, bank, prev):
        desc = model.apply(params, points + prev * 0.0, mask, voxel_stats=vs)
        d2, idx = l2_topk(desc, bank, 20)
        return d2, d2[0, 0]

    # --- production path: sorted host stats + Pallas segment-sum + BN fold
    from gloc3d_tpu.models.fold import fold_batch_norm

    fmodel = build_model(cfg.model.replace(fold_bn=True), cfg.voxel)
    fparams = {"params": fold_batch_norm(params["params"],
                                         params["batch_stats"])}

    def detect_folded(params, points, mask, vs, bank, prev):
        desc = fmodel.apply(params, points + prev * 0.0, mask,
                            voxel_stats=vs)
        d2, idx = l2_topk(desc, bank, 20)
        return d2, d2[0, 0]

    # device-compute latency: each relay call carries ~0.7 ms of dispatch
    # overhead that local PJRT does not have (~50 us). The marginal cost of
    # an extra detect chained INSIDE the jit isolates the device time.
    def detect_x4(params, points, mask, vs, bank, prev):
        x = prev
        for _ in range(4):
            desc = fmodel.apply(params, points + x * 0.0, mask,
                                voxel_stats=vs)
            d2, idx = l2_topk(desc, bank, 20)
            x = d2[0, 0]
        return d2, x

    med, med_call = marginal_chained(
        detect_folded, detect_x4, fparams, sp_d, sv_d, vs5_d, bank)
    log(f"detect latency, sorted+Pallas+foldedBN+pp: {med_call:.2f} ms/query "
        f"(per relay call)")
    log(f"device-compute latency (paired marginal in-jit): {med:.2f} "
        f"ms/query")

    if full:  # comparison paths/stages cost one model-scale compile each
        med_g = chained(detect_folded)(fparams, sp_d, sv_d, vs4_d, bank)
        log(f"detect latency, foldedBN + device gather: {med_g:.2f} ms/query")

        # B=8 throughput through the same production program (vmapped batch)
        sp8 = jnp.repeat(sp_d, 8, axis=0)
        sv8 = jnp.repeat(sv_d, 8, axis=0)
        vs58 = tuple(jnp.repeat(a, 8, axis=0) for a in vs5_d)
        b8 = chained(detect_folded)(fparams, sp8, sv8, vs58, bank, n=20)
        log(f"detect B=8 (pp path): {b8:.2f} ms/batch = {b8/8:.2f} ms/query "
            f"per relay call")

        med_s = chained(detect_host)(params, sp_d, sv_d, vs4_d, bank)
        log(f"detect latency, sorted+Pallas path:      {med_s:.2f} ms/query")

        med_h = chained(detect_host)(params, hp_d, hv_d, vs_d, bank)
        log(f"detect latency, hoststats path (device): {med_h:.2f} ms/query")

        def detect_default(params, points, mask, bank, prev):
            desc = model.apply(params, points + prev * 0.0, mask)
            d2, idx = l2_topk(desc, bank, 20)
            return d2, d2[0, 0]

        med_dev = chained(detect_default)(params, pts_d, mask_d, bank)
        log(f"detect latency, all-device path:         {med_dev:.2f} ms/query")

        def stage_encode(params, points, mask, vs, prev):
            f = model.apply(params, points + prev * 0.0, mask, voxel_stats=vs,
                            method=model.encode)
            s = f.sum()
            return s, s * 0.0

        enc_ms = chained(stage_encode)(params, hp_d, hv_d, vs_d)
        log(f"  stage encoder (voxelize+PointNet+scatter+CNN): {enc_ms:.2f} ms")

        fm = jnp.asarray(rng.randn(1, 80, 140, 128).astype(np.float32))

        def stage_pool(params, fm, prev):
            pool = model.bind(params).pool
            d = pool(fm + prev * 0.0)
            s = d.sum()
            return s, s * 0.0

        pool_ms = chained(stage_pool)(params, fm)
        log(f"  stage NetVLAD pool:                            {pool_ms:.2f} ms")

    q = jnp.asarray(rng.randn(1, cfg.index.dim).astype(np.float32))

    def stage_topk(q, bank, prev):
        d2, idx = l2_topk(q + prev * 0.0, bank, 20)
        return d2, d2[0, 0]

    topk_ms = chained(stage_topk)(q, bank, n=200)
    log(f"  stage exact top-20 search (10k bank):          {topk_ms:.2f} ms")

    # --- i2i serving path (the reference's primary published config:
    # VGG16+NetVLAD-FC on 768² BEV probability images, main.py:531-541;
    # latency counterpart of i2i_feature_extract.cpp's 1000-iter loop).
    # Guarded: the headline s2s metric must print even if this fails. ----
    def run_i2i():
        i2i_cfg = PipelineConfig.i2i()
        i2i_model = build_model(i2i_cfg.model, i2i_cfg.voxel)
        img1 = jnp.asarray(
            (rng.rand(1, 768, 768, 3) > 0.01).astype(np.float32))
        i2i_params = jax.jit(i2i_model.init)(jax.random.PRNGKey(1), img1)
        i2i_bank = jnp.asarray(
            rng.randn(10000, i2i_cfg.index.dim).astype(np.float32))

        def i2i_detect(params, img, bank, prev):
            desc = i2i_model.apply(params, img + prev * 0.0)
            d2, idx = l2_topk(desc, bank, 20)
            return d2, d2[0, 0]

        def i2i_detect_x4(params, img, bank, prev):
            x = prev
            for _ in range(4):
                desc = i2i_model.apply(params, img + x * 0.0)
                d2, idx = l2_topk(desc, bank, 20)
                x = d2[0, 0]
            return d2, x

        ms, i2i_call = marginal_chained(
            i2i_detect, i2i_detect_x4, i2i_params, img1, i2i_bank, n=15)
        img8 = jnp.repeat(img1, 8, axis=0)
        b8 = chained(i2i_detect)(i2i_params, img8, i2i_bank, n=10)
        log(f"i2i detect (VGG16+VLAD-FC 768² + top-20): {ms:.2f} ms/query "
            f"device (marginal in-jit; {i2i_call:.2f}/relay call), B=8 "
            f"{b8:.2f} ms/batch = {b8/8:.2f} ms/query")
        # roofline statement for the FLOP-bound path (the VGG stack is where
        # the MXU earns its keep; the s2s MFU line below is bandwidth-bound
        # and not comparable). cost_analysis reuses the cached executable.
        try:
            ca = jax.jit(i2i_detect).lower(
                i2i_params, img1, i2i_bank, jnp.float32(0.0)
            ).compile().cost_analysis()
            fl = float(ca["flops"])
            log(f"i2i roofline: {fl/1e9:.0f} GFLOP forward at {ms:.2f} ms = "
                f"{fl/(ms/1e3)/V5E_PEAK_BF16_FLOPS*100:.0f}% of v5e bf16 "
                f"peak (B=1; block 1 runs at 768² with 3→64→64 ch — "
                f"width-packed pairs fill the 128-lane MXU there, deeper "
                f"blocks are already lane-full)")
        except Exception as e:
            log(f"i2i cost analysis unavailable: {e!r}")
        return ms, b8

    i2i_ms = i2i_b8 = float("nan")
    try:
        i2i_ms, i2i_b8 = run_i2i()
    except Exception as e:  # defensive: driver runs must print the JSON line
        log(f"i2i bench section failed: {e!r}")

    # --- staged registration (the other half of a located query: the
    # reference evaluator's "2D match latency", global_localization.cpp:
    # 521-524). K=1 first-candidate registration at 768² with the serving
    # matcher preset (fast_match(fm=True)); marginal in-jit chaining. ----
    def run_match():
        from gloc3d_tpu.config import BEVConfig, MatchConfig
        from gloc3d_tpu.ops.bev import BEVImage, scan_to_bev
        from gloc3d_tpu.ops.bev_match import match_bev_topk

        bcfg = BEVConfig(image_size=768, max_points=n_pts)
        mcfg = MatchConfig(image_size=768, fine_downsample=2,
                           coarse_rot_downsample=8, fine_top_f=4,
                           fine_argmax_downsample=2, coarse_mode="fm")
        mk_bev = jax.jit(lambda p, m: scan_to_bev(p, m, bcfg))
        q_bev = mk_bev(pts_d[0, :, :3], mask_d[0])
        # db candidate: the same scan yawed 0.35 rad + 4 m offset
        c, s = np.cos(0.35), np.sin(0.35)
        rot = pts[0, :, :3].copy()
        rot[:, :2] = rot[:, :2] @ np.array([[c, s], [-s, c]], np.float32)
        rot[:, :2] += np.float32([4.0, -2.0])
        db_bev = mk_bev(jnp.asarray(rot), mask_d[0])
        db_img = db_bev.image[None]
        db_org = db_bev.origin_xy[None]
        res_m = float(q_bev.resolution)

        def match1(qi, qo, db, do, prev):
            query = BEVImage(
                image=qi * (1.0 + prev * 1e-30), origin_xy=qo,
                resolution=jnp.float32(res_m),
                num_occupied=jnp.sum(qi < 0.5).astype(jnp.int32))
            r = match_bev_topk(query, db, do, mcfg, resolution=res_m)
            return r.score, r.score[0]

        def match_x4(qi, qo, db, do, prev):
            x = prev
            for _ in range(4):
                sc, x = match1(qi, qo, db, do, x)
            return sc, x

        sc = np.asarray(jax.jit(match1)(
            q_bev.image, q_bev.origin_xy, db_img, db_org,
            jnp.float32(0.0))[0])
        ms, m_call = marginal_chained(
            match1, match_x4, q_bev.image, q_bev.origin_xy, db_img, db_org,
            n=15)
        log(f"staged K=1 registration (768², fm preset): {ms:.2f} ms device "
            f"(marginal in-jit; {m_call:.2f}/relay call; score "
            f"{float(sc[0]):.3f})")
        return ms

    match_ms = float("nan")
    try:
        match_ms = run_match()
    except Exception as e:
        log(f"match bench section failed: {e!r}")

    # --- fused one-program located query (the production serving path:
    # gloc serve / locate_fused — extraction + bank search + HBM-store
    # candidate gather + staged registration in ONE jit; XLA overlaps the
    # stages, so this is faster than detect + standalone match). 10k-scan
    # map with the real scan planted at row 5000 so the staged top-1
    # branch registers, exactly as in steady-state serving. -------------
    def run_fused():
        from gloc3d_tpu.data.native import compute_bev_host
        from gloc3d_tpu.pipeline import GlobalLocalizer, Keyframe

        n_map = 10_000
        fcfg = cfg.replace(
            model=cfg.model.replace(fold_bn=True),
            index=cfg.index.replace(capacity=n_map),
        ).fast_match(fm=True)
        loc = GlobalLocalizer(fcfg, fmodel, fparams, host_stats=True,
                              device_keyframes=True, host_mirror=False)
        desc, bev, _ = loc.extract(pts, mask)
        for i in range(0, n_map, 5000):
            loc.bank.add(rng.randn(5000, fcfg.index.dim).astype(np.float32))
        jrow = n_map // 2
        loc.bank._bank = jax.lax.dynamic_update_slice(
            loc.bank._bank, jnp.asarray(np.asarray(desc)), (jrow, 0))
        sz = fcfg.bev.image_size
        loc._kf_cap = n_map
        loc._kf_store = jnp.zeros((n_map, sz, sz // 8), jnp.uint8)
        loc._kf_origins = jnp.zeros((n_map, 2), jnp.float32)
        loc._store_keyframes(bev.image[:1], bev.origin_xy[:1], offset=jrow)
        loc.keyframes = [Keyframe(None, None, None, None)] * n_map
        res = loc.locate_fused(pts[0], mask[0])
        assert res.success and res.db_index == jrow

        imgs, origins, _ = compute_bev_host(pts, counts, fcfg.bev)
        fargs = (loc.params, sp_d, sv_d, *vs5_d, jnp.asarray(imgs[0]),
                 jnp.asarray(origins[0]), loc.bank._bank,
                 jnp.int32(len(loc.bank)), loc._kf_store, loc._kf_origins)
        impl = loc._locate_fused_sorted_impl

        def mk(serialize, k):
            # serialize=True chains each query on its own MATCH result
            # (latency). serialize=False chains only on the SEARCH result,
            # so query i+1's extraction overlaps query i's registration
            # (pipelined throughput) — every match still executes: its
            # outputs accumulate into the fetched result (else XLA DCEs
            # the whole registration and the number measures nothing).
            def f(*a):
                *core, prev = a
                x, acc = prev, jnp.float32(0.0)
                for _ in range(k):
                    d2, idx, r = impl(*core[:7], core[7] + x * 0.0,
                                      *core[8:])
                    m = jnp.sum(r.score) + jnp.sum(r.xy_yaw)
                    x = d2[0, 0] + (m * 0.0 if serialize else 0.0)
                    acc = acc + m
                return d2 + acc * 1e-30, x
            return f

        # search-only chaining (serialize=False) measures the same number:
        # the TPU schedules one program's stages in order, so there is no
        # cross-query overlap inside a chain (measured: 3.21 vs 3.20 ms).
        # One variant keeps the driver's bench run lean.
        lat, call = marginal_chained(mk(True, 1), mk(True, 4),
                                     *fargs, n=30)
        log(f"fused located query (one jit, 10k map + HBM store, fm "
            f"preset): {lat:.2f} ms/query device ({call:.2f}/relay call)")
        return lat

    fused_ms = float("nan")
    try:
        fused_ms = run_fused()
    except Exception as e:
        log(f"fused bench section failed: {e!r}")

    # --- ALIGNED fused located query (the reference evaluator's headline
    # path runs with ground alignment ON: global_localization.cpp:423-437
    # aligns every db scan and :511-574 composes the 6-DoF pose through the
    # ground frames). All-device variant: ground RANSAC + rotate + BEV +
    # voxelize + CNN + VLAD + top-20 + store gather + staged registration
    # in ONE jit (_locate_fused_impl with align_ground=True). ------------
    def run_fused_aligned():
        from gloc3d_tpu.core.transforms import Rigid3
        from gloc3d_tpu.pipeline import GlobalLocalizer, Keyframe

        n_map = 10_000
        fcfg = cfg.replace(
            model=cfg.model.replace(fold_bn=True),
            index=cfg.index.replace(capacity=n_map),
        ).fast_match(fm=True)
        loc = GlobalLocalizer(fcfg, fmodel, fparams, align_ground=True,
                              device_keyframes=True, host_mirror=False)
        desc, bev, ground = loc.extract(pts, mask)
        for _ in range(0, n_map, 5000):
            loc.bank.add(rng.randn(5000, fcfg.index.dim).astype(np.float32))
        jrow = n_map // 2
        loc.bank._bank = jax.lax.dynamic_update_slice(
            loc.bank._bank, jnp.asarray(np.asarray(desc)), (jrow, 0))
        sz = fcfg.bev.image_size
        loc._kf_cap = n_map
        loc._kf_store = jnp.zeros((n_map, sz, sz // 8), jnp.uint8)
        loc._kf_origins = jnp.zeros((n_map, 2), jnp.float32)
        loc._store_keyframes(bev.image[:1], bev.origin_xy[:1], offset=jrow)
        g = Rigid3(np.asarray(ground.transform.rotation[0]),
                   np.asarray(ground.transform.translation[0]))
        loc.keyframes = [Keyframe(None, None, g, None)] * n_map
        res = loc.locate_fused(pts[0], mask[0])
        assert res.success and res.db_index == jrow and res.pose is not None

        impl = loc._locate_fused_impl
        key = jax.random.PRNGKey(7)
        fargs = (loc.params, pts_d, mask_d, key, loc.bank._bank,
                 jnp.int32(len(loc.bank)), loc._kf_store, loc._kf_origins)

        def mk(k):
            def f(params, points, mask, kk, bank, size, store, sorg, prev):
                x, acc = prev, jnp.float32(0.0)
                for _ in range(k):
                    d2, idx, r, _ = impl(params, points + x * 0.0, mask, kk,
                                         bank, size, store, sorg)
                    m = jnp.sum(r.score) + jnp.sum(r.xy_yaw)
                    x = d2[0, 0] + m * 0.0
                    acc = acc + m
                return d2 + acc * 1e-30, x
            return f

        lat, call = marginal_chained(mk(1), mk(4), *fargs, n=15)
        log(f"ALIGNED fused located query (ground RANSAC in-jit, 10k map): "
            f"{lat:.2f} ms/query device ({call:.2f}/relay call)")

        # ---- pipelined aligned serving (the aligned soak's structure:
        # device ground-align program -> host re-bin of the aligned cloud
        # -> the host-stats fused program). In steady state the host
        # re-bin of query i+1 overlaps the device work of query i, so the
        # effective per-query cost is max(host, devA + devB) where devB is
        # the unaligned fused number (the same program consumes the
        # host-binned aligned stats). Components measured; composition
        # stated as such — global_localization.cpp:423-449 headline mode.
        align_impl = loc._align_impl

        def al1(params, points, mask, kk, prev):
            aligned, ground = align_impl(points + prev * 0.0, mask, kk)
            s = jnp.sum(aligned[:, 0, 0])
            return s, s * 0.0

        def al4(params, points, mask, kk, prev):
            x = prev
            for _ in range(4):
                aligned, ground = align_impl(points + x * 0.0, mask, kk)
                x = jnp.sum(aligned[:, 0, 0]) * 0.0
            return jnp.sum(aligned[:, 0, 0]), x

        a_ms, a_call = marginal_chained(
            al1, al4, loc.params, pts_d, mask_d, key, n=20)
        log(f"  stage device ground-align program: {a_ms:.2f} ms "
            f"({a_call:.2f}/relay call)")
        return lat, a_ms

    aligned_ms = align_stage_ms = float("nan")
    try:
        aligned_ms, align_stage_ms = run_fused_aligned()
    except Exception as e:
        log(f"aligned fused bench section failed: {e!r}")

    # host re-bin cost for the pipelined composition: stats+sort+pp + the
    # host BEV pass the fused program's keyframe/match stage consumes.
    # Serving runs the native loader THREADED (its production default,
    # num_threads=8), so the composition uses threaded timings; the
    # 1-thread numbers above remain the per-core cost statement.
    host_bev_ms = host_mt_ms = float("nan")
    try:
        from gloc3d_tpu.data.native import compute_bev_host

        t0 = time.time()
        for _ in range(reps):
            compute_bev_host(pts, counts, cfg.bev)
        host_bev_ms = (time.time() - t0) / reps * 1000.0
        t0 = time.time()
        for _ in range(reps):
            compute_voxel_stats_host_sorted(
                pts, counts, vc.xbound, vc.ybound, vc.zbound,
                crop=True, num_threads=8, per_point=True)
        host_stats_mt = (time.time() - t0) / reps * 1000.0
        host_mt_ms = host_stats_mt + host_bev_ms
        log(f"host BEV pass: {host_bev_ms:.2f} ms/scan (8 threads); "
            f"stats+sort+pp 8-thread: {host_stats_mt:.2f} ms/scan")
    except Exception as e:
        log(f"host BEV timing failed: {e!r}")

    aligned_pipelined_ms = float("nan")
    if np.isfinite(align_stage_ms) and np.isfinite(fused_ms) \
            and np.isfinite(host_mt_ms) and np.isfinite(aligned_ms):
        dev_total = align_stage_ms + fused_ms
        pipelined = max(host_mt_ms, dev_total)
        # steady-state aligned serving picks the cheaper mode per chip:
        # the host-rebin pipeline (host overlapped with device; host-bound
        # when cores are scarce — this box has ONE core, so the host pass
        # cannot parallelize away) or the all-device one-jit program.
        aligned_pipelined_ms = min(pipelined, aligned_ms)
        import os as _os
        ncpu = _os.cpu_count() or 1
        log(f"ALIGNED pipelined steady state: host re-bin {host_mt_ms:.2f} "
            f"ms/scan ({ncpu}-core host), device align "
            f"{align_stage_ms:.2f} + fused locate {fused_ms:.2f} = "
            f"{dev_total:.2f} ms -> pipelined max() = {pipelined:.2f}; "
            f"serving picks min(pipelined, all-device "
            f"{aligned_ms:.2f}) = {aligned_pipelined_ms:.2f} ms/query = "
            f"{1000.0/aligned_pipelined_ms:.0f} queries/s/chip. The "
            f"pipeline becomes device-bound ({dev_total:.2f} ms) once "
            f"host cores can absorb ~{host_mt_ms:.0f} ms/scan of binning "
            f"(≥{int(np.ceil(host_mt_ms/dev_total))} workers)")

    # --- MFU estimate --------------------------------------------------------
    flops = 5.87e10  # XLA cost_analysis of the forward (measured; the
    # recompute costs a model-scale compile, so only --full re-derives it)
    if full:
        try:
            compiled = jax.jit(
                lambda p, x, m, v: model.apply(p, x, m, voxel_stats=v)
            ).lower(params, sp_d, sv_d, vs4_d).compile()
            flops = float(compiled.cost_analysis()["flops"])
        except Exception:
            pass
    mfu = flops / (med / 1000.0) / V5E_PEAK_BF16_FLOPS
    log(f"model forward ≈ {flops/1e9:.1f} GFLOP → MFU ≈ {mfu*100:.1f}% of "
        f"v5e bf16 peak at {med:.2f} ms (extraction is bandwidth/row-bound, "
        f"not FLOP-bound; the MXU is mostly idle during the pillar binning)")

    # honest latency-vs-throughput statement (no projected-rate dressing):
    log(f"single cold query end-to-end: ≈ {host_sorted_ms + med_call:.2f} ms "
        f"through this relay (host stats+sort {host_sorted_ms:.2f} + "
        f"{med_call:.2f}/call); on local PJRT ≈ host + {med:.2f} device. "
        f"Steady-state pipelined serving: {med:.2f} ms/query device time on "
        f"one chip; sharding the bank over N chips reduces SEARCH time only. "
        f"The s2s forward stays replicated (binning-bound); the i2i conv "
        f"stack can additionally spatial-partition over the mesh "
        f"(GlobalLocalizer.shard_spatial) to cut B=1 forward latency.")

    out = {
        "metric": "query_detect_latency_ms",
        "value": round(med, 3),
        "unit": "ms",
        "vs_baseline": round(2.0 / med, 4),
    }
    if np.isfinite(i2i_ms):
        out["i2i_detect_latency_ms"] = round(i2i_ms, 3)
        out["i2i_detect_b8_ms_per_query"] = round(i2i_b8 / 8, 3)
    if np.isfinite(match_ms):
        out["match_staged_ms"] = round(match_ms, 3)
        out["e2e_located_query_ms"] = round(med + match_ms, 3)
    if np.isfinite(fused_ms):
        out["e2e_located_fused_ms"] = round(fused_ms, 3)
    if np.isfinite(aligned_ms):
        out["e2e_aligned_ms"] = round(aligned_ms, 3)
    if np.isfinite(aligned_pipelined_ms):
        out["e2e_aligned_pipelined_ms"] = round(aligned_pipelined_ms, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main(full="--full" in sys.argv)
