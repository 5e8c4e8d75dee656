"""Per-stage attribution of the ALIGNED fused located query (real TPU).

bench.py round 4 reports e2e_aligned_ms ≈ 11.5 vs 3.2 unaligned — ground
alignment "costs" 8.3 ms, far more than the 1.6 ms ground estimate itself.
The aligned program (pipeline._locate_fused_impl with align_ground=True)
differs from the unaligned host-stats program in THREE ways, each timed
here in isolation with the paired-marginal methodology (CLAUDE.md):

  align    — ground RANSAC estimate + cloud rotation (ops/ground.py)
  bev      — device scan_to_bev on the aligned cloud (ops/bev.py; the
             unaligned path gets its BEV from the host loader)
  forward  — all-device model forward (in-model voxelize: sort + segment
             reductions on device; the unaligned path uses host stats)
  tail     — _fused_tail: top-20 search + store gather + staged match
  whole    — the full aligned fused program (cross-check vs sum of parts)

Usage: python tools/profile_aligned.py   (TPU; one process)
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

import bench as B
from gloc3d_tpu.config import PipelineConfig
from gloc3d_tpu.models import build_model
from gloc3d_tpu.models.fold import fold_batch_norm
from gloc3d_tpu.pipeline import GlobalLocalizer


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    cfg = PipelineConfig.s2s()
    n_pts = cfg.voxel.max_points
    pts, mask, n_real = B.load_query_scan(n_pts)
    pts_d, mask_d = jnp.asarray(pts), jnp.asarray(mask)

    model = build_model(cfg.model, cfg.voxel)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pts_d, mask_d)
    fcfg = cfg.replace(model=cfg.model.replace(fold_bn=True),
                       index=cfg.index.replace(capacity=10_000)
                       ).fast_match(fm=True)
    fmodel = build_model(fcfg.model, fcfg.voxel)
    fparams = {"params": fold_batch_norm(params["params"],
                                         params["batch_stats"])}

    loc = GlobalLocalizer(fcfg, fmodel, fparams, align_ground=True,
                          device_keyframes=True, host_mirror=False,
                          device_sort=True)  # explicit: the sorted variant
    rng = np.random.RandomState(0)
    bank = jnp.asarray(rng.randn(10_000, fcfg.index.dim).astype(np.float32))
    sz = fcfg.bev.image_size
    store = jnp.zeros((10_000, sz, sz // 8), jnp.uint8)
    sorg = jnp.zeros((10_000, 2), jnp.float32)
    size = jnp.int32(10_000)
    key = jax.random.PRNGKey(7)
    jrow = 5_000

    # materialize intermediates once for stage inputs
    aligned, ground = jax.jit(loc._align_impl)(pts_d, mask_d, key)
    aligned = jax.block_until_ready(aligned)
    from gloc3d_tpu.ops.bev import scan_to_bev
    bev = jax.jit(lambda p, m: jax.vmap(
        lambda a, b: scan_to_bev(a, b, fcfg.bev))(p[..., :3], m)
    )(aligned, mask_d)
    desc = jax.jit(lambda pr, p, m: fmodel.apply(pr, p, m))(
        fparams, aligned, mask_d)
    img0 = bev.image[0] + 0.0
    org0 = bev.origin_xy[0] + 0.0

    # plant a first-candidate success (bench.py's serving-representative
    # setup): the query's own descriptor + stored BEV at row jrow, so the
    # staged lax.cond takes the single-registration fast branch. The
    # all-20 fallback branch is measured separately below via a
    # staged_first=False variant.
    bank = jax.lax.dynamic_update_slice(bank, desc, (jrow, 0))
    loc._kf_cap = 10_000
    loc._kf_store = store
    loc._kf_origins = sorg
    loc._store_keyframes(bev.image[:1], bev.origin_xy[:1], offset=jrow)
    store, sorg = loc._kf_store, loc._kf_origins

    def stage_align(p, m, prev):
        a, g = loc._align_impl(p + prev * 0.0, m, key)
        return a[:, 0, :3], a[0, 0, 0]

    def stage_bev(p, m, prev):
        b = jax.vmap(lambda a, c: scan_to_bev(a, c, fcfg.bev))(
            p[..., :3] + prev * 0.0, m)
        return b.image[:, :2, :2], b.image[0, 0, 0]

    def stage_fwd(p, m, prev):
        d = fmodel.apply(fparams, p + prev * 0.0, m)
        return d, d[0, 0]

    # NOTE: bank/store/sorg must be ARGUMENTS, not closure captures — a
    # captured non-uniform array becomes an HLO constant, and the 737 MB
    # store blows the relay's remote-compile body limit (HTTP 413).
    def stage_tail(d, im, og, bk, st, so, prev):
        d2, idx, res = loc._fused_tail(d + prev * 0.0, im, og, bk, size,
                                       st, so)
        return d2, d2[0, 0] + jnp.sum(res.score) * 1e-9

    def stage_whole(p, m, bk, st, so, prev):
        d2, idx, res, g = loc._locate_fused_impl(
            fparams, p + prev * 0.0, m, key, bk, size, st, so)
        return d2, d2[0, 0] + jnp.sum(res.score) * 1e-9

    def mk(fn, k):
        def f(*args):
            *a, prev = args
            x, acc = prev, jnp.float32(0.0)
            for _ in range(k):
                out, x = fn(*a, x)
                acc = acc + jnp.sum(out.astype(jnp.float32)) * 1e-30
            return jnp.float32(0.0) + acc, x
        return f

    def stage_fwd_sorted(p, m, prev):
        from gloc3d_tpu.ops.voxelize import device_pillar_sort_stats
        vcfg = fcfg.voxel
        ps, vs, ids, starts, raw_counts, centroids = jax.vmap(
            lambda a, b: device_pillar_sort_stats(
                a, b, vcfg.xbound, vcfg.ybound, vcfg.zbound)
        )(p + prev * 0.0, m)
        d = fmodel.apply(fparams, ps, vs,
                         voxel_stats=(ids, raw_counts, centroids, starts))
        return d, d[0, 0]

    # all-20 fallback branch, measured deterministically (staged_first off)
    loc_k20 = GlobalLocalizer(
        fcfg.replace(match=fcfg.match.replace(staged_first=False)),
        fmodel, fparams, align_ground=True, device_keyframes=True,
        host_mirror=False)

    def stage_tail_k20(d, im, og, bk, st, so, prev):
        d2, idx, res = loc_k20._fused_tail(d + prev * 0.0, im, og, bk,
                                           size, st, so)
        return d2, d2[0, 0] + jnp.sum(res.score) * 1e-9

    # whole program with the scatter (unsorted) forward, to decide the
    # aligned default for device_sort
    loc_scatter = GlobalLocalizer(fcfg, fmodel, fparams, align_ground=True,
                                  device_keyframes=True, host_mirror=False,
                                  device_sort=False)

    def stage_whole_scatter(p, m, bk, st, so, prev):
        d2, idx, res, g = loc_scatter._locate_fused_impl(
            fparams, p + prev * 0.0, m, key, bk, size, st, so)
        return d2, d2[0, 0] + jnp.sum(res.score) * 1e-9

    stages = [
        ("align (ground RANSAC + rotate)", stage_align, (pts_d, mask_d)),
        ("bev (device scan_to_bev)", stage_bev, (aligned, mask_d)),
        ("forward (scatter voxelize)", stage_fwd, (aligned, mask_d)),
        ("forward (sorted voxelize)", stage_fwd_sorted, (aligned, mask_d)),
        ("tail, 1st-candidate success", stage_tail,
         (desc, img0, org0, bank, store, sorg)),
        ("tail, all-20 fallback", stage_tail_k20,
         (desc, img0, org0, bank, store, sorg)),
        ("WHOLE aligned fused (sorted)", stage_whole,
         (pts_d, mask_d, bank, store, sorg)),
        ("WHOLE aligned fused (scatter)", stage_whole_scatter,
         (pts_d, mask_d, bank, store, sorg)),
    ]
    for name, fn, args in stages:
        lat, call = B.marginal_chained(mk(fn, 1), mk(fn, 4), *args, n=15)
        log(f"{name:36s}: {lat:7.2f} ms device ({call:.2f}/call)")


if __name__ == "__main__":
    main()
