"""Registration-matcher latency micro-benchmark (real KITTI scan, 768²).

Measures the reference's "2D match latency" quantity
(global_localization.cpp:521-524) for the dense FFT matcher: one query BEV
image registered against K candidate images in one jit (match_bev_topk).

Methodology identical to bench.py: chained in-jit calls through the axon
relay, min over repeats. Stage micro-benches isolate the per-candidate cost
components (db shear rotation, fine FFT correlation, coarse stage) so
optimization work can be attributed.

Usage: python tools/bench_matcher.py [--full] [--k K]
"""

import argparse
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

from gloc3d_tpu.config import BEVConfig, MatchConfig
from gloc3d_tpu.ops.bev import BEVImage, scan_to_bev
from gloc3d_tpu.ops import bev_match


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def chained(fn, static=()):
    jfn = jax.jit(fn, static_argnames=static)

    def run(*args, n=20, reps=3, **kw):
        prev = jnp.float32(0.0)
        out, prev = jfn(*args, prev, **kw)
        _ = np.asarray(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            for _ in range(n):
                out, prev = jfn(*args, prev, **kw)
            _ = np.asarray(out)
            best = min(best, (time.time() - t0) / n * 1000.0)
        return best

    return run


def real_scan_bev(size=768):
    raw = np.fromfile(
        "/root/reference/s2s_libtorch/000000.bin", np.float32
    ).reshape(-1, 4)
    cfg = BEVConfig(image_size=size, max_points=131072)
    pts = np.zeros((cfg.max_points, 3), np.float32)
    n = min(len(raw), cfg.max_points)
    pts[:n] = raw[:n, :3]
    mask = np.zeros(cfg.max_points, np.float32)
    mask[:n] = 1.0
    bev = jax.jit(lambda p, m: scan_to_bev(p, m, cfg))(
        jnp.asarray(pts), jnp.asarray(mask))
    return (np.asarray(bev.image), np.asarray(bev.origin_xy),
            float(bev.resolution)), cfg, raw


def perturbed_stack(raw, cfg, k, seed=0):
    """K SE(2)-perturbed variants of the real scan as db candidates."""
    rng = np.random.RandomState(seed)
    imgs, origins = [], []
    f = jax.jit(lambda p, m: scan_to_bev(p, m, cfg))
    for i in range(k):
        dx, dy = rng.uniform(-12, 12, 2)
        yaw = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(yaw), np.sin(yaw)
        xy = raw[:, :2] @ np.array([[c, s], [-s, c]], np.float32)
        xy = xy + np.array([dx, dy], np.float32)
        pts = np.zeros((cfg.max_points, 3), np.float32)
        n = min(len(raw), cfg.max_points)
        pts[:n, :2] = xy[:n]
        pts[:n, 2] = raw[:n, 2]
        mask = np.zeros(cfg.max_points, np.float32)
        mask[:n] = 1.0
        bev = f(jnp.asarray(pts), jnp.asarray(mask))
        imgs.append(np.asarray(bev.image))
        origins.append(np.asarray(bev.origin_xy))
    return np.stack(imgs), np.stack(origins)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--size", type=int, default=768)
    args = ap.parse_args()

    log("building query BEV...")
    (q_img, q_origin, res), cfg, raw = real_scan_bev(args.size)
    log(f"query BEV: {q_img.shape}, occupied px = {(q_img < 0.5).sum()}")
    log("building perturbed db stack...")
    db_imgs, db_origins = perturbed_stack(raw, cfg, args.k)
    log("stack done")

    q_img_d = jnp.asarray(q_img)
    q_origin_d = jnp.asarray(q_origin)
    db_d = jnp.asarray(db_imgs)
    do_d = jnp.asarray(db_origins)

    mcfg = MatchConfig(image_size=args.size)

    def run_match(qi, qo, db, do, prev, c):
        query = BEVImage(
            image=qi + prev * 0.0, origin_xy=qo,
            resolution=jnp.float32(res),
            num_occupied=jnp.sum(qi < 0.5).astype(jnp.int32),
        )
        r = bev_match.match_bev_topk(query, db, do, c, resolution=res)
        return r.score, r.score[0]

    timer = chained(run_match, static=("c",))

    # correctness first: all K perturbed copies must register
    jfn = jax.jit(run_match, static_argnames=("c",))
    scores, _ = jfn(q_img_d, q_origin_d, db_d, do_d, jnp.float32(0.0), c=mcfg)
    scores = np.asarray(scores)
    log(f"scores over {args.k} perturbed candidates: "
        f"min {scores.min():.3f} max {scores.max():.3f}")

    variants = [
        ("default", mcfg),
        ("crd=8", mcfg.replace(coarse_rot_downsample=8)),
        ("ftf=4", mcfg.replace(fine_top_f=4)),
        ("g=2", mcfg.replace(fine_downsample=2)),
        ("serving (g=2,crd=8,ftf=4)", mcfg.replace(
            fine_downsample=2, coarse_rot_downsample=8, fine_top_f=4)),
        ("fm", mcfg.replace(coarse_mode="fm")),
        ("serving+fm", mcfg.replace(
            fine_downsample=2, coarse_rot_downsample=8, fine_top_f=4,
            coarse_mode="fm")),
        ("serving+fm+two-stage (preset)", mcfg.replace(
            fine_downsample=2, coarse_rot_downsample=8, fine_top_f=4,
            fine_argmax_downsample=2, coarse_mode="fm")),
    ]
    for name, c in variants:
        sc, _ = jfn(q_img_d, q_origin_d, db_d, do_d, jnp.float32(0.0), c=c)
        sc = np.asarray(sc)
        ms = timer(q_img_d, q_origin_d, db_d, do_d, n=5, c=c)
        ms1 = timer(q_img_d, q_origin_d, db_d[:1], do_d[:1], n=10, c=c)
        n_scored = int((sc > 0).sum())
        log(f"[{name}] K={args.k}: {ms:.1f} ms/batch = {ms/args.k:.2f} "
            f"ms/cand | K=1 (staged): {ms1:.2f} ms | scores "
            f"{sc[sc > 0].min():.3f}-{sc.max():.3f} ({n_scored} scored)")

    if not args.full:
        return

    # ---- stage micro-benches -------------------------------------------
    occ = (q_img_d < 0.5).astype(jnp.float32)

    def rot_full(img, prev):
        out = bev_match._rotate_image_shear(
            img + prev * 0.0, jnp.array([0.7]))
        return out.sum(), out.sum() * 0.0

    log(f"  db shear rotation (1 angle, {args.size}² → 2x canvas): "
        f"{chained(rot_full)(occ):.2f} ms")

    for g in (1, 2):
        sf = args.size // g
        fq = occ[:sf, :sf]
        pad_f = sf + max(256 // g, sf // 4)
        rf = 11
        fan = jnp.zeros((rf, pad_f, pad_f)).at[:, :sf, :sf].set(
            jnp.stack([fq] * rf))
        ffan = jnp.conj(jnp.fft.rfft2(fan))

        def fine_corr(ffan_, tgt, prev):
            ft = jnp.fft.rfft2(tgt + prev * 0.0)
            corr = jnp.fft.irfft2(ffan_ * ft[None], s=(pad_f, pad_f))
            return corr.max(), corr.max() * 0.0

        tgt = jnp.zeros((pad_f, pad_f)).at[:sf, :sf].set(fq)
        log(f"  fine corr (rfft2 + 11 products + irfft2, pad {pad_f}): "
            f"{chained(fine_corr)(ffan, tgt):.2f} ms  [g={g}]")

    # coarse per-candidate piece
    f = mcfg.coarse_downsample
    sc = args.size // f
    pad_c = max(1 << (sc - 1).bit_length(), sc + sc // 2)
    nrot = mcfg.num_rotations
    stack = jnp.zeros((nrot, pad_c, pad_c)).at[:, :sc, :sc].set(
        jnp.stack([occ[:sc, :sc]] * nrot))
    fr_c = jnp.conj(jnp.fft.rfft2(stack))

    def coarse_corr(fr, tgt, prev):
        corr = jnp.fft.irfft2(fr * jnp.fft.rfft2(tgt + prev * 0.0)[None],
                              s=(pad_c, pad_c))
        return corr.max(), corr.max() * 0.0

    tgt_c = jnp.zeros((pad_c, pad_c)).at[:sc, :sc].set(occ[:sc, :sc])
    log(f"  coarse corr ({nrot} rot × pad {pad_c}): "
        f"{chained(coarse_corr)(fr_c, tgt_c):.2f} ms")

    def coarse_pool(img, prev):
        out = bev_match._maxpool(img + prev * 0.0, f)
        return out.sum(), out.sum() * 0.0

    log(f"  coarse maxpool ÷{f}: {chained(coarse_pool)(occ):.2f} ms")


if __name__ == "__main__":
    main()
