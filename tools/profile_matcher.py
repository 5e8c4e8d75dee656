"""Per-stage device-time profile of the K=1 staged registration path.

The round-3 serving+fm preset costs ~8 ms staged (K=1) while the marginal
per-candidate cost is ~0.9 ms — i.e. almost all of it is query-side fixed
cost. This script times each piece in isolation with MARGINAL in-jit
chaining (jit a fori_loop of N and of M>N iterations, report
(t_M − t_N)/(M − N): pure device time, no relay dispatch), so optimization
work can be attributed before it is spent.

Pieces (fm serving preset geometry: S=768, g=2 → sf=384, pad_f=480,
f=4, fr=8 → sc_r=96, pad_c=144, rf=11):

  fan_old   — _rotate_small_padded(fq, δ×11, 480) + conj(rfft2(·))
  fan_new   — _fan_rfft2 (fused shear↔FFT passes)
  sig       — _angular_signature of the ÷4-pooled occupancy (+1-D rfft)
  coarse_fm — one candidate's fm coarse stage (sig_db + θ-corr + 2-rot check)
  dbrot     — _rotate_image_shear of the ÷2 db image (2× canvas)
  fine_corr — rfft2(tgt) + 11 products + irfft2 + peak + ratio
  full K=1  — match_bev_topk, serving+fm
  full K=20 — match_bev_topk, serving+fm

Usage: python tools/profile_matcher.py  (TPU; one process, ~10 compiles)
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

from gloc3d_tpu.config import MatchConfig
from gloc3d_tpu.ops import bev_match as bm
from gloc3d_tpu.ops.bev import BEVImage


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def marginal(fn, *args, n1=10, n2=30, reps=3):
    """Marginal in-jit device ms of fn(*args, prev)->scalar over a chain."""

    def chain(n):
        @jax.jit
        def run(*a):
            def body(_, c):
                return fn(*a, c)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    f1, f2 = chain(n1), chain(n2)
    _ = np.asarray(f1(*args)), np.asarray(f2(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); _ = np.asarray(f1(*args)); t1 = time.time() - t0
        t0 = time.time(); _ = np.asarray(f2(*args)); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (n2 - n1) * 1000.0)
    return best


def main():
    size = 768
    raw = np.fromfile(
        "/root/reference/s2s_libtorch/000000.bin", np.float32
    ).reshape(-1, 4)
    # build the query BEV on-device via the real pipeline would add compiles;
    # for stage timing, synthesize an occupancy image with realistic density
    # by splatting the real scan's xy at 0.2 m (timing is content-agnostic)
    img = np.ones((size, size), np.float32)
    ij = np.clip((raw[:, :2] / 0.2 + size // 2).astype(int), 0, size - 1)
    img[ij[:, 1], ij[:, 0]] = 0.0  # occupied = 0.0 convention
    occ = jnp.asarray((img < 0.5).astype(np.float32))
    log(f"occupied px: {int((img < 0.5).sum())}")

    cfg = MatchConfig(image_size=size).replace(
        fine_downsample=2, coarse_rot_downsample=8, fine_top_f=4,
        coarse_mode="fm")
    g, f, fr, rf = (cfg.fine_downsample, cfg.coarse_downsample,
                    cfg.coarse_rot_downsample, cfg.refine_rotations)
    half = float(cfg.refine_span_deg) * np.pi / 180.0 / 2.0
    deltas = jnp.linspace(-half, half, rf)
    sf = size // g
    pad_f = bm._good_fft_size(sf + max(cfg.fine_pad_px // g, 16))
    sc_r = size // fr
    pad_c = max(1 << (sc_r - 1).bit_length(), sc_r + sc_r // 2)
    log(f"sf={sf} pad_f={pad_f} sc_r={sc_r} pad_c={pad_c} rf={rf}")

    fq = np.asarray(bm._maxpool(occ, g))
    fq_d = jnp.asarray(fq)
    cq_r = jnp.asarray(np.asarray(bm._maxpool(occ, fr)))
    pooled4 = jnp.asarray(np.asarray(bm._maxpool(occ, f)))

    # ---- fan variants --------------------------------------------------
    def fan_old(q, c):
        fan = bm._rotate_small_padded(q * (1.0 + c * 1e-30), deltas, pad_f)
        ff = jnp.conj(jnp.fft.rfft2(fan))
        return jnp.abs(ff).sum() * 1e-9

    def fan_new(q, c):
        ff = bm._fan_rfft2(q * (1.0 + c * 1e-30), deltas, pad_f, half)
        return jnp.abs(ff).sum() * 1e-9

    # interleaved A/B: relay-server state drifts across minutes, so only
    # back-to-back comparisons in one process are trustworthy
    for rnd in range(2):
        log(f"fan_old (11 delta, unfused) [{rnd}]: "
            f"{marginal(fan_old, fq_d):.3f} ms")
        log(f"fan_new (11 delta, fused)   [{rnd}]: "
            f"{marginal(fan_new, fq_d):.3f} ms")

    # ---- fm signature --------------------------------------------------
    def sig(p4, c):
        s = bm._angular_signature(p4 * (1.0 + c * 1e-30), cfg.fm_theta_bins)
        return jnp.abs(jnp.fft.rfft(s, axis=0)).sum() * 1e-9

    log(f"sig (192 matmul polar + rfft): {marginal(sig, pooled4):.3f} ms")

    # ---- fm coarse, one candidate --------------------------------------
    sig_q = bm._angular_signature(pooled4, cfg.fm_theta_bins)
    fsig_q = jnp.conj(jnp.fft.rfft(sig_q, axis=0))

    def coarse_fm(db_occ, cqr, fsq, c):
        cdb = bm._maxpool(db_occ * (1.0 + c * 1e-30), fr)
        tgt = jnp.zeros((pad_c, pad_c)).at[:sc_r, :sc_r].set(cdb)
        ft_db = jnp.fft.rfft2(tgt)
        sig_db = bm._angular_signature(bm._maxpool(db_occ, f),
                                       cfg.fm_theta_bins)
        corr_t = jnp.sum(jnp.fft.irfft(
            fsq * jnp.fft.rfft(sig_db, axis=0),
            n=cfg.fm_theta_bins, axis=0), axis=-1)
        delta = jnp.argmax(corr_t) * (jnp.pi / cfg.fm_theta_bins)
        two = bm._rotate_image_shear(cqr, jnp.stack([delta, delta + jnp.pi]))
        two_p = jnp.zeros((2, pad_c, pad_c)).at[:, :sc_r, :sc_r].set(two)
        corr2 = jnp.fft.irfft2(
            jnp.conj(jnp.fft.rfft2(two_p)) * ft_db[None], s=(pad_c, pad_c))
        r2, _, _, peak_c = bm._peak(corr2, pad_c)
        return (delta + r2 * 1.0) * 1e-9 + peak_c * 1e-12

    log(f"coarse_fm (1 cand):           "
        f"{marginal(coarse_fm, occ, cq_r, fsig_q):.3f} ms")

    # ---- db rotation (fine stage, per candidate) -----------------------
    def dbrot(q, c):
        out = bm._rotate_image_shear(q * (1.0 + c * 1e-30), jnp.array([0.7]))
        return out.sum() * 1e-9

    log(f"dbrot (1 angle, {sf} on 2x):   {marginal(dbrot, fq_d):.3f} ms")

    # ---- fine correlation (per candidate, given the fan) ---------------
    ffan = jax.jit(lambda q: bm._fan_rfft2(q, deltas, pad_f, half))(fq_d)

    def fine_corr(ff, q, c):
        tgt = jnp.zeros((pad_f, pad_f)).at[:sf, :sf].set(q * (1.0 + c * 1e-30))
        ft = jnp.fft.rfft2(tgt)
        corr = jnp.fft.irfft2(ff * ft[None], s=(pad_f, pad_f))
        r, dy, dx, peak = bm._peak(corr, pad_f)
        ratio = bm._peak_ratio(corr, peak, dy, dx, pad_f)
        return peak * 1e-9 + ratio * 1e-12

    log(f"fine_corr (rfft2+{rf}x irfft2): "
        f"{marginal(fine_corr, ffan, fq_d):.3f} ms")

    # ---- full matcher --------------------------------------------------
    q_img = jnp.asarray(img)
    origin = jnp.asarray(np.float32([-76.8, -76.8]))

    def full(db, do, qi, c):
        query = BEVImage(image=qi * (1.0 + c * 1e-30), origin_xy=origin,
                         resolution=jnp.float32(0.2),
                         num_occupied=jnp.sum(qi < 0.5).astype(jnp.int32))
        r = bm.match_bev_topk(query, db, do, cfg, resolution=0.2)
        return r.score.sum() * 1e-3

    db1 = q_img[None]
    do1 = origin[None]
    log(f"full K=1 (serving+fm):        "
        f"{marginal(full, db1, do1, q_img, n1=6, n2=18):.3f} ms")
    db20 = jnp.broadcast_to(q_img, (20, size, size))
    do20 = jnp.broadcast_to(origin, (20, 2))
    log(f"full K=20 (serving+fm):       "
        f"{marginal(full, db20, do20, q_img, n1=3, n2=9):.3f} ms")


if __name__ == "__main__":
    main()
