"""Low-overlap BEV registration by exhaustive rotation × translation search.

The reference registers query/candidate BEV images with SURF keypoints +
FLANN matching + RANSAC partial-affine (loop_detector.cpp:192-288) — a CPU
pipeline whose quality hinges on keypoint repeatability on thin occupancy
contours. The capability also exists there as dense search:
FastCorrelativeScanMatcher2D (branch-and-bound, fast_correlative_scan_matcher
_2d.cpp) and TestGridMatch brute force (global_registration.cpp:778-840).

TPU-native redesign: dense search IS the right algorithm on this hardware.
Cross-correlation over all translations is a product in the Fourier domain,
and the rotation axis is just a batch dimension:

  coarse: occupancy max-pooled ×4 → (R, 128, 128) rotated stack → one batched
          rFFT correlation against the db image → best (θ, s) over the full
          360° × ±51.2 m window.
  fine:   full resolution, a narrow rotation fan around θ*, FFT-padded to S+256
          → exact peak → (dx, dy, yaw) at grid precision.

Window note: the coarse stage's alias-free translation window is
±(pad_c − sc) coarse cells (≈ ±25 m at the 768/4 default) — narrower than
the fine stage's ±51 m. Candidate pairs farther apart than the coarse window
may lock a wrong coarse rotation and fail the score gate; place-recognition
candidates live within posDistThr = 20 m, inside the window.

Output contract matches RpyPCLoopDetector::match: a metric (dx, dy, yaw)
taking query points to db points (p_db = R(yaw)·p_q + t), a confidence score,
and an accept gate. The reference's |1−scale|<0.1 gate is meaningless for a
rigid search (scale ≡ 1); the gate here is a normalized-correlation threshold
+ minimum overlap count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gloc3d_tpu.config import MatchConfig
from gloc3d_tpu.ops.bev import BEVImage

Array = jax.Array


class MatchResult(NamedTuple):
    """Rigid 2-D registration of a query BEV image onto a db BEV image."""

    xy_yaw: Array      # (3,) [dx, dy, yaw]: p_db = R(yaw)·p_q + [dx, dy]
    score: Array       # () normalized correlation peak ∈ [0, 1]
    overlap: Array     # () occupied-pixel overlap count at the peak
    success: Array     # () bool — clears score and overlap gates
    scale: Array       # () always 1.0 (rigid); kept for contract parity
    ratio: Array = jnp.float32(0.0)  # () peak sharpness: best / best-outside-
    # ±3-cells (true matches peak uniquely; structurally-similar negatives
    # correlate diffusely). 0 when not computed.


def match_bev_topk(
    query: BEVImage,
    db_images: Array,      # (K, S, S)
    db_origins: Array,     # (K, 2)
    cfg: MatchConfig,
    resolution: Array | float | None = None,
) -> MatchResult:
    """Register one query against K candidate BEV images in one jit.

    This is where the dense-search design pays off against the reference's
    per-candidate SURF loop (global_localization.cpp:519-524): the coarse
    rotated query stack and its FFT depend only on the query, so they are
    computed ONCE and reused for all K candidates; per-candidate work is a
    spectrum product + inverse FFT. Returns a MatchResult with a leading K
    axis; callers emulate the reference's first-success-wins scan by masking
    with candidate order.
    """
    res = query.resolution if resolution is None else jnp.float32(resolution)
    occ_q = _occupancy(query.image)

    f = cfg.coarse_downsample
    cq = _maxpool(occ_q, f)
    sc = cq.shape[-1]
    pad_c = max(1 << (sc - 1).bit_length(), sc + sc // 2)
    angles_c = (
        jnp.arange(cfg.num_rotations, dtype=jnp.float32)
        * (2.0 * jnp.pi / cfg.num_rotations)
    )
    rot_c = _rotate_image_shear(cq, angles_c)
    rot_cp = jnp.zeros((cfg.num_rotations, pad_c, pad_c)).at[:, :sc, :sc].set(rot_c)
    fr_c = jnp.conj(jnp.fft.rfft2(rot_cp))          # shared across candidates

    half = cfg.refine_span_deg * jnp.pi / 180.0 / 2.0
    rf = cfg.refine_rotations
    g = cfg.fine_downsample
    fq = _maxpool(occ_q, g) if g > 1 else occ_q
    sf = fq.shape[-1]
    nf_q = jnp.sum(fq)
    pad_f = sf + max(256 // g, sf // 4)
    res_f = res * g
    o_q = query.origin_xy + res * (g - 1) / 2.0

    # The fine fan is query-only: instead of re-rotating the full-res query
    # by (θ_coarse + δ) per candidate (11 shear rotations each), rotate the
    # query ONCE by the δ offsets here and rotate each candidate's db image
    # by −θ_coarse inside the loop (1 rotation). Equivalent search:
    #   corr(rot(q, θc+δ), db) ≡ corr(rot(q, δ), rot(db, −θc))
    # with the found pixel shift s′ mapping back as s = R(θc)·s′.
    # MEASURED (768², K=24, v5e): 40 → 8.6 ms per candidate (969 → 206
    # ms/batch).
    deltas = jnp.linspace(-half, half, rf)
    fan = _rotate_image_shear(fq, deltas)
    fan_p = jnp.zeros((rf, pad_f, pad_f)).at[:, :sf, :sf].set(fan)
    ffan = jnp.conj(jnp.fft.rfft2(fan_p))       # shared across candidates
    if cfg.overlap_norm:
        # rotated query SUPPORT fan (for the per-shift db mass): low-overlap
        # scoring normalizes by the occupancy masses inside the overlap
        # region instead of the full images (masked NCC).
        sup_fan = _rotate_image_shear(jnp.ones((sf, sf)), deltas)
        sup_p = jnp.zeros((rf, pad_f, pad_f)).at[:, :sf, :sf].set(sup_fan)
        fsup = jnp.conj(jnp.fft.rfft2(sup_p))

    def one(db_img, db_origin):
        occ_db = _occupancy(db_img)
        cdb = _maxpool(occ_db, f)
        tgt = jnp.zeros((pad_c, pad_c)).at[:sc, :sc].set(cdb)
        corr_c = jnp.fft.irfft2(fr_c * jnp.fft.rfft2(tgt)[None], s=(pad_c, pad_c))
        r_c, _, _, _ = _peak(corr_c, pad_c)
        theta_c = angles_c[r_c]

        fdb = _maxpool(occ_db, g) if g > 1 else occ_db
        nf_db = jnp.sum(fdb)
        db_rot = _rotate_image_shear(fdb, -theta_c[None])[0]
        tgt_f = jnp.zeros((pad_f, pad_f)).at[:sf, :sf].set(db_rot)
        ft_db = jnp.fft.rfft2(tgt_f)
        corr_f = jnp.fft.irfft2(ffan * ft_db[None], s=(pad_f, pad_f))
        if cfg.overlap_norm:
            # per-shift masses inside the overlap region: db occupancy under
            # the rotated query support, and query occupancy under the
            # (rotated) db support; NCC = corr / sqrt(m_q · m_db), shifts
            # with overlap mass below the floor are masked out.
            db_sup = _rotate_image_shear(
                jnp.ones_like(fdb), -theta_c[None])[0]
            tgt_sup = jnp.zeros((pad_f, pad_f)).at[:sf, :sf].set(db_sup)
            m_q = jnp.fft.irfft2(
                ffan * jnp.fft.rfft2(tgt_sup)[None], s=(pad_f, pad_f))
            m_db = jnp.fft.irfft2(fsup * ft_db[None], s=(pad_f, pad_f))
            floor = jnp.float32(cfg.min_overlap_pixels)
            ncc = corr_f * jax.lax.rsqrt(
                jnp.maximum(m_q, 1.0) * jnp.maximum(m_db, 1.0))
            score_map = jnp.where(
                jnp.minimum(m_q, m_db) >= floor, ncc, -1.0)
            r_f, dy, dx, ncc_peak = _peak(score_map, pad_f)
            peak = corr_f[r_f, dy % pad_f, dx % pad_f]
            ratio = _peak_ratio(score_map, ncc_peak, dy, dx, pad_f)
        else:
            r_f, dy, dx, peak = _peak(corr_f, pad_f)
            ncc_peak = None
            ratio = _peak_ratio(corr_f, peak, dy, dx, pad_f)
        theta = theta_c + deltas[r_f]

        c = (sf - 1) / 2.0
        ct, st = jnp.cos(theta), jnp.sin(theta)
        rot_mat = jnp.array([[ct, -st], [st, ct]])
        ctc, stc = jnp.cos(theta_c), jnp.sin(theta_c)
        rot_c_mat = jnp.array([[ctc, -stc], [stc, ctc]])
        center = jnp.array([c, c]) * res_f
        shift = rot_c_mat @ (jnp.array([dx, dy], jnp.float32) * res_f)
        o_db = db_origin + res * (g - 1) / 2.0
        t = o_db + center + shift - rot_mat @ (o_q + center)
        theta = jnp.arctan2(st, ct)
        if cfg.overlap_norm:
            score = ncc_peak
            success = (
                (score >= cfg.min_score)
                & (score > -1.0)  # at least one shift met the mass floor
                & (nf_q > 0) & (nf_db > 0)
            )
        else:
            score = peak / jnp.maximum(jnp.sqrt(nf_q * nf_db), 1.0)
            success = (
                (score >= cfg.min_score)
                & (peak >= cfg.min_overlap_pixels)
                & (nf_q > 0) & (nf_db > 0)
            )
        if cfg.min_peak_ratio > 0.0:
            success = success & (ratio >= cfg.min_peak_ratio)
        return MatchResult(
            jnp.array([t[0], t[1], theta]), score, peak, success,
            jnp.float32(1.0), ratio,
        )

    return jax.lax.map(lambda args: one(*args), (db_images, db_origins))


def _occupancy(img: Array) -> Array:
    """BEV image (free=1, occupied=0) → binary occupancy (occupied=1)."""
    return (img < 0.5).astype(jnp.float32)


def _shear_x_fft(img: Array, s: Array) -> Array:
    """Shift row y by s·(y−c) along x via FFT phase (subpixel, circular)."""
    n = img.shape[-1]
    c = (n - 1) / 2.0
    f = jnp.fft.rfft(img, axis=-1)
    k = jnp.arange(n // 2 + 1)
    y = jnp.arange(img.shape[-2]) - (img.shape[-2] - 1) / 2.0
    phase = jnp.exp(
        (-2j * jnp.pi / n) * k[None, :] * (s * y)[:, None]
    ).astype(jnp.complex64)
    return jnp.fft.irfft(f * phase, n=n, axis=-1)


def _rotate_image_shear(img: Array, angles: Array) -> Array:
    """Rotate (S, S) image by each angle about its center → (R, S, S).

    Gather-free: exact 90° steps by jnp.rot90 + the residual (|θ| ≤ 45°) as
    the classic three-shear decomposition, each shear an FFT phase multiply.
    MEASURED on v5e: 45× faster than the bilinear-gather rotation (XLA TPU
    gathers cost ~100M rows/s; FFTs are dense). To avoid circular-wrap
    artifacts the image is embedded centered in a 2× canvas, rotated, and
    cropped back — content leaving the frame is lost exactly as with the
    gather version's out-of-bounds zeros.
    """
    s = img.shape[-1]
    pad = 2 * s
    off = (pad - s) // 2
    canvas = jnp.zeros((pad, pad), img.dtype).at[off : off + s, off : off + s].set(img)

    quarter = jnp.pi / 2.0
    k90 = jnp.round(angles / quarter).astype(jnp.int32) % 4
    residual = angles - jnp.round(angles / quarter) * quarter

    # NB: jnp.rot90 rotates axis0→axis1, which in the (row=y, col=x) image
    # convention is a MATH-NEGATIVE rotation; +90° steps therefore use k=-1.
    r0 = canvas
    r1 = jnp.rot90(canvas, -1)
    r2 = jnp.rot90(canvas, 2)
    r3 = jnp.rot90(canvas, 1)

    def one(k, theta):
        base = jax.lax.switch(
            k, [lambda: r0, lambda: r1, lambda: r2, lambda: r3]
        )
        a = -jnp.tan(theta / 2.0)
        b = jnp.sin(theta)
        out = _shear_x_fft(_shear_x_fft(base, a).T, b).T
        out = _shear_x_fft(out, a)
        # clamp sinc ringing; occupancy is [0, 1]
        return jnp.clip(out[off : off + s, off : off + s], 0.0, 1.0)

    return jax.vmap(one)(k90, residual)


def _rotate_image(img: Array, angles: Array) -> Array:
    """Rotate (S, S) image by each angle about the pixel center → (R, S, S).

    Output pixel p samples source at R(−θ)·(p − c) + c (bilinear). Out-of-
    bounds samples read 0 (unoccupied). Kept as the reference implementation
    for tests; the matcher uses the 45×-faster _rotate_image_shear.
    """
    s = img.shape[-1]
    c = (s - 1) / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(s, dtype=jnp.float32),
                          jnp.arange(s, dtype=jnp.float32), indexing="ij")

    def one(theta):
        ct, st = jnp.cos(-theta), jnp.sin(-theta)
        # (x, y) math convention: x = cols, y = rows
        xr = ct * (xs - c) - st * (ys - c) + c
        yr = st * (xs - c) + ct * (ys - c) + c
        x0 = jnp.floor(xr).astype(jnp.int32)
        y0 = jnp.floor(yr).astype(jnp.int32)
        fx = xr - x0
        fy = yr - y0

        def tap(yy, xx):
            ok = (xx >= 0) & (xx < s) & (yy >= 0) & (yy < s)
            v = img[jnp.clip(yy, 0, s - 1), jnp.clip(xx, 0, s - 1)]
            return jnp.where(ok, v, 0.0)

        return (
            tap(y0, x0) * (1 - fx) * (1 - fy)
            + tap(y0, x0 + 1) * fx * (1 - fy)
            + tap(y0 + 1, x0) * (1 - fx) * fy
            + tap(y0 + 1, x0 + 1) * fx * fy
        )

    return jax.vmap(one)(angles)


def _fft_correlate(rotated: Array, target: Array, pad: int) -> Array:
    """Batched circular cross-correlation via rFFT.

    corr[r, dy, dx] = Σ_p rotated[r, p] · target[p + (dy, dx)] with zero
    padding to ``pad`` (linear for shifts < pad − S).
    """
    s = target.shape[-1]
    rot_p = jnp.zeros(rotated.shape[:-2] + (pad, pad)).at[..., :s, :s].set(rotated)
    tgt_p = jnp.zeros((pad, pad)).at[:s, :s].set(target)
    fr = jnp.fft.rfft2(rot_p)
    ft = jnp.fft.rfft2(tgt_p)
    return jnp.fft.irfft2(jnp.conj(fr) * ft[None], s=(pad, pad))


def _peak_ratio(corr: Array, peak: Array, dy: Array, dx: Array,
                pad: int, excl: int = 3) -> Array:
    """Peak sharpness: peak / strongest value outside ±excl cells of the
    peak's TRANSLATION (across all rotations — adjacent-rotation responses
    at the same shift are the same pose hypothesis). True matches peak
    uniquely; structurally-similar negatives correlate diffusely."""
    yy = jax.lax.broadcasted_iota(jnp.int32, (pad, pad), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (pad, pad), 1)
    py, px = dy % pad, dx % pad
    cdy = jnp.abs(yy - py)
    cdx = jnp.abs(xx - px)
    near = (jnp.minimum(cdy, pad - cdy) <= excl) & (
        jnp.minimum(cdx, pad - cdx) <= excl)
    sec = jnp.max(jnp.where(near[None], -jnp.inf, corr))
    return peak / jnp.maximum(sec, 1e-6)


def _peak(corr: Array, pad: int):
    """argmax over (R, pad, pad) → (r, dy, dx) with signed wrap of shifts."""
    flat = jnp.argmax(corr.reshape(corr.shape[0], -1), axis=-1)
    per_rot = jnp.max(corr.reshape(corr.shape[0], -1), axis=-1)
    r = jnp.argmax(per_rot)
    dy = flat[r] // pad
    dx = flat[r] % pad
    # shifts > pad/2 are negative (circular)
    dy = jnp.where(dy > pad // 2, dy - pad, dy)
    dx = jnp.where(dx > pad // 2, dx - pad, dx)
    return r, dy, dx, per_rot[r]


def _maxpool(img: Array, f: int) -> Array:
    s = img.shape[-1] // f
    return jnp.max(img[: s * f, : s * f].reshape(s, f, s, f), axis=(1, 3))


def match_bev(
    query: BEVImage, db: BEVImage, cfg: MatchConfig
) -> MatchResult:
    """Register query onto db: the K=1 specialization of match_bev_topk
    (one implementation — the coarse/fine/metric logic lives there)."""
    res = match_bev_topk(
        query, db.image[None], db.origin_xy[None], cfg,
        resolution=db.resolution,
    )
    return jax.tree.map(lambda x: x[0], res)
