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

import math
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


def _good_fft_size(n: int) -> int:
    """Smallest m >= n whose factorization uses only 2/3/5/7 (fast FFT sizes)."""
    m = n
    while True:
        r = m
        for p in (2, 3, 5, 7):
            while r % p == 0:
                r //= p
        if r == 1:
            return m
        m += 1


def match_bev_topk(
    query: BEVImage,
    db_images: Array,      # (K, S, S)
    db_origins: Array,     # (K, 2)
    cfg: MatchConfig,
    resolution: Array | float | None = None,
) -> MatchResult:
    """Register one query against K candidate BEV images in one jit.

    This is where the dense-search design pays off against the reference's
    per-candidate SURF loop (global_localization.cpp:519-524). Structure
    (round-3 latency attack; per-stage numbers in RESULTS.md):

      shared   - coarse rotation stack (/coarse_downsample, optionally
                 pooled further to /coarse_rot_downsample: its only output
                 is theta_coarse) + its rFFT; the fine delta-fan rotated by
                 SMALL-ANGLE shears directly on the zero-padded FFT canvas
                 (no 2x rotation canvas: delta <= +-refine_span/2 drifts
                 content <= sin(span/2)*S/2 px, well inside the pad margin).
      stage 1  - batched coarse correlation over ALL K candidates -> per-
                 candidate theta_coarse and a normalized coarse score.
      stage 2  - optionally keep only the fine_top_f best candidates by
                 coarse score (serving preset; 0 = exact, register all).
      stage 3  - per selected candidate: one db rotation by -theta_coarse +
                 fine FFT correlation against the shared fan,
                   corr(rot(q, tc+d), db) == corr(rot(q, d), rot(db, -tc)),
                 peak -> (dx, dy, yaw) at grid precision. With
                 fine_argmax_downsample >= 2 this splits again: the fan /
                 its yaw-argmax run at an extra downsample, then ONE
                 full-theta query rotation correlates against the UNROTATED
                 db at the fine grid (serving preset; exact peak, ~4x less
                 fan + correlation work).

    Returns a MatchResult with a leading K axis; callers emulate the
    reference's first-success-wins scan by masking with candidate order
    (pruned candidates report success=False with score 0).
    """
    res = query.resolution if resolution is None else jnp.float32(resolution)
    # pin default layouts at the FFT pipeline's boundary: inputs arriving
    # from other jitted programs can carry transposed layouts, which the
    # XLA:CPU fft thunk rejects (LayoutUtil::IsMonotonicWithDim0Major
    # RET_CHECK); a barrier materializes row-major copies. No-op on TPU.
    q_image, db_images = jax.lax.optimization_barrier(
        (query.image, db_images))
    occ_q = _occupancy(q_image)
    k_cand = db_images.shape[0]

    # ---- shared: coarse rotation stage --------------------------------
    f = cfg.coarse_downsample
    fr = max(cfg.coarse_rot_downsample or f, f)
    fm = cfg.coarse_mode == "fm"
    cq_r = _maxpool(occ_q, fr)
    sc_r = cq_r.shape[-1]
    pad_c = max(1 << (sc_r - 1).bit_length(), sc_r + sc_r // 2)
    if fm:
        # Fourier-Mellin: |F| is translation-invariant and rotates with the
        # image, so one polar-resampled magnitude signature per image
        # replaces the whole rotation stack; the θ-correlation is 1-D.
        sig_q = _angular_signature(_maxpool(occ_q, f), cfg.fm_theta_bins)
        fsig_q = jnp.conj(jnp.fft.rfft(sig_q, axis=0))
    else:
        angles_c = (
            jnp.arange(cfg.num_rotations, dtype=jnp.float32)
            * (2.0 * jnp.pi / cfg.num_rotations)
        )
        # pool FIRST, then rotate: with coarse_rot_downsample the whole
        # rotation stack (num_rotations shear rotations — the dominant
        # shared cost at K=1) runs at the pooled resolution. θ-argmax
        # quality at ÷8 on 768² BEVs is calibrated in tests/test_bev_match
        # .py + RESULTS.md.
        rot_c = _rotate_image_shear(cq_r, angles_c)
        rot_cp = jnp.zeros(
            (cfg.num_rotations, pad_c, pad_c)).at[:, :sc_r, :sc_r].set(rot_c)
        fr_c = jnp.conj(jnp.fft.rfft2(rot_cp))  # shared across candidates

    # ---- shared: fine delta-fan on the FFT canvas ---------------------
    half = cfg.refine_span_deg * jnp.pi / 180.0 / 2.0
    rf = cfg.refine_rotations
    g = cfg.fine_downsample
    fq = _maxpool(occ_q, g) if g > 1 else occ_q
    sf = fq.shape[-1]
    nf_q = jnp.sum(fq)
    pad_f = _good_fft_size(sf + max(cfg.fine_pad_px // g, 16))
    res_f = res * g
    o_q = query.origin_xy + res * (g - 1) / 2.0

    # The fine fan is query-only: instead of re-rotating the full-res query
    # by (theta_c + delta) per candidate, rotate the query ONCE by the delta
    # offsets here and rotate each candidate's db image by -theta_c inside
    # the loop (1 rotation); the found pixel shift s' maps back as
    # s = R(theta_c) s'. Round 3: the deltas are small (<= span/2), so the
    # fan rotates via three center-parameterized shears DIRECTLY on the
    # (pad_f, pad_f) FFT canvas - no 2x wrap-safe canvas, no separate
    # zero-pad pass (measured: the shared fan cost dominated K=1 staged
    # registration before this).
    # 0-centered fan: linspace(-half, half, rf) omits delta=0 for even rf
    # (the coarse estimate itself would be excluded from its own fine fan)
    # and yields [-half] for rf=1; this form always contains 0, and for
    # odd rf (the default 11) is identical to the linspace.
    deltas = (jnp.arange(rf) - rf // 2) * (half / max(rf // 2, 1))
    fa = max(int(cfg.fine_argmax_downsample), 0)
    two_stage = fa > 1
    if two_stage:
        # Two-stage fine (serving preset): the delta-fan's ONLY job is the
        # yaw argmax, so run the whole fan + its correlation at an extra
        # /fa downsample (4x cheaper at fa=2), then score/pose the winner
        # with ONE full-(theta_c+delta*) rotation of the query against the
        # UNROTATED db at the fine grid — exact peak, same score semantics,
        # and the shift needs no R(theta_c) remap (it is already in the db
        # frame). Shared cost: the /g2 fan; per candidate: one /g2 db
        # rotation + rf small irfft2 + one /g rotation + 3 FFTs.
        g2 = g * fa
        fq2 = _maxpool(occ_q, g2)
        sf2 = fq2.shape[-1]
        pad_f2 = _good_fft_size(sf2 + max(cfg.fine_pad_px // g2, 8))
        ffan2 = _fan_rfft2(fq2, deltas, pad_f2, float(half))
    else:
        ffan = _fan_rfft2(fq, deltas, pad_f, float(half))  # shared, all cands
        if cfg.overlap_norm:
            # rotated query SUPPORT fan (for the per-shift db mass):
            # low-overlap scoring normalizes by the occupancy masses inside
            # the overlap region (computed with two extra FFT correlations
            # against the rotated supports), with the min_overlap_pixels
            # floor applied per shift. Low-overlap true matches score by
            # overlap quality instead of overlap fraction.
            fsup = _fan_rfft2(jnp.ones((sf, sf)), deltas, pad_f, float(half))

    # ---- stage 1: batched coarse over all K ---------------------------
    def coarse_one(db_img):
        occ_db = _occupancy(db_img)
        cdb = _maxpool(occ_db, fr)
        tgt = jnp.zeros((pad_c, pad_c)).at[:sc_r, :sc_r].set(cdb)
        ft_db = jnp.fft.rfft2(tgt)
        norm = jax.lax.rsqrt(jnp.maximum(jnp.sum(cdb), 1.0))
        if fm:
            sig_db = _angular_signature(
                _maxpool(occ_db, f), cfg.fm_theta_bins)
            # circular θ-correlation (period π): peak at yaw mod π
            corr_t = jnp.sum(jnp.fft.irfft(
                fsig_q * jnp.fft.rfft(sig_db, axis=0),
                n=cfg.fm_theta_bins, axis=0), axis=-1)
            delta = jnp.argmax(corr_t) * (jnp.pi / cfg.fm_theta_bins)
            # |F| is centro-symmetric → 180° ambiguity; disambiguate (and
            # score) with a 2-rotation dense check at the pooled resolution
            two = _rotate_image_shear(cq_r, jnp.stack([delta, delta + jnp.pi]))
            two_p = jnp.zeros((2, pad_c, pad_c)).at[:, :sc_r, :sc_r].set(two)
            corr2 = jnp.fft.irfft2(
                jnp.conj(jnp.fft.rfft2(two_p)) * ft_db[None],
                s=(pad_c, pad_c))
            r2, _, _, peak_c = _peak(corr2, pad_c)
            theta_c = delta + r2.astype(jnp.float32) * jnp.pi
        else:
            corr_c = jnp.fft.irfft2(fr_c * ft_db[None], s=(pad_c, pad_c))
            r_c, _, _, peak_c = _peak(corr_c, pad_c)
            theta_c = angles_c[r_c]
        # score normalized for cross-candidate ranking (stage 2)
        return theta_c, peak_c * norm

    thetas_c, coarse_scores = jax.lax.map(
        coarse_one, db_images,
        batch_size=min(4 if (fr <= 4 and not fm) else 16, k_cand))

    # ---- stage 2: candidate selection ---------------------------------
    prune = 0 < cfg.fine_top_f < k_cand
    if prune:
        _, sel = jax.lax.top_k(coarse_scores, cfg.fine_top_f)
        sel = jnp.sort(sel)  # keep candidate order inside the fine stage
    else:
        sel = jnp.arange(k_cand)

    # ---- stage 3: fine registration per selected candidate ------------
    def fine_one(db_img, db_origin, theta_c):
        occ_db = _occupancy(db_img)
        fdb = _maxpool(occ_db, g) if g > 1 else occ_db
        nf_db = jnp.sum(fdb)
        if two_stage:
            # yaw argmax at /g2: rotate the /g2 db by -theta_c, correlate
            # against the shared /g2 fan, keep ONLY the rotation index
            fdb2 = _maxpool(occ_db, g2)
            db2_rot = _rotate_image_shear(fdb2, -theta_c[None])[0]
            tgt2 = jnp.zeros((pad_f2, pad_f2)).at[:sf2, :sf2].set(db2_rot)
            corr2 = jnp.fft.irfft2(
                ffan2 * jnp.fft.rfft2(tgt2)[None], s=(pad_f2, pad_f2))
            r2 = jnp.argmax(jnp.max(corr2.reshape(rf, -1), axis=-1))
            theta_w = theta_c + deltas[r2]
            # final: ONE full-theta rotation of the query at /g against the
            # UNROTATED db — exact peak/score/pose at the fine grid, and
            # the found shift is already in the db frame (no remap)
            qrot = _rotate_image_shear(fq, theta_w[None])[0]
            src = jnp.zeros((pad_f, pad_f)).at[:sf, :sf].set(qrot)
            f_src = jnp.conj(jnp.fft.rfft2(src))
            tgt_f = jnp.zeros((pad_f, pad_f)).at[:sf, :sf].set(fdb)
            ft_db = jnp.fft.rfft2(tgt_f)
            corr_f = jnp.fft.irfft2(f_src * ft_db, s=(pad_f, pad_f))[None]
            thetas_r = theta_w[None]
            shift_mat = jnp.eye(2)
        else:
            db_rot = _rotate_image_shear(fdb, -theta_c[None])[0]
            tgt_f = jnp.zeros((pad_f, pad_f)).at[:sf, :sf].set(db_rot)
            ft_db = jnp.fft.rfft2(tgt_f)
            corr_f = jnp.fft.irfft2(ffan * ft_db[None], s=(pad_f, pad_f))
            thetas_r = theta_c + deltas
            ctc, stc = jnp.cos(theta_c), jnp.sin(theta_c)
            shift_mat = jnp.array([[ctc, -stc], [stc, ctc]])
        if cfg.overlap_norm:
            # per-shift masses inside the overlap region: db occupancy under
            # the rotated query support, and query occupancy under the
            # (rotated) db support; NCC = corr / sqrt(m_q * m_db), shifts
            # with overlap mass below the floor are masked out.
            if two_stage:
                # db is unrotated here: its support is the [0, sf)^2 box;
                # the query support rotates by the full winning theta
                box = jnp.zeros((pad_f, pad_f)).at[:sf, :sf].set(1.0)
                q_sup = _rotate_image_shear(
                    jnp.ones_like(fq), thetas_r)[0]
                sup_p = jnp.zeros((pad_f, pad_f)).at[:sf, :sf].set(q_sup)
                m_q = jnp.fft.irfft2(
                    f_src * jnp.fft.rfft2(box), s=(pad_f, pad_f))[None]
                m_db = jnp.fft.irfft2(
                    jnp.conj(jnp.fft.rfft2(sup_p)) * ft_db,
                    s=(pad_f, pad_f))[None]
            else:
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
            # the ratio is a full extra max over the correlation volume —
            # only pay for it when its gate is enabled
            ratio = (_peak_ratio(score_map, ncc_peak, dy, dx, pad_f)
                     if cfg.min_peak_ratio > 0.0 else jnp.float32(0.0))
        else:
            r_f, dy, dx, peak = _peak(corr_f, pad_f)
            ncc_peak = None
            ratio = (_peak_ratio(corr_f, peak, dy, dx, pad_f)
                     if cfg.min_peak_ratio > 0.0 else jnp.float32(0.0))
        theta = thetas_r[r_f]

        c = (sf - 1) / 2.0
        ct, st = jnp.cos(theta), jnp.sin(theta)
        rot_mat = jnp.array([[ct, -st], [st, ct]])
        center = jnp.array([c, c]) * res_f
        shift = shift_mat @ (jnp.array([dx, dy], jnp.float32) * res_f)
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

    res_sel: MatchResult = jax.lax.map(
        lambda args: fine_one(*args),
        (db_images[sel], db_origins[sel], thetas_c[sel]),
    )
    if not prune:
        return res_sel

    # ---- stage 4: scatter fine results back to the K candidate lanes --
    defaults = MatchResult(
        xy_yaw=jnp.zeros((k_cand, 3)),
        score=jnp.zeros((k_cand,)),
        overlap=jnp.zeros((k_cand,)),
        success=jnp.zeros((k_cand,), bool),
        scale=jnp.ones((k_cand,)),
        ratio=jnp.zeros((k_cand,)),
    )
    return MatchResult(*(d.at[sel].set(v) for d, v in zip(defaults, res_sel)))


def _occupancy(img: Array) -> Array:
    """BEV image (free=1, occupied=0) → binary occupancy (occupied=1)."""
    return (img < 0.5).astype(jnp.float32)


def _shear_x_fft(img: Array, s: Array, center: Array | float | None = None,
                 ) -> Array:
    """Shift row y by s·(y−c) along x via FFT phase (subpixel, circular).

    ``center`` overrides the shear center row (defaults to the array's own
    middle) — used when the image is embedded top-left in a larger FFT
    canvas but must rotate about its OWN center."""
    n = img.shape[-1]
    # materialize a row-major input: callers shear transposed views, and the
    # XLA:CPU fft thunk RET_CHECKs on non-dim0-major layouts (the barrier is
    # layout-neutral on TPU, where the FFT accepts any layout)
    img = jax.lax.optimization_barrier(img)
    f = jnp.fft.rfft(img, axis=-1)
    k = jnp.arange(n // 2 + 1)
    cy = (img.shape[-2] - 1) / 2.0 if center is None else center
    y = jnp.arange(img.shape[-2]) - cy
    phase = jnp.exp(
        (-2j * jnp.pi / n) * k[None, :] * (s * y)[:, None]
    ).astype(jnp.complex64)
    return jnp.fft.irfft(f * phase, n=n, axis=-1)


def _fan_rfft2(img: Array, angles: Array, pad: int, max_abs: float) -> Array:
    """``conj(rfft2(`` small-angle rotation fan ``))`` with the shear FFTs
    fused into the correlation FFT → (R, pad, pad//2+1) complex64.

    Semantically `_rotate_small_padded` followed by ``conj(rfft2(…))``, but
    the round-trip FFT passes between the three shears and the final
    ``rfft2`` collapse: the first shear's row FFT IS the shared canvas rFFT
    (computed once for all angles), and the third shear's phase multiply
    happens directly on the correlation rFFT's row transform — 5 one-axis
    FFT passes per angle instead of 8, plus one shared. Differences from
    the unfused pair (both benign, covered by the equivalence test):

    - the wrap guard applies after shear 2 (rows are final there) with the
      column guard shrunk by shear 3's max drift ``tan(max_abs/2)·S/2`` —
      this makes circular wrap IMPOSSIBLE (nothing lives within drift
      distance of the canvas edge when shear 3 runs) where the unfused
      version merely zeroed it afterwards;
    - no [0, 1] clip of sinc ringing (the clip lived between rotation and
      FFT; ringing is zero-mean and the correlation integrates over it).
    """
    s = img.shape[-1]
    n = pad
    canvas = jnp.zeros((pad, pad), jnp.float32).at[:s, :s].set(img)
    c = (s - 1) / 2.0
    guard = s + (pad - s) // 2
    drift3 = int(math.ceil(math.tan(max_abs / 2.0) * (s / 2.0))) + 1
    row_ok = jnp.arange(pad) < guard
    col_ok = jnp.arange(pad) < (guard - drift3)
    keep = (row_ok[:, None] & col_ok[None, :]).astype(jnp.float32)
    k = jnp.arange(n // 2 + 1)
    y = jnp.arange(pad, dtype=jnp.float32) - c
    canvas = jax.lax.optimization_barrier(canvas)  # row-major for XLA:CPU fft
    z0 = jnp.fft.rfft(canvas, axis=-1)             # shared across angles

    def one(theta):
        a = -jnp.tan(theta / 2.0)
        b = jnp.sin(theta)
        ph_a = jnp.exp(
            (-2j * jnp.pi / n) * k[None, :] * (a * y)[:, None]
        ).astype(jnp.complex64)
        ph_b = jnp.exp(
            (-2j * jnp.pi / n) * k[:, None] * (b * y)[None, :]
        ).astype(jnp.complex64)
        y1 = jnp.fft.irfft(ph_a * z0, n=n, axis=-1)       # shear 1
        z2 = jnp.fft.rfft(y1, axis=0)
        y2 = jnp.fft.irfft(ph_b * z2, n=n, axis=0) * keep  # shear 2 + guard
        z3 = jnp.fft.rfft(y2, axis=-1)
        return jnp.conj(jnp.fft.fft(ph_a * z3, axis=0))    # shear 3 ∘ rfft2

    return jax.vmap(one)(angles)


def _rotate_small_padded(img: Array, angles: Array, pad: int) -> Array:
    """Rotate (S, S) image by SMALL angles about its own center, directly on
    a (pad, pad) zero canvas (top-left embed) → (R, pad, pad).

    The three-shear decomposition without the 2× wrap-safe canvas of
    `_rotate_image_shear`: for |θ| ≤ ~20° content drifts at most
    ~sin(θ)·S/2 pixels, far inside the FFT pad margin, so the rotation and
    the correlation zero-pad share one canvas (the fine δ-fan's case —
    measured on v5e, this halves the shared fan cost at 768²). A guard band
    in the outer half of the margin is zeroed after the shears so the
    (tiny) circularly-wrapped residue from rows/cols near the image edge
    cannot correlate; genuine drift content inside the inner margin is
    kept. Same output convention as `_rotate_image_shear` (clip to [0, 1]).
    """
    s = img.shape[-1]
    canvas = jnp.zeros((pad, pad), img.dtype).at[:s, :s].set(img)
    c = (s - 1) / 2.0
    guard = s + (pad - s) // 2
    row_ok = (jnp.arange(pad) < guard)
    keep = (row_ok[:, None] & row_ok[None, :]).astype(img.dtype)

    def one(theta):
        a = -jnp.tan(theta / 2.0)
        b = jnp.sin(theta)
        out = _shear_x_fft(canvas, a, c)
        out = _shear_x_fft(out.T, b, c).T
        out = _shear_x_fft(out, a, c)
        return jnp.clip(out * keep, 0.0, 1.0)

    return jax.vmap(one)(angles)


def _rotate_image_shear(img: Array, angles: Array) -> Array:
    """Rotate (S, S) image by each angle about its center → (R, S, S).

    Gather-free: exact 90° steps by jnp.rot90 + the residual (|θ| ≤ 45°) as
    the classic three-shear decomposition, each shear an FFT phase multiply.
    MEASURED on v5e: 45× faster than the bilinear-gather rotation (XLA TPU
    gathers cost ~100M rows/s; FFTs are dense). To avoid circular-wrap
    artifacts the image is embedded centered in a √2-sized canvas, rotated,
    and cropped back — content leaving the frame is lost exactly as with
    the gather version's out-of-bounds zeros. √2 (not 2×) suffices: with
    |residual| ≤ 45° every shear intermediate stays inside the rotated
    bounding box (shear 1: |x+tan(θ/2)·y| ≤ √2·S/2; shear 2 lands on the
    final y; shear 3 on the final x — all ≤ √2·S/2), which at S=384 makes
    each FFT pass ~45 % cheaper than the 2× canvas.
    """
    s = img.shape[-1]
    pad = _good_fft_size(int(math.ceil(s * math.sqrt(2.0))) + 2)
    while (pad - s) % 2:  # exact center alignment needs even (pad − s)
        pad = _good_fft_size(pad + 1)
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


def _polar_weights(s: int, t_bins: int, r_min: int):
    """Static bilinear polar-resampling weights over a (s, s//2+1) rFFT
    magnitude → (RowW (P, s), ColW (P, s//2+1)) with P = t_bins · n_radii.

    The sample geometry is compile-time static, so the resample becomes one
    MXU matmul (RowW @ mag) + a weighted column reduce instead of a 4-tap
    element gather — measured ~10× faster on v5e (XLA TPU gathers are slow;
    dense matmuls are free at this size).
    """
    import numpy as np

    theta = (np.arange(t_bins, dtype=np.float64) + 0.5) * np.pi / t_bins
    radii = np.arange(r_min, s // 2, dtype=np.float64)
    kx = radii[None, :] * np.cos(theta)[:, None]
    ky = radii[None, :] * np.sin(theta)[:, None]
    flip = kx < 0                                     # |F(-k)| = |F(k)|
    kx = np.where(flip, -kx, kx)
    ky = np.where(flip, -ky, ky)
    row = np.mod(ky, s)                               # signed freq → row
    r0 = np.floor(row).astype(np.int64)
    c0 = np.floor(kx).astype(np.int64)
    fr_ = (row - r0).ravel()
    fc = (kx - c0).ravel()
    p = t_bins * len(radii)
    i = np.arange(p)
    row_w = np.zeros((p, s), np.float32)
    row_w[i, (r0 % s).ravel()] += 1.0 - fr_
    row_w[i, ((r0 + 1) % s).ravel()] += fr_
    col_w = np.zeros((p, s // 2 + 1), np.float32)
    col_w[i, np.clip(c0, 0, s // 2).ravel()] += 1.0 - fc
    col_w[i, np.clip(c0 + 1, 0, s // 2).ravel()] += fc
    return row_w, col_w, len(radii)


def _angular_signature(img: Array, t_bins: int, r_min: int = 3) -> Array:
    """Rotation signature for Fourier-Mellin coarse estimation → (T, R).

    Polar resampling of the magnitude spectrum: |F| is invariant to image
    translation and rotates with the image, so a rotation by θ circularly
    shifts this signature by θ along its first axis (period π — |F| of a
    real image is centro-symmetric, hence the caller's 180° disambiguation
    step). A circular Hann window suppresses the frame-edge spectral cross;
    the per-radius mean over θ is removed (DC carries no rotation signal)
    and radii are weighted linearly (outer rings carry the fine angular
    detail). The resample itself is a static-weight matmul (_polar_weights)
    rather than a gather.
    """
    s = img.shape[-1]
    c = (s - 1) / 2.0
    yy = jnp.arange(s, dtype=jnp.float32) - c
    rad = jnp.sqrt(yy[:, None] ** 2 + yy[None, :] ** 2)
    win = jnp.where(
        rad <= s / 2.0, 0.5 * (1.0 + jnp.cos(jnp.pi * rad / (s / 2.0))), 0.0)
    mag = jnp.abs(jnp.fft.rfft2(img * win))          # (s, s//2 + 1)

    row_w, col_w, n_rad = _polar_weights(s, t_bins, r_min)
    interp = jax.lax.dot_general(
        jnp.asarray(row_w), mag, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (P, s//2+1) on the MXU
    sig = jnp.sum(interp * jnp.asarray(col_w), axis=-1).reshape(t_bins, n_rad)
    sig = sig - jnp.mean(sig, axis=0, keepdims=True)
    radii = jnp.arange(r_min, s // 2, dtype=jnp.float32)
    return sig * (radii / radii[-1])[None, :]


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
