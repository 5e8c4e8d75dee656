"""Correlative scan-to-grid matching (FastCorrelativeScanMatcher2D parity).

The reference implements Olson real-time correlative scan matching with a
branch-and-bound search over a sliding-window-max pyramid
(fast_correlative_scan_matcher_2d.cpp): score(θ, t) = mean of grid
probabilities at the transformed scan points, maximized over a (linear ×
angular) window; MatchFullSubmap searches 360° over the whole grid
(:248-268).

TPU redesign: branch-and-bound is pointer-chasing; exhaustive evaluation is
a batched FFT. Scatter the θ-rotated scan into a count image O_θ, then

    score(θ, t) · N = Σ_i P[cell(R_θ p_i) + t] = (O_θ ⋆ P)(t)

one circular cross-correlation per rotation — exact (every candidate
evaluated, the BnB optimum by construction), and the rotation axis batches.
The sliding-window-max pyramid (``max_pyramid``) is still provided for
capability parity and for callers that want upper-bound filtering.

Angular step follows the reference's Olson bound (correlative_scan_matcher_
2d.cpp SearchParameters): δθ = acos(1 − res²/(2·d_max²)), guaranteeing ≤ one
cell of motion at the scan's max range between adjacent rotations.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gloc3d_tpu.ops.occupancy import ProbabilityGrid2D

Array = jax.Array

# Max rotations per batched-FFT call. The TPU's batched FFT kernel loses
# accuracy above a batch threshold: measured on-chip, ~8-count errors at
# batch ≥64 for pad 768/2048 and ≥128 for pad 1152, ~1.3-1.7-count errors
# at batch ~2400 even for small pads (192/288), while every shape probed
# at batch ≤48 is accurate to ≤4e-4 counts vs a float64 direct sum. Raise
# only with a new on-chip error probe (tests/test_scan_match_fast.py
# calibration pins the CPU floor; tools/bench_submap.py --olson re-checks
# fast==exhaustive equality on chip).
_FFT_SAFE_BATCH = 48


class ScanMatchResult(NamedTuple):
    pose: Array    # (3,) [x, y, theta] metric pose of the scan in grid frame
    score: Array   # () mean probability at matched points ∈ [0, 1]


def olson_angular_step(resolution: float, max_scan_range: float) -> float:
    """Angular discretization with sub-cell guarantee
    (correlative_scan_matcher_2d.cpp:47-51)."""
    return math.acos(
        max(1.0 - resolution**2 / (2.0 * max_scan_range**2), -1.0)
    )


def max_pyramid(grid_probs: Array, depths: Sequence[int] = (1, 2, 4, 8, 16)
                ) -> Tuple[Array, ...]:
    """Sliding-window maxima (PrecomputationGrid2D, fast_...cpp:112-190).

    Level w holds, at each cell, the max probability over the w×w window
    anchored there — the admissible upper bound BnB expands against. Window
    w, stride 1, same shape (edges padded with 0/unknown).
    """
    out = []
    for w in depths:
        if w == 1:
            out.append(grid_probs)
            continue
        out.append(
            jax.lax.reduce_window(
                grid_probs, -jnp.inf, jax.lax.max,
                window_dimensions=(w, w), window_strides=(1, 1),
                padding=((0, w - 1), (0, w - 1)),
            )
        )
    return tuple(out)


def _scatter_counts(points: Array, valid: Array, size: int,
                    out_size: Optional[int] = None) -> Array:
    """Scatter 2-D cell indices (already image-frame) into a count image.

    ``out_size`` ≥ size scatters straight into the FFT-padded frame (cells
    stay in [0, size); the pad ring stays zero) — saves the pad copy.
    """
    if out_size is None:
        out_size = size
    rows = points[:, 1]
    cols = points[:, 0]
    inb = valid & (rows >= 0) & (rows < size) & (cols >= 0) & (cols < size)
    flat = jnp.where(inb, rows * out_size + cols, out_size * out_size)
    img = jnp.zeros((out_size * out_size + 1,), jnp.float32).at[flat].add(
        jnp.where(inb, 1.0, 0.0)
    )
    return img[: out_size * out_size].reshape(out_size, out_size)


def match_scan(
    grid: ProbabilityGrid2D,
    points_xy: Array,
    mask: Array,
    num_rotations: int = 256,
    angular_center: float = 0.0,
    angular_halfwidth: float = math.pi,
    pad: Optional[int] = None,
    rotation_chunk: Optional[int] = None,
) -> ScanMatchResult:
    """Find the (x, y, θ) placing the scan at maximum mean grid probability.

    Full-window search (MatchFullSubmap semantics) when angular_halfwidth=π;
    narrow both with ``angular_center``/``angular_halfwidth`` for local
    matching (Match semantics). points_xy are metric scan-frame (N, 2).

    Alias-free translation range: the circular FFT is exact (zero wrapped
    mass) for |t| ≤ size/2 cells per axis — the decode window. In the band
    size/2 < |t| ≤ pad − size (= size/2 at the default pad = 1.5·size) the
    decoded shift is unique but the circular score can include wrapped
    probability mass, inflating scores for scans hanging far off-grid.
    Matches whose translation lands within half the grid (every realistic
    submap query: the scan overlaps the map) are exact. Raise ``pad`` to
    2·size − 1 for full-range exactness.

    ``rotation_chunk``: process rotations in lax.map chunks of this size,
    keeping only per-rotation maxima between chunks — same optimum, peak
    memory ∝ chunk instead of ∝ R. The default ``_FFT_SAFE_BATCH`` (32) is
    a NUMERICS bound, not just memory: the TPU's batched-FFT kernel drops
    to ~bf16 effective precision above a batch threshold (measured on
    chip: ≤48 exact at pad 768, ≤64 exact at pads 1024/1152, ~7–8-count
    errors at batch 64/pad 768, batch 128/pad 1152, and batch 64/pad 2048
    — i.e. the cliff is batch-dependent and hits power-of-two sizes too).
    Chunking at 32 keeps every probed shape in the exact regime; the
    decoded pose is additionally RE-SCORED by an exact gather, so the
    returned score never carries FFT round-off regardless of platform.
    """
    res = grid.resolution
    h, w = grid.log_odds.shape
    assert h == w, "square grids only"
    size = h
    probs = grid.probabilities()
    n_valid = jnp.maximum(jnp.sum(mask > 0), 1.0)

    if pad is None:
        pad = size + size // 2
    if rotation_chunk is None:
        rotation_chunk = _FFT_SAFE_BATCH
    thetas = angular_center + jnp.linspace(
        -angular_halfwidth, angular_halfwidth, num_rotations, endpoint=False
    )

    ft = jnp.fft.rfft2(
        jnp.zeros((pad, pad)).at[:size, :size].set(probs)
    )

    def cells(theta):
        c, s = jnp.cos(theta), jnp.sin(theta)
        x = c * points_xy[:, 0] - s * points_xy[:, 1]
        y = s * points_xy[:, 0] + c * points_xy[:, 1]
        # grid cell of a metric point: round((p - origin)/res)
        col = jnp.round((x - grid.origin_xy[0]) / res).astype(jnp.int32)
        row = jnp.round((y - grid.origin_xy[1]) / res).astype(jnp.int32)
        return col, row

    def rotate_counts(theta):
        col, row = cells(theta)
        return _scatter_counts(
            jnp.stack([col, row], 1), mask > 0, size, out_size=pad
        )

    if rotation_chunk >= num_rotations:
        cp = jax.vmap(rotate_counts)(thetas)  # (R, pad, pad), ring zero
        corr = jnp.fft.irfft2(jnp.conj(jnp.fft.rfft2(cp)) * ft[None],
                              s=(pad, pad))  # (R, pad, pad)
        flat = corr.reshape(num_rotations, -1)
        best_per_rot = jnp.max(flat, axis=-1)
        amax_per_rot = jnp.argmax(flat, axis=-1)
    else:
        chunk = rotation_chunk
        nchunk = -(-num_rotations // chunk)
        # pad the rotation axis with repeats of θ₀; masked to -inf below
        th_pad = jnp.concatenate(
            [thetas,
             jnp.full((nchunk * chunk - num_rotations,), thetas[0])])
        valid_rot = (jnp.arange(nchunk * chunk) < num_rotations)

        def one_chunk(args):
            th_c, val_c = args
            cp = jax.vmap(rotate_counts)(th_c)  # (chunk, pad, pad)
            corr = jnp.fft.irfft2(
                jnp.conj(jnp.fft.rfft2(cp)) * ft[None], s=(pad, pad))
            flat_c = corr.reshape(chunk, -1)
            best = jnp.where(val_c, jnp.max(flat_c, axis=-1), -jnp.inf)
            return best, jnp.argmax(flat_c, axis=-1)

        best_per_rot, amax_per_rot = jax.lax.map(
            one_chunk,
            (th_pad.reshape(nchunk, chunk),
             valid_rot.reshape(nchunk, chunk)))
        best_per_rot = best_per_rot.reshape(-1)[:num_rotations]
        amax_per_rot = amax_per_rot.reshape(-1)[:num_rotations]

    r = jnp.argmax(best_per_rot)
    amax = amax_per_rot[r]
    dy = amax // pad
    dx = amax % pad
    dy = jnp.where(dy > pad // 2, dy - pad, dy)
    dx = jnp.where(dx > pad // 2, dx - pad, dx)
    # exact re-score of the decoded pose (same objective as the FFT: points
    # whose UNtranslated cell is in-grid, translated off-grid reads 0) —
    # one N-point gather, removes FFT round-off from the reported score
    col, row = cells(thetas[r])
    un_inb = ((mask > 0) & (row >= 0) & (row < size)
              & (col >= 0) & (col < size))
    rowt, colt = row + dy, col + dx
    inb = (un_inb & (rowt >= 0) & (rowt < size)
           & (colt >= 0) & (colt < size))
    flat_idx = jnp.clip(rowt * size + colt, 0, size * size - 1)
    raw = jnp.sum(jnp.where(inb, probs.reshape(-1)[flat_idx], 0.0))
    score = raw / n_valid
    # shift (dx, dy) moves the scatter image onto the grid: translation in
    # metric = shift · res (both images share grid.origin)
    pose = jnp.array(
        [dx.astype(jnp.float32) * res, dy.astype(jnp.float32) * res,
         thetas[r]]
    )
    return ScanMatchResult(pose, score)


def match_scan_fast(
    grid: ProbabilityGrid2D,
    points_xy: Array,
    mask: Array,
    num_rotations: int = 256,
    angular_center: float = 0.0,
    angular_halfwidth: float = math.pi,
    coarse_factor: int = 4,
    num_candidates: int = 128,
    certificate_slack: float = 0.05,
) -> Tuple[ScanMatchResult, Array]:
    """Coarse-to-fine ``match_scan``: same optimum, ~``coarse_factor²``×
    cheaper FFTs.

    The reference prunes with a sliding-window-max pyramid inside BnB
    (fast_correlative_scan_matcher_2d.cpp:112-190 PrecomputationGrid2D;
    :192-246 BranchAndBound). Pointer-chasing BnB does not map to the TPU,
    but the *bound* does, batched:

    1. coarse bound level: ``Pmax[Q] = max P`` over the 2f×2f fine window
       anchored at f·Q (reduce_window, stride f). For a point at fine cell
       c = f·q + e (e ∈ [0,f)²) and a translation t = f·T + s (s ∈ [0,f)²),
       e + s ∈ [0, 2f)², so Σᵢ Pmax[qᵢ + T] ≥ score·N for EVERY fine t in
       coarse cell T — an admissible upper bound, computed for all (θ, T)
       at once by the same FFT correlation as ``match_scan`` but on a grid
       f× smaller per side (FFT cost ÷ f², typically ÷16).
    2. expand the ``num_candidates`` best (θ, T) cells: evaluate the EXACT
       score at each of their f² fine translations with a batched gather
       (K·f²·N probability reads — cheap next to the full-size FFT).

    Returns ``(result, certificate)``: certificate is True when the best
    fine score is within ``certificate_slack`` (unnormalized counts) of the
    best *unexpanded* coarse bound — i.e. the result's score is provably
    within slack of the global optimum (what BnB guarantees by
    construction). The slack absorbs FFT round-off only: measured fp32
    max |FFT − direct sum| is ≤ 4e-4 counts at 768²/4096 points (see
    tests/test_scan_match_fast.py::test_certificate_slack_calibration), so
    the default 0.05 is a >100× margin yet ~1e-5 relative at serving
    magnitudes — a certified result is the global optimum up to a
    0.05-count score tie. The default K=128 certifies the dense random
    maps in tests; grids whose free space is mostly *known* (p=0.1
    carpet) make the bound loose, so a False certificate flags that the
    caller should fall back to ``match_scan`` — ``match_full_submap``
    below wires exactly that policy. Alias-free translation range is the
    same |t| ≤ size/2 band as ``match_scan`` (the coarse circular FFT can
    wrap for larger |t|; the inflated bounds then drop the certificate to
    False rather than certify a wrong pose, and the exact fine gather
    always uses true zero-out-of-grid semantics).
    """
    thetas = angular_center + jnp.linspace(
        -angular_halfwidth, angular_halfwidth, num_rotations, endpoint=False
    )
    pose, raw, unexpanded_bound, n_valid = _match_fast_core(
        grid, points_xy, mask, thetas, coarse_factor, num_candidates)
    # FFT round-off can lift a bound by ≤4e-4 counts (measured, docstring);
    # the absolute slack certifies "global optimum up to a slack-count tie"
    certificate = raw >= unexpanded_bound - certificate_slack
    return ScanMatchResult(pose, raw / n_valid), certificate


def _match_fast_core(
    grid: ProbabilityGrid2D,
    points_xy: Array,
    mask: Array,
    thetas: Array,
    coarse_factor: int,
    num_candidates: int,
) -> Tuple[Array, Array, Array, Array]:
    """Coarse-bound FFT + top-K exact expansion over an explicit rotation
    set. Returns (pose, raw best score in counts, best unexpanded bound,
    n_valid) — the pieces ``match_scan_fast`` assembles into a certificate,
    exposed separately so the rotation axis can be sharded over a device
    mesh (``match_scan_fast_sharded``: each shard handles its θ slice and
    the merge is a max over shards)."""
    res = grid.resolution
    h, w = grid.log_odds.shape
    assert h == w, "square grids only"
    size = h
    f = coarse_factor
    size_c = (size - 1) // f + 1
    pad_c = size_c + size_c // 2
    probs = grid.probabilities()
    n_valid = jnp.maximum(jnp.sum(mask > 0), 1.0)
    num_rotations = thetas.shape[0]

    # coarse bound grid: max over the 2f×2f fine window anchored at f·Q,
    # for Q ∈ [-1, size_c) — Q = -1 is reachable (q + T = -1 with
    # e + s ≥ f still lands in-grid), so the grid is extended one coarse
    # cell on the negative side by pre-padding f zero rows/cols; the
    # correlation index then carries a +1 offset, removed at decode.
    pmax = jax.lax.reduce_window(
        jnp.pad(probs, ((f, 0), (f, 0))), -jnp.inf, jax.lax.max,
        window_dimensions=(2 * f, 2 * f), window_strides=(f, f),
        padding=((0, 2 * f - 1), (0, 2 * f - 1)),
    )
    pmax = jnp.maximum(pmax, 0.0)  # -inf never survives, but be safe
    ft_c = jnp.fft.rfft2(
        jnp.zeros((pad_c, pad_c)).at[: size_c + 1, : size_c + 1].set(pmax)
    )

    def cells(theta):
        c, s = jnp.cos(theta), jnp.sin(theta)
        x = c * points_xy[:, 0] - s * points_xy[:, 1]
        y = s * points_xy[:, 0] + c * points_xy[:, 1]
        col = jnp.round((x - grid.origin_xy[0]) / res).astype(jnp.int32)
        row = jnp.round((y - grid.origin_xy[1]) / res).astype(jnp.int32)
        return col, row

    def coarse_counts(theta):
        col, row = cells(theta)
        # same drop rule as match_scan: points whose untranslated fine cell
        # is off-grid contribute nothing
        inb = (mask > 0) & (row >= 0) & (row < size) & (col >= 0) & (col < size)
        q = jnp.stack([col // f, row // f], 1)
        return _scatter_counts(q, inb, size_c, out_size=pad_c)

    # coarse FFT in _FFT_SAFE_BATCH chunks: the TPU batched-FFT kernel is
    # only bit-accurate below a batch threshold (see _FFT_SAFE_BATCH) and
    # the certificate leans on these bounds being within the documented
    # slack of exact
    if num_rotations <= _FFT_SAFE_BATCH:
        cp = jax.vmap(coarse_counts)(thetas)  # (R, pad_c, pad_c)
        bounds = jnp.fft.irfft2(jnp.conj(jnp.fft.rfft2(cp)) * ft_c[None],
                                s=(pad_c, pad_c))  # (R, pad_c, pad_c)
    else:
        chunk = _FFT_SAFE_BATCH
        nchunk = -(-num_rotations // chunk)
        th_pad = jnp.concatenate(
            [thetas,
             jnp.full((nchunk * chunk - num_rotations,), thetas[0])])
        valid_rot = (jnp.arange(nchunk * chunk) < num_rotations)

        def coarse_counts_v(theta, val):
            # padded rotations (val=False) scatter zero counts, so their
            # bounds are 0 and can never enter the top-K over real scores
            col, row = cells(theta)
            inb = ((mask > 0) & val & (row >= 0) & (row < size)
                   & (col >= 0) & (col < size))
            q = jnp.stack([col // f, row // f], 1)
            return _scatter_counts(q, inb, size_c, out_size=pad_c)

        def chunk_bounds(args):
            th_c, val_c = args
            cp = jax.vmap(coarse_counts_v)(th_c, val_c)
            return jnp.fft.irfft2(jnp.conj(jnp.fft.rfft2(cp)) * ft_c[None],
                                  s=(pad_c, pad_c))

        bounds = jax.lax.map(
            chunk_bounds,
            (th_pad.reshape(nchunk, chunk),
             valid_rot.reshape(nchunk, chunk)),
        ).reshape(nchunk * chunk, pad_c, pad_c)[:num_rotations]

    # hierarchical exact selection: lax.top_k over the full R·pad_c² bound
    # volume is O(n·k) on TPU (measured 67 ms at R=64 — slower than the
    # exhaustive matcher it replaces). Instead: per-block maxima → top-B
    # blocks → top-K cells of the pooled blocks; every top_k is small. Any
    # cell NOT selected is bounded by max(block_bound, pool_bound), so the
    # certificate (and therefore exactness-when-certified) is unchanged.
    flat_bounds = bounds.reshape(-1)
    block = 128
    nblk = -(-flat_bounds.shape[0] // block)
    flat_bounds = jnp.pad(flat_bounds,
                          (0, nblk * block - flat_bounds.shape[0]),
                          constant_values=-jnp.inf)
    blk_max = jnp.max(flat_bounds.reshape(nblk, block), axis=1)
    nb_sel = min(num_candidates, nblk)
    btop, bidx = jax.lax.top_k(blk_max, min(nb_sel + 1, nblk))
    block_bound = (btop[nb_sel] if nblk > nb_sel
                   else jnp.float32(-jnp.inf))  # unselected blocks ≤ this
    pool_idx = (bidx[:nb_sel, None] * block
                + jnp.arange(block)[None, :]).reshape(-1)
    pool = flat_bounds[pool_idx]
    ncand = min(num_candidates, pool.shape[0])
    top, pidx = jax.lax.top_k(pool, min(ncand + 1, pool.shape[0]))
    cand = pool_idx[pidx[:ncand]]
    pool_bound = (top[ncand] if pool.shape[0] > ncand
                  else jnp.float32(-jnp.inf))
    unexpanded_bound = jnp.maximum(pool_bound, block_bound)
    r_k = cand // (pad_c * pad_c)
    ty_c = (cand // pad_c) % pad_c
    tx_c = cand % pad_c
    ty_c = jnp.where(ty_c > pad_c // 2, ty_c - pad_c, ty_c) - 1
    tx_c = jnp.where(tx_c > pad_c // 2, tx_c - pad_c, tx_c) - 1

    # exact fine evaluation at the K candidates × f² fine translations
    col_k, row_k = jax.vmap(cells)(thetas[r_k])        # (K, N)
    w_k = ((mask > 0)[None]
           & (row_k >= 0) & (row_k < size)
           & (col_k >= 0) & (col_k < size))
    sy, sx = jnp.meshgrid(jnp.arange(f), jnp.arange(f), indexing="ij")
    ty = f * ty_c[:, None] + sy.reshape(-1)[None]      # (K, f²)
    tx = f * tx_c[:, None] + sx.reshape(-1)[None]
    rows_t = row_k[:, None, :] + ty[:, :, None]        # (K, f², N)
    cols_t = col_k[:, None, :] + tx[:, :, None]
    inb_t = (w_k[:, None, :]
             & (rows_t >= 0) & (rows_t < size)
             & (cols_t >= 0) & (cols_t < size))
    flat = jnp.clip(rows_t * size + cols_t, 0, size * size - 1)
    vals = jnp.where(inb_t, probs.reshape(-1)[flat], 0.0)
    scores = jnp.sum(vals, axis=-1)                    # (K, f²) unnormalized

    best = jnp.argmax(scores.reshape(-1))
    bk = best // (f * f)
    bs = best % (f * f)
    raw = scores.reshape(-1)[best]
    pose = jnp.array([
        tx[bk, bs].astype(jnp.float32) * res,
        ty[bk, bs].astype(jnp.float32) * res,
        thetas[r_k[bk]],
    ])
    return pose, raw, unexpanded_bound, n_valid


def match_scan_fast_sharded(
    mesh,
    grid: ProbabilityGrid2D,
    points_xy: Array,
    mask: Array,
    num_rotations: int = 256,
    angular_center: float = 0.0,
    angular_halfwidth: float = math.pi,
    coarse_factor: int = 4,
    num_candidates: int = 128,
    certificate_slack: float = 0.05,
    axis: str = None,
) -> Tuple[ScanMatchResult, Array]:
    """``match_scan_fast`` with the ROTATION axis sharded over a device
    mesh: each device scores its θ slice (coarse FFT + top-K expansion on
    its rotations only), the merge is one small all_gather + max.

    At the Olson-bound R (~1,570 rotations at 512²/0.2 m — the
    reference's own MatchFullSubmap guarantee) the coarse FFT batch
    dominates and is embarrassingly parallel over θ, so N chips cut
    full-submap relocalization ~N×. The certificate stays exact: every
    coarse cell lives in exactly one shard, so the global unexpanded
    bound is the max of per-shard bounds (each shard expands its own
    top-K, a superset of the single-device global top-K — the sharded
    matcher can only certify MORE often, never certify a worse result).
    """
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    if axis is None:
        axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    if num_rotations % n_dev:
        raise ValueError(
            f"num_rotations ({num_rotations}) must divide the mesh axis "
            f"({n_dev}); round up to a multiple")
    thetas = angular_center + jnp.linspace(
        -angular_halfwidth, angular_halfwidth, num_rotations, endpoint=False
    )

    def local(th_shard, lo, kn, org, pts, mk):
        g = ProbabilityGrid2D(lo, kn, org, grid.resolution)
        pose, raw, bound, n_valid = _match_fast_core(
            g, pts, mk, th_shard, coarse_factor, num_candidates)
        poses = jax.lax.all_gather(pose, axis)      # (n_dev, 3)
        raws = jax.lax.all_gather(raw, axis)        # (n_dev,)
        bounds = jax.lax.all_gather(bound, axis)
        i = jnp.argmax(raws)
        best_raw = raws[i]
        cert = best_raw >= jnp.max(bounds) - certificate_slack
        return poses[i], best_raw / n_valid, cert

    # outputs are value-replicated (every device computes the same merged
    # max) but shard_map's static replication checker cannot prove it
    # through all_gather+argmax — disable the check (check_vma on current
    # JAX, check_rep on older versions)
    specs = dict(mesh=mesh, in_specs=(P(axis), P(), P(), P(), P(), P()),
                 out_specs=(P(), P(), P()))
    try:
        fn = shard_map(local, check_vma=False, **specs)
    except TypeError:
        fn = shard_map(local, check_rep=False, **specs)
    pose, score, cert = fn(thetas, grid.log_odds, grid.known,
                           grid.origin_xy, points_xy, mask)
    return ScanMatchResult(pose, score), cert


def score_at(
    grid: ProbabilityGrid2D,
    points_xy: Array,
    mask: Array,
    pose: Array,
) -> Array:
    """Exact mean-probability score of the scan placed at ``pose`` (x, y, θ)
    — the quantity both matchers maximize, evaluated directly (gather, no
    FFT). Used by tests to accept score-equal pose ties and by callers to
    re-validate a match."""
    res = grid.resolution
    size = grid.log_odds.shape[0]
    probs = grid.probabilities()
    n_valid = jnp.maximum(jnp.sum(mask > 0), 1.0)
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    x = c * points_xy[:, 0] - s * points_xy[:, 1]
    y = s * points_xy[:, 0] + c * points_xy[:, 1]
    col = (jnp.round((x - grid.origin_xy[0]) / res).astype(jnp.int32)
           + jnp.round(pose[0] / res).astype(jnp.int32))
    row = (jnp.round((y - grid.origin_xy[1]) / res).astype(jnp.int32)
           + jnp.round(pose[1] / res).astype(jnp.int32))
    inb = ((mask > 0) & (row >= 0) & (row < size)
           & (col >= 0) & (col < size))
    flat = jnp.clip(row * size + col, 0, size * size - 1)
    vals = jnp.where(inb, probs.reshape(-1)[flat], 0.0)
    return jnp.sum(vals) / n_valid


class SubmapMatchResult(NamedTuple):
    pose: Array        # (3,) [x, y, theta]
    score: Array       # () mean probability
    certified: bool    # fast-path certificate (True ⇒ optimum, no fallback)
    used_fallback: bool


def match_full_submap(
    grid: ProbabilityGrid2D,
    points_xy: Array,
    mask: Array,
    num_rotations: Optional[int] = None,
    max_scan_range: float = 50.0,
    angular_center: float = 0.0,
    angular_halfwidth: float = math.pi,
    coarse_factor: int = 4,
    num_candidates: Optional[int] = None,
    fallback: str = "full",
    try_fast: Optional[bool] = None,
) -> SubmapMatchResult:
    """MatchFullSubmap with the certificate→fallback policy wired in
    (fast_correlative_scan_matcher_2d.cpp:248-268).

    ``num_candidates`` defaults to max(128, min(R, 2048)): at Olson-scale R
    the bound volume is dominated by near-duplicate θ bins of the same
    translation, so a fixed K=128 starves coarse-cell diversity and can
    miss the optimum (measured at R=2410 on the 512² submap: K=128 found a
    secondary peak 0.003 below the optimum, K=2048 found the optimum; the
    fine-expansion cost is linear in K and stays small next to the coarse
    FFT batch).

    ``try_fast`` (default auto = R ≤ 512): whether to attempt the
    certified fast path before the exhaustive program. Measured at the
    Olson bound (R=2410, tools/bench_submap.py --olson, round 5): on
    realistic mostly-known submaps the certificate held in 0/20 queries —
    the bound is structurally loose there — and the chunk-safe coarse FFT
    made fast 1.29 s vs exhaustive 1.07 s at 512², so attempting fast
    first only adds cost. At R ≤ 512 (local Match windows, sparse or
    synthetic maps) certificates do hold and fast wins ~4×. Exhaustive is
    exact either way; auto just avoids paying for a certificate that
    cannot hold.

    Runs ``match_scan_fast`` at the Olson-bound rotation count (δθ from
    ``olson_angular_step(resolution, max_scan_range)`` spanning the angular
    window — the reference's own sub-cell angular guarantee,
    correlative_scan_matcher_2d.cpp:47-51) and inspects the certificate on
    the host:

    - certified → the fast result IS the global optimum (up to the
      0.05-count score tie documented on ``match_scan_fast``); return it.
    - not certified → fall back:
        * ``fallback="full"`` (default): exhaustive ``match_scan`` over the
          same window — exact by construction, ~f²× the FFT cost.
        * ``fallback="theta"``: exhaustive ``match_scan`` restricted to the
          ±3·δθ neighborhood of the fast pose's θ — cheap, and re-scored:
          the better of (fast, neighborhood) results is returned. NOT
          certified exact (the true optimum could sit at a distant θ);
          use when latency matters more than the guarantee.
        * ``fallback="none"``: return the fast result, certified=False.

    Host-level policy (two cached jits), not a lax.cond: the fallback is
    rare and its program is f²× larger — compiling it into every call's
    graph would double compile time and HBM for the common path.
    """
    if num_rotations is None:
        step = olson_angular_step(grid.resolution, max_scan_range)
        num_rotations = max(1, int(math.ceil(2 * angular_halfwidth / step)))
    if num_candidates is None:
        num_candidates = max(128, min(num_rotations, 2048))
    if try_fast is None:
        try_fast = num_rotations <= 512
    if not try_fast:
        exact = _jit_match(grid, points_xy, mask, num_rotations,
                           angular_center, angular_halfwidth)
        return SubmapMatchResult(exact.pose, exact.score, False, True)
    fast, cert = _jit_match_fast(
        grid, points_xy, mask, num_rotations, angular_center,
        angular_halfwidth, coarse_factor, num_candidates)
    if bool(cert):
        return SubmapMatchResult(fast.pose, fast.score, True, False)
    if fallback == "none":
        return SubmapMatchResult(fast.pose, fast.score, False, False)
    if fallback == "theta":
        step = 2 * angular_halfwidth / num_rotations
        theta = float(fast.pose[2])
        nb = _jit_match(grid, points_xy, mask, 7, theta, 3.0 * step)
        better = float(nb.score) > float(fast.score)
        res = nb if better else fast
        return SubmapMatchResult(res.pose, res.score, False, True)
    if fallback != "full":
        raise ValueError(f"unknown fallback policy {fallback!r}")
    exact = _jit_match(grid, points_xy, mask, num_rotations,
                       angular_center, angular_halfwidth)
    return SubmapMatchResult(exact.pose, exact.score, False, True)


def _jit_match_fast(grid, points_xy, mask, num_rotations, angular_center,
                    angular_halfwidth, coarse_factor, num_candidates):
    fn = jax.jit(match_scan_fast,
                 static_argnames=("num_rotations", "angular_halfwidth",
                                 "coarse_factor", "num_candidates"))
    return fn(grid, points_xy, mask, num_rotations=num_rotations,
              angular_center=angular_center,
              angular_halfwidth=angular_halfwidth,
              coarse_factor=coarse_factor, num_candidates=num_candidates)


def _jit_match(grid, points_xy, mask, num_rotations, angular_center,
               angular_halfwidth):
    fn = jax.jit(match_scan,
                 static_argnames=("num_rotations", "angular_halfwidth"))
    return fn(grid, points_xy, mask, num_rotations=num_rotations,
              angular_center=angular_center,
              angular_halfwidth=angular_halfwidth)
