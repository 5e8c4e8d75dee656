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


def _scatter_counts(points: Array, valid: Array, size: int) -> Array:
    """Scatter 2-D cell indices (already image-frame) into a count image."""
    rows = points[:, 1]
    cols = points[:, 0]
    inb = valid & (rows >= 0) & (rows < size) & (cols >= 0) & (cols < size)
    flat = jnp.where(inb, rows * size + cols, size * size)
    img = jnp.zeros((size * size + 1,), jnp.float32).at[flat].add(
        jnp.where(inb, 1.0, 0.0)
    )
    return img[: size * size].reshape(size, size)


def match_scan(
    grid: ProbabilityGrid2D,
    points_xy: Array,
    mask: Array,
    num_rotations: int = 256,
    angular_center: float = 0.0,
    angular_halfwidth: float = math.pi,
    pad: Optional[int] = None,
) -> ScanMatchResult:
    """Find the (x, y, θ) placing the scan at maximum mean grid probability.

    Full-window search (MatchFullSubmap semantics) when angular_halfwidth=π;
    narrow both with ``angular_center``/``angular_halfwidth`` for local
    matching (Match semantics). points_xy are metric scan-frame (N, 2).
    """
    res = grid.resolution
    h, w = grid.log_odds.shape
    assert h == w, "square grids only"
    size = h
    probs = grid.probabilities()
    n_valid = jnp.maximum(jnp.sum(mask > 0), 1.0)

    if pad is None:
        pad = size + size // 2
    thetas = angular_center + jnp.linspace(
        -angular_halfwidth, angular_halfwidth, num_rotations, endpoint=False
    )

    ft = jnp.fft.rfft2(
        jnp.zeros((pad, pad)).at[:size, :size].set(probs)
    )

    def rotate_counts(theta):
        c, s = jnp.cos(theta), jnp.sin(theta)
        x = c * points_xy[:, 0] - s * points_xy[:, 1]
        y = s * points_xy[:, 0] + c * points_xy[:, 1]
        # grid cell of a metric point: round((p - origin)/res)
        col = jnp.round((x - grid.origin_xy[0]) / res).astype(jnp.int32)
        row = jnp.round((y - grid.origin_xy[1]) / res).astype(jnp.int32)
        return _scatter_counts(
            jnp.stack([col, row], 1), mask > 0, size
        )

    counts = jax.vmap(rotate_counts)(thetas)  # (R, S, S)
    cp = jnp.zeros((num_rotations, pad, pad)).at[:, :size, :size].set(counts)
    corr = jnp.fft.irfft2(jnp.conj(jnp.fft.rfft2(cp)) * ft[None],
                          s=(pad, pad))  # (R, pad, pad)

    flat = corr.reshape(num_rotations, -1)
    best_per_rot = jnp.max(flat, axis=-1)
    r = jnp.argmax(best_per_rot)
    amax = jnp.argmax(flat[r])
    dy = amax // pad
    dx = amax % pad
    dy = jnp.where(dy > pad // 2, dy - pad, dy)
    dx = jnp.where(dx > pad // 2, dx - pad, dx)
    score = best_per_rot[r] / n_valid
    # shift (dx, dy) moves the scatter image onto the grid: translation in
    # metric = shift · res (both images share grid.origin)
    pose = jnp.array(
        [dx.astype(jnp.float32) * res, dy.astype(jnp.float32) * res,
         thetas[r]]
    )
    return ScanMatchResult(pose, score)
