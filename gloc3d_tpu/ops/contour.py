"""Contour-blob virtual point clouds from BEV probability images.

The reference extracts registration clouds from prob images with OpenCV
(global_registration.cpp::get_scan_from_contours, :568-609): threshold →
3×3 erode → findContours → keep contours with area ∈ (min_area, H·W/4) →
fill each contour interior → interior pixels become metric points.

TPU-native redesign: contour tracing is inherently sequential, but the NET
effect — "pixels of solid occupied blobs whose component area is in range" —
is a connected-components problem, which maps to the hardware as iterative
label propagation: seed each occupied pixel with its own index, then
repeatedly min-pool labels over the 3×3 neighborhood (masked to occupancy).
Each sweep is one cheap vectorized pass; labels converge in O(blob diameter)
sweeps. Component areas then come from one scatter-add over labels.

Differences vs OpenCV, by design (documented parity deltas):
  * 8-connectivity (the reference's findContours default), erosion included;
  * a ring-shaped blob's hole is NOT filled (OpenCV's contour fill would
    fill it); solid blobs — the actual structures in BEV occupancy — match.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def erode3x3(binary: Array) -> Array:
    """3×3 binary erosion (cv::erode with a MORPH_RECT 3×3 element;
    outside-image reads as 0, so border pixels erode). The init value of
    reduce_window must be the reduction identity (+inf for min) — border
    semantics come from explicit zero padding."""
    padded = jnp.pad(binary, 1, constant_values=0.0)
    return jax.lax.reduce_window(
        padded, jnp.inf, jax.lax.min, (3, 3), (1, 1), "VALID"
    )


def connected_components(occupied: Array, num_sweeps: int | None = None
                         ) -> Array:
    """8-connected component labels by min-label propagation + pointer
    jumping.

    occupied: (H, W) {0,1}. Returns (H, W) int32: background = H·W (one past
    the largest pixel index), foreground pixels share their component's
    minimum flattened index.

    Each sweep min-pools labels over the 3×3 neighborhood (one pixel of
    propagation) and then hops each label to its labelee's current label
    (pointer jumping — path lengths roughly double per sweep), so snake-
    shaped blobs of diameter D converge in O(log D) sweeps instead of O(D).
    The default 2·ceil(log2(H·W)) + 4 sweeps is safely past convergence for
    any blob shape at these sizes.
    """
    h, w = occupied.shape
    bg = jnp.int32(h * w)
    idx = jnp.arange(h * w, dtype=jnp.int32)
    seed = jnp.where(occupied > 0.5, idx.reshape(h, w), bg)
    cap = num_sweeps if num_sweeps is not None else h * w  # convergence cap

    def jump(labels):
        # follow my label to ITS label (bg row appended so the background
        # index gathers safely)
        flat = jnp.concatenate([labels.reshape(-1), jnp.array([bg])])
        hopped = flat[labels.reshape(-1)].reshape(h, w)
        return jnp.where(occupied > 0.5, jnp.minimum(labels, hopped), bg)

    def body(state):
        i, labels, _ = state
        spread = jax.lax.reduce_window(
            labels, jnp.iinfo(jnp.int32).max, jax.lax.min, (3, 3), (1, 1),
            "SAME",
        )
        new = jnp.where(occupied > 0.5, jnp.minimum(labels, spread), bg)
        new = jump(jump(new))
        return i + 1, new, jnp.any(new != labels)

    def cond(state):
        i, _, changed = state
        return changed & (i < cap)

    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), seed, jnp.bool_(True))
    )
    return labels


def component_areas(labels: Array) -> Array:
    """Pixel count per label id (flat length H·W+1; index H·W = background)."""
    h, w = labels.shape
    return jnp.zeros(h * w + 1, jnp.int32).at[labels.reshape(-1)].add(1)


def contour_virtual_cloud(
    image: Array,            # (S, S) BEV prob image, free = 1.0
    origin_xy: Array,        # (2,) metric coordinate of pixel (0, 0)
    resolution,
    budget: int,
    min_area: int = 100,
    occupied_below: float = 0.5,
    num_sweeps: int | None = None,
) -> Tuple[Array, Array]:
    """Virtual metric point cloud from area-filtered occupied blobs.

    Pipeline (get_scan_from_contours parity): threshold → 3×3 erode →
    connected components → keep components with min_area < area < S²/4 →
    every surviving pixel center becomes a point. Static output via top-k
    selection behind a fixed pseudo-random permutation (uniform spatial
    subsample when over budget).

    Returns ((budget, 2) points, (budget,) validity).
    """
    s = image.shape[-1]
    occ = (image < occupied_below).astype(jnp.float32)
    occ = erode3x3(occ)
    labels = connected_components(occ, num_sweeps)
    areas = component_areas(labels)
    max_area = s * s // 4
    pix_area = areas[labels]
    keep = (
        (occ > 0.5) & (pix_area > min_area) & (pix_area < max_area)
    ).astype(jnp.float32).reshape(-1)

    perm = jax.random.permutation(jax.random.PRNGKey(0), s * s)
    vals, pidx = jax.lax.top_k(keep[perm], budget)
    idx = perm[pidx]
    row = (idx // s).astype(jnp.float32)
    col = (idx % s).astype(jnp.float32)
    pts = jnp.stack(
        [origin_xy[0] + col * resolution, origin_xy[1] + row * resolution],
        axis=-1,
    )
    return pts, vals
