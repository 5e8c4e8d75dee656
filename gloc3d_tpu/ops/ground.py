"""Ground-plane estimation → gravity alignment, fully batched on TPU.

Replaces registration/ground_estimator.cpp: candidate points within 20 m
(:202) → k-NN PCA normals (OMP k=10, :73-80) → 18×10° pitch-angle histogram
keeping near-vertical bins (:82-124) → RANSAC plane (PCL, 0.1 m inliers,
:19-37) → rotation mapping the plane normal to +Z with yaw zeroed and z-offset
by the plane distance (:165-192).

TPU re-design: the per-point OMP k-NN tree search becomes one (M, M) distance
matrix + ``lax.top_k`` on a fixed-size random subsample; RANSAC becomes H
simultaneous triplet hypotheses scored by a single matmul-like inlier count.
No data-dependent shapes anywhere — selection flows through masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gloc3d_tpu.config import GroundConfig
from gloc3d_tpu.core.transforms import Rigid3, quat_from_two_vectors, quat_identity, remove_yaw

Array = jax.Array


class GroundEstimate(NamedTuple):
    transform: Rigid3      # T_lidar→ground (apply to points to gravity-align)
    plane: Array           # (4,) [a, b, c, d]: ax+by+cz+d=0, ‖(a,b,c)‖=1, c>0
    valid: Array           # () bool — a near-vertical normal bin was found
    inlier_fraction: Array  # () float — RANSAC inliers / ground candidates


def _smallest_eigvec_3x3(a: Array) -> Array:
    """Closed-form smallest eigenvector of batched symmetric (…, 3, 3).

    jnp.linalg.eigh on (M, 3, 3) batches lowers to a slow iterative kernel
    on TPU (~tens of ms at M=4096); the trigonometric (Cardano) eigenvalue
    formula plus the (A−λ1)(A−λ2) column trick is pure elementwise math.
    Degenerate (isotropic) inputs return +Z.
    """
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    a01, a02, a12 = a[..., 0, 1], a[..., 0, 2], a[..., 1, 2]
    p1 = a01**2 + a02**2 + a12**2
    dq = jnp.stack([a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]], -1) - q[..., None]
    p2 = jnp.sum(dq * dq, -1) + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-20))
    eye = jnp.eye(3, dtype=a.dtype)
    b = (a - q[..., None, None] * eye) / p[..., None, None]
    detb = jnp.linalg.det(b)
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)                       # largest
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    lam2 = 3.0 * q - lam1 - lam3
    # columns of (A−λ1)(A−λ2) span the λ3 eigenspace
    c = jnp.matmul(a - lam1[..., None, None] * eye,
                   a - lam2[..., None, None] * eye)
    norms = jnp.linalg.norm(c, axis=-2)                     # (…, 3) col norms
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(c, best[..., None, None], axis=-1)[..., 0]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    up = jnp.zeros_like(v).at[..., 2].set(1.0)
    degenerate = (p2 < 1e-16) | (n[..., 0] < 1e-12)
    v = jnp.where(degenerate[..., None], up, v / jnp.maximum(n, 1e-20))
    return v


def _plane_from_triplets(p0: Array, p1: Array, p2: Array) -> Array:
    """(H, 3)×3 → (H, 4) unit-normal plane coefficients."""
    n = jnp.cross(p1 - p0, p2 - p0)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    d = -jnp.sum(n * p0, axis=-1, keepdims=True)
    return jnp.concatenate([n, d], axis=-1)


def estimate_ground(
    points: Array, mask: Array, cfg: GroundConfig, key: jax.Array
) -> GroundEstimate:
    """Estimate the ground plane of one scan and the aligning transform.

    Args:
      points: (N, 3) padded scan.
      mask: (N,) validity.
      cfg: GroundConfig.
      key: PRNG key for the subsample + RANSAC draws (deterministic given key).
    """
    m = cfg.num_candidates
    r2 = jnp.sum(points * points, axis=-1)
    cand_ok = (mask > 0) & (r2 < cfg.candidate_radius**2)

    # Random fixed-size subsample of candidates (invalid rows sort last).
    k_samp, k_tri = jax.random.split(key)
    prio = jnp.where(cand_ok, jax.random.uniform(k_samp, (points.shape[0],)), 2.0)
    # partial selection, not a full sort: the subsample is random anyway, so
    # approx_min_k's imperfect recall just draws a different (equally
    # uniform) subsample — and it replaces a full N=122k argsort (~1 ms)
    # with the TPU-native top-k
    if m < points.shape[0]:
        _, take = jax.lax.approx_min_k(prio, m)
    else:  # tiny scans (tests): budget covers everything, keep all rows
        take = jnp.argsort(prio)
    pts = points[take]                       # (M, 3)
    ok = cand_ok[take]                       # (M,)

    # --- k-NN PCA normals over the subsample ---
    d2 = (
        jnp.sum(pts * pts, -1)[:, None]
        - 2.0 * pts @ pts.T
        + jnp.sum(pts * pts, -1)[None, :]
    )
    d2 = jnp.where(ok[None, :], d2, jnp.inf)          # exclude invalid columns
    # approx_min_k: the TPU-native partial selection (exact top_k sorts the
    # whole 4096-wide row; the approximate variant's recall at k=10 over a
    # 0.1 m-scale neighborhood has no measurable effect on the normals)
    _, nn = jax.lax.approx_min_k(d2, cfg.knn)         # (M, K) incl. self
    nbr = pts[nn]                                     # (M, K, 3)
    mu = jnp.mean(nbr, axis=1, keepdims=True)
    c = nbr - mu
    cov = jnp.einsum("mki,mkj->mij", c, c) / cfg.knn  # (M, 3, 3)
    # smallest eigenvector == surface normal (closed form; batched eigh is
    # ~10 ms at this size on TPU)
    normal = _smallest_eigvec_3x3(cov)                # (M, 3)

    # --- pitch-angle histogram, 10° bins (ground_estimator.cpp:82-124) ---
    nxy = jnp.sqrt(normal[:, 0] ** 2 + normal[:, 1] ** 2)
    theta = (jnp.arctan2(normal[:, 2], nxy) + jnp.pi / 2) * (180.0 / jnp.pi)
    bins = jnp.clip((theta // 10.0).astype(jnp.int32), 0, cfg.num_bins - 1)
    hist = jnp.zeros((cfg.num_bins,), jnp.int32).at[bins].add(ok.astype(jnp.int32))
    bin_ids = jnp.arange(cfg.num_bins)
    near_vertical = (bin_ids <= cfg.vertical_lo) | (bin_ids >= cfg.vertical_hi)
    masked_hist = jnp.where(near_vertical, hist, -1)
    ground_bin = jnp.argmax(masked_hist)
    valid = masked_hist[ground_bin] > 0

    ground_ok = ok & (bins == ground_bin)             # (M,) ground candidates

    # --- vectorized RANSAC plane (H simultaneous triplet hypotheses) ---
    logits = jnp.where(ground_ok, 0.0, -jnp.inf)
    tri = jax.random.categorical(
        k_tri, logits[None, :], shape=(3, cfg.ransac_iters)
    )                                                  # (3, H)
    planes = _plane_from_triplets(pts[tri[0]], pts[tri[1]], pts[tri[2]])
    dist = jnp.abs(pts @ planes[:, :3].T + planes[None, :, 3])  # (M, H)
    inl = jnp.sum((dist < cfg.inlier_threshold) & ground_ok[:, None], axis=0)
    best = jnp.argmax(inl)
    plane = planes[best]
    n_ground = jnp.maximum(jnp.sum(ground_ok), 1)
    inlier_frac = inl[best].astype(jnp.float32) / n_ground

    # --- least-squares refit on inliers (improves on PCL's raw best-sample) ---
    w = ((dist[:, best] < cfg.inlier_threshold) & ground_ok).astype(pts.dtype)
    wsum = jnp.maximum(jnp.sum(w), 3.0)
    mu_i = jnp.sum(pts * w[:, None], axis=0) / wsum
    ci = (pts - mu_i) * w[:, None]
    cov_i = ci.T @ ci / wsum
    _, v_i = jnp.linalg.eigh(cov_i)
    n_ref = v_i[:, 0]
    n_ref = n_ref / jnp.maximum(jnp.linalg.norm(n_ref), 1e-9)
    plane = jnp.concatenate([n_ref, -jnp.sum(n_ref * mu_i)[None]])

    # --- alignment transform (ground_estimator.cpp:165-192) ---
    n = plane[:3]
    d_abs = jnp.abs(plane[3])
    n = jnp.where(n[2] < 0, -n, n)                    # upward normal
    plane = jnp.concatenate([n, jnp.where(plane[2] < 0, -plane[3:], plane[3:])])
    q = remove_yaw(quat_from_two_vectors(n, jnp.array([0.0, 0.0, 1.0], pts.dtype)))
    t = jnp.array([0.0, 0.0, 1.0], pts.dtype) * d_abs
    ident_q = quat_identity(pts.dtype)
    transform = Rigid3(
        jnp.where(valid, q, ident_q),
        jnp.where(valid, t, jnp.zeros(3, pts.dtype)),
    )
    return GroundEstimate(transform, plane, valid, inlier_frac)
