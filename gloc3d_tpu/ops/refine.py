"""Pose refinement: batched ICP, NDT scoring, ergodic roll/pitch sweep.

Capability parity with the optional refinement paths of the reference's
registration study (global_registration.cpp):
  - ICP refinement of a 6-DoF estimate (:1388-1398, pcl::IterativeClosestPoint)
    → vectorized point-to-point ICP: brute-force correspondences via one
    matmul distance, Kabsch/SVD update, fixed iteration count under lax.scan.
  - NDT utilities (:237-416) → a dense 2-D NDT: per-cell Gaussian statistics
    and a pose scoring function.
  - the "ergodic" ±3° roll/pitch sweep producing 49 candidate BEV images
    (:1267-1295) → one batched BEV projection over the 7×7 rotation grid +
    the batched matcher; selection by correlation score (the reference's
    min |1−scale| criterion has no analog in a rigid search).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gloc3d_tpu.config import BEVConfig, MatchConfig
from gloc3d_tpu.core.transforms import Rigid3, matrix_to_quat, quat_from_rpy, quat_to_matrix
from gloc3d_tpu.ops.bev import BEVImage, scan_to_bev
from gloc3d_tpu.ops.bev_match import MatchResult

Array = jax.Array


class ICPResult(NamedTuple):
    transform: Rigid3     # refined src→dst
    rmse: Array           # () inlier RMSE at convergence
    num_inliers: Array    # () correspondences within max_corr_dist


def icp_point_to_point(
    src: Array, src_mask: Array,
    dst: Array, dst_mask: Array,
    init: Rigid3,
    iterations: int = 20,
    max_corr_dist: float = 1.0,
) -> ICPResult:
    """Rigid ICP of src onto dst from an initial guess.

    Correspondences are exact nearest neighbours (one (N, M) matmul per
    iteration — the TPU answer to the KD-tree); the update is the closed-form
    weighted Kabsch solution. Fully jittable; fixed iteration count.
    """
    dst_sq = jnp.sum(dst * dst, axis=-1)
    dst_valid = dst_mask > 0

    def step(carry, _):
        q, t = carry
        moved = jnp.einsum("ij,nj->ni", quat_to_matrix(q), src) + t
        d2 = (
            jnp.sum(moved * moved, -1)[:, None]
            - 2.0 * moved @ dst.T
            + dst_sq[None, :]
        )
        d2 = jnp.where(dst_valid[None, :], d2, jnp.inf)
        nn = jnp.argmin(d2, axis=1)
        nn_d2 = jnp.min(d2, axis=1)
        w = (
            (src_mask > 0)
            & (nn_d2 < max_corr_dist * max_corr_dist)
        ).astype(src.dtype)
        wsum = jnp.maximum(jnp.sum(w), 3.0)
        tgt = dst[nn]
        mu_s = jnp.sum(moved * w[:, None], 0) / wsum
        mu_t = jnp.sum(tgt * w[:, None], 0) / wsum
        cov = ((moved - mu_s) * w[:, None]).T @ (tgt - mu_t) / wsum
        u, _, vt = jnp.linalg.svd(cov)
        d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
        corr = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(d)
        r_delta = vt.T @ corr @ u.T
        t_delta = mu_t - r_delta @ mu_s
        q_new = matrix_to_quat(r_delta @ quat_to_matrix(q))
        t_new = r_delta @ t + t_delta
        # nn_d2 can be epsilon-negative from the ‖a‖²−2ab+‖b‖² cancellation
        rmse = jnp.sqrt(jnp.maximum(jnp.sum(nn_d2 * w), 0.0) / wsum)
        return (q_new, t_new), (rmse, jnp.sum(w))

    (q, t), (rmses, ws) = jax.lax.scan(
        step, (init.rotation, init.translation), None, length=iterations
    )
    return ICPResult(Rigid3(q, t), rmses[-1], ws[-1].astype(jnp.int32))


def bev_to_virtual_points(
    image: Array, origin_xy: Array, resolution, budget: int,
) -> Tuple[Array, Array]:
    """Occupied BEV pixels → a padded metric 2-D point cloud.

    The reference extracts "virtual point clouds" from probability images to
    feed cloud-based refiners (global_registration.cpp:441-609); the dense
    equivalent here takes every occupied pixel center (static ``budget`` via
    top-k on the occupancy flag — selection order among occupied pixels is
    arbitrary, which a point-set consumer is invariant to).

    Returns ((budget, 2) points, (budget,) validity).
    """
    s = image.shape[-1]
    occ = (image < 0.5).astype(jnp.float32).reshape(-1)
    # top_k breaks ties in index order, which on a 0/1 flag would select only
    # the topmost image rows when occupied > budget — a spatially-biased
    # cloud. A fixed permutation first makes over-budget selection a uniform
    # spatial subsample (deterministic: seed is constant).
    perm = jax.random.permutation(jax.random.PRNGKey(0), s * s)
    vals, pidx = jax.lax.top_k(occ[perm], budget)
    idx = perm[pidx]
    row = (idx // s).astype(jnp.float32)
    col = (idx % s).astype(jnp.float32)
    pts = jnp.stack(
        [origin_xy[0] + col * resolution, origin_xy[1] + row * resolution],
        axis=-1,
    )
    return pts, vals


class ICP2DResult(NamedTuple):
    xy_yaw: Array        # (3,) refined (dx, dy, yaw): p_dst = R(yaw)p_src + t
    rmse: Array          # () inlier RMSE at the last iteration
    num_inliers: Array   # () correspondences within max_corr_dist


def icp_planar(
    src: Array, src_mask: Array,     # (N, 2), (N,)
    dst: Array, dst_mask: Array,     # (M, 2), (M,)
    init_xy_yaw: Array,              # (3,)
    iterations: int = 10,
    max_corr_dist: float = 1.0,
    trim_fraction: float = 0.7,
) -> ICP2DResult:
    """Trimmed planar point-to-point ICP with the closed-form 2-D Kabsch
    update (θ = atan2(Σxy−Σyx, Σxx+Σyy)). Brute-force matmul
    correspondences; fixed iteration count under lax.scan. Refines the
    grid-resolution BEV match below one cell (the pcl::IterativeClosestPoint
    role, global_registration.cpp:1388-1398, for the planar output contract).

    BEV virtual clouds overlap only partially (each view occludes different
    structure), so plain point-to-point gets dragged by unmatched points;
    trimming keeps the best ``trim_fraction`` of in-gate correspondences per
    iteration (trimmed-ICP)."""
    dst_sq = jnp.sum(dst * dst, axis=-1)
    dst_valid = dst_mask > 0

    def step(carry, _):
        th, t = carry
        c, s = jnp.cos(th), jnp.sin(th)
        rot = jnp.array([[c, -s], [s, c]])
        moved = src @ rot.T + t
        d2 = (
            jnp.sum(moved * moved, -1)[:, None]
            - 2.0 * moved @ dst.T
            + dst_sq[None, :]
        )
        d2 = jnp.where(dst_valid[None, :], d2, jnp.inf)
        nn = jnp.argmin(d2, axis=1)
        nn_d2 = jnp.min(d2, axis=1)
        in_gate = (src_mask > 0) & (nn_d2 < max_corr_dist * max_corr_dist)
        # trim: keep the closest trim_fraction of in-gate correspondences
        gated = jnp.where(in_gate, nn_d2, jnp.inf)
        order = jnp.sort(gated)
        n_gate = jnp.sum(in_gate)
        keep_n = jnp.maximum(
            (n_gate * trim_fraction).astype(jnp.int32), 3
        )
        cutoff = order[jnp.clip(keep_n - 1, 0, src.shape[0] - 1)]
        w = (in_gate & (nn_d2 <= cutoff)).astype(src.dtype)
        wsum = jnp.maximum(jnp.sum(w), 3.0)
        tgt = dst[nn]
        mu_s = jnp.sum(moved * w[:, None], 0) / wsum
        mu_t = jnp.sum(tgt * w[:, None], 0) / wsum
        a = (moved - mu_s) * w[:, None]
        b = tgt - mu_t
        sxx = jnp.sum(a[:, 0] * b[:, 0])
        syy = jnp.sum(a[:, 1] * b[:, 1])
        sxy = jnp.sum(a[:, 0] * b[:, 1])
        syx = jnp.sum(a[:, 1] * b[:, 0])
        dth = jnp.arctan2(sxy - syx, sxx + syy)
        cd, sd = jnp.cos(dth), jnp.sin(dth)
        r_delta = jnp.array([[cd, -sd], [sd, cd]])
        t_delta = mu_t - r_delta @ mu_s
        th_new = th + dth
        t_new = r_delta @ t + t_delta
        # nn_d2 can be epsilon-negative from the ‖a‖²−2ab+‖b‖² cancellation
        rmse = jnp.sqrt(jnp.maximum(jnp.sum(nn_d2 * w), 0.0) / wsum)
        return (th_new, t_new), (rmse, jnp.sum(w))

    (th, t), (rmses, ws) = jax.lax.scan(
        step, (init_xy_yaw[2], init_xy_yaw[:2]), None, length=iterations
    )
    th = jnp.arctan2(jnp.sin(th), jnp.cos(th))
    return ICP2DResult(
        jnp.array([t[0], t[1], th]), rmses[-1], ws[-1].astype(jnp.int32)
    )


def refine_match_icp(
    q_image: Array, q_origin: Array,
    db_image: Array, db_origin: Array,
    xy_yaw: Array, resolution,
    budget: int = 4096, iterations: int = 10, max_corr_dist: float = 1.0,
) -> ICP2DResult:
    """ICP-refine a BEV match: virtual clouds from both images, planar ICP
    seeded with the matcher's (dx, dy, yaw)."""
    q_pts, q_valid = bev_to_virtual_points(q_image, q_origin, resolution, budget)
    d_pts, d_valid = bev_to_virtual_points(db_image, db_origin, resolution, budget)
    return icp_planar(q_pts, q_valid, d_pts, d_valid, xy_yaw,
                      iterations=iterations, max_corr_dist=max_corr_dist)


def _inv2x2(m: Array) -> Array:
    """Closed-form batched 2×2 inverse. jnp.linalg.inv's LU path is
    pathologically slow on the axon TPU backend (measured: 353 s for a
    129k-batch of 3×3); the adjugate form is pure elementwise math."""
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / det
    return jnp.stack([
        jnp.stack([d, -b], -1),
        jnp.stack([-c, a], -1),
    ], -2) * inv_det[..., None, None]


def _inv3x3(m: Array) -> Array:
    """Closed-form batched 3×3 inverse via the adjugate (see _inv2x2)."""
    a = m[..., 0, 0]; b = m[..., 0, 1]; c = m[..., 0, 2]  # noqa: E702
    d = m[..., 1, 0]; e = m[..., 1, 1]; f = m[..., 1, 2]  # noqa: E702
    g = m[..., 2, 0]; h = m[..., 2, 1]; i = m[..., 2, 2]  # noqa: E702
    co_a = e * i - f * h
    co_b = f * g - d * i
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / det
    adj = jnp.stack([
        jnp.stack([co_a, c * h - b * i, b * f - c * e], -1),
        jnp.stack([co_b, a * i - c * g, c * d - a * f], -1),
        jnp.stack([co_c, b * g - a * h, a * e - b * d], -1),
    ], -2)
    return adj * inv_det[..., None, None]


class NDTGrid2D(NamedTuple):
    """Per-cell 2-D Gaussian statistics (the NDT map)."""

    mean: Array      # (H, W, 2)
    inv_cov: Array   # (H, W, 2, 2)
    valid: Array     # (H, W) bool (≥3 points and invertible cov)
    origin_xy: Array
    cell_size: float


def build_ndt_grid(points_xy: Array, mask: Array, size: int,
                   cell_size: float, origin_xy) -> NDTGrid2D:
    origin_xy = jnp.asarray(origin_xy, jnp.float32)
    ij = jnp.floor((points_xy - origin_xy) / cell_size).astype(jnp.int32)
    inb = (
        (mask > 0)
        & (ij >= 0).all(-1) & (ij < size).all(-1)
    )
    flat = jnp.where(inb, ij[:, 1] * size + ij[:, 0], size * size)
    n = size * size + 1
    w = inb.astype(jnp.float32)
    cnt = jnp.zeros(n).at[flat].add(w)
    sx = jnp.zeros((n, 2)).at[flat].add(points_xy * w[:, None])
    mean = sx / jnp.maximum(cnt, 1.0)[:, None]
    centered = points_xy - mean[flat]
    outer = centered[:, :, None] * centered[:, None, :] * w[:, None, None]
    cov = jnp.zeros((n, 2, 2)).at[flat].add(outer) / jnp.maximum(cnt, 1.0)[:, None, None]
    cov = cov + jnp.eye(2) * 1e-3  # regularize (NDT standard practice)
    inv = _inv2x2(cov)
    valid = cnt >= 3
    return NDTGrid2D(
        mean[: size * size].reshape(size, size, 2),
        inv[: size * size].reshape(size, size, 2, 2),
        valid[: size * size].reshape(size, size),
        origin_xy, cell_size,
    )


def ndt_score(grid: NDTGrid2D, points_xy: Array, mask: Array,
              pose: Array) -> Array:
    """Mean NDT likelihood of points under pose (x, y, θ)."""
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    x = c * points_xy[:, 0] - s * points_xy[:, 1] + pose[0]
    y = s * points_xy[:, 0] + c * points_xy[:, 1] + pose[1]
    p = jnp.stack([x, y], 1)
    size = grid.valid.shape[0]
    ij = jnp.floor((p - grid.origin_xy) / grid.cell_size).astype(jnp.int32)
    inb = (mask > 0) & (ij >= 0).all(-1) & (ij < size).all(-1)
    ij = jnp.clip(ij, 0, size - 1)
    mu = grid.mean[ij[:, 1], ij[:, 0]]
    ic = grid.inv_cov[ij[:, 1], ij[:, 0]]
    ok = inb & grid.valid[ij[:, 1], ij[:, 0]]
    d = p - mu
    mahal = jnp.einsum("ni,nij,nj->n", d, ic, d)
    score = jnp.exp(-0.5 * mahal) * ok
    return jnp.sum(score) / jnp.maximum(jnp.sum(mask > 0), 1.0)


class NDTGrid3D(NamedTuple):
    """Per-voxel 3-D Gaussian statistics (the NDT map; the role of PCL's
    VoxelGridCovariance inside NormalDistributionsTransform,
    global_registration.cpp:250-416)."""

    mean: Array      # (V, 3)
    inv_cov: Array   # (V, 3, 3)
    valid: Array     # (V,) bool (≥ 5 points, PCL's default min)
    origin: Array    # (3,)
    cell_size: float
    dims: Tuple[int, int, int]  # static (nx, ny, nz)


def build_ndt_grid_3d(
    points: Array, mask: Array,
    origin, dims: Tuple[int, int, int], cell_size: float,
) -> NDTGrid3D:
    """One fused scatter builds every voxel's mean and covariance."""
    nx, ny, nz = dims
    v = nx * ny * nz
    origin = jnp.asarray(origin, jnp.float32)
    ijk = jnp.floor((points - origin) / cell_size).astype(jnp.int32)
    inb = (
        (mask > 0)
        & (ijk >= 0).all(-1)
        & (ijk < jnp.asarray(dims)).all(-1)
    )
    flat = jnp.where(
        inb, ijk[:, 0] * ny * nz + ijk[:, 1] * nz + ijk[:, 2], v
    )
    w = inb.astype(jnp.float32)
    # fused payload: [1, x, y, z, outer-products (9)]
    outer = (points[:, :, None] * points[:, None, :]).reshape(-1, 9)
    payload = jnp.concatenate([w[:, None], points * w[:, None],
                               outer * w[:, None]], axis=-1)
    acc = jnp.zeros((v + 1, 13)).at[flat].add(payload)
    cnt = acc[:, 0]
    mean = acc[:, 1:4] / jnp.maximum(cnt, 1.0)[:, None]
    e_xx = acc[:, 4:13].reshape(-1, 3, 3) / jnp.maximum(cnt, 1.0)[:, None, None]
    cov = e_xx - mean[:, :, None] * mean[:, None, :]
    cov = cov + jnp.eye(3) * 1e-3  # regularize (NDT standard practice)
    inv = _inv3x3(cov)
    valid = cnt >= 5
    return NDTGrid3D(mean[:v], inv[:v], valid[:v], origin, cell_size, dims)


def _pose6_apply(pose6: Array, points: Array) -> Array:
    """(x, y, z, roll, pitch, yaw) applied to (N, 3) points."""
    q = quat_from_rpy(pose6[3], pose6[4], pose6[5])
    return jnp.einsum("ij,nj->ni", quat_to_matrix(q), points) + pose6[:3]


def ndt_score_3d(grid: NDTGrid3D, points: Array, mask: Array,
                 pose6: Array) -> Array:
    """Mean NDT likelihood of points under a 6-DoF pose — smooth in pose6,
    so jax.grad gives the registration gradient for free."""
    nx, ny, nz = grid.dims
    p = _pose6_apply(pose6, points)
    cont = (p - grid.origin) / grid.cell_size
    ijk = jnp.floor(cont).astype(jnp.int32)
    inb = (mask > 0) & (ijk >= 0).all(-1) & (ijk < jnp.asarray(grid.dims)).all(-1)
    ijk = jnp.clip(ijk, 0, jnp.asarray(grid.dims) - 1)
    flat = ijk[:, 0] * ny * nz + ijk[:, 1] * nz + ijk[:, 2]
    mu = grid.mean[flat]
    ic = grid.inv_cov[flat]
    ok = inb & grid.valid[flat]
    d = p - mu
    mahal = jnp.einsum("ni,nij,nj->n", d, ic, d)
    score = jnp.exp(-0.5 * mahal) * ok
    return jnp.sum(score) / jnp.maximum(jnp.sum(mask > 0), 1.0)


def ndt_refine_3d(
    grid: NDTGrid3D, points: Array, mask: Array, init6: Array,
    iterations: int = 35, lr_t: float = 0.15, lr_r: float = 0.05,
) -> Tuple[Array, Array]:
    """NDT registration by gradient ascent on the likelihood.

    The TPU-native counterpart of pcl::NormalDistributionsTransform's
    Newton + More-Thuente optimization (global_registration.cpp:250-416):
    the score is differentiable end-to-end (voxel lookup is piecewise-
    constant, the Gaussian term smooth), so the update is one jax.grad —
    no hand-derived Hessian. Fixed iteration count under lax.scan; the
    best-scoring iterate is returned (ascent with per-block step sizes).
    """
    score_fn = lambda p6: ndt_score_3d(grid, points, mask, p6)  # noqa: E731
    step = jnp.array([lr_t, lr_t, lr_t, lr_r, lr_r, lr_r])

    def body(carry, decay):
        pose, best_pose, best_score = carry
        s, g = jax.value_and_grad(score_fn)(pose)
        better = s > best_score
        best_pose = jnp.where(better, pose, best_pose)
        best_score = jnp.where(better, s, best_score)
        gnorm = jnp.linalg.norm(g) + 1e-9
        # normalized ascent with geometric step decay: early iterations move
        # whole cells, late ones converge sub-centimeter
        pose = pose + decay * step * g / gnorm
        return (pose, best_pose, best_score), s

    decays = 0.9 ** jnp.arange(iterations, dtype=jnp.float32)
    init_score = score_fn(init6)
    (pose, best_pose, best_score), _ = jax.lax.scan(
        body, (init6, init6, init_score), decays
    )
    final = score_fn(pose)
    better = final > best_score
    return (
        jnp.where(better, pose, best_pose),
        jnp.where(better, final, best_score),
    )


def ergodic_rp_sweep_match(
    points: Array, mask: Array,
    db_image: Array, db_origin: Array,
    bev_cfg: BEVConfig, match_cfg: MatchConfig,
    half_deg: float = 3.0, step_deg: float = 1.0,
) -> Tuple[MatchResult, Array]:
    """Try every roll/pitch perturbation in a ±half_deg grid; return the
    best-scoring 2-D match and the winning (roll, pitch).

    global_registration.cpp:1267-1295 renders 49 candidate BEV images under
    perturbed gravity directions to survive bad ground estimates; here the
    candidates are one vmapped BEV batch and one batched match call.
    """
    import numpy as np

    rs = jnp.deg2rad(jnp.arange(-half_deg, half_deg + 1e-6, step_deg))
    rr, pp = jnp.meshgrid(rs, rs, indexing="ij")
    rolls = rr.reshape(-1)
    pitchs = pp.reshape(-1)
    zeros = jnp.zeros_like(rolls)
    quats = quat_from_rpy(rolls, pitchs, zeros)  # (K, 4)

    bevs = jax.vmap(
        lambda q: scan_to_bev(points, mask, bev_cfg, align_rotation=q)
    )(quats)

    def match_one(img, origin):
        query = BEVImage(img, origin, jnp.float32(bev_cfg.resolution),
                         jnp.sum(img < 0.5).astype(jnp.int32))
        from gloc3d_tpu.ops.bev_match import match_bev

        return match_bev(query, BEVImage(
            db_image, db_origin, jnp.float32(bev_cfg.resolution),
            jnp.sum(db_image < 0.5).astype(jnp.int32)), match_cfg)

    results = jax.lax.map(lambda args: match_one(*args),
                          (bevs.image, bevs.origin_xy))
    best = jnp.argmax(results.score)
    pick = jax.tree_util.tree_map(lambda x: x[best], results)
    return pick, jnp.stack([rolls[best], pitchs[best]])
