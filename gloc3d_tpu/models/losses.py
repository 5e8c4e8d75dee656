"""Metric-learning and pose losses.

- ``triplet_margin_loss``: nn.TripletMarginLoss(margin=√0.1, p=2,
  reduction='sum') semantics — what main.py:644-645 trains with, applied
  per (query, negative) pair and normalized by the negative count
  (main.py:152-158).
- ``batched_triplet_loss`` / ``batched_quadruplet_loss``: the PointNetVLAD
  style losses from model/loss.py (squared distances, lazy/min/ignore-zero
  variants) — capability preserved even though main.py does not use them.
- ``pose_loss``: relative angle-axis + frame-rotated translation error
  (pointpillar.py:20-57), vectorized instead of the reference's Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gloc3d_tpu.core.transforms import angle_axis_to_quat, quat_conj, quat_mul, quat_rotate, quat_to_angle_axis

Array = jax.Array


def _l2(a: Array, b: Array, eps: float = 1e-6) -> Array:
    """torch pairwise_distance semantics (eps inside the sqrt keeps grads finite)."""
    return jnp.sqrt(jnp.sum((a - b) ** 2, axis=-1) + eps)


def triplet_margin_loss(
    anchor: Array, positive: Array, negative: Array, margin: float
) -> Array:
    """Σ max(‖a−p‖ − ‖a−n‖ + margin, 0) over the batch (reduction='sum')."""
    return jnp.sum(
        jnp.maximum(_l2(anchor, positive) - _l2(anchor, negative) + margin, 0.0)
    )


def training_triplet_loss(
    q: Array, pos: Array, negs: Array, neg_mask: Array, margin: float
) -> Array:
    """The main.py:152-158 step loss with padded negatives.

    q, pos: (B, D); negs: (B, Nneg, D); neg_mask: (B, Nneg) 1.0 for real
    negatives. Per-pair TripletMarginLoss summed, then / total real negatives.
    """
    d_pos = _l2(q, pos)[:, None]                      # (B, 1)
    d_neg = _l2(q[:, None, :], negs)                  # (B, Nneg)
    per_pair = jnp.maximum(d_pos - d_neg + margin, 0.0) * neg_mask
    n = jnp.maximum(jnp.sum(neg_mask), 1.0)
    return jnp.sum(per_pair) / n


def best_pos_distance(query: Array, pos_vecs: Array) -> tuple[Array, Array]:
    """Min/max squared distance to positives (loss.py:6-12)."""
    d = jnp.sum((pos_vecs - query[:, None, :]) ** 2, axis=-1)  # (B, P)
    return jnp.min(d, axis=1), jnp.max(d, axis=1)


def batched_triplet_loss(
    q: Array, pos: Array, negs: Array, margin: float,
    use_min: bool = False, lazy: bool = False, ignore_zero_loss: bool = False,
) -> Array:
    """PointNetVLAD batched triplet loss (loss.py:15-42), squared distances."""
    min_pos, max_pos = best_pos_distance(q, pos)
    positive = min_pos if use_min else max_pos
    d_neg = jnp.sum((negs - q[:, None, :]) ** 2, axis=-1)  # (B, N)
    loss = jnp.maximum(margin + positive[:, None] - d_neg, 0.0)
    loss = jnp.max(loss, axis=1) if lazy else jnp.sum(loss, axis=1)
    if ignore_zero_loss:
        hard = (loss > 1e-16).astype(loss.dtype)
        return jnp.sum(loss) / (jnp.sum(hard) + 1e-16)
    return jnp.mean(loss)


def batched_quadruplet_loss(
    q: Array, pos: Array, negs: Array, other_neg: Array,
    m1: float, m2: float,
    use_min: bool = False, lazy: bool = False, ignore_zero_loss: bool = False,
) -> Array:
    """Quadruplet loss (loss.py:49-93): triplet + second margin against a
    negative that is far from all of (q, pos, negs)."""
    first = batched_triplet_loss(q, pos, negs, m1, use_min, lazy, ignore_zero_loss)
    min_pos, max_pos = best_pos_distance(q, pos)
    positive = min_pos if use_min else max_pos
    d_on = jnp.sum((negs - other_neg[:, None, :]) ** 2, axis=-1)
    second = jnp.maximum(m2 + positive[:, None] - d_on, 0.0)
    second = jnp.max(second, axis=1) if lazy else jnp.sum(second, axis=1)
    if ignore_zero_loss:
        hard = (second > 1e-16).astype(second.dtype)
        second = jnp.sum(second) / (jnp.sum(hard) + 1e-16)
    else:
        second = jnp.mean(second)
    return first + second


def pose_loss(pred: Array, gt: Array, angle_scale: float = 1.0) -> Array:
    """Relative-pose loss (pointpillar.py:25-57), vectorized.

    pred, gt: (B, 6) [angle-axis | translation]. Rotation term is the norm of
    the angle-axis of gtᵀ·pred; translation error is rotated into the gt frame.
    """
    q_pred = angle_axis_to_quat(pred[:, :3])
    q_gt = angle_axis_to_quat(gt[:, :3])
    dq = quat_mul(quat_conj(q_gt), q_pred)
    dr = jnp.linalg.norm(quat_to_angle_axis(dq), axis=-1)
    dt = quat_rotate(quat_conj(q_gt), pred[:, 3:] - gt[:, 3:])
    dt = jnp.linalg.norm(dt, axis=-1)
    return angle_scale * jnp.mean(dr) + jnp.mean(dt)
