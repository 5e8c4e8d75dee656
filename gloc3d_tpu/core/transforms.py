"""SE(3) / SE(2) rigid transforms and quaternion algebra as pure JAX functions.

TPU-native replacement for the reference's Eigen-based geometry core
(registration/3d/rigid_transform.h:32-238, registration/3d/transform.h:28-117).
Everything here is a pure function over arrays — batchable with ``vmap`` and
traceable under ``jit``. Quaternions are stored ``(w, x, y, z)`` in the last
axis; rigid transforms are NamedTuples of arrays, so they are pytrees and flow
through JAX transforms unchanged.

Branch-free: the reference's small-angle special cases
(transform.h:RotationQuaternionToAngleAxisVector cutoff 1e-7) are handled with
``jnp.where`` so the same code path vectorizes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Quaternion algebra (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32) -> Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: Array) -> Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conj(q: Array) -> Array:
    """Conjugate == inverse for unit quaternions."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(a: Array, b: Array) -> Array:
    """Hamilton product a*b; composition: (a*b) rotates by b then a."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4).

    Uses the expanded form v' = v + 2*w*(u×v) + 2*(u×(u×v)) — 18 mul, no
    matmul, fully fused by XLA on the VPU.
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: Array) -> Array:
    """Unit quaternion (..., 4) → rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: Array) -> Array:
    """Rotation matrix (..., 3, 3) → unit quaternion (..., 4), branch-free.

    Computes all four Shepperd candidates and selects the numerically best
    (largest pivot) with ``where`` — safe under vmap/jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5
    w0, x1, y2, z3 = jnp.moveaxis(qw, -1, 0)

    cand0 = jnp.stack([w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0),
                       (m10 - m01) / (4 * w0)], axis=-1)
    cand1 = jnp.stack([(m21 - m12) / (4 * x1), x1, (m01 + m10) / (4 * x1),
                       (m02 + m20) / (4 * x1)], axis=-1)
    cand2 = jnp.stack([(m02 - m20) / (4 * y2), (m01 + m10) / (4 * y2), y2,
                       (m12 + m21) / (4 * y2)], axis=-1)
    cand3 = jnp.stack([(m10 - m01) / (4 * z3), (m02 + m20) / (4 * z3),
                       (m12 + m21) / (4 * z3), z3], axis=-1)

    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)[..., None]
    cands = jnp.stack([cand0, cand1, cand2, cand3], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None], axis=-2)[..., 0, :]
    return quat_normalize(q)


def angle_axis_to_quat(angle_axis: Array) -> Array:
    """Angle-axis vector (angle*unit_axis) → quaternion.

    Semantics of transform.h:AngleAxisVectorToRotationQuaternion (linearized
    below 1e-8 squared-norm cutoff), made branch-free.
    """
    sq = jnp.sum(angle_axis * angle_axis, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, 1e-24))
    small = sq < 1e-8
    scale = jnp.where(small, 0.5, jnp.sin(norm / 2.0) / norm)
    w = jnp.where(small[..., 0], 1.0, jnp.cos(norm[..., 0] / 2.0))
    xyz = scale * angle_axis
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def quat_to_angle_axis(q: Array) -> Array:
    """Quaternion → angle-axis vector; positive-w branch like the reference
    (transform.h:RotationQuaternionToAngleAxisVector)."""
    q = quat_normalize(q)
    q = jnp.where(q[..., :1] < 0.0, -q, q)
    vec_norm = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vec_norm, q[..., :1])
    small = angle < 1e-7
    sin_half = jnp.sin(angle / 2.0)
    scale = jnp.where(small, 2.0, angle / jnp.where(small, 1.0, sin_half))
    return scale * q[..., 1:]


def quat_from_rpy(roll: Array, pitch: Array, yaw: Array) -> Array:
    """(roll, pitch, yaw) → quaternion, URDF convention Rz(y)·Ry(p)·Rx(r).

    Matches rigid_transform.h:229 / rigid_transform.cpp:29 (RollPitchYaw).
    """
    hr, hp, hy = roll * 0.5, pitch * 0.5, yaw * 0.5
    cr, sr = jnp.cos(hr), jnp.sin(hr)
    cp, sp = jnp.cos(hp), jnp.sin(hp)
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    return jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        axis=-1,
    )


def rpy_from_quat(q: Array) -> tuple[Array, Array, Array]:
    """Extract (roll, pitch, yaw), ZYX convention (inverse of quat_from_rpy)."""
    m = quat_to_matrix(q)
    yaw = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    pitch = jnp.arcsin(jnp.clip(-m[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
    return roll, pitch, yaw


def get_yaw(q: Array) -> Array:
    """Yaw of a rotation: heading of the rotated +X axis.

    Matches transform.h:41-53 (GetYaw via rotation of UnitX).
    """
    ex = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 0].set(1.0)
    d = quat_rotate(q, ex)
    return jnp.arctan2(d[..., 1], d[..., 0])


def get_angle(q: Array) -> Array:
    """Non-negative rotation angle (transform.h:GetAngle)."""
    return 2.0 * jnp.arctan2(
        jnp.linalg.norm(q[..., 1:], axis=-1), jnp.abs(q[..., 0])
    )


def remove_yaw(q: Array) -> Array:
    """Return Rz(-yaw(q)) · q — the same rotation with its ZYX-yaw zeroed.

    Used for gravity alignment: if q maps the ground normal to +Z, so does
    remove_yaw(q), but without an arbitrary heading (ground_estimator.cpp:
    165-192 builds the same thing via eulerAngles + RollPitchYaw(r,p,0)).
    """
    yaw = get_yaw(q)
    z = jnp.zeros_like(yaw)
    return quat_mul(quat_from_rpy(z, z, -yaw), q)


def quat_from_two_vectors(a: Array, b: Array) -> Array:
    """Shortest-arc rotation taking unit direction a to b.

    Branch-free analog of Eigen Quaternion::FromTwoVectors
    (ground_estimator.cpp:186). Handles the antiparallel case by rotating
    180° about an axis orthogonal to a.
    """
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    c = jnp.cross(a, b)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    w = 1.0 + d
    q = jnp.concatenate([w, c], axis=-1)
    # Antiparallel: pick any axis ⟂ a. Use the smaller of (a×ex, a×ez).
    ex = jnp.zeros_like(a).at[..., 0].set(1.0)
    ez = jnp.zeros_like(a).at[..., 2].set(1.0)
    alt1 = jnp.cross(a, ex)
    alt2 = jnp.cross(a, ez)
    alt = jnp.where(
        jnp.linalg.norm(alt1, axis=-1, keepdims=True) > 0.1, alt1, alt2
    )
    q_anti = jnp.concatenate([jnp.zeros_like(w), alt], axis=-1)
    q = jnp.where(w < 1e-6, q_anti, q)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# Rigid transforms
# ---------------------------------------------------------------------------

class Rigid3(NamedTuple):
    """SE(3): rotation quaternion (..., 4) + translation (..., 3).

    Pytree NamedTuple → composes with jit/vmap/scan. Replaces
    rigid_transform.h:Rigid3<T> (compose :140, inverse :154).
    """

    rotation: Array    # (..., 4) wxyz
    translation: Array  # (..., 3)

    @staticmethod
    def identity(dtype=jnp.float32) -> "Rigid3":
        return Rigid3(quat_identity(dtype), jnp.zeros(3, dtype))

    @staticmethod
    def from_matrix(m: Array) -> "Rigid3":
        """From a 4×4 (or (...,4,4)) homogeneous matrix."""
        return Rigid3(matrix_to_quat(m[..., :3, :3]), m[..., :3, 3])

    def to_matrix(self) -> Array:
        r = quat_to_matrix(self.rotation)
        batch = self.translation.shape[:-1]
        m = jnp.zeros(batch + (4, 4), self.translation.dtype)
        m = m.at[..., :3, :3].set(r)
        m = m.at[..., :3, 3].set(self.translation)
        return m.at[..., 3, 3].set(1.0)

    def compose(self, other: "Rigid3") -> "Rigid3":
        """self ∘ other: apply `other` first."""
        return Rigid3(
            quat_mul(self.rotation, other.rotation),
            quat_rotate(self.rotation, other.translation) + self.translation,
        )

    def inverse(self) -> "Rigid3":
        rinv = quat_conj(self.rotation)
        return Rigid3(rinv, -quat_rotate(rinv, self.translation))

    def apply(self, points: Array) -> Array:
        """Transform points (..., 3) under plain numpy broadcasting.

        A single Rigid3 against (N, 3) points broadcasts directly; for batched
        transforms against per-transform point sets use ``jax.vmap``.
        """
        return quat_rotate(self.rotation, points) + self.translation

    def __matmul__(self, other):
        if isinstance(other, Rigid3):
            return self.compose(other)
        return self.apply(other)


class Rigid2(NamedTuple):
    """SE(2): heading angle (...) + translation (..., 2).

    Replaces rigid_transform.h:Rigid2<T>.
    """

    angle: Array        # (...)
    translation: Array  # (..., 2)

    @staticmethod
    def identity(dtype=jnp.float32) -> "Rigid2":
        return Rigid2(jnp.zeros((), dtype), jnp.zeros(2, dtype))

    def compose(self, other: "Rigid2") -> "Rigid2":
        c, s = jnp.cos(self.angle), jnp.sin(self.angle)
        ox, oy = other.translation[..., 0], other.translation[..., 1]
        t = jnp.stack([c * ox - s * oy, s * ox + c * oy], axis=-1)
        return Rigid2(self.angle + other.angle, t + self.translation)

    def inverse(self) -> "Rigid2":
        c, s = jnp.cos(self.angle), jnp.sin(self.angle)
        tx, ty = self.translation[..., 0], self.translation[..., 1]
        t = jnp.stack([-(c * tx + s * ty), -(-s * tx + c * ty)], axis=-1)
        return Rigid2(-self.angle, t)

    def apply(self, points: Array) -> Array:
        c, s = jnp.cos(self.angle), jnp.sin(self.angle)
        x, y = points[..., 0], points[..., 1]
        return jnp.stack([c * x - s * y, s * x + c * y], axis=-1) + self.translation


def project_2d(t: Rigid3) -> Rigid2:
    """SE(3) → SE(2) on the XY plane (transform.h:100-105)."""
    return Rigid2(get_yaw(t.rotation), t.translation[..., :2])


def embed_3d(t: Rigid2) -> Rigid3:
    """SE(2) → SE(3) rotation about +Z (transform.h:107-114)."""
    zeros = jnp.zeros_like(t.angle)
    q = quat_from_rpy(zeros, zeros, t.angle)
    trans = jnp.concatenate(
        [t.translation, jnp.zeros_like(t.translation[..., :1])], axis=-1
    )
    return Rigid3(q, trans)


def transform_points(t: Rigid3, points: Array) -> Array:
    """Transform a point set (N, 3) by a single Rigid3 (point_cloud.h:42)."""
    return quat_rotate(t.rotation[None, :], points) + t.translation[None, :]
