"""Unit tests for the SE(3)/SE(2) geometry core.

Closed-form cases mirror the semantics of the reference's Eigen code
(rigid_transform.h, transform.h) without running it: compose/inverse algebra,
URDF RollPitchYaw convention, GetYaw-as-heading-of-+X, shortest-arc rotation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gloc3d_tpu.core import (
    Rigid2,
    Rigid3,
    angle_axis_to_quat,
    embed_3d,
    get_angle,
    get_yaw,
    matrix_to_quat,
    project_2d,
    quat_from_rpy,
    quat_from_two_vectors,
    quat_mul,
    quat_rotate,
    quat_to_angle_axis,
    quat_to_matrix,
    remove_yaw,
    rpy_from_quat,
    transform_points,
)

KEY = jax.random.PRNGKey(0)


def random_quat(key, batch=()):
    q = jax.random.normal(key, batch + (4,))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotate_matches_matrix():
    q = random_quat(KEY, (32,))
    v = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    out = quat_rotate(q, v)
    m = quat_to_matrix(q)
    expected = jnp.einsum("bij,bj->bi", m, v)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_quat_mul_associates_with_rotation():
    k1, k2 = jax.random.split(KEY)
    a, b = random_quat(k1, (8,)), random_quat(k2, (8,))
    v = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    np.testing.assert_allclose(
        quat_rotate(quat_mul(a, b), v),
        quat_rotate(a, quat_rotate(b, v)),
        atol=1e-5,
    )


def test_matrix_quat_roundtrip():
    q = random_quat(KEY, (64,))
    q2 = matrix_to_quat(quat_to_matrix(q))
    # q and -q are the same rotation
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * sign, q2, atol=1e-5)


def test_angle_axis_roundtrip():
    # Round-trip only holds for |aa| < pi (the canonical short rotation);
    # the reference's positive-w branch has the same domain.
    aa = jax.random.normal(KEY, (32, 3))
    aa = aa / jnp.linalg.norm(aa, axis=-1, keepdims=True)
    aa = aa * jax.random.uniform(KEY, (32, 1), minval=1e-3, maxval=3.0)
    back = quat_to_angle_axis(angle_axis_to_quat(aa))
    np.testing.assert_allclose(aa, back, atol=1e-4)


def test_angle_axis_small_angle():
    aa = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    q = angle_axis_to_quat(aa)
    np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-7)
    back = quat_to_angle_axis(q)
    np.testing.assert_allclose(back, aa, atol=1e-7)


def test_rpy_convention_is_urdf_zyx():
    # RollPitchYaw(r, p, y) == Rz(y) * Ry(p) * Rx(r) (rigid_transform.cpp:29)
    r, p, y = 0.3, -0.2, 1.1
    q = quat_from_rpy(jnp.float32(r), jnp.float32(p), jnp.float32(y))
    z = jnp.zeros(())
    qz = quat_from_rpy(z, z, jnp.float32(y))
    qy = quat_from_rpy(z, jnp.float32(p), z)
    qx = quat_from_rpy(jnp.float32(r), z, z)
    np.testing.assert_allclose(q, quat_mul(qz, quat_mul(qy, qx)), atol=1e-6)
    rr, pp, yy = rpy_from_quat(q)
    np.testing.assert_allclose([rr, pp, yy], [r, p, y], atol=1e-5)


def test_get_yaw_is_heading_of_x_axis():
    q = quat_from_rpy(jnp.float32(0.1), jnp.float32(-0.05), jnp.float32(0.7))
    # transform.h:41-53: yaw = atan2 of rotated UnitX
    ex = quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(get_yaw(q), jnp.arctan2(ex[1], ex[0]), atol=1e-6)
    np.testing.assert_allclose(get_yaw(q), 0.7, atol=1e-2)


def test_get_angle_nonnegative():
    q = random_quat(KEY, (16,))
    a = get_angle(q)
    assert (a >= 0).all() and (a <= jnp.pi + 1e-5).all()


def test_remove_yaw_preserves_normal_alignment():
    # If q maps n → z, remove_yaw(q) must too, with zero residual yaw.
    n = jnp.array([0.1, -0.2, 0.97])
    n = n / jnp.linalg.norm(n)
    q = quat_from_two_vectors(n, jnp.array([0.0, 0.0, 1.0]))
    # Inject an arbitrary extra yaw
    q = quat_mul(quat_from_rpy(jnp.zeros(()), jnp.zeros(()), jnp.float32(1.3)), q)
    qn = remove_yaw(q)
    np.testing.assert_allclose(
        quat_rotate(qn, n), jnp.array([0.0, 0.0, 1.0]), atol=1e-5
    )
    np.testing.assert_allclose(get_yaw(qn), 0.0, atol=1e-5)


def test_from_two_vectors_shortest_arc():
    a = jnp.array([1.0, 0.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    q = quat_from_two_vectors(a, b)
    np.testing.assert_allclose(quat_rotate(q, a), b, atol=1e-6)
    np.testing.assert_allclose(get_angle(q), jnp.pi / 2, atol=1e-5)


def test_from_two_vectors_antiparallel():
    a = jnp.array([0.0, 0.0, 1.0])
    q = quat_from_two_vectors(a, -a)
    np.testing.assert_allclose(quat_rotate(q, a), -a, atol=1e-5)


def test_rigid3_compose_inverse():
    k1, k2 = jax.random.split(KEY)
    t1 = Rigid3(random_quat(k1), jax.random.normal(k1, (3,)))
    t2 = Rigid3(random_quat(k2), jax.random.normal(k2, (3,)))
    pts = jax.random.normal(jax.random.PRNGKey(3), (100, 3))
    # (t1 ∘ t2) p == t1(t2(p))
    np.testing.assert_allclose(
        transform_points(t1.compose(t2), pts),
        transform_points(t1, transform_points(t2, pts)),
        atol=1e-4,
    )
    # t⁻¹ ∘ t == identity
    ident = t1.inverse().compose(t1)
    np.testing.assert_allclose(transform_points(ident, pts), pts, atol=1e-4)


def test_rigid3_matrix_roundtrip():
    t = Rigid3(random_quat(KEY), jnp.array([1.0, -2.0, 3.0]))
    t2 = Rigid3.from_matrix(t.to_matrix())
    pts = jax.random.normal(KEY, (10, 3))
    np.testing.assert_allclose(
        transform_points(t, pts), transform_points(t2, pts), atol=1e-5
    )


def test_rigid2_compose_inverse_apply():
    t1 = Rigid2(jnp.float32(0.4), jnp.array([1.0, 2.0]))
    t2 = Rigid2(jnp.float32(-1.1), jnp.array([-0.5, 0.3]))
    pts = jax.random.normal(KEY, (50, 2))
    np.testing.assert_allclose(
        t1.compose(t2).apply(pts), t1.apply(t2.apply(pts)), atol=1e-5
    )
    np.testing.assert_allclose(
        t1.inverse().compose(t1).apply(pts), pts, atol=1e-5
    )


def test_project_embed_2d():
    t2 = Rigid2(jnp.float32(0.9), jnp.array([3.0, -1.0]))
    t3 = embed_3d(t2)
    back = project_2d(t3)
    np.testing.assert_allclose(back.angle, t2.angle, atol=1e-6)
    np.testing.assert_allclose(back.translation, t2.translation, atol=1e-6)
    assert t3.translation[2] == 0.0


def test_rigid3_vmappable():
    qs = random_quat(KEY, (16,))
    ts = jax.random.normal(KEY, (16, 3))
    batch = Rigid3(qs, ts)
    pts = jax.random.normal(KEY, (16, 3))
    out = jax.vmap(lambda t, p: t.apply(p))(batch, pts)
    assert out.shape == (16, 3)


def test_jit_compiles():
    f = jax.jit(lambda t, p: transform_points(t.inverse(), p))
    t = Rigid3.identity()
    p = jnp.ones((4, 3))
    np.testing.assert_allclose(f(t, p), p, atol=1e-6)
