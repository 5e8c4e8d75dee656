"""Ground estimation tests on synthetic tilted scenes."""

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import GroundConfig
from gloc3d_tpu.core.transforms import get_yaw, quat_from_rpy, quat_rotate, transform_points
from gloc3d_tpu.ops.ground import estimate_ground

CFG = GroundConfig(num_candidates=1024, ransac_iters=128)


def make_scene(roll, pitch, lidar_height, n_ground=2000, n_clutter=600, seed=0):
    """Ground plane + boxes, observed from a lidar tilted by (roll, pitch).

    World: flat ground z=0, sensor at height h. Sensor frame = R⁻¹ applied.
    """
    rng = np.random.RandomState(seed)
    gx = rng.uniform(-18, 18, n_ground)
    gy = rng.uniform(-18, 18, n_ground)
    ground = np.stack([gx, gy, np.zeros(n_ground)], 1)
    boxes = []
    for _ in range(8):
        cx, cy = rng.uniform(-15, 15, 2)
        w, h = rng.uniform(0.5, 2, 2)
        zs = rng.uniform(0, 3, n_clutter // 8)
        xs = cx + rng.uniform(-w, w, n_clutter // 8)
        ys = cy + rng.uniform(-h, h, n_clutter // 8)
        boxes.append(np.stack([xs, ys, zs], 1))
    world = np.concatenate([ground] + boxes).astype(np.float32)
    world[:, 2] -= lidar_height  # sensor at origin
    q = quat_from_rpy(jnp.float32(roll), jnp.float32(pitch), jnp.float32(0.0))
    # world → sensor: rotate by inverse of sensor attitude
    from gloc3d_tpu.core.transforms import quat_conj

    sensor = quat_rotate(quat_conj(q)[None, :], jnp.asarray(world))
    noise = rng.normal(0, 0.01, sensor.shape).astype(np.float32)
    return jnp.asarray(sensor) + noise


def test_flat_ground_identity():
    pts = make_scene(0.0, 0.0, 1.7)
    mask = jnp.ones(pts.shape[0])
    est = estimate_ground(pts, mask, CFG, jax.random.PRNGKey(0))
    assert bool(est.valid)
    # plane ~ z = -1.7 -> normal +z, |d| = 1.7
    np.testing.assert_allclose(np.asarray(est.plane[:3]), [0, 0, 1], atol=0.02)
    assert abs(float(est.plane[3]) - (-1.7)) < 0.05 or abs(float(est.plane[3]) - 1.7) < 0.05
    # transform lifts points: ground points map to z≈0
    out = transform_points(est.transform, pts)
    ground_z = np.asarray(out[:2000, 2])
    assert np.abs(np.median(ground_z)) < 0.05


def test_tilted_ground_aligns():
    roll, pitch = 0.06, -0.04
    pts = make_scene(roll, pitch, 1.73, seed=1)
    mask = jnp.ones(pts.shape[0])
    est = estimate_ground(pts, mask, CFG, jax.random.PRNGKey(1))
    assert bool(est.valid)
    out = transform_points(est.transform, pts)
    ground_z = np.asarray(out[:2000, 2])
    assert np.abs(np.median(ground_z)) < 0.05, "ground must map to z=0"
    # aligned normal must be +z and transform yaw-free
    assert abs(float(get_yaw(est.transform.rotation))) < 1e-4


def test_yaw_invariance():
    """Adding yaw to the scene must not change the recovered roll/pitch."""
    pts = make_scene(0.05, 0.03, 1.5, seed=2)
    qz = quat_from_rpy(jnp.float32(0), jnp.float32(0), jnp.float32(1.2))
    pts_yawed = quat_rotate(qz[None, :], pts)
    mask = jnp.ones(pts.shape[0])
    e1 = estimate_ground(pts, mask, CFG, jax.random.PRNGKey(3))
    e2 = estimate_ground(pts_yawed, mask, CFG, jax.random.PRNGKey(3))
    o1 = transform_points(e1.transform, pts)
    o2 = transform_points(e2.transform, pts_yawed)
    assert np.abs(np.median(np.asarray(o1[:2000, 2]))) < 0.05
    assert np.abs(np.median(np.asarray(o2[:2000, 2]))) < 0.05


def test_jit_and_masked_padding():
    pts = make_scene(0.02, 0.02, 1.7, seed=3)
    n = pts.shape[0]
    padded = jnp.zeros((n + 500, 3)).at[:n].set(pts)
    mask = jnp.zeros(n + 500).at[:n].set(1.0)
    f = jax.jit(lambda p, m, k: estimate_ground(p, m, CFG, k))
    est = f(padded, mask, jax.random.PRNGKey(4))
    assert bool(est.valid)
    assert float(est.inlier_fraction) > 0.4


def test_smallest_eigvec_matches_eigh():
    from gloc3d_tpu.ops.ground import _smallest_eigvec_3x3

    rng = np.random.RandomState(3)
    mats = []
    for _ in range(200):
        a = rng.randn(5, 3)
        mats.append(a.T @ a / 5)
    a = jnp.asarray(np.stack(mats), jnp.float32)
    got = np.asarray(_smallest_eigvec_3x3(a))
    _, vecs = np.linalg.eigh(np.asarray(a))
    want = vecs[..., 0]
    # sign-insensitive comparison
    dots = np.abs(np.sum(got * want, -1))
    np.testing.assert_allclose(dots, 1.0, atol=2e-3)


def test_smallest_eigvec_degenerate():
    from gloc3d_tpu.ops.ground import _smallest_eigvec_3x3

    a = jnp.zeros((2, 3, 3), jnp.float32).at[1].set(jnp.eye(3))
    got = np.asarray(_smallest_eigvec_3x3(a))
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)
