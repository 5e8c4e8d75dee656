"""BEV registration matcher tests on synthetic scenes with known offsets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gloc3d_tpu.config import BEVConfig, MatchConfig
from gloc3d_tpu.ops.bev import scan_to_bev
from gloc3d_tpu.ops.bev_match import match_bev

BEV = BEVConfig(image_size=256, max_points=8192)
MATCH = MatchConfig(image_size=256)


def make_structured_cloud(seed=0, n_walls=14):
    """Vertical wall segments — distinctive structure for registration."""
    rng = np.random.RandomState(seed)
    pts = []
    for _ in range(n_walls):
        x0, y0 = rng.uniform(-18, 18, 2)
        ang = rng.uniform(0, np.pi)
        length = rng.uniform(3, 10)
        ts = rng.uniform(0, length, 300)
        xs = x0 + np.cos(ang) * ts
        ys = y0 + np.sin(ang) * ts
        zs = rng.uniform(0.0, 2.5, 300)
        pts.append(np.stack([xs, ys, zs], 1))
    return np.concatenate(pts).astype(np.float32)


def to_bev(points):
    padded = np.zeros((BEV.max_points, 3), np.float32)
    padded[: len(points)] = points
    mask = np.zeros(BEV.max_points, np.float32)
    mask[: len(points)] = 1.0
    return scan_to_bev(jnp.asarray(padded), jnp.asarray(mask), BEV)


def apply_2d(points, dx, dy, yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    out = points.copy()
    out[:, 0] = c * points[:, 0] - s * points[:, 1] + dx
    out[:, 1] = s * points[:, 0] + c * points[:, 1] + dy
    return out


@pytest.mark.parametrize(
    "dx,dy,yaw",
    [(0.0, 0.0, 0.0), (5.0, -3.0, 0.0), (0.0, 0.0, 1.2), (-7.0, 4.0, -2.1),
     (3.0, 8.0, 3.0)],
)
def test_recovers_known_transform(dx, dy, yaw):
    """db cloud = T(query cloud); matcher must recover T = (dx, dy, yaw)."""
    cloud_q = make_structured_cloud(seed=42)
    cloud_db = apply_2d(cloud_q, dx, dy, yaw)
    bev_q = to_bev(cloud_q)
    bev_db = to_bev(cloud_db)
    res = match_bev(bev_q, bev_db, MATCH)
    assert bool(res.success), f"score {float(res.score):.3f}"
    got = np.asarray(res.xy_yaw)
    dyaw = np.arctan2(np.sin(got[2] - yaw), np.cos(got[2] - yaw))
    assert abs(dyaw) < np.deg2rad(2.0), f"yaw {got[2]} vs {yaw}"
    assert abs(got[0] - dx) < 0.5 and abs(got[1] - dy) < 0.5, f"{got} vs {(dx, dy)}"


def test_low_overlap_pair():
    """Query sees only part of the db scene (offset viewpoint + crop)."""
    cloud = make_structured_cloud(seed=7, n_walls=20)
    dx, dy, yaw = 6.0, -5.0, 0.8
    moved = apply_2d(cloud, dx, dy, yaw)
    # query keeps only points within 15 m of origin AFTER transform: partial view
    keep = np.linalg.norm(cloud[:, :2], axis=1) < 15
    res = match_bev(to_bev(cloud[keep]), to_bev(moved), MATCH)
    assert bool(res.success)
    got = np.asarray(res.xy_yaw)
    dyaw = np.arctan2(np.sin(got[2] - yaw), np.cos(got[2] - yaw))
    assert abs(dyaw) < np.deg2rad(2.0)
    assert abs(got[0] - dx) < 0.6 and abs(got[1] - dy) < 0.6


def test_unrelated_scenes_rejected():
    a = make_structured_cloud(seed=1, n_walls=8)
    b = make_structured_cloud(seed=99, n_walls=8)
    res = match_bev(to_bev(a), to_bev(b), MATCH)
    assert float(res.score) < 0.5  # clearly below a confident match
    # note: random walls can still correlate; the score separating gate is
    # exercised against the true-match scores (> 0.5 in the tests above)


def test_jit_compiles_once():
    f = jax.jit(lambda q, d: match_bev(q, d, MATCH))
    cloud = make_structured_cloud(seed=3)
    b1 = to_bev(cloud)
    b2 = to_bev(apply_2d(cloud, 2.0, 1.0, 0.3))
    res = f(b1, b2)
    assert bool(res.success)


def test_fine_top_f_pruning_matches_exact():
    """fine_top_f registers only the best-coarse candidates; lanes it keeps
    must equal the exact (unpruned) result, and the true match survives."""
    from gloc3d_tpu.ops.bev_match import match_bev_topk

    cloud = make_structured_cloud(seed=11, n_walls=16)
    true_db = apply_2d(cloud, 4.0, -2.0, 0.9)
    bevs = [to_bev(true_db)]
    for s in (101, 102, 103, 104, 105):
        bevs.append(to_bev(make_structured_cloud(seed=s)))
    db_imgs = jnp.stack([b.image for b in bevs])
    db_orgs = jnp.stack([b.origin_xy for b in bevs])
    q = to_bev(cloud)

    exact = match_bev_topk(q, db_imgs, db_orgs, MATCH)
    pruned = match_bev_topk(
        q, db_imgs, db_orgs, MATCH.replace(fine_top_f=2))

    assert bool(exact.success[0]) and bool(pruned.success[0])
    np.testing.assert_allclose(
        np.asarray(pruned.xy_yaw[0]), np.asarray(exact.xy_yaw[0]), atol=1e-5)
    np.testing.assert_allclose(
        float(pruned.score[0]), float(exact.score[0]), atol=1e-5)
    # pruned-out lanes report failure with zero score
    kept = int(jnp.sum(pruned.score > 0.0))
    assert kept <= 2
    assert not bool(pruned.success[np.argmin(np.asarray(pruned.score))])


def test_coarse_rot_downsample_still_recovers():
    """Extra pooling for the rotation-argmax stage (serving preset) keeps
    pose recovery within tolerance."""
    cloud_q = make_structured_cloud(seed=21)
    dx, dy, yaw = -6.0, 3.0, 2.4
    cloud_db = apply_2d(cloud_q, dx, dy, yaw)
    cfg = MATCH.replace(coarse_rot_downsample=8)
    res = match_bev(to_bev(cloud_q), to_bev(cloud_db), cfg)
    assert bool(res.success)
    got = np.asarray(res.xy_yaw)
    dyaw = np.arctan2(np.sin(got[2] - yaw), np.cos(got[2] - yaw))
    assert abs(dyaw) < np.deg2rad(2.0)
    assert abs(got[0] - dx) < 0.6 and abs(got[1] - dy) < 0.6


@pytest.mark.parametrize(
    "dx,dy,yaw",
    [(0.0, 0.0, 0.0), (5.0, -3.0, 0.0), (0.0, 0.0, 1.2), (-7.0, 4.0, -2.1),
     (3.0, 8.0, 3.0)],
)
def test_fm_coarse_recovers_known_transform(dx, dy, yaw):
    """Fourier-Mellin coarse mode (coarse_mode='fm'): same recovery contract
    as the rotation-stack mode, no rotation stack."""
    cfg = MATCH.replace(coarse_mode="fm")
    cloud_q = make_structured_cloud(seed=42)
    cloud_db = apply_2d(cloud_q, dx, dy, yaw)
    res = match_bev(to_bev(cloud_q), to_bev(cloud_db), cfg)
    assert bool(res.success), f"score {float(res.score):.3f}"
    got = np.asarray(res.xy_yaw)
    dyaw = np.arctan2(np.sin(got[2] - yaw), np.cos(got[2] - yaw))
    assert abs(dyaw) < np.deg2rad(2.0)
    assert abs(got[0] - dx) < 0.5 and abs(got[1] - dy) < 0.5


@pytest.mark.parametrize(
    "dx,dy,yaw",
    [(0.0, 0.0, 0.0), (5.0, -3.0, 0.0), (0.0, 0.0, 1.2), (-7.0, 4.0, -2.1),
     (3.0, 8.0, 3.0)],
)
def test_two_stage_fine_recovers_known_transform(dx, dy, yaw):
    """Two-stage fine (fine_argmax_downsample=2, the serving preset's fine
    structure): δ-argmax at an extra ÷2, winner scored at the fine grid —
    same recovery contract as the single-stage fine."""
    cfg = MATCH.replace(fine_argmax_downsample=2)
    cloud_q = make_structured_cloud(seed=42)
    cloud_db = apply_2d(cloud_q, dx, dy, yaw)
    res = match_bev(to_bev(cloud_q), to_bev(cloud_db), cfg)
    assert bool(res.success), f"score {float(res.score):.3f}"
    got = np.asarray(res.xy_yaw)
    dyaw = np.arctan2(np.sin(got[2] - yaw), np.cos(got[2] - yaw))
    assert abs(dyaw) < np.deg2rad(2.0)
    assert abs(got[0] - dx) < 0.5 and abs(got[1] - dy) < 0.5


def test_two_stage_fine_serving_preset_geometry():
    """The full serving-preset matcher config (fm coarse + ÷2 fine +
    two-stage argmax + top-f pruning) recovers pose and tracks the exact
    matcher's score closely on a low-overlap pair."""
    cfg = MATCH.replace(coarse_mode="fm", fine_downsample=2,
                        coarse_rot_downsample=8, fine_argmax_downsample=2)
    cloud = make_structured_cloud(seed=7, n_walls=20)
    dx, dy, yaw = 6.0, -5.0, 0.8
    moved = apply_2d(cloud, dx, dy, yaw)
    keep = np.linalg.norm(cloud[:, :2], axis=1) < 15
    q, db = to_bev(cloud[keep]), to_bev(moved)
    res = match_bev(q, db, cfg)
    exact = match_bev(q, db, MATCH)
    assert bool(res.success)
    got = np.asarray(res.xy_yaw)
    dyaw = np.arctan2(np.sin(got[2] - yaw), np.cos(got[2] - yaw))
    assert abs(dyaw) < np.deg2rad(2.0)
    # ÷2 fine grid: 0.4 m cells, tolerance accordingly
    assert abs(got[0] - dx) < 0.8 and abs(got[1] - dy) < 0.8
    assert abs(float(res.score) - float(exact.score)) < 0.12


def test_two_stage_fine_overlap_norm():
    """Two-stage fine composes with masked-NCC scoring (overlap_norm)."""
    cfg = MATCH.replace(fine_argmax_downsample=2, overlap_norm=True)
    cloud = make_structured_cloud(seed=7, n_walls=20)
    dx, dy, yaw = 6.0, -5.0, 0.8
    moved = apply_2d(cloud, dx, dy, yaw)
    keep = np.linalg.norm(cloud[:, :2], axis=1) < 15
    res = match_bev(to_bev(cloud[keep]), to_bev(moved), cfg)
    assert bool(res.success)
    got = np.asarray(res.xy_yaw)
    dyaw = np.arctan2(np.sin(got[2] - yaw), np.cos(got[2] - yaw))
    assert abs(dyaw) < np.deg2rad(2.0)
    assert abs(got[0] - dx) < 0.6 and abs(got[1] - dy) < 0.6


def test_fm_low_overlap_pair():
    cfg = MATCH.replace(coarse_mode="fm")
    cloud = make_structured_cloud(seed=7, n_walls=20)
    dx, dy, yaw = 6.0, -5.0, 0.8
    moved = apply_2d(cloud, dx, dy, yaw)
    keep = np.linalg.norm(cloud[:, :2], axis=1) < 15
    res = match_bev(to_bev(cloud[keep]), to_bev(moved), cfg)
    assert bool(res.success)
    got = np.asarray(res.xy_yaw)
    dyaw = np.arctan2(np.sin(got[2] - yaw), np.cos(got[2] - yaw))
    assert abs(dyaw) < np.deg2rad(2.0)
    assert abs(got[0] - dx) < 0.6 and abs(got[1] - dy) < 0.6
