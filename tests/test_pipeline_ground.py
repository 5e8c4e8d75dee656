"""Pipeline with align_ground=True: tilted scans → full 6-DoF composition.

Exercises the path the reference calls 'align' mode (global_localization.cpp
:573, construct_db with EsitmateGroundAndTransform): each scan is gravity-
aligned before BEV/descriptor extraction, and locate() composes roll/pitch/z
from the ground transforms with (x, y, yaw) from the 2-D match
(global_localization.cpp:527-570).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gloc3d_tpu.config import (
    BEVConfig, GroundConfig, IndexConfig, MatchConfig, ModelConfig,
    PipelineConfig, VoxelConfig,
)
from gloc3d_tpu.core.transforms import (
    Rigid3, quat_conj, quat_from_rpy, quat_rotate,
)
from gloc3d_tpu.eval import registration_errors
from gloc3d_tpu.models import build_model
from gloc3d_tpu.pipeline import GlobalLocalizer
from test_pipeline import WORLD

N_PTS = 4096

CFG = PipelineConfig(
    bev=BEVConfig(image_size=256, max_points=N_PTS),
    voxel=VoxelConfig(max_points=N_PTS),
    model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                      compute_dtype="float32"),
    index=IndexConfig(dim=128, top_k=3, capacity=16),
    match=MatchConfig(image_size=256),
    ground=GroundConfig(num_candidates=1024, ransac_iters=128),
)


def tilted_scan(x, y, yaw, roll, pitch, height=1.7, view=35.0, n=N_PTS,
                seed=0):
    """World → sensor frame of a sensor at (x, y, height) with attitude
    (roll, pitch, yaw). World has a ground plane at z=0 plus wall structure."""
    rng = np.random.RandomState(seed)
    rel = WORLD[:, :2] - np.array([x, y])
    keep = np.linalg.norm(rel, axis=1) < view
    struct = WORLD[keep].copy()
    struct[:, 0] -= x
    struct[:, 1] -= y
    # add ground-plane returns (the world in test_pipeline has no ground)
    gx = rng.uniform(-18, 18, 1200)
    gy = rng.uniform(-18, 18, 1200)
    ground = np.stack([gx, gy, np.zeros(1200)], 1)
    world_pts = np.concatenate([struct, ground]).astype(np.float32)
    world_pts[:, 2] -= height
    q = quat_from_rpy(jnp.float32(roll), jnp.float32(pitch), jnp.float32(yaw))
    sensor = np.array(quat_rotate(quat_conj(q)[None], jnp.asarray(world_pts)))
    sensor += rng.normal(0, 0.01, sensor.shape).astype(np.float32)
    pad = np.zeros((n, 3), np.float32)
    m = min(len(sensor), n)
    sel = rng.choice(len(sensor), m, replace=False) if len(sensor) > n else np.arange(len(sensor))
    pad[: len(sel)] = sensor[sel]
    mask = np.zeros(n, np.float32)
    mask[: len(sel)] = 1.0
    return pad, mask


@pytest.fixture(scope="module")
def localizer():
    model = build_model(CFG.model, CFG.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, N_PTS, 3)), jnp.zeros((1, N_PTS))
    )
    loc = GlobalLocalizer(CFG, model, params, align_ground=True)
    # db keyframes with small random tilts (vehicle attitude noise)
    poses = [(-30, -30, 0.0), (0, -30, 0.4), (30, 0, 1.5), (0, 30, 3.0)]
    tilts = [(0.02, -0.01), (-0.015, 0.02), (0.01, 0.015), (-0.02, -0.02)]
    scans = [tilted_scan(*p, roll=r, pitch=pi, seed=i)
             for i, (p, (r, pi)) in enumerate(zip(poses, tilts))]
    loc.add_keyframes(
        np.stack([s[0] for s in scans]), np.stack([s[1] for s in scans])
    )
    loc.db_poses = poses
    loc.db_tilts = tilts
    return loc


def test_ground_transforms_stored(localizer):
    for kf in localizer.keyframes:
        assert kf.ground is not None
        # lidar height ~1.7 recovered in the z translation
        assert abs(float(kf.ground.translation[2]) - 1.7) < 0.15


def test_locate_composes_full_6dof(localizer):
    i = 1
    x, y, yaw = localizer.db_poses[i]
    q_pose = (x + 2.5, y - 1.5, yaw + 0.3)
    q_tilt = (0.03, -0.02)
    pts, mask = tilted_scan(*q_pose, roll=q_tilt[0], pitch=q_tilt[1],
                            height=1.65, seed=99)
    res = localizer.locate(pts, mask)
    assert res.success
    db_i = res.db_index
    db_pose = localizer.db_poses[db_i]
    db_tilt = localizer.db_tilts[db_i]

    # GT relative pose T_db⁻¹ ∘ T_q with full attitudes and heights
    def pose6(p, tilt, h):
        q = quat_from_rpy(jnp.float32(tilt[0]), jnp.float32(tilt[1]),
                          jnp.float32(p[2]))
        return Rigid3(q, jnp.array([p[0], p[1], h]))

    gt = pose6(db_pose, db_tilt, 1.7).inverse().compose(
        pose6(q_pose, q_tilt, 1.65)
    )
    err_pos, err_rot = registration_errors(
        Rigid3(jnp.asarray(res.pose.rotation), jnp.asarray(res.pose.translation)),
        gt,
    )
    assert float(err_pos) < 1.0, f"pos err {float(err_pos)}"
    assert float(err_rot) < 5.0, f"rot err {float(err_rot)}"
    # z offset (height difference) must be captured by the rpz chain
    assert abs(float(res.pose.translation[2]) - float(gt.translation[2])) < 0.3


def test_mixed_mode_map_does_not_crash(localizer):
    """A db keyframe ingested WITHOUT a ground estimate (mixed-mode map —
    e.g. keyframes imported from an unaligned session) must not crash the
    aligned 6-DoF composition: its missing ground frame composes as
    identity (pipeline._db_ground)."""
    from gloc3d_tpu.pipeline import Keyframe

    i = 1
    x, y, yaw = localizer.db_poses[i]
    pts, mask = tilted_scan(x + 2.0, y - 1.0, yaw + 0.2,
                            roll=0.02, pitch=-0.01, seed=123)
    saved = localizer.keyframes[i]
    try:
        localizer.keyframes[i] = Keyframe(saved.image, saved.origin_xy,
                                          None, saved.cloud)
        res = localizer.match_keyframe(pts, mask, db_index=i)
        assert res.success and res.pose is not None
        # identity db-ground: x/y/yaw still recovered from the 2-D match
        assert abs(float(res.pose.translation[0]) - 2.0) < 1.0
        res2 = localizer.locate(pts, mask)
        assert res2.success and res2.pose is not None
    finally:
        localizer.keyframes[i] = saved
