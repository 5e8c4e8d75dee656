"""i2i (VGG16) pipeline slice: scan → BEV image → VGG descriptor → locate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gloc3d_tpu.config import (
    BEVConfig, IndexConfig, MatchConfig, ModelConfig, PipelineConfig, VoxelConfig,
)
from gloc3d_tpu.models import build_model
from gloc3d_tpu.pipeline import GlobalLocalizer
from test_pipeline import scan_at

N_PTS = 4096

CFG = PipelineConfig(
    bev=BEVConfig(image_size=128, max_points=N_PTS),
    voxel=VoxelConfig(max_points=N_PTS),
    model=ModelConfig(encoder="vgg16", encoder_dim=512,
                      compute_dtype="float32"),
    index=IndexConfig(dim=512, top_k=3, capacity=16),
    match=MatchConfig(image_size=128, min_score=0.15, min_overlap_pixels=16),
)


@pytest.fixture(scope="module")
def localizer():
    model = build_model(CFG.model, CFG.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )
    loc = GlobalLocalizer(CFG, model, params)
    db_poses = [(-30, -30, 0.0), (0, -30, 0.3), (30, 0, 1.6), (0, 30, 3.1)]
    scans = [scan_at(*p) for p in db_poses]
    loc.add_keyframes(
        np.stack([s[0][:, :3] for s in scans]), np.stack([s[1] for s in scans])
    )
    loc.db_poses = db_poses
    return loc


def test_i2i_db_and_detect(localizer):
    assert len(localizer.bank) == 4
    pts, mask = scan_at(*localizer.db_poses[2])
    d2, idx, bev, _ = localizer.detect(pts[None, :, :3], mask[None])
    assert idx[0, 0] == 2
    assert d2[0, 0] < 1e-4
    assert bev.image.shape == (1, 128, 128)


def test_i2i_locate(localizer):
    x, y, yaw = localizer.db_poses[1]
    pts, mask = scan_at(x + 2.0, y - 1.0, yaw + 0.25)
    res = localizer.locate(pts[:, :3], mask)
    assert res.success
    got = np.asarray(res.match_xy_yaw)
    # relative yaw recovered
    assert abs(np.arctan2(np.sin(got[2] - 0.25), np.cos(got[2] - 0.25))) < 0.05


def _render_images(poses):
    """scan_at poses → (imgs (B,S,S,3) float, origins (B,2)) via the BEV op,
    i.e. exactly what `gloc preprocess` writes to npz."""
    from gloc3d_tpu.ops.bev import batch_scan_to_bev

    pts = np.stack([scan_at(*p)[0][:, :3] for p in poses])
    msk = np.stack([scan_at(*p)[1] for p in poses])
    bev = jax.jit(lambda p, m: batch_scan_to_bev(p, m, CFG.bev))(
        jnp.asarray(pts), jnp.asarray(msk)
    )
    imgs = np.asarray(bev.image)[..., None].repeat(3, -1).astype(np.float32)
    return imgs, np.asarray(bev.origin_xy)


def test_i2i_image_input_keyframes_and_locate():
    """Image-input mode: prob images feed the db and the query directly
    (loop_detector.cpp:137-172 semantics), no raw points anywhere."""
    model = build_model(CFG.model, CFG.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )
    loc = GlobalLocalizer(CFG, model, params)
    db_poses = [(-30, -30, 0.0), (0, -30, 0.3), (30, 0, 1.6), (0, 30, 3.1)]
    imgs, origins = _render_images(db_poses)
    loc.add_keyframes(imgs, origins=origins)
    assert len(loc.bank) == 4 and len(loc.keyframes) == 4

    x, y, yaw = db_poses[2]
    q_imgs, q_origins = _render_images([(x + 1.5, y - 1.0, yaw + 0.2)])
    d2, idx, bev, ground = loc.detect(q_imgs, origins=q_origins)
    assert idx[0, 0] == 2 and ground is None
    res = loc.locate(q_imgs[0], origin=q_origins[0])
    assert res.success and res.db_index == 2
    got = np.asarray(res.match_xy_yaw)
    assert abs(np.arctan2(np.sin(got[2] - 0.2), np.cos(got[2] - 0.2))) < 0.06
    # translation recovered within a couple of grid cells
    assert res.pose is not None


def test_i2i_image_evaluate_split(tmp_path):
    """The full i2i registration eval (cli `eval --registration` flow with
    image datasets) runs green end-to-end."""
    from gloc3d_tpu.data.dataset import TripletDataset
    from gloc3d_tpu.eval.evaluator import evaluate_split

    model = build_model(CFG.model, CFG.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )
    loc = GlobalLocalizer(CFG, model, params)
    db_poses = [(-30, -30, 0.0), (0, -30, 0.3), (30, 0, 1.6), (0, 30, 3.1)]
    q_poses = [(1.0, -29.0, 0.45), (29.0, 1.0, 1.5)]
    db_imgs, db_origins = _render_images(db_poses)
    q_imgs, q_origins = _render_images(q_poses)

    def pose_mat(x, y, yaw):
        m = np.eye(4)
        c, s = np.cos(yaw), np.sin(yaw)
        m[:2, :2] = [[c, -s], [s, c]]
        m[0, 3], m[1, 3] = x, y
        return m

    ds = TripletDataset(
        db_inputs=db_imgs, q_inputs=q_imgs,
        utm_db=np.asarray([p[:2] for p in db_poses], np.float32),
        utm_q=np.asarray([p[:2] for p in q_poses], np.float32),
        db_poses=np.stack([pose_mat(*p) for p in db_poses]),
        q_poses=np.stack([pose_mat(*p) for p in q_poses]),
        db_origins=db_origins, q_origins=q_origins,
    )
    report = evaluate_split(loc, ds, out_dir=str(tmp_path), batch=2)
    assert report.recognition_recall[1] == 1.0
    assert report.registration["num_total"] == 2
    assert report.registration["success_rate"] > 0.0


def test_i2i_device_keyframes_matches_host():
    """device_keyframes=True on the i2i image-input path: prob images
    bit-pack at the matcher's <0.5 threshold; locate results identical."""
    model = build_model(CFG.model, CFG.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )
    db_poses = [(-30, -30, 0.0), (0, -30, 0.3), (30, 0, 1.6), (0, 30, 3.1)]
    imgs, origins = _render_images(db_poses)

    loc_h = GlobalLocalizer(CFG, model, params)
    loc_d = GlobalLocalizer(CFG, model, params, device_keyframes=True)
    loc_h.add_keyframes(imgs, origins=origins)
    loc_d.add_keyframes(imgs, origins=origins)
    assert loc_d._kf_store is not None

    x, y, yaw = db_poses[2]
    q_imgs, q_origins = _render_images([(x + 1.5, y - 1.0, yaw + 0.2)])
    rh = loc_h.locate(q_imgs[0], origin=q_origins[0])
    rd = loc_d.locate(q_imgs[0], origin=q_origins[0])
    assert rh.success and rd.success and rh.db_index == rd.db_index == 2
    np.testing.assert_allclose(rd.match_score, rh.match_score,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(rd.match_xy_yaw, rh.match_xy_yaw,
                               rtol=1e-5, atol=1e-4)


def test_i2i_locate_fused_matches_locate():
    """locate_fused on an IMAGE query (one device program: CNN + search +
    HBM-store gather + staged registration) equals the two-call locate."""
    model = build_model(CFG.model, CFG.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )
    loc = GlobalLocalizer(CFG, model, params, device_keyframes=True)
    db_poses = [(-30, -30, 0.0), (0, -30, 0.3), (30, 0, 1.6), (0, 30, 3.1)]
    imgs, origins = _render_images(db_poses)
    loc.add_keyframes(imgs, origins=origins)

    x, y, yaw = db_poses[2]
    q_imgs, q_origins = _render_images([(x + 1.5, y - 1.0, yaw + 0.2)])
    ref = loc.locate(q_imgs[0], origin=q_origins[0])
    res = loc.locate_fused(q_imgs[0], origin=q_origins[0])
    assert ref.success and res.success
    assert res.db_index == ref.db_index == 2
    np.testing.assert_allclose(res.match_score, ref.match_score,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(res.match_xy_yaw, ref.match_xy_yaw,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.pose.translation),
                               np.asarray(ref.pose.translation),
                               rtol=1e-5, atol=1e-4)
