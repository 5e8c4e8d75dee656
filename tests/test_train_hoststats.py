"""Host-stats training path: the serving fast path's zero-device-scatter
extraction used for train steps (TrainConfig.host_stats).

Parity target: the all-device step (points_to_voxels scatters). The two
differ only in float accumulation order (host stats sums + Pallas cumsum
vs XLA scatter), so losses/grads agree to reassociation tolerance; the
segment-sum backward itself is an exact row gather
(ops/pallas_scatter.py::segment_sum_sorted_grad).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gloc3d_tpu.config import (
    BEVConfig, IndexConfig, ModelConfig, PipelineConfig, TrainConfig,
    VoxelConfig,
)
from gloc3d_tpu.models import build_model
from gloc3d_tpu.ops.pallas_scatter import segment_sum_sorted_grad
from gloc3d_tpu.ops.voxelize import segment_sum_sorted
from gloc3d_tpu.train import Trainer
from tests.test_train import CFG, _make_dataset

HS_CFG = CFG.replace(train=CFG.train.replace(host_stats=True))


# ------------------------------------------------------- segment-sum VJP

def test_segment_sum_grad_matches_xla():
    rng = np.random.RandomState(0)
    n, v, c = 512, 16, 64
    ids = np.sort(rng.randint(0, v, n)).astype(np.int32)
    starts = np.searchsorted(ids, np.arange(v + 1), "left").astype(np.int32)
    vals = jnp.asarray(rng.randn(n, c).astype(np.float32))
    w = jnp.asarray(rng.randn(v, c).astype(np.float32))  # non-trivial cotangent

    f_new = lambda x: (segment_sum_sorted_grad(
        x, jnp.asarray(starts), jnp.asarray(ids)) * w).sum()
    f_ref = lambda x: (segment_sum_sorted(x, jnp.asarray(starts)) * w).sum()
    np.testing.assert_allclose(f_new(vals), f_ref(vals), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_new)(vals)), np.asarray(jax.grad(f_ref)(vals)),
        rtol=1e-5, atol=1e-5,
    )


def test_segment_sum_grad_vmapped():
    rng = np.random.RandomState(1)
    b, n, v, c = 3, 256, 8, 64
    ids = np.stack([np.sort(rng.randint(0, v, n)) for _ in range(b)]
                   ).astype(np.int32)
    starts = np.stack([
        np.searchsorted(ids[i], np.arange(v + 1), "left") for i in range(b)
    ]).astype(np.int32)
    vals = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    w = jnp.asarray(rng.randn(b, v, c).astype(np.float32))

    f_new = lambda x: (jax.vmap(segment_sum_sorted_grad)(
        x, jnp.asarray(starts), jnp.asarray(ids)) * w).sum()
    f_ref = lambda x: (jax.vmap(segment_sum_sorted)(
        x, jnp.asarray(starts)) * w).sum()
    np.testing.assert_allclose(f_new(vals), f_ref(vals), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_new)(vals)), np.asarray(jax.grad(f_ref)(vals)),
        rtol=1e-5, atol=1e-5,
    )


def test_segment_sum_fp32_error_at_reference_scale():
    """fp32 running-cumsum cancellation at the real point count (N=122880,
    KITTI pad) with the worst-case layout: a huge pillar-0 padding segment
    first, thousands of small pillars late. Both the Pallas cumsum path and
    the XLA sorted path are compared against an fp64 ground truth; measured
    max error is ~4e-3 of the per-segment L1 mass for BOTH (the Pallas
    kernel adds no pathology over XLA's own fp32 accumulation)."""
    rng = np.random.RandomState(0)
    n, c, v = 122880, 16, 4480
    n_pad = n // 2
    ids = np.concatenate([
        np.zeros(n_pad, np.int64),
        np.sort(rng.randint(1, v, n - n_pad)),
    ])
    starts = np.searchsorted(ids, np.arange(v + 1), "left").astype(np.int32)
    vals = rng.uniform(-35, 35, (n, c)).astype(np.float32)

    ref = np.zeros((v, c))
    np.add.at(ref, ids, vals.astype(np.float64))
    l1 = np.zeros((v, c))
    np.add.at(l1, ids, np.abs(vals).astype(np.float64))

    from gloc3d_tpu.ops.pallas_scatter import segment_sum_sorted_fast

    got = np.asarray(segment_sum_sorted_fast(
        jnp.asarray(vals), jnp.asarray(starts)))
    xla = np.asarray(segment_sum_sorted(
        jnp.asarray(vals), jnp.asarray(starts)))
    rel_fast = (np.abs(got - ref) / np.maximum(l1, 1e-9)).max()
    rel_xla = (np.abs(xla - ref) / np.maximum(l1, 1e-9)).max()
    assert rel_fast < 2e-2, f"Pallas path error blew up: {rel_fast:.2e}"
    assert rel_fast < 4 * max(rel_xla, 1e-4), (
        f"Pallas path materially worse than XLA: {rel_fast:.2e} "
        f"vs {rel_xla:.2e}"
    )


# ------------------------------------------------------- step parity

@pytest.fixture(scope="module")
def world(tmp_path_factory):
    ds = _make_dataset()
    # exercise the padding path: mask out the tail of every scan (the
    # unmasked-BN quirk must see the same rows on both paths)
    ds.db_masks[:, -32:] = 0.0
    ds.db_inputs[:, -32:] = 0.0
    ds.q_masks[:, -32:] = 0.0
    ds.q_inputs[:, -32:] = 0.0
    model = build_model(CFG.model, CFG.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(ds.db_inputs[:1]), jnp.asarray(ds.db_masks[:1]),
    )
    wd = tmp_path_factory.mktemp("hs")
    std = Trainer(CFG, model, ds, str(wd / "std"))
    hs = Trainer(HS_CFG, model, ds, str(wd / "hs"))
    state = std.init_state(params["params"], params.get("batch_stats"))
    return ds, std, hs, state


def test_cache_matches(world):
    ds, std, hs, state = world
    c_std = np.asarray(std.compute_cache(state, ds.db_inputs, ds.db_masks))
    c_hs = np.asarray(hs.compute_cache(state, ds.db_inputs, ds.db_masks))
    np.testing.assert_allclose(c_hs, c_std, rtol=5e-4, atol=5e-5)


def test_train_step_matches(world):
    ds, std, hs, state = world
    b, n_neg = CFG.train.batch_size, CFG.train.n_neg
    q_in, q_mk = ds.q_inputs[:b], ds.q_masks[:b]
    p_in, p_mk = ds.db_inputs[:b], ds.db_masks[:b]
    n_in = ds.db_inputs[b : b + b * n_neg]
    n_mk = ds.db_masks[b : b + b * n_neg]
    neg_valid = jnp.ones((b, n_neg), jnp.float32)
    q_valid = jnp.ones((b,), jnp.float32)

    s_std, loss_std = std._train_step(
        state, jnp.asarray(q_in), jnp.asarray(q_mk), jnp.asarray(p_in),
        jnp.asarray(p_mk), jnp.asarray(n_in), jnp.asarray(n_mk),
        neg_valid, q_valid, jax.random.PRNGKey(7),
    )
    cat_in = np.concatenate([q_in, p_in, n_in], axis=0)
    cat_mk = np.concatenate([q_mk, p_mk, n_mk], axis=0)
    p_sorted, vl, vs = hs._host_sorted(cat_in, cat_mk)
    s_hs, loss_hs = hs._train_step_hs(state, p_sorted, vl, vs,
                                      neg_valid, q_valid)

    np.testing.assert_allclose(float(loss_hs), float(loss_std),
                               rtol=1e-4, atol=1e-6)
    flat_std = jax.tree_util.tree_leaves_with_path(s_std.params)
    flat_hs = jax.tree_util.tree_leaves_with_path(s_hs.params)
    for (p1, a), (p2, b_) in zip(flat_std, flat_hs):
        assert p1 == p2
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=5e-3, atol=1e-6,
            err_msg=jax.tree_util.keystr(p1),
        )
    # BN batch stats see the same rows (permutation-invariant)
    for (p1, a), (p2, b_) in zip(
        jax.tree_util.tree_leaves_with_path(s_std.batch_stats),
        jax.tree_util.tree_leaves_with_path(s_hs.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(p1),
        )


def test_fit_epochs_decrease_loss(world):
    ds, std, hs, state = world
    s = state
    losses = []
    for e in range(1, 5):
        s, loss = hs.train_epoch(s, e)
        assert np.isfinite(loss)
        losses.append(loss)
    assert min(losses[1:]) < losses[0], f"no loss decrease: {losses}"
    rec = hs.evaluate(s)
    assert 0.0 <= rec[5] <= 1.0


def test_augment_yaw_host_matches_device(world):
    """The host-stats path's numpy yaw augmentation and the device path's
    traced one share draw (draw_aug_yaw) and rotation (rotate_clouds_z);
    pin their equality so the two cannot silently drift."""
    from gloc3d_tpu.train.trainer import draw_aug_yaw, rotate_clouds_z

    rng = np.random.RandomState(3)
    q = rng.randn(4, 64, 4).astype(np.float32)
    key = jax.random.PRNGKey(11)
    yaw_dev = draw_aug_yaw(key, 4)
    dev = np.asarray(jax.jit(
        lambda x: rotate_clouds_z(x, draw_aug_yaw(key, 4), jnp))(
            jnp.asarray(q)))
    host = rotate_clouds_z(q, np.asarray(yaw_dev), np)
    np.testing.assert_allclose(host, dev, rtol=1e-6, atol=1e-6)


def test_dp_step_matches_single_device(tmp_path):
    """Host-stats step over the 8-device mesh == single device (the DP
    sharding wiring for the concatenated batch + vs tuple)."""
    from gloc3d_tpu.parallel import make_mesh

    n_pts = 128
    cfg = PipelineConfig(
        bev=BEVConfig(image_size=64, max_points=n_pts),
        voxel=VoxelConfig(max_points=n_pts, xbound=(-8.0, 8.0, 0.5),
                          ybound=(-4.0, 4.0, 0.5)),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                          compute_dtype="float32"),
        index=IndexConfig(dim=128),
        train=TrainConfig(batch_size=8, n_neg=2, n_neg_sample=8,
                          host_stats=True),
    )
    rng = np.random.RandomState(0)

    def cloud(m):
        out = np.zeros((m, n_pts, 4), np.float32)
        out[:, :, 0] = rng.uniform(-7, 7, (m, n_pts))
        out[:, :, 1] = rng.uniform(-3.5, 3.5, (m, n_pts))
        out[:, :, 2] = rng.uniform(0, 3, (m, n_pts))
        return out

    from gloc3d_tpu.data.dataset import TripletDataset

    ds = TripletDataset(
        db_inputs=cloud(32), q_inputs=cloud(8),
        utm_db=rng.randn(32, 2) * 100, utm_q=rng.randn(8, 2) * 100,
        db_masks=np.ones((32, n_pts), np.float32),
        q_masks=np.ones((8, n_pts), np.float32),
    )
    model = build_model(cfg.model, cfg.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(ds.db_inputs[:1]),
        jnp.asarray(ds.db_masks[:1]),
    )
    tr_dp = Trainer(cfg, model, ds, str(tmp_path / "dp"), mesh=make_mesh())
    tr_sd = Trainer(cfg, model, ds, str(tmp_path / "sd"))
    s0 = tr_dp.init_state(params["params"], params.get("batch_stats"))

    b, n_neg = 8, 2
    cat = np.concatenate(
        [ds.q_inputs, ds.db_inputs[:b], ds.db_inputs[: b * n_neg]], axis=0)
    cat_mk = np.concatenate(
        [ds.q_masks, ds.db_masks[:b], ds.db_masks[: b * n_neg]], axis=0)
    p_sorted, vl, vs = tr_dp._host_sorted(cat, cat_mk)
    neg_valid = jnp.ones((b, n_neg), jnp.float32)
    q_valid = jnp.ones((b,), jnp.float32)
    new_dp, loss_dp = tr_dp._train_step_hs(s0, p_sorted, vl, vs,
                                           neg_valid, q_valid)
    new_sd, loss_sd = tr_sd._train_step_hs(s0, p_sorted, vl, vs,
                                           neg_valid, q_valid)
    np.testing.assert_allclose(float(loss_dp), float(loss_sd), rtol=1e-4)
    for a, bb in zip(jax.tree_util.tree_leaves(new_dp.params),
                     jax.tree_util.tree_leaves(new_sd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5)


def test_augment_yaw_composes(world):
    ds, std, hs, state = world
    cfg = HS_CFG.replace(train=HS_CFG.train.replace(augment_yaw=True))
    model = hs.model
    tr = Trainer(cfg, model, ds, hs.workdir)
    s, loss = tr.train_epoch(state, 1)
    assert np.isfinite(loss)
