"""Profiling/observability + data-parallel trainer tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.profiling import MetricsLogger, StageTimer


def test_stage_timer():
    t = StageTimer()
    x = jnp.ones((128, 128))
    with t.stage("matmul", result_ref=None):
        y = x @ x
    with t.stage("matmul", result_ref=y):
        y = x @ x
    assert t.count["matmul"] == 2
    assert t.mean_ms("matmul") >= 0
    assert "matmul" in t.report()


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "metrics.jsonl")
    m = MetricsLogger(p)
    m.log(1, loss=0.5, recall={"1": 0.9})
    m.log(2, loss=0.4)
    m.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["loss"] == 0.5
    assert lines[1]["step"] == 2


def test_data_parallel_trainer(devices, tmp_path):
    """One DP train step over the 8-device CPU mesh changes params and
    matches the single-device step."""
    from gloc3d_tpu.config import (
        BEVConfig, IndexConfig, ModelConfig, PipelineConfig, TrainConfig,
        VoxelConfig,
    )
    from gloc3d_tpu.data.dataset import TripletDataset
    from gloc3d_tpu.models import build_model
    from gloc3d_tpu.parallel import make_mesh
    from gloc3d_tpu.train import Trainer

    n_pts = 128
    cfg = PipelineConfig(
        bev=BEVConfig(image_size=64, max_points=n_pts),
        voxel=VoxelConfig(max_points=n_pts, xbound=(-8.0, 8.0, 0.5),
                          ybound=(-4.0, 4.0, 0.5)),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                          compute_dtype="float32"),
        index=IndexConfig(dim=128),
        train=TrainConfig(batch_size=8, n_neg=2, n_neg_sample=8),
    )
    rng = np.random.RandomState(0)

    def cloud(m):
        out = np.zeros((m, n_pts, 4), np.float32)
        out[:, :, 0] = rng.uniform(-7, 7, (m, n_pts))
        out[:, :, 1] = rng.uniform(-3.5, 3.5, (m, n_pts))
        out[:, :, 2] = rng.uniform(0, 3, (m, n_pts))
        return out

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
    mesh = make_mesh()
    tr_dp = Trainer(cfg, model, ds, str(tmp_path / "dp"), mesh=mesh)
    tr_sd = Trainer(cfg, model, ds, str(tmp_path / "sd"))
    s_dp = tr_dp.init_state(params["params"], params.get("batch_stats"))
    s_sd = tr_sd.init_state(params["params"], params.get("batch_stats"))

    b = 8
    args = (
        jnp.asarray(ds.q_inputs), jnp.asarray(ds.q_masks),
        jnp.asarray(ds.db_inputs[:b]), jnp.asarray(ds.db_masks[:b]),
        jnp.asarray(ds.db_inputs[: b * 2]), jnp.asarray(ds.db_masks[: b * 2]),
        jnp.ones((b, 2), jnp.float32), jnp.ones((b,), jnp.float32),
    )
    aug_key = jax.random.PRNGKey(7)
    new_dp, loss_dp = tr_dp._train_step(s_dp, *args, aug_key)
    new_sd, loss_sd = tr_sd._train_step(s_sd, *args, aug_key)
    assert np.isfinite(float(loss_dp))
    np.testing.assert_allclose(float(loss_dp), float(loss_sd), rtol=1e-4)
    # parameters updated identically (DP == single-device math)
    for a, bb in zip(jax.tree_util.tree_leaves(new_dp.params),
                     jax.tree_util.tree_leaves(new_sd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5)


def test_profiler_trace(tmp_path):
    from gloc3d_tpu.profiling import trace

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        x = jnp.ones((64, 64))
        np.asarray(x @ x)
    # a trace directory with at least one event file must exist
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "no profiler trace files written"


def test_data_parallel_trainer_i2i(devices, tmp_path):
    """DP trainer with image inputs (masks=None) — the i2i + mesh combination
    must work (sharding specs tolerate the empty mask pytrees)."""
    from gloc3d_tpu.config import (
        BEVConfig, IndexConfig, ModelConfig, PipelineConfig, TrainConfig,
        VoxelConfig,
    )
    from gloc3d_tpu.data.dataset import TripletDataset
    from gloc3d_tpu.models import build_model
    from gloc3d_tpu.parallel import make_mesh
    from gloc3d_tpu.train import Trainer

    s = 32
    cfg = PipelineConfig(
        bev=BEVConfig(image_size=s, max_points=64),
        voxel=VoxelConfig(max_points=64),
        model=ModelConfig(encoder="vgg16", encoder_dim=512,
                          num_clusters=4, compute_dtype="float32"),
        index=IndexConfig(dim=512),
        train=TrainConfig(batch_size=8, n_neg=2, n_neg_sample=8),
    )
    rng = np.random.RandomState(0)

    def imgs(m):
        return rng.uniform(0, 1, (m, s, s, 3)).astype(np.float32)

    ds = TripletDataset(
        db_inputs=imgs(32), q_inputs=imgs(8),
        utm_db=rng.randn(32, 2) * 100, utm_q=rng.randn(8, 2) * 100,
        db_masks=None, q_masks=None,
    )
    model = build_model(cfg.model, cfg.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(ds.db_inputs[:1]))
    mesh = make_mesh()
    tr = Trainer(cfg, model, ds, str(tmp_path / "dp_i2i"), mesh=mesh)
    state = tr.init_state(params["params"], params.get("batch_stats"))
    b = 8
    args = (
        jnp.asarray(ds.q_inputs), None,
        jnp.asarray(ds.db_inputs[:b]), None,
        jnp.asarray(ds.db_inputs[: b * 2]), None,
        jnp.ones((b, 2), jnp.float32), jnp.ones((b,), jnp.float32),
    )
    new_state, loss = tr._train_step(state, *args, jax.random.PRNGKey(7))
    assert np.isfinite(float(loss))
