"""i2i (image-input, maskless) trainer path: one epoch + eval must run."""

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import (
    BEVConfig, IndexConfig, ModelConfig, PipelineConfig, TrainConfig, VoxelConfig,
)
from gloc3d_tpu.data.dataset import TripletDataset
from gloc3d_tpu.models import build_model
from gloc3d_tpu.train import Trainer

CFG = PipelineConfig(
    bev=BEVConfig(image_size=64),
    model=ModelConfig(encoder="vgg16", encoder_dim=512,
                      compute_dtype="float32"),
    index=IndexConfig(dim=512),
    train=TrainConfig(batch_size=2, n_neg=2, n_neg_sample=8,
                      cache_refresh_rate=8, epochs=1, eval_every=1, lr=1e-3),
)


def _make_images(n, seed):
    rng = np.random.RandomState(seed)
    imgs = np.ones((n, 64, 64, 3), np.float32)
    for i in range(n):
        site = np.random.RandomState(i % 8)
        for _ in range(6):
            r, c = site.randint(4, 56, 2)
            length = site.randint(6, 20)
            imgs[i, r, c:c + length] = 0.0
        imgs[i] += rng.normal(0, 0.01, imgs[i].shape)
    return imgs


def test_i2i_train_epoch_and_eval(tmp_path):
    n_db, n_q = 16, 6
    ds = TripletDataset(
        db_inputs=_make_images(n_db, 0),
        q_inputs=_make_images(n_q, 1),
        utm_db=np.array([((i % 4) * 60.0, (i // 4) * 60.0) for i in range(n_db)]),
        utm_q=np.array([((i % 4) * 60.0 + 2, (i // 4) * 60.0 - 1) for i in range(n_q)]),
    )
    model = build_model(CFG.model)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(ds.db_inputs[:1])
    )
    tr = Trainer(CFG, model, ds, str(tmp_path))
    state = tr.init_state(params["params"], params.get("batch_stats"))
    state, loss = tr.train_epoch(state, 1)
    assert np.isfinite(loss)
    rec = tr.evaluate(state)
    assert 0.0 <= rec[1] <= 1.0


import pytest


@pytest.mark.parametrize("encoder", ["alexnet", "mobilenet", "resnet18"])
def test_encoder_zoo_cluster_train_eval(tmp_path, encoder):
    """The alternative encoder baselines (main.py:519-564) run the full
    cluster-init -> frozen-encoder train epoch -> eval path."""
    from gloc3d_tpu.models.encoders import (
        ENCODER_DIMS, encoder_trainable_mask,
    )
    from gloc3d_tpu.train.cluster import init_vlad_from_data

    dim = ENCODER_DIMS[encoder]
    cfg = CFG.replace(
        model=CFG.model.replace(encoder=encoder, encoder_dim=dim),
        index=CFG.index.replace(dim=dim),
        # huge margin: every negative violates, so the epoch is guaranteed
        # to take gradient steps (main.py skips non-violating queries)
        train=CFG.train.replace(margin=10.0),
    )
    n_db, n_q = 8, 4
    ds = TripletDataset(
        db_inputs=_make_images(n_db, 2),
        q_inputs=_make_images(n_q, 3),
        utm_db=np.array([((i % 4) * 60.0, (i // 4) * 60.0)
                         for i in range(n_db)]),
        utm_q=np.array([((i % 4) * 60.0 + 2, (i // 4) * 60.0 - 1)
                        for i in range(n_q)]),
    )
    model = build_model(cfg.model)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(ds.db_inputs[:1])
    )
    # cluster-mode VLAD init (the reference's mandatory --mode=cluster)
    params, cents, _ = init_vlad_from_data(
        cfg, model, params, ds.db_inputs, None, jax.random.PRNGKey(1),
        num_images=8, per_image=16,
    )
    assert cents.shape == (cfg.model.num_clusters, dim)

    # reference freeze rules: mask over the full param tree
    enc_mask = encoder_trainable_mask(encoder, params["params"]["encoder"])
    mask = jax.tree.map(lambda _: True, params["params"])
    mask["encoder"] = enc_mask
    tr = Trainer(cfg, model, ds, str(tmp_path / encoder),
                 trainable_mask=mask)
    state = tr.init_state(params["params"], params.get("batch_stats"))
    frozen_before = jax.tree.map(
        lambda p: np.asarray(p).copy(), state.params["encoder"])
    state, loss = tr.train_epoch(state, 1)
    assert np.isfinite(loss)

    # frozen leaves unchanged, at least one trainable leaf moved
    import flax.traverse_util as tu

    flat_m = tu.flatten_dict(enc_mask)
    flat_b = tu.flatten_dict(frozen_before)
    flat_a = tu.flatten_dict(jax.tree.map(np.asarray,
                                          state.params["encoder"]))
    for k, trainable in flat_m.items():
        if not trainable:
            np.testing.assert_array_equal(flat_a[k], flat_b[k])
    assert any(
        not np.array_equal(flat_a[k], flat_b[k])
        for k, trainable in flat_m.items() if trainable
    )
    rec = tr.evaluate(state)
    assert 0.0 <= rec[1] <= 1.0
