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
