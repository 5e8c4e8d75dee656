"""Training stack tests: mining semantics, one fit() cycle, checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gloc3d_tpu.config import (
    IndexConfig, ModelConfig, PipelineConfig, TrainConfig, VoxelConfig, BEVConfig,
)
from gloc3d_tpu.data.dataset import TripletDataset
from gloc3d_tpu.models import build_model
from gloc3d_tpu.train import Trainer, mine_triplets
from gloc3d_tpu.train.cluster import init_vlad_from_data

N_PTS = 256

CFG = PipelineConfig(
    bev=BEVConfig(image_size=128, max_points=N_PTS),
    # tiny 40x24 pillar grid keeps the CPU conv backward tractable in CI
    voxel=VoxelConfig(max_points=N_PTS, xbound=(-10.0, 10.0, 0.5),
                      ybound=(-6.0, 6.0, 0.5)),
    model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                      compute_dtype="float32"),
    index=IndexConfig(dim=128),
    train=TrainConfig(batch_size=2, n_neg=3, n_neg_sample=16,
                      cache_refresh_rate=8, epochs=2, eval_every=1,
                      lr=1e-3),
)


# ---------------------------------------------------------------- mining

def test_mine_triplets_semantics():
    rng = np.random.RandomState(0)
    d = 8
    ndb, nq = 32, 4
    cache_db = rng.randn(ndb, d).astype(np.float32)
    # query 0 identical to db 3 (positive), db 10 is a margin-violating negative
    cache_q = rng.randn(nq, d).astype(np.float32)
    cache_q[0] = cache_db[3] + 0.01
    cache_db[10] = cache_q[0] + 0.02  # very close negative
    pos_mask = np.zeros((nq, ndb), bool)
    pos_mask[:, 3] = True
    neg_mask = np.ones((nq, ndb), bool)
    neg_mask[:, 3] = False
    mined = mine_triplets(
        jnp.asarray(cache_db), jnp.asarray(cache_q),
        jnp.arange(4), jnp.asarray(pos_mask), jnp.asarray(neg_mask),
        jnp.zeros((nq, 3), jnp.int32), jax.random.PRNGKey(0),
        margin=0.1, n_neg=3, n_sample=64,
    )
    assert int(mined.pos_idx[0]) == 3
    assert bool(mined.valid[0])
    # the planted close negative must be selected first for query 0
    assert int(mined.neg_idx[0, 0]) == 10
    # selected negatives are never the positive-radius entries
    sel = np.asarray(mined.neg_idx)[np.asarray(mined.neg_valid) > 0]
    assert not np.isin(sel, [3]).any()


def test_mine_no_violators_invalid():
    d = 4
    cache_db = 100.0 + np.arange(8 * d, dtype=np.float32).reshape(8, d)  # all far
    cache_q = np.zeros((1, d), np.float32)
    cache_db[0] = cache_q[0]  # positive identical -> d_pos = 0
    pos_mask = np.zeros((1, 8), bool)
    pos_mask[0, 0] = True
    neg_mask = ~pos_mask
    mined = mine_triplets(
        jnp.asarray(cache_db), jnp.asarray(cache_q), jnp.zeros(1, jnp.int32),
        jnp.asarray(pos_mask), jnp.asarray(neg_mask),
        jnp.zeros((1, 3), jnp.int32), jax.random.PRNGKey(1),
        margin=0.1, n_neg=3, n_sample=16,
    )
    assert not bool(mined.valid[0])


# ---------------------------------------------------------------- dataset

def _make_dataset(n_db=16, n_q=8, seed=0):
    """Clustered world: scans near each other share structure."""
    rng = np.random.RandomState(seed)
    db_inputs = np.zeros((n_db, N_PTS, 4), np.float32)
    db_masks = np.ones((n_db, N_PTS), np.float32)
    utm_db = np.zeros((n_db, 2))
    for i in range(n_db):
        cx, cy = (i % 4) * 60.0, (i // 4) * 60.0
        utm_db[i] = (cx, cy)
        # per-site structure, deterministic by site
        site_rng = np.random.RandomState(i)
        db_inputs[i, :, 0] = site_rng.uniform(-9, 9, N_PTS)
        db_inputs[i, :, 1] = site_rng.uniform(-5, 5, N_PTS)
        db_inputs[i, :, 2] = site_rng.uniform(0, 3, N_PTS)
    q_inputs = np.zeros((n_q, N_PTS, 4), np.float32)
    q_masks = np.ones((n_q, N_PTS), np.float32)
    utm_q = np.zeros((n_q, 2))
    for j in range(n_q):
        i = j % n_db
        utm_q[j] = utm_db[i] + rng.uniform(-3, 3, 2)
        q_inputs[j] = db_inputs[i]
        q_inputs[j, :, :2] += rng.normal(0, 0.05, (N_PTS, 2)).astype(np.float32)
    return TripletDataset(
        db_inputs=db_inputs, q_inputs=q_inputs,
        utm_db=utm_db, utm_q=utm_q,
        db_masks=db_masks, q_masks=q_masks,
    )


@pytest.fixture(scope="module")
def trainer_and_state(tmp_path_factory):
    ds = _make_dataset()
    model = build_model(CFG.model, CFG.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(ds.db_inputs[:1]), jnp.asarray(ds.db_masks[:1]),
    )
    wd = str(tmp_path_factory.mktemp("run"))
    trainer = Trainer(CFG, model, ds, wd)
    state = trainer.init_state(params["params"], params.get("batch_stats"))
    return trainer, state


def test_fit_runs_and_improves_loss(trainer_and_state):
    trainer, state = trainer_and_state
    state, loss1 = trainer.train_epoch(state, 1)
    losses = []
    for e in range(2, 6):
        state, l = trainer.train_epoch(state, e)
        losses.append(l)
    assert np.isfinite(loss1)
    # loss should not blow up; usually decreases on this easy set
    assert losses[-1] <= loss1 * 1.5
    trainer._fit_state = state


def test_evaluate_recall(trainer_and_state):
    trainer, state = trainer_and_state
    rec = trainer.evaluate(state)
    # queries are near-copies of their db sites: recall@5 should be high
    assert rec[5] >= 0.75
    assert 0.0 <= rec[1] <= 1.0


def test_checkpoint_roundtrip(trainer_and_state):
    trainer, state = trainer_and_state
    trainer.save_checkpoint(state, "latest")
    restored = trainer.load_checkpoint("latest", state)
    leaves1 = jax.tree_util.tree_leaves(state.params)
    leaves2 = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cluster_init(trainer_and_state):
    trainer, state = trainer_and_state
    ds = trainer.ds
    model = trainer.model
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    new_params, cents, descs = init_vlad_from_data(
        CFG, model, variables, ds.db_inputs, ds.db_masks,
        jax.random.PRNGKey(3), num_images=8, per_image=50,
    )
    assert cents.shape == (CFG.model.num_clusters, CFG.model.encoder_dim)
    np.testing.assert_allclose(
        np.asarray(new_params["params"]["pool"]["centroids"]), cents, atol=1e-5
    )


def test_yaw_augmentation_rotates_only_query_xyz():
    import jax

    from gloc3d_tpu.config import TrainConfig

    cfg_aug = CFG.replace(train=CFG.train.replace(augment_yaw=True))
    ds = _make_dataset()
    model = build_model(cfg_aug.model, cfg_aug.voxel)
    trainer = Trainer(cfg_aug, model, ds, "/tmp/aug_test")
    q = jnp.asarray(ds.q_inputs[:2])
    out = trainer._augment_yaw(q, jax.random.PRNGKey(0))
    # intensity channel unchanged; xy norms preserved (pure rotation)
    np.testing.assert_allclose(np.asarray(out[..., 3]), ds.q_inputs[:2, :, 3],
                               atol=1e-6)
    r_in = np.linalg.norm(ds.q_inputs[:2, :, :2], axis=-1)
    r_out = np.linalg.norm(np.asarray(out[..., :2]), axis=-1)
    np.testing.assert_allclose(r_out, r_in, atol=1e-4)
    # z unchanged
    np.testing.assert_allclose(np.asarray(out[..., 2]), ds.q_inputs[:2, :, 2],
                               atol=1e-6)


def test_adam_optimizer_option(trainer_and_state, tmp_path):
    """TrainConfig.optimizer='adam' mirrors main.py:630-632: plain Adam(lr),
    no weight decay, no StepLR — one epoch must run to a finite loss."""
    ds = _make_dataset(n_db=8, n_q=4, seed=3)
    model = build_model(CFG.model, CFG.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(ds.db_inputs[:1]), jnp.asarray(ds.db_masks[:1]),
    )
    cfg = CFG.replace(train=CFG.train.replace(optimizer="adam"))
    trainer = Trainer(cfg, model, ds, str(tmp_path))
    state = trainer.init_state(params["params"], params.get("batch_stats"))
    import optax
    assert any(isinstance(s, optax.ScaleByAdamState)
               for s in jax.tree_util.tree_leaves(
                   state.opt_state, is_leaf=lambda x: hasattr(x, "mu")))
    state, loss = trainer.train_epoch(state, 1)
    assert np.isfinite(loss)
