"""Pose-regression training: loss must drop sharply when overfitting pairs."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import (
    ModelConfig, PipelineConfig, VoxelConfig, BEVConfig,
)
from gloc3d_tpu.train.pose import (
    init_pose_state, make_pose_model, pose_train_step, predict_pose,
)

N_PTS = 256

CFG = PipelineConfig(
    bev=BEVConfig(max_points=N_PTS),
    voxel=VoxelConfig(max_points=N_PTS, xbound=(-10.0, 10.0, 0.5),
                      ybound=(-6.0, 6.0, 0.5)),
    model=ModelConfig(encoder="pointpillar", compute_dtype="float32"),
)


def _pairs(b=2, seed=0):
    rng = np.random.RandomState(seed)
    pts_q = np.zeros((b, N_PTS, 4), np.float32)
    pts_q[..., 0] = rng.uniform(-9, 9, (b, N_PTS))
    pts_q[..., 1] = rng.uniform(-5, 5, (b, N_PTS))
    pts_q[..., 2] = rng.uniform(0, 3, (b, N_PTS))
    gt = np.zeros((b, 6), np.float32)
    gt[:, 2] = rng.uniform(-0.3, 0.3, b)      # yaw angle-axis z
    gt[:, 3:5] = rng.uniform(-2, 2, (b, 2))   # xy translation
    pts_p = pts_q.copy()
    for i in range(b):
        c, s = np.cos(gt[i, 2]), np.sin(gt[i, 2])
        x, y = pts_q[i, :, 0], pts_q[i, :, 1]
        pts_p[i, :, 0] = c * x - s * y + gt[i, 3]
        pts_p[i, :, 1] = s * x + c * y + gt[i, 4]
    masks = np.ones((b, N_PTS), np.float32)
    return ((jnp.asarray(pts_q), jnp.asarray(masks),
             jnp.asarray(pts_p), jnp.asarray(masks)), jnp.asarray(gt))


def test_pose_training_overfits_pairs():
    model = make_pose_model(CFG)
    batch, gt = _pairs()
    state, tx = init_pose_state(model, batch, lr=1e-3)
    step = jax.jit(partial(pose_train_step, model, tx))
    losses = []
    for _ in range(25):
        state, loss = step(state, batch, gt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # the mechanism under test: gradients flow through both encoders and the
    # head, and the loss trends down on a fixed batch (full convergence of a
    # conv regressor from 4 pairs in 60 steps is not the claim)
    assert min(losses) < 0.7 * max(losses[:3]), (losses[:3], min(losses))
    pred = predict_pose(model, state, batch)
    assert pred.shape == gt.shape
    assert bool(np.isfinite(np.asarray(pred)).all())
