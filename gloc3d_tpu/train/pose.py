"""Relative-pose regression training (the reference's pose mode, made real).

The reference sketches pose supervision — PointPillar's ``conv_out_pose``
head (pointpillar.py:171-177), a PoseLayer that builds layers inside
``forward`` and therefore can never train (pointpillar.py:59-89), and
PoseLoss (pointpillar.py:20-57). This module completes the capability: a
scan-pair model (shared PointPillar pose encoding → PoseHead → 6-DoF
angle-axis|translation) and a minimal pair trainer around
losses.pose_loss.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from gloc3d_tpu.config import PipelineConfig
from gloc3d_tpu.models.losses import pose_loss
from gloc3d_tpu.models.packed import PoseHead
from gloc3d_tpu.models.pointpillar import PointPillar

Array = jax.Array


class PosePairModel(nn.Module):
    """(scan_q, scan_p) → 6-DoF relative pose [angle-axis | translation]."""

    xbound: Tuple[float, float, float]
    ybound: Tuple[float, float, float]
    zbound: Tuple[float, float, float]
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts_q: Array, mk_q: Array, pts_p: Array, mk_p: Array,
                 train: bool = False) -> Array:
        encoder = PointPillar(
            xbound=self.xbound, ybound=self.ybound, zbound=self.zbound,
            compute_dtype=self.compute_dtype, name="encoder",
        )
        enc_q = encoder(pts_q, mk_q, mode="pose", train=train)
        enc_p = encoder(pts_p, mk_p, mode="pose", train=train)
        return PoseHead(name="pose_head")(enc_q, enc_p, train=train)


class PoseTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def make_pose_model(cfg: PipelineConfig) -> PosePairModel:
    v = cfg.voxel
    return PosePairModel(xbound=v.xbound, ybound=v.ybound, zbound=v.zbound,
                         compute_dtype=jnp.dtype(cfg.model.compute_dtype))


def init_pose_state(model: PosePairModel, example, lr: float = 1e-3,
                    key=None) -> Tuple[PoseTrainState, optax.GradientTransformation]:
    key = key if key is not None else jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(key, *example)
    tx = optax.adam(lr)
    return PoseTrainState(
        variables["params"], variables.get("batch_stats", {}),
        tx.init(variables["params"]),
    ), tx


def pose_train_step(model: PosePairModel, tx, state: PoseTrainState,
                    batch, gt: Array, angle_scale: float = 1.0):
    """One SGD step on a pair batch. batch = (pts_q, mk_q, pts_p, mk_p);
    gt: (B, 6) angle-axis|translation of T_p←q. Jit the closure once."""

    def loss_fn(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        pred, upd = model.apply(variables, *batch, train=True,
                                mutable=["batch_stats"])
        return pose_loss(pred, gt, angle_scale), upd.get("batch_stats", {})

    (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return PoseTrainState(new_params, new_bs, new_opt), loss


def predict_pose(model: PosePairModel, state: PoseTrainState, batch) -> Array:
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return model.apply(variables, *batch, train=False)
