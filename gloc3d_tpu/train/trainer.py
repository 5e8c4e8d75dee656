"""Triplet trainer: cache-refresh mining loop, SGD, checkpoints, early stop.

Replicates the main.py training behavior (main.py:86-187, 630-724) with the
HDF5 cache replaced by an on-device feature cache and the DataLoader-worker
mining replaced by ops in train/mining.py:

  per epoch, per cache-refresh subset:
    1. refresh feature cache: jitted forward over the whole train set;
    2. mine a query batch's (positive, ≤n_neg negatives) on device;
    3. forward cat(q, pos, negs) in ONE batch (main.py:139-143), backprop the
       per-pair TripletMarginLoss / nNeg (main.py:152-158);
  per epoch: optional recall eval, best-checkpoint tracking on recall@5,
  early stop after ``patience`` epochs without improvement (main.py:704-724).

Optimizer: SGD(momentum 0.9, weight decay 1e-3) + StepLR(5, 0.5)
(main.py:630-645) via optax; weight decay is applied as the true torch
coupled L2 (added to the gradient before momentum).

Checkpoints are orbax StandardCheckpointer saves of the full TrainState plus
a config JSON — the flags.json round-trip (main.py:431-450) equivalent.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gloc3d_tpu.config import PipelineConfig
from gloc3d_tpu.data.dataset import TripletDataset
from gloc3d_tpu.eval.recall import recall_at_n
from gloc3d_tpu.models.losses import training_triplet_loss
from gloc3d_tpu.ops.topk import l2_topk
from gloc3d_tpu.train.mining import mine_triplets

Array = jax.Array


def draw_aug_yaw(key: Array, b: int) -> Array:
    """Per-sample augmentation yaw draw, uniform in (-pi, pi).

    The single source of the draw for BOTH the device train step and the
    host-stats path — the host path converts the result to numpy, so the
    two paths rotate by bit-identical angles for a given key."""
    return jax.random.uniform(key, (b,), minval=-jnp.pi, maxval=jnp.pi)


def rotate_clouds_z(q_in, yaw, xp):
    """Rotate the xy channels of (B, N, >=2) clouds by per-sample ``yaw``.

    ``xp`` is jnp (traced, device train step) or np (host-stats path,
    applied before the native pillar-stats pass). One implementation for
    both so the augmentation math cannot drift between paths."""
    c = xp.cos(yaw)[:, None]
    s = xp.sin(yaw)[:, None]
    x, y = q_in[..., 0], q_in[..., 1]
    rot = xp.stack([c * x - s * y, s * x + c * y], axis=-1)
    return xp.concatenate([rot, q_in[..., 2:]], axis=-1)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array


class Trainer:
    """Drives triplet training of a DescriptorModel on a TripletDataset."""

    def __init__(
        self,
        cfg: PipelineConfig,
        model,
        dataset: TripletDataset,
        workdir: str,
        eval_dataset: Optional[TripletDataset] = None,
        seed: Optional[int] = None,
        mesh=None,
        trainable_mask=None,
    ):
        """mesh: optional jax.sharding.Mesh — when given, the train step runs
        data-parallel: batch tensors sharded on their leading axis over the
        mesh, params replicated (XLA inserts the gradient all-reduce). The
        reference's only model parallelism is single-process DataParallel
        (main.py:620-625); this is its multi-chip successor. batch_size must
        divide the mesh size.

        trainable_mask: optional boolean pytree over params (same treedef);
        False leaves are frozen — the reference's pretrained-encoder freeze
        rules (main.py:519-564; build one with
        models.encoders.encoder_trainable_mask / models.vgg.trainable_mask).
        """
        self.trainable_mask = trainable_mask
        self.cfg = cfg
        self.model = model
        self.ds = dataset
        self.eval_ds = eval_dataset
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        t = cfg.train
        self.key = jax.random.PRNGKey(seed if seed is not None else t.seed)

        self.is_s2s = cfg.model.encoder == "pointpillar"
        # s2s fast path: pillar stats + counting sort on the host, Pallas
        # segment-sum (with its exact row-gather VJP) on the device — the
        # serving path's zero-device-scatter extraction, now for training.
        # The forward was 80 % of the 213 ms reference-scale step and the
        # two voxel scatter stages most of that forward; measured 213 →
        # 119 ms/step device (tools/bench_train.py --host-stats).
        self.host_stats = bool(cfg.train.host_stats) and self.is_s2s
        self.pos_mask = jnp.asarray(
            dataset.nontrivial_positives(t.nontriv_pos_dist)
        )
        self.neg_mask = jnp.asarray(dataset.potential_negatives(t.neg_dist_thr))
        self.neg_cache = jnp.zeros((dataset.num_q, t.n_neg), jnp.int32)

        # torch-style coupled weight decay: grad += wd * param, then momentum.
        steps_per_epoch = max(dataset.num_q // t.batch_size, 1)
        if t.optimizer.lower() == "adam":
            # main.py:630-632: the ADAM branch is plain Adam(lr) — no weight
            # decay and no StepLR (the scheduler lives in the SGD branch)
            self.tx = optax.adam(learning_rate=t.lr)
        else:
            schedule = optax.exponential_decay(
                init_value=t.lr,
                transition_steps=t.lr_step * steps_per_epoch,
                decay_rate=t.lr_gamma,
                staircase=True,
            )
            self.tx = optax.chain(
                optax.add_decayed_weights(t.weight_decay),
                optax.sgd(learning_rate=schedule, momentum=t.momentum),
            )
        if trainable_mask is not None:
            # frozen leaves get their update zeroed (torch requires_grad=False)
            frozen = jax.tree.map(lambda m: not m, trainable_mask)
            self.tx = optax.chain(
                self.tx, optax.masked(optax.set_to_zero(), frozen)
            )

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            bsh = NamedSharding(mesh, P(mesh.axis_names[0]))
            self._train_step = jax.jit(
                self._train_step_impl,
                in_shardings=(repl,) + (bsh,) * 8 + (repl,),
                out_shardings=(repl, repl),
            )
            self._forward_cache = jax.jit(
                self._forward_cache_impl,
                in_shardings=(repl, repl, bsh, bsh),
            )
            self._train_step_hs = jax.jit(
                self._train_step_hs_impl,
                in_shardings=(repl, bsh, bsh, (bsh,) * 5, bsh, bsh),
                out_shardings=(repl, repl),
            )
            self._forward_cache_hs = jax.jit(
                self._forward_cache_hs_impl,
                in_shardings=(repl, repl, bsh, bsh, (bsh,) * 5),
            )
        else:
            self._train_step = jax.jit(self._train_step_impl)
            self._forward_cache = jax.jit(self._forward_cache_impl)
            self._train_step_hs = jax.jit(self._train_step_hs_impl)
            self._forward_cache_hs = jax.jit(self._forward_cache_hs_impl)

        self.history: list = []
        self.best_recall5 = -1.0
        self.epochs_since_best = 0

    # ------------------------------------------------------------------ setup
    def init_state(self, params, batch_stats=None) -> TrainState:
        return TrainState(
            params=params,
            batch_stats=batch_stats if batch_stats is not None else {},
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    # --------------------------------------------------------------- forward
    def _apply(self, params, batch_stats, inputs, masks, train,
               voxel_stats=None):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        args = (inputs, masks) if self.is_s2s else (inputs,)
        kw = {"voxel_stats": voxel_stats} if voxel_stats is not None else {}
        if train:
            out, updates = self.model.apply(
                variables, *args, train=True, mutable=["batch_stats"], **kw
            )
            return out, updates.get("batch_stats", {})
        return (self.model.apply(variables, *args, train=False, **kw),
                batch_stats)

    def _forward_cache_impl(self, params, batch_stats, inputs, masks):
        out, _ = self._apply(params, batch_stats, inputs, masks, train=False)
        return out

    def _forward_cache_hs_impl(self, params, batch_stats, inputs, valid, vs):
        out, _ = self._apply(params, batch_stats, inputs, valid, train=False,
                             voxel_stats=vs)
        return out

    def _host_sorted(self, inputs, masks):
        """Host pillar stats + counting sort for a numpy scan batch.

        Returns (sorted points, valid, vs 5-tuple) ready for
        model.apply(voxel_stats=...). crop=False keeps out-of-grid rows
        (zeroed into pillar 0 by the model) so the unmasked-BN batch
        statistics see the same rows as the all-device step.

        Masks MUST be prefix-contiguous (valid rows first, then padding —
        the loader convention, same as pipeline.py's keyframe path): the
        native pass treats ``masks.sum(1)`` as a prefix LENGTH and only
        reads the first n rows, whereas the device path honors arbitrary
        per-row masks. A non-prefix mask would silently bin masked-out
        rows and drop valid tail rows here."""
        from gloc3d_tpu.data.native import compute_voxel_stats_host_sorted

        v = self.cfg.voxel
        inputs = np.asarray(inputs, np.float32)
        if masks is not None:
            m = np.asarray(masks, np.float32)
            assert (np.diff(m, axis=1) <= 0).all(), (
                "_host_sorted requires prefix-contiguous masks "
                "(valid rows first); got a mask with a 0->1 transition"
            )
            counts = m.sum(1).astype(np.int64)
        else:
            counts = np.full((len(inputs),), inputs.shape[1], np.int64)
        p, vl, i, c, g, s, pp = compute_voxel_stats_host_sorted(
            inputs, counts, v.xbound, v.ybound, v.zbound,
            crop=False, num_threads=8, per_point=True,
        )
        return (jnp.asarray(p), jnp.asarray(vl),
                (jnp.asarray(i), jnp.asarray(c), jnp.asarray(g),
                 jnp.asarray(s), jnp.asarray(pp)))

    def compute_cache(self, state: TrainState, inputs, masks, batch: int = 8):
        """Descriptor cache over a whole set, batched (cache build,
        main.py:103-118)."""
        outs = []
        n = len(inputs)
        pad = (-n) % batch
        if pad:
            inputs = np.concatenate([inputs, np.repeat(inputs[-1:], pad, 0)])
            masks = (
                np.concatenate([masks, np.repeat(masks[-1:], pad, 0)])
                if masks is not None else None
            )
        for i in range(0, n + pad, batch):
            if self.host_stats:
                p, vl, vs = self._host_sorted(
                    inputs[i : i + batch],
                    masks[i : i + batch] if masks is not None else None,
                )
                outs.append(
                    self._forward_cache_hs(
                        state.params, state.batch_stats, p, vl, vs
                    )
                )
                continue
            mb = jnp.asarray(masks[i : i + batch]) if masks is not None else None
            outs.append(
                self._forward_cache(
                    state.params, state.batch_stats,
                    jnp.asarray(inputs[i : i + batch]), mb,
                )
            )
        return jnp.concatenate(outs)[:n]

    # ------------------------------------------------------------- train step
    def _augment_yaw(self, q_in, key):
        """Random per-sample z-rotation of query clouds (xyz channels only).

        Heading-invariance augmentation, s2s only — BEV images rotate with
        sensor yaw and the descriptor must tolerate it; the reference relies
        purely on revisit diversity in the data. Draw + rotation are shared
        with the host-stats path via draw_aug_yaw/rotate_clouds_z so the two
        cannot drift (pinned by test_train_hoststats.py)."""
        yaw = draw_aug_yaw(key, q_in.shape[0])
        return rotate_clouds_z(q_in, yaw, jnp)

    def _train_step_impl(self, state: TrainState, q_in, q_mk, p_in, p_mk,
                         n_in, n_mk, neg_valid, q_valid, aug_key=None):
        t = self.cfg.train
        b = q_in.shape[0]
        n_neg = self.cfg.train.n_neg
        if t.augment_yaw and self.is_s2s and aug_key is not None:
            q_in = self._augment_yaw(q_in, aug_key)

        def loss_fn(params):
            inputs = jnp.concatenate([q_in, p_in, n_in], axis=0)
            masks = (
                jnp.concatenate([q_mk, p_mk, n_mk], axis=0)
                if q_mk is not None else None
            )
            desc, new_bs = self._apply(
                params, state.batch_stats, inputs, masks, train=True
            )
            dq = desc[:b]
            dp = desc[b : 2 * b]
            dn = desc[2 * b :].reshape(b, n_neg, -1)
            nv = neg_valid * q_valid[:, None]
            loss = training_triplet_loss(
                dq, dp, dn, nv, margin=jnp.sqrt(t.margin)
            )
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_bs, new_opt, state.step + 1),
            loss,
        )

    def _train_step_hs_impl(self, state: TrainState, inputs, valid, vs,
                            neg_valid, q_valid):
        """Host-stats train step: ``inputs`` is the PRE-CONCATENATED
        (q | pos | negs) batch, pillar-sorted on the host, with its voxel
        stats in ``vs``. Same loss/optimizer as _train_step_impl; yaw
        augmentation (if any) already happened on the host before the
        stats pass."""
        t = self.cfg.train
        n_neg = t.n_neg
        b = inputs.shape[0] // (2 + n_neg)

        def loss_fn(params):
            desc, new_bs = self._apply(
                params, state.batch_stats, inputs, valid, train=True,
                voxel_stats=vs,
            )
            dq = desc[:b]
            dp = desc[b : 2 * b]
            dn = desc[2 * b :].reshape(b, n_neg, -1)
            nv = neg_valid * q_valid[:, None]
            loss = training_triplet_loss(
                dq, dp, dn, nv, margin=jnp.sqrt(t.margin)
            )
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_bs, new_opt, state.step + 1),
            loss,
        )

    # ------------------------------------------------------------ train epoch
    def _gather(self, arr, masks, idx):
        idx = np.asarray(idx)
        a = arr[idx]
        m = masks[idx] if masks is not None else None
        return a, m

    def train_epoch(self, state: TrainState, epoch: int) -> tuple:
        t = self.cfg.train
        nq = self.ds.num_q
        order = np.asarray(
            jax.random.permutation(jax.random.fold_in(self.key, epoch), nq)
        )
        refresh = t.cache_refresh_rate or nq
        losses = []
        for sub_start in range(0, nq, refresh):
            sub = order[sub_start : sub_start + refresh]
            # 1. refresh cache
            cache_db = self.compute_cache(state, self.ds.db_inputs, self.ds.db_masks)
            cache_q = self.compute_cache(state, self.ds.q_inputs, self.ds.q_masks)
            # 2-3. mine + step per batch
            for i in range(0, len(sub), t.batch_size):
                batch_idx = sub[i : i + t.batch_size]
                if len(batch_idx) < t.batch_size:
                    continue
                self.key, sub_key = jax.random.split(self.key)
                mined = mine_triplets(
                    cache_db, cache_q, jnp.asarray(batch_idx),
                    self.pos_mask, self.neg_mask, self.neg_cache, sub_key,
                    t.margin, t.n_neg, t.n_neg_sample,
                )
                if not bool(np.asarray(mined.valid).any()):
                    continue
                self.neg_cache = self.neg_cache.at[jnp.asarray(batch_idx)].set(
                    mined.neg_idx
                )
                q_in, q_mk = self._gather(self.ds.q_inputs, self.ds.q_masks, batch_idx)
                p_in, p_mk = self._gather(
                    self.ds.db_inputs, self.ds.db_masks, np.asarray(mined.pos_idx)
                )
                flat_neg = np.asarray(mined.neg_idx).reshape(-1)
                n_in, n_mk = self._gather(self.ds.db_inputs, self.ds.db_masks, flat_neg)
                self.key, aug_key = jax.random.split(self.key)
                if self.host_stats:
                    if t.augment_yaw:
                        # same draw + rotation as the device path
                        # (_augment_yaw), applied on the host BEFORE the
                        # stats pass — the pillar assignment must see the
                        # rotated cloud
                        yaw = np.asarray(draw_aug_yaw(aug_key, len(q_in)))
                        q_in = rotate_clouds_z(
                            np.asarray(q_in, np.float32), yaw, np)
                    cat_in = np.concatenate([q_in, p_in, n_in], axis=0)
                    cat_mk = (
                        np.concatenate([q_mk, p_mk, n_mk], axis=0)
                        if q_mk is not None else None
                    )
                    p_sorted, vl, vs = self._host_sorted(cat_in, cat_mk)
                    state, loss = self._train_step_hs(
                        state, p_sorted, vl, vs,
                        mined.neg_valid, mined.valid.astype(jnp.float32),
                    )
                else:
                    state, loss = self._train_step(
                        state, jnp.asarray(q_in),
                        None if q_mk is None else jnp.asarray(q_mk),
                        jnp.asarray(p_in),
                        None if p_mk is None else jnp.asarray(p_mk),
                        jnp.asarray(n_in),
                        None if n_mk is None else jnp.asarray(n_mk),
                        mined.neg_valid,
                        mined.valid.astype(jnp.float32),
                        aug_key,
                    )
                losses.append(float(loss))
        return state, float(np.mean(losses)) if losses else 0.0

    # ------------------------------------------------------------------ eval
    def evaluate(self, state: TrainState, ds: Optional[TripletDataset] = None
                 ) -> Dict[int, float]:
        """recall@{1,5,10,20} on a dataset (main.py:276-352 semantics)."""
        ds = ds or self.eval_ds or self.ds
        cache_db = self.compute_cache(state, ds.db_inputs, ds.db_masks)
        cache_q = self.compute_cache(state, ds.q_inputs, ds.q_masks)
        k = min(20, ds.num_db)
        _, idx = l2_topk(cache_q, cache_db, k)
        positives = ds.eval_positives(self.cfg.train.pos_dist_thr)
        ns = [n for n in (1, 5, 10, 20) if n <= k]
        return recall_at_n(np.asarray(idx), positives, ns)

    # ------------------------------------------------------------------- fit
    def fit(self, state: TrainState, epochs: Optional[int] = None,
            log: Callable[[str], None] = print) -> TrainState:
        t = self.cfg.train
        epochs = epochs or t.epochs
        for epoch in range(1, epochs + 1):
            state, avg_loss = self.train_epoch(state, epoch)
            entry = {"epoch": epoch, "loss": avg_loss}
            if epoch % t.eval_every == 0:
                rec = self.evaluate(state)
                entry["recall"] = rec
                r5 = rec.get(5, rec.get(1, 0.0))
                self.save_checkpoint(state, "latest")
                if r5 > self.best_recall5:
                    self.best_recall5 = r5
                    self.epochs_since_best = 0
                    self.save_checkpoint(state, "best")
                else:
                    self.epochs_since_best += 1
                log(f"epoch {epoch}: loss {avg_loss:.4f} recall {rec}")
                if t.patience and self.epochs_since_best >= t.patience:
                    log(f"early stop at epoch {epoch} "
                        f"(no recall@5 gain for {t.patience} evals)")
                    break
            else:
                log(f"epoch {epoch}: loss {avg_loss:.4f}")
            self.history.append(entry)
        return state

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self, state: TrainState, tag: str) -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.workdir, f"ckpt_{tag}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, dataclasses.asdict(state)
                   if dataclasses.is_dataclass(state) else state._asdict(),
                   force=True)
        ckptr.wait_until_finished()
        with open(os.path.join(self.workdir, "config.json"), "w") as f:
            f.write(self.cfg.to_json())
        with open(os.path.join(self.workdir, "history.json"), "w") as f:
            json.dump({"history": self.history,
                       "best_recall5": self.best_recall5}, f)

    def load_checkpoint(self, tag: str, example_state: TrainState) -> TrainState:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.workdir, f"ckpt_{tag}"))
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, example_state._asdict())
        return TrainState(**restored)
