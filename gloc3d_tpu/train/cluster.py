"""NetVLAD centroid initialization from encoder descriptors.

Replicates --mode=cluster (main.py:354-401): sample images, take random
spatial locations from the encoder's feature map, k-means them into
num_clusters centroids, then set the VLAD assignment conv via init_params
(netvlad_fc.py:44-55). faiss.Kmeans is replaced by index/kmeans.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import PipelineConfig
from gloc3d_tpu.index.kmeans import kmeans
from gloc3d_tpu.models.netvlad import init_netvlad_params

Array = jax.Array


def sample_encoder_descriptors(
    model, params, inputs: np.ndarray, masks: Optional[np.ndarray],
    key: jax.Array,
    num_images: int = 500, per_image: int = 100, batch: int = 8,
    l2_normalize: bool = True,
) -> np.ndarray:
    """(num_images·per_image, C) random spatial samples of encoder features.

    Mirrors main.py:355-392: iterate sampled images, L2-normalize encoder
    output channel-wise (the cluster-mode L2Norm append, main.py:567-568),
    take ``per_image`` random spatial positions.
    """
    n = len(inputs)
    key, k_sel = jax.random.split(key)
    sel = np.asarray(jax.random.permutation(k_sel, n))[: min(num_images, n)]

    is_s2s = masks is not None

    @jax.jit
    def encode(batch_in, batch_mk):
        if is_s2s:
            feat = model.apply(params, batch_in, batch_mk,
                               method=lambda m, i, mk: m.encode(i, mk))
        else:
            feat = model.apply(params, batch_in,
                               method=lambda m, i: m.encode(i))
        if l2_normalize:
            feat = feat * jax.lax.rsqrt(
                jnp.sum(feat * feat, -1, keepdims=True) + 1e-12
            )
        return feat

    out = []
    for i in range(0, len(sel), batch):
        idx = sel[i : i + batch]
        mk = jnp.asarray(masks[idx]) if is_s2s else None
        feat = encode(jnp.asarray(inputs[idx]), mk)  # (b, H, W, C)
        b, h, w, c = feat.shape
        flat = np.asarray(feat).reshape(b, h * w, c)
        key, k_pos = jax.random.split(key)
        pos = np.asarray(
            jax.random.randint(k_pos, (b, per_image), 0, h * w)
        )
        out.append(np.take_along_axis(flat, pos[..., None], axis=1).reshape(-1, c))
    return np.concatenate(out)


def init_vlad_from_data(
    cfg: PipelineConfig, model, params, inputs: np.ndarray,
    masks: Optional[np.ndarray], key: jax.Array,
    num_images: int = 500, per_image: int = 100,
) -> Tuple[dict, np.ndarray, np.ndarray]:
    """cluster-mode + init_params in one call.

    Returns (new_params, centroids, sampled_descriptors).
    """
    descs = sample_encoder_descriptors(
        model, params, inputs, masks, key, num_images, per_image
    )
    cents, _ = kmeans(
        jax.random.fold_in(key, 1), jnp.asarray(descs),
        cfg.model.num_clusters, num_iters=100,
    )
    cents = np.asarray(cents)
    new_params = dict(params)
    new_params["params"] = init_netvlad_params(
        params["params"], cents, descs, vladv2=cfg.model.vladv2, path=("pool",)
    )
    return new_params, cents, descs
