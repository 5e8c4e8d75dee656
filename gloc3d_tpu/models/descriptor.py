"""End-to-end descriptor extractor: encoder + pooling in one module.

The reference's ``VGGVLAD`` container (main.py:409-423) holds an ``encoder``
and a ``pool``; inputs are either 768×768×3 BEV images (i2i, VGG16) or padded
point clouds (s2s, PointPillar). ``build_model`` assembles the combination
described by a ModelConfig (pooling choices mirror main.py:574-618).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gloc3d_tpu.config import ModelConfig, VoxelConfig
from gloc3d_tpu.models.netvlad import NetVLAD
from gloc3d_tpu.models.pointpillar import PointPillar
from gloc3d_tpu.models.vgg import VGG16Encoder

Array = jax.Array


class _MaxPoolHead(nn.Module):
    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        v = jnp.max(x, axis=(1, 2))
        return v * jax.lax.rsqrt(jnp.sum(v * v, -1, keepdims=True) + 1e-12)


class _AvgPoolHead(nn.Module):
    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        v = jnp.mean(x, axis=(1, 2))
        return v * jax.lax.rsqrt(jnp.sum(v * v, -1, keepdims=True) + 1e-12)


class DescriptorModel(nn.Module):
    """encoder ∘ pool → (B, D) global descriptor."""

    model_cfg: ModelConfig
    voxel_cfg: VoxelConfig

    def setup(self):
        from gloc3d_tpu.models.encoders import (
            build_image_encoder, is_image_encoder,
        )

        cfg = self.model_cfg
        cd = jnp.dtype(cfg.compute_dtype)
        if is_image_encoder(cfg.encoder):
            self.encoder = build_image_encoder(
                cfg.encoder, compute_dtype=cd,
                pack_width=cfg.vgg_pack_width)
        elif cfg.encoder == "pointpillar":
            v = self.voxel_cfg
            self.encoder = PointPillar(
                xbound=v.xbound, ybound=v.ybound, zbound=v.zbound,
                compute_dtype=cd, fold_bn=cfg.fold_bn,
            )
        else:
            raise ValueError(f"unknown encoder {cfg.encoder!r}")

        if cfg.pooling in ("netvlad", "netvlad_fc"):
            self.pool = NetVLAD(
                num_clusters=cfg.num_clusters,
                dim=cfg.encoder_dim,
                vladv2=cfg.vladv2,
                use_fc=cfg.pooling == "netvlad_fc",
                gating=cfg.gating,
                normalize_input=cfg.normalize_input,
                compute_dtype=cd,
            )
        elif cfg.pooling == "max":
            self.pool = _MaxPoolHead()
        elif cfg.pooling == "avg":
            self.pool = _AvgPoolHead()
        else:
            raise ValueError(f"unknown pooling {cfg.pooling!r}")

    def encode(self, inputs, mask: Optional[Array] = None, train: bool = False,
               voxel_stats=None):
        if self.model_cfg.encoder == "pointpillar":
            return self.encoder(inputs, mask, mode="vlad", train=train,
                                voxel_stats=voxel_stats)
        return self.encoder(inputs, train=train)

    def __call__(
        self, inputs: Array, mask: Optional[Array] = None, train: bool = False,
        voxel_stats=None,
    ) -> Array:
        feat = self.encode(inputs, mask, train, voxel_stats=voxel_stats)
        return self.pool(feat, train=train)


def build_model(model_cfg: ModelConfig, voxel_cfg: VoxelConfig | None = None):
    return DescriptorModel(model_cfg, voxel_cfg or VoxelConfig())
