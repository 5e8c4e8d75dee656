"""PointPillar BEV encoder in Flax (s2s path).

Reimplements model/pointpillar.py: 14-dim per-point features → 1×1-conv
PointNet → mean-scatter into a pillar grid → 3-block CNN with FPN upsampling →
448-ch concat → 128-ch BEV feature heads (descriptor + pose). The torch
version relies on torch_scatter CUDA kernels and NCHW; here the scatter is an
XLA segment-mean and everything is NHWC with bf16 conv compute on the MXU.

Faithful reference quirks: BatchNorm in the PointNet sees *unmasked* conv
outputs (padding pollutes stats, pointpillar.py:114-124 applies the mask
after the sequential); the final ``transpose(3, 2)`` swap of the two spatial
axes (pointpillar.py:230-237) is preserved as an x↔y swap in NHWC.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gloc3d_tpu.ops.voxelize import (
    points_to_voxels, points_to_voxels_hoststats, scatter_mean_to_grid,
)

Array = jax.Array


def resize_bilinear_align_corners(x: Array, factor: int) -> Array:
    """Bilinear ×factor upsample with torch align_corners=True semantics.

    jax.image.resize uses half-pixel centers (align_corners=False), which
    shifts features by up to half a cell — enough to break parity with the
    reference FPN (pointpillar.py:150, 156). src = i·(in−1)/(out−1).
    Separable 1-D lerp per spatial axis.
    """

    def axis_resize(v: Array, axis: int) -> Array:
        n_in = v.shape[axis]
        n_out = n_in * factor
        if n_in == 1:
            return jnp.repeat(v, factor, axis=axis)
        src = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        frac = (src - lo).astype(v.dtype)
        shape = [1] * v.ndim
        shape[axis] = n_out
        frac = frac.reshape(shape)
        return (
            jnp.take(v, lo, axis=axis) * (1 - frac)
            + jnp.take(v, hi, axis=axis) * frac
        )

    return axis_resize(axis_resize(x, 1), 2)  # NHWC: axes 1, 2


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16
    fold_bn: bool = False  # serving: BN folded into the conv (models/fold.py)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=self.fold_bn,
            dtype=self.compute_dtype,
        )(x)
        if self.fold_bn:
            # serving: stay in compute dtype between convs (the standard
            # path's fp32 interludes exist only for BN statistics); the
            # block output (relu=False head ends) returns fp32 for the pool.
            if not self.relu:
                return x.astype(jnp.float32)
            return nn.relu(x)
        # momentum 0.9 = torch BatchNorm2d default 0.1 (flax convention
        # new = m*old + (1-m)*batch); flax's own default 0.99 updates the
        # running stats 10x slower than the reference.
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=jnp.float32
        )(x.astype(jnp.float32))
        return nn.relu(x) if self.relu else x


class PillarBlock(nn.Module):
    """num_layers × (3×3 conv + BN + ReLU); stride on the first conv only
    (pointpillar.py:91-108)."""

    dims: int
    num_layers: int = 1
    stride: int = 1
    compute_dtype: jnp.dtype = jnp.bfloat16
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for i in range(self.num_layers):
            x = ConvBNRelu(
                self.dims,
                fold_bn=self.fold_bn,
                stride=self.stride if i == 0 else 1,
                compute_dtype=self.compute_dtype,
            )(x, train)
        return x


class PointNet(nn.Module):
    """Per-point 1×1 conv + BN + ReLU, masked after (pointpillar.py:111-124)."""

    odims: int = 64
    compute_dtype: jnp.dtype = jnp.bfloat16
    fold_bn: bool = False

    @nn.compact
    def __call__(self, feats: Array, mask: Array, train: bool = False) -> Array:
        # feats: (B, N, C_in); mask: (B, N)
        x = nn.Dense(self.odims, use_bias=self.fold_bn,
                     dtype=self.compute_dtype)(feats)
        if self.fold_bn:
            x = x.astype(jnp.float32)
        else:
            x = nn.BatchNorm(  # momentum: see ConvBNRelu note
                use_running_average=not train, momentum=0.9,
                dtype=jnp.float32
            )(x.astype(jnp.float32))
        return nn.relu(x) * mask[..., None]


class PointPillar(nn.Module):
    """PointPillar backbone + descriptor/pose heads (pointpillar.py:127-250).

    Call with padded points (B, N, ≥4) and a validity mask. ``mode``:
      'vlad'    → (B, gy, gx, 128) descriptor feature map (conv_out)
      'cluster' → same, L2-normalized over channels
      'pose'    → (B, gy, gx, 128) pose feature map (conv_out_pose)
      'both'    → (vlad, pose) tuple

    NOTE: ``init`` with mode='both' to create both heads' params; other modes
    only touch the head they use (Flax compact modules create params lazily).
    """

    xbound: Tuple[float, float, float] = (-35.0, 35.0, 0.5)
    ybound: Tuple[float, float, float] = (-20.0, 20.0, 0.5)
    zbound: Tuple[float, float, float] = (-10.0, 10.0, 20.0)
    compute_dtype: jnp.dtype = jnp.bfloat16
    fold_bn: bool = False  # serving: BN folded into convs (models/fold.py)

    @nn.compact
    def __call__(
        self, points: Array, mask: Array, mode: str = "vlad",
        train: bool = False, voxel_stats=None,
    ) -> Array | Tuple[Array, Array]:
        xyz = points[..., :3]
        starts = None
        if voxel_stats is not None:
            # serving fast path: per-pillar counts/centroids precomputed on
            # the host (data/native.py) — skips the first device scatter.
            # A 4th element (starts, (B, V+1)) marks the points as
            # pillar-SORTED: the feature reduction then runs as the Pallas
            # single-pass cumsum segment-sum instead of the second scatter.
            # A 5th element (pp, (B, N, 4)) carries the host-gathered
            # per-point (count, centroid) rows — zero device by-index reads.
            pp = None
            if len(voxel_stats) == 5:
                ids, raw_counts, centroids, starts, pp = voxel_stats
            elif len(voxel_stats) == 4:
                ids, raw_counts, centroids, starts = voxel_stats
            else:
                ids, raw_counts, centroids = voxel_stats
            voxels = points_to_voxels_hoststats(
                xyz, mask, ids, raw_counts, centroids,
                self.xbound, self.ybound, self.zbound, per_point=pp,
            )
        else:
            voxels = points_to_voxels(
                xyz, mask, self.xbound, self.ybound, self.zbound
            )

        # 14-dim per-point features for 4-dim input (pointpillar.py:190-197)
        feats = jnp.concatenate(
            [
                points,
                voxels["voxel_point_count"][..., None],
                voxels["local_points_xyz"],
                voxels["point_centroids"],
                xyz - voxels["voxel_centers"],
            ],
            axis=-1,
        )
        feats = PointNet(64, compute_dtype=self.compute_dtype,
                         fold_bn=self.fold_bn, name="pn")(
            feats, voxels["points_mask"], train
        )

        if starts is not None:
            from gloc3d_tpu.ops.pallas_scatter import segment_sum_sorted_grad

            sums = jax.vmap(segment_sum_sorted_grad)(
                feats, starts, voxels["voxel_indices"]
            )  # (B, V, 64); grad-enabled — the sorted path trains too
            pillar = sums / jnp.maximum(
                voxels["raw_counts"], 1.0
            )[..., None]
        else:
            pillar = scatter_mean_to_grid(
                feats, voxels["voxel_indices"], voxels["num_voxels"],
                counts=voxels["raw_counts"],
            )  # (B, V, 64)
        gx, gy, _ = voxels["grid_shape"]  # static ints, jit-safe
        # x-major ravel → reshape puts x on axis 1 (≙ torch view(B,C,gx,gy))
        x = pillar.reshape(points.shape[0], gx, gy, 64)

        f1 = PillarBlock(64, num_layers=2, stride=1, fold_bn=self.fold_bn,
                         compute_dtype=self.compute_dtype, name="block1")(x, train)
        f2 = PillarBlock(128, num_layers=3, stride=2, fold_bn=self.fold_bn,
                         compute_dtype=self.compute_dtype, name="block2")(f1, train)
        f3 = PillarBlock(256, num_layers=3, stride=2, fold_bn=self.fold_bn,
                         compute_dtype=self.compute_dtype, name="block3")(f2, train)
        f1 = ConvBNRelu(64, compute_dtype=self.compute_dtype,
                        fold_bn=self.fold_bn, name="up1")(f1, train)
        f2 = ConvBNRelu(128, compute_dtype=self.compute_dtype,
                        fold_bn=self.fold_bn, name="up2")(
            resize_bilinear_align_corners(f2, 2), train
        )
        f3 = ConvBNRelu(256, compute_dtype=self.compute_dtype,
                        fold_bn=self.fold_bn, name="up3")(
            resize_bilinear_align_corners(f3, 4), train
        )
        feat = jnp.concatenate([f1, f2, f3], axis=-1)  # (B, gx, gy, 448)

        def head(name: str) -> Array:
            h = ConvBNRelu(256, compute_dtype=self.compute_dtype,
                           fold_bn=self.fold_bn,
                           name=f"{name}_0")(feat, train)
            h = ConvBNRelu(128, relu=False, compute_dtype=self.compute_dtype,
                           fold_bn=self.fold_bn,
                           name=f"{name}_1")(h, train)
            # reference transpose(3,2): swap the two spatial axes
            return jnp.swapaxes(h, 1, 2)  # (B, gy, gx, 128)

        if mode == "vlad":
            return head("conv_out")
        if mode == "cluster":
            out = head("conv_out")
            return out * jax.lax.rsqrt(
                jnp.sum(out * out, axis=-1, keepdims=True) + 1e-12
            )
        if mode == "pose":
            return head("conv_out_pose")
        if mode == "both":
            return head("conv_out"), head("conv_out_pose")
        raise ValueError(f"unknown mode {mode!r}")


def load_pointpillar_npz(variables: dict, npz_path: str) -> dict:
    """Install a converted reference s2s checkpoint into a DescriptorModel
    variables tree (params + batch_stats).

    The npz holds '/'-joined tree paths (tools/convert_torch_checkpoint.py
    ``pointpillar`` mode). Entries absent from the npz (e.g. the pose head
    when the checkpoint has none) keep their current values.
    """
    import copy

    import numpy as np

    data = np.load(npz_path)
    new = copy.deepcopy(
        {k: v for k, v in variables.items()}
    )
    for key in data.files:
        parts = key.split("/")
        node = new
        for p in parts[:-1]:
            if p not in node:
                node = None
                break
            node = node[p]
        if node is None or parts[-1] not in node:
            continue  # tree node not present in this model configuration
        node[parts[-1]] = jnp.asarray(data[key])
    return new
