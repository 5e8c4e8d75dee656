"""VGG16 convolutional encoder in Flax (i2i path).

The reference uses torchvision vgg16 IMAGENET1K_V1 ``features[:-2]`` — the 13
conv layers through conv5_3, dropping the final ReLU and max-pool
(main.py:531-541) — giving a (B, 48, 48, 512) map from 768×768 input. This is
that exact topology in NHWC with bf16 conv compute.

Pretrained torchvision weights can be converted offline to an .npz of
``conv{i}_kernel`` (HWIO) / ``conv{i}_bias`` arrays and loaded with
``load_torchvision_npz`` (see tools/convert_torch_checkpoint.py). Layer freezing
(reference trains only conv5_*) is handled at the optimizer level via
``trainable_mask``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# (channels, pool_before) for the 13 convs of VGG16-D.
_VGG16_CFG = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]


class VGG16Encoder(nn.Module):
    """13-conv VGG16 feature extractor ending at conv5_3 (no ReLU/pool)."""

    compute_dtype: jnp.dtype = jnp.bfloat16
    l2_normalize_output: bool = False  # cluster mode appends L2Norm (main.py:568)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        del train  # VGG has no BN; signature kept uniform with other encoders
        for i, (ch, pool_before) in enumerate(_VGG16_CFG):
            if pool_before:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(
                ch, (3, 3), padding="SAME", dtype=self.compute_dtype,
                name=f"conv{i}",
            )(x)
            if i < len(_VGG16_CFG) - 1:  # last conv has no ReLU (features[:-2])
                x = nn.relu(x)
        x = x.astype(jnp.float32)
        if self.l2_normalize_output:
            x = x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
        return x


def load_torchvision_npz(params: dict, npz_path: str) -> dict:
    """Replace encoder params with converted torchvision weights.

    Expects keys conv{i}_kernel (H, W, I, O) and conv{i}_bias (O,) for
    i in 0..12, as produced by tools/convert_torch_checkpoint.py.
    """
    import copy

    data = np.load(npz_path)
    new = copy.deepcopy(params)
    for i in range(len(_VGG16_CFG)):
        new[f"conv{i}"]["kernel"] = jnp.asarray(data[f"conv{i}_kernel"])
        new[f"conv{i}"]["bias"] = jnp.asarray(data[f"conv{i}_bias"])
    return new


def load_vggvlad_npz(params: dict, npz_path: str) -> dict:
    """Install a converted GLoc3D VGGVLAD checkpoint
    (tools/convert_torch_checkpoint.py ``vggvlad``) into a DescriptorModel
    params dict {'encoder': ..., 'pool': ...}."""
    import copy

    data = np.load(npz_path)
    new = copy.deepcopy(params)
    enc = new["encoder"]
    for i in range(len(_VGG16_CFG)):
        enc[f"conv{i}"]["kernel"] = jnp.asarray(data[f"conv{i}_kernel"])
        enc[f"conv{i}"]["bias"] = jnp.asarray(data[f"conv{i}_bias"])
    pool = new["pool"]
    pool["conv_weight"] = jnp.asarray(data["pool_conv_weight"])
    pool["centroids"] = jnp.asarray(data["pool_centroids"])
    pool["hidden1_weights"] = jnp.asarray(data["pool_hidden1_weights"])
    if "pool_conv_bias" in data and "conv_bias" in pool:
        pool["conv_bias"] = jnp.asarray(data["pool_conv_bias"])
    return new


def trainable_mask(params: dict, train_from_conv: int = 10) -> dict:
    """Boolean pytree: True for trainable leaves.

    Reference freezes everything below conv5_1 (= conv index 10) when
    pretrained (main.py:538-541).
    """
    trainable_names = {
        f"conv{i}" for i in range(train_from_conv, len(_VGG16_CFG))
    }
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(k, "key", None) in trainable_names for k in path
        ),
        params,
    )
