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


class PackedPairConv(nn.Module):
    """3×3 SAME conv evaluated on the width-pair-packed layout.

    The first VGG block's 3/64-channel convs half-fill the MXU's 128 lanes
    and run at ~20 % of bf16 peak (tools/profile_i2i.py). Packing adjacent
    COLUMN PAIRS into the channel dim — (B, H, W, C) → (B, H, W/2, 2C) —
    fills the lanes: the canonical conv becomes a 3×3 conv over 2C packed
    channels whose kernel is a sparse rearrangement of the canonical one
    (output half b at packed column j reconstructs original column 2j+b
    from original columns 2j+b-1 .. 2j+b+1, which live in packed columns
    j-1 .. j+1). 2× the MACs (half the packed taps are structural zeros)
    but ~1.7× faster on the conv0+conv1+pool1 segment and 1.25× on the full
    13-conv encoder (tools/profile_i2i_pack.py; exact in fp32, bf16 differs
    only by tap-summation order — ~5e-3 relative over the whole stack).

    Declares the CANONICAL (3, 3, C, features) kernel/bias — identical
    parameter tree, shapes, and init draws to the nn.Conv it replaces — and
    rearranges at apply time, so checkpoints/converters/freeze masks are
    unaffected and gradients flow back to the canonical weights.
    """

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xp: Array) -> Array:
        cin = xp.shape[-1] // 2
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            jnp.float32)
        o = self.features
        k = kernel.astype(self.dtype)
        kp = jnp.zeros((3, 3, 2 * cin, 2 * o), self.dtype)
        # tap t ∈ 0..2 of output half b reads original column 2j+b-1+t,
        # i.e. packed column 1 + (b-1+t)//2, channel half (b-1+t) % 2
        for b in range(2):
            for t in range(3):
                d = b - 1 + t
                pj, half = 1 + (d // 2), d % 2
                kp = kp.at[:, pj, half * cin:(half + 1) * cin,
                           b * o:(b + 1) * o].set(k[:, t])
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), kp, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)
        return y + jnp.concatenate([bias, bias]).astype(self.dtype)


class VGG16Encoder(nn.Module):
    """13-conv VGG16 feature extractor ending at conv5_3 (no ReLU/pool).

    pack_width runs conv0/conv1 (+ pool1) on the width-pair-packed layout
    (PackedPairConv) — numerically exact, same parameter tree, ~1.7× faster
    on the segment that is otherwise half the 768² forward.
    """

    compute_dtype: jnp.dtype = jnp.bfloat16
    l2_normalize_output: bool = False  # cluster mode appends L2Norm (main.py:568)
    pack_width: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        del train  # VGG has no BN; signature kept uniform with other encoders
        packed = (self.pack_width and x.ndim == 4
                  and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        i0 = 0
        if packed:
            b, h, w, c = x.shape
            xp = x.reshape(b, h, w // 2, 2 * c)
            xp = nn.relu(PackedPairConv(
                64, dtype=self.compute_dtype, name="conv0")(xp))
            xp = nn.relu(PackedPairConv(
                64, dtype=self.compute_dtype, name="conv1")(xp))
            # pool1 on the packed layout: width-max is the channel-half max
            xp = jnp.maximum(xp[..., :64], xp[..., 64:])
            x = xp.reshape(b, h // 2, 2, w // 2, 64).max(axis=2)
            i0 = 2
        for i, (ch, pool_before) in enumerate(_VGG16_CFG):
            if i < i0:
                continue
            if pool_before and not (packed and i == i0):
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
