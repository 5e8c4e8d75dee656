"""Alternative i2i encoder baselines: AlexNet, MobileNetV2, ResNet18.

The reference driver builds four encoder choices (main.py:519-564), each the
torchvision backbone truncated to its feature extractor, with per-arch
freeze boundaries when pretrained:

  alexnet    features[:-2]  → 256-ch map; only the final conv trains
  vgg16      features[:-2]  → 512-ch map; conv5_1..conv5_3 train (models/vgg.py)
  mobilenet  mobilenet_v2 features[:-1] → 320-ch map; the last two inverted
             residual blocks train (main.py:542-554)
  resnet18   children()[:-2] → 512-ch map; layer3 + layer4 train
             (main.py:555-564)

These are research baselines, not the flagship — implemented here with the
same conventions as the rest of the package: NHWC, bf16 conv compute on the
MXU, fp32 BatchNorm with momentum 0.9 (torch's 0.1; flax's 0.99 default is a
parity bug — see CLAUDE.md). Weight converters for the torchvision
state_dict layouts live in ``convert_torchvision_encoder`` so pretrained
IMAGENET1K_V1 files transfer unmodified.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Output channel count of each encoder's feature map (main.py:520/532/543/555).
ENCODER_DIMS = {
    "alexnet": 256,
    "vgg16": 512,
    "mobilenet": 320,
    "resnet18": 512,
}

# Encoders that consume (B, S, S, 3) BEV probability images (everything but
# the s2s pointpillar path).
IMAGE_ENCODERS = ("vgg16", "alexnet", "mobilenet", "resnet18")


def is_image_encoder(name: str) -> bool:
    return name in IMAGE_ENCODERS


def _l2norm(x: Array) -> Array:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)


class AlexNetEncoder(nn.Module):
    """torchvision alexnet ``features[:-2]`` (main.py:519-529).

    Five convs; ReLU after all but the last (features[:-2] drops the final
    ReLU + max-pool), 3×3/2 max-pools after conv0 and conv1. 256-ch output.
    """

    compute_dtype: jnp.dtype = jnp.bfloat16
    l2_normalize_output: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        del train  # no BN in alexnet features
        specs = [  # (out_ch, kernel, stride, pad, pool_after)
            (64, 11, 4, 2, True),
            (192, 5, 1, 2, True),
            (384, 3, 1, 1, False),
            (256, 3, 1, 1, False),
            (256, 3, 1, 1, False),
        ]
        for i, (ch, k, s, p, pool) in enumerate(specs):
            x = nn.Conv(
                ch, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                dtype=self.compute_dtype, name=f"conv{i}",
            )(x)
            if i < len(specs) - 1:  # last conv keeps pre-activation output
                x = nn.relu(x)
            if pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = x.astype(jnp.float32)
        if self.l2_normalize_output:
            x = _l2norm(x)
        return x


# MobileNetV2 inverted-residual plan: (expand_ratio, out_ch, stride) per
# block, torchvision features[1..17]. features[:-1] drops the final 1×1
# 1280-ch ConvBNReLU, so the output is block 17's 320 channels.
_MBV2_BLOCKS: Sequence[Tuple[int, int, int]] = (
    (1, 16, 1),
    (6, 24, 2), (6, 24, 1),
    (6, 32, 2), (6, 32, 1), (6, 32, 1),
    (6, 64, 2), (6, 64, 1), (6, 64, 1), (6, 64, 1),
    (6, 96, 1), (6, 96, 1), (6, 96, 1),
    (6, 160, 2), (6, 160, 1), (6, 160, 1),
    (6, 320, 1),
)


class MobileNetV2Encoder(nn.Module):
    """torchvision mobilenet_v2 ``features[:-1]`` (main.py:542-554).

    Stem ConvBNReLU6(32, /2) + 17 inverted residual blocks; the final
    1280-ch 1×1 is dropped, leaving a 320-ch map at stride 32.
    """

    compute_dtype: jnp.dtype = jnp.bfloat16
    l2_normalize_output: bool = False

    def _bn(self, name: str, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd = self.compute_dtype
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=cd, name="stem_conv")(x)
        x = self._bn("stem_bn", train)(x.astype(jnp.float32))
        x = nn.relu6(x).astype(cd)

        in_ch = 32
        for bi, (t, ch, s) in enumerate(_MBV2_BLOCKS, start=1):
            inp = x
            hidden = in_ch * t
            if t != 1:
                x = nn.Conv(hidden, (1, 1), use_bias=False, dtype=cd,
                            name=f"block{bi}_expand_conv")(x)
                x = self._bn(f"block{bi}_expand_bn", train)(
                    x.astype(jnp.float32))
                x = nn.relu6(x).astype(cd)
            x = nn.Conv(
                hidden, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
                feature_group_count=hidden, use_bias=False, dtype=cd,
                name=f"block{bi}_dw_conv",
            )(x)
            x = self._bn(f"block{bi}_dw_bn", train)(x.astype(jnp.float32))
            x = nn.relu6(x).astype(cd)
            x = nn.Conv(ch, (1, 1), use_bias=False, dtype=cd,
                        name=f"block{bi}_project_conv")(x)
            x = self._bn(f"block{bi}_project_bn", train)(
                x.astype(jnp.float32)).astype(cd)
            if s == 1 and in_ch == ch:
                x = x + inp
            in_ch = ch
        x = x.astype(jnp.float32)
        if self.l2_normalize_output:
            x = _l2norm(x)
        return x


class ResNet18Encoder(nn.Module):
    """torchvision resnet18 ``children()[:-2]`` (main.py:555-564).

    conv1(7×7/2) + maxpool(3/2) + layers 1-4 of two BasicBlocks each; the
    avgpool + fc tail is dropped, leaving a 512-ch map at stride 32.
    """

    compute_dtype: jnp.dtype = jnp.bfloat16
    l2_normalize_output: bool = False

    def _bn(self, name: str, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd = self.compute_dtype
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=cd, name="conv1")(x)
        x = self._bn("bn1", train)(x.astype(jnp.float32))
        x = nn.relu(x).astype(cd)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        in_ch = 64
        for li, ch in enumerate((64, 128, 256, 512), start=1):
            for b in range(2):
                stride = 2 if (li > 1 and b == 0) else 1
                pre = f"layer{li}_block{b}"
                identity = x
                y = nn.Conv(ch, (3, 3), strides=(stride, stride),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            dtype=cd, name=f"{pre}_conv1")(x)
                y = self._bn(f"{pre}_bn1", train)(y.astype(jnp.float32))
                y = nn.relu(y).astype(cd)
                y = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            use_bias=False, dtype=cd,
                            name=f"{pre}_conv2")(y)
                y = self._bn(f"{pre}_bn2", train)(y.astype(jnp.float32))
                if stride != 1 or in_ch != ch:
                    identity = nn.Conv(
                        ch, (1, 1), strides=(stride, stride), use_bias=False,
                        dtype=cd, name=f"{pre}_down_conv",
                    )(identity)
                    identity = self._bn(f"{pre}_down_bn", train)(
                        identity.astype(jnp.float32))
                x = nn.relu(y + identity.astype(jnp.float32)).astype(cd)
                in_ch = ch
        x = x.astype(jnp.float32)
        if self.l2_normalize_output:
            x = _l2norm(x)
        return x


def build_image_encoder(name: str, compute_dtype, l2_normalize_output=False,
                        pack_width: bool = True):
    cls = {
        "alexnet": AlexNetEncoder,
        "mobilenet": MobileNetV2Encoder,
        "resnet18": ResNet18Encoder,
    }
    if name == "vgg16":
        from gloc3d_tpu.models.vgg import VGG16Encoder

        return VGG16Encoder(compute_dtype=compute_dtype,
                            l2_normalize_output=l2_normalize_output,
                            pack_width=pack_width)
    return cls[name](compute_dtype=compute_dtype,
                     l2_normalize_output=l2_normalize_output)


def encoder_trainable_prefixes(name: str) -> Tuple[str, ...]:
    """Parameter-name prefixes that TRAIN under the reference's pretrained
    freeze rules (main.py:519-564); everything else is frozen.

    alexnet: layers[:-1] frozen → only the final conv (our conv4) trains.
    vgg16: layers[:-5] frozen → conv5_1..5_3 (our conv10..12) train.
    mobilenet: layers[:-2] frozen → the last two inverted residuals
      (our block16, block17) train.
    resnet18: layers[:-2] frozen → layer3 + layer4 train.
    """
    return {
        "alexnet": ("conv4",),
        "vgg16": ("conv10", "conv11", "conv12"),
        "mobilenet": ("block16_", "block17_"),
        "resnet18": ("layer3_", "layer4_"),
    }[name]


def encoder_trainable_mask(name: str, params: dict) -> dict:
    """Boolean pytree over encoder params: True for trainable leaves."""
    prefixes = encoder_trainable_prefixes(name)

    def on_path(path, _):
        return any(
            str(getattr(k, "key", "")).startswith(prefixes) for k in path
        )

    return jax.tree_util.tree_map_with_path(on_path, params)


# ---------------------------------------------------------------------------
# torchvision state_dict converters (key layouts pinned by
# tests/test_torch_parity.py fixtures so real IMAGENET1K_V1 files convert
# unmodified)

def _k(w):  # (O, I, kH, kW) → (kH, kW, I, O)
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _dwk(w):  # depthwise (C, 1, kH, kW) → (kH, kW, 1, C)
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _bn_tree(sd, src):
    return (
        {"scale": _np(sd[f"{src}.weight"]), "bias": _np(sd[f"{src}.bias"])},
        {"mean": _np(sd[f"{src}.running_mean"]),
         "var": _np(sd[f"{src}.running_var"])},
    )


def convert_torchvision_encoder(name: str, state_dict) -> Tuple[dict, dict]:
    """torchvision state_dict → (params, batch_stats) trees for the encoder.

    Key layouts (torchvision 0.13+):
      alexnet:   features.{0,3,6,8,10}.{weight,bias}
      mobilenet: features.0.{0,1}.*, features.N.conv.{...}.*
      resnet18:  conv1/bn1/layer{L}.{B}.{conv1,bn1,conv2,bn2,downsample}
    """
    sd = {k: v for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    if name == "alexnet":
        for i, li in enumerate((0, 3, 6, 8, 10)):
            params[f"conv{i}"] = {
                "kernel": _k(_np(sd[f"features.{li}.weight"])),
                "bias": _np(sd[f"features.{li}.bias"]),
            }
        return params, stats

    if name == "mobilenet":
        params["stem_conv"] = {"kernel": _k(_np(sd["features.0.0.weight"]))}
        params["stem_bn"], stats["stem_bn"] = _bn_tree(sd, "features.0.1")
        for bi, (t, _, _) in enumerate(_MBV2_BLOCKS, start=1):
            base = f"features.{bi}.conv"
            # torchvision InvertedResidual.conv is a Sequential:
            #   t != 1: [ConvBNReLU(expand), ConvBNReLU(dw), conv(project), bn]
            #   t == 1: [ConvBNReLU(dw), conv(project), bn]
            off = 0
            if t != 1:
                params[f"block{bi}_expand_conv"] = {
                    "kernel": _k(_np(sd[f"{base}.0.0.weight"]))}
                (params[f"block{bi}_expand_bn"],
                 stats[f"block{bi}_expand_bn"]) = _bn_tree(sd, f"{base}.0.1")
                off = 1
            params[f"block{bi}_dw_conv"] = {
                "kernel": _dwk(_np(sd[f"{base}.{off}.0.weight"]))}
            (params[f"block{bi}_dw_bn"],
             stats[f"block{bi}_dw_bn"]) = _bn_tree(sd, f"{base}.{off}.1")
            params[f"block{bi}_project_conv"] = {
                "kernel": _k(_np(sd[f"{base}.{off + 1}.weight"]))}
            (params[f"block{bi}_project_bn"],
             stats[f"block{bi}_project_bn"]) = _bn_tree(
                sd, f"{base}.{off + 2}")
        return params, stats

    if name == "resnet18":
        params["conv1"] = {"kernel": _k(_np(sd["conv1.weight"]))}
        params["bn1"], stats["bn1"] = _bn_tree(sd, "bn1")
        for li in range(1, 5):
            for b in range(2):
                src = f"layer{li}.{b}"
                pre = f"layer{li}_block{b}"
                params[f"{pre}_conv1"] = {
                    "kernel": _k(_np(sd[f"{src}.conv1.weight"]))}
                params[f"{pre}_bn1"], stats[f"{pre}_bn1"] = _bn_tree(
                    sd, f"{src}.bn1")
                params[f"{pre}_conv2"] = {
                    "kernel": _k(_np(sd[f"{src}.conv2.weight"]))}
                params[f"{pre}_bn2"], stats[f"{pre}_bn2"] = _bn_tree(
                    sd, f"{src}.bn2")
                if f"{src}.downsample.0.weight" in sd:
                    params[f"{pre}_down_conv"] = {
                        "kernel": _k(_np(sd[f"{src}.downsample.0.weight"]))}
                    (params[f"{pre}_down_bn"],
                     stats[f"{pre}_down_bn"]) = _bn_tree(
                        sd, f"{src}.downsample.1")
        return params, stats

    raise ValueError(f"unknown encoder {name!r}")
