"""Encoder-zoo tests: alexnet / mobilenet / resnet18 baselines.

Numeric parity is checked against torch replicas of the torchvision
backbones transcribed here (torchvision itself is not installed in this
environment; the layer plans follow main.py:519-564's sliced feature
extractors). The converter tests pin the torchvision state_dict key layout
so real IMAGENET1K_V1 files convert unmodified.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from gloc3d_tpu.config import ModelConfig, PipelineConfig, VoxelConfig
from gloc3d_tpu.models import build_model
from gloc3d_tpu.models.encoders import (
    ENCODER_DIMS,
    AlexNetEncoder,
    MobileNetV2Encoder,
    ResNet18Encoder,
    _MBV2_BLOCKS,
    convert_torchvision_encoder,
    encoder_trainable_mask,
    is_image_encoder,
)

torch.manual_seed(0)


# ---------------------------------------------------------------- torch replicas
def torch_alexnet_features():
    """torchvision alexnet.features[:-2] (main.py:519-529)."""
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, 1, 1),
    )


def _cbr6(cin, cout, k, s, groups=1):
    p = (k - 1) // 2
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, k, s, p, groups=groups, bias=False),
        tnn.BatchNorm2d(cout), tnn.ReLU6(),
    )


class TorchInvertedResidual(tnn.Module):
    def __init__(self, cin, cout, stride, t):
        super().__init__()
        hidden = cin * t
        layers = []
        if t != 1:
            layers.append(_cbr6(cin, hidden, 1, 1))
        layers.append(_cbr6(hidden, hidden, 3, stride, groups=hidden))
        layers.append(tnn.Conv2d(hidden, cout, 1, bias=False))
        layers.append(tnn.BatchNorm2d(cout))
        self.conv = tnn.Sequential(*layers)
        self.use_res = stride == 1 and cin == cout

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.use_res else y


def torch_mobilenet_features():
    """torchvision mobilenet_v2.features[:-1] (main.py:542-554)."""
    mods = [_cbr6(3, 32, 3, 2)]
    cin = 32
    for t, c, s in _MBV2_BLOCKS:
        mods.append(TorchInvertedResidual(cin, c, s, t))
        cin = c
    return tnn.Sequential(*mods)


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class TorchResNet18Features(tnn.Module):
    """torchvision resnet18 children()[:-2] (main.py:555-564)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for li, ch in enumerate((64, 128, 256, 512), start=1):
            blocks = []
            for b in range(2):
                blocks.append(TorchBasicBlock(cin, ch, 2 if li > 1 and b == 0 else 1))
                cin = ch
            setattr(self, f"layer{li}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        return x


def _randomize_bn_stats(mod, rng):
    for m in mod.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.tensor(
                    rng.randn(m.num_features), dtype=torch.float32))
                m.running_var.copy_(torch.tensor(
                    0.5 + rng.rand(m.num_features), dtype=torch.float32))
                m.weight.copy_(torch.tensor(
                    0.5 + rng.rand(m.num_features), dtype=torch.float32))
                m.bias.copy_(torch.tensor(
                    rng.randn(m.num_features) * 0.1, dtype=torch.float32))


def _state_dict_np(mod, prefix=""):
    return {prefix + k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _forward_pair(flax_enc, name, tmod, sd_prefix, size, seed=1):
    """Run torch replica and flax encoder (converted weights) on the same
    input; return (torch NHWC, flax) outputs."""
    rng = np.random.RandomState(seed)
    _randomize_bn_stats(tmod, rng)
    tmod.eval()
    x = rng.rand(2, size, size, 3).astype(np.float32)
    with torch.no_grad():
        ty = tmod(torch.tensor(x.transpose(0, 3, 1, 2)))
    ty = ty.numpy().transpose(0, 2, 3, 1)

    params, stats = convert_torchvision_encoder(
        name, _state_dict_np(tmod, sd_prefix))
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    fy = flax_enc.apply(variables, jnp.asarray(x))
    return ty, np.asarray(fy)


# ------------------------------------------------------------------- tests
def test_alexnet_numeric_parity():
    enc = AlexNetEncoder(compute_dtype=jnp.float32)
    ty, fy = _forward_pair(enc, "alexnet", torch_alexnet_features(),
                           "features.", size=96)
    assert ty.shape == fy.shape and ty.shape[-1] == ENCODER_DIMS["alexnet"]
    np.testing.assert_allclose(fy, ty, atol=2e-4, rtol=1e-3)


def test_mobilenet_numeric_parity():
    enc = MobileNetV2Encoder(compute_dtype=jnp.float32)
    ty, fy = _forward_pair(enc, "mobilenet", torch_mobilenet_features(),
                           "features.", size=64)
    assert ty.shape == fy.shape and ty.shape[-1] == ENCODER_DIMS["mobilenet"]
    np.testing.assert_allclose(fy, ty, atol=5e-4, rtol=1e-2)


def test_resnet18_numeric_parity():
    enc = ResNet18Encoder(compute_dtype=jnp.float32)
    ty, fy = _forward_pair(enc, "resnet18", TorchResNet18Features(),
                           "", size=64)
    assert ty.shape == fy.shape and ty.shape[-1] == ENCODER_DIMS["resnet18"]
    np.testing.assert_allclose(fy, ty, atol=5e-4, rtol=1e-2)


@pytest.mark.parametrize("name", ["alexnet", "mobilenet", "resnet18"])
def test_converted_tree_matches_init(name):
    """Converted torchvision trees must exactly match model.init's layout —
    the key-layout pin that lets real IMAGENET1K_V1 files load unmodified."""
    tmod = {
        "alexnet": lambda: torch_alexnet_features(),
        "mobilenet": torch_mobilenet_features,
        "resnet18": TorchResNet18Features,
    }[name]()
    prefix = "" if name == "resnet18" else "features."
    params, stats = convert_torchvision_encoder(
        name, _state_dict_np(tmod, prefix))

    enc = {
        "alexnet": AlexNetEncoder, "mobilenet": MobileNetV2Encoder,
        "resnet18": ResNet18Encoder,
    }[name](compute_dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def tree_shapes(t):
        return jax.tree.map(lambda a: jnp.shape(a), t)

    assert tree_shapes(variables["params"]) == tree_shapes(params)
    if "batch_stats" in variables:
        assert tree_shapes(variables["batch_stats"]) == tree_shapes(stats)


@pytest.mark.parametrize("name,want_frac", [
    ("alexnet", (0.1, 0.5)), ("mobilenet", (0.2, 0.8)),
    ("resnet18", (0.5, 0.95)),
])
def test_freeze_boundaries(name, want_frac):
    """Per-arch pretrained freeze rules (main.py:519-564): the right leaves
    are trainable and the trainable fraction of parameters is sane."""
    enc = {
        "alexnet": AlexNetEncoder, "mobilenet": MobileNetV2Encoder,
        "resnet18": ResNet18Encoder,
    }[name](compute_dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = variables["params"]
    mask = encoder_trainable_mask(name, params)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(mask)
    flat_p = tu.flatten_dict(params)
    n_train = sum(np.size(flat_p[k]) for k, v in flat.items() if v)
    n_total = sum(np.size(v) for v in flat_p.values())
    frac = n_train / n_total
    assert want_frac[0] < frac < want_frac[1], frac

    expect_true = {
        "alexnet": ("conv4",), "mobilenet": ("block17_project_conv",),
        "resnet18": ("layer4_block1_conv2",),
    }[name]
    expect_false = {
        "alexnet": ("conv0",), "mobilenet": ("stem_conv",),
        "resnet18": ("conv1", "layer2_block0_conv1"),
    }[name]
    for k in expect_true:
        assert all(v for v in tu.flatten_dict(mask[k]).values()), k
    for k in expect_false:
        assert not any(v for v in tu.flatten_dict(mask[k]).values()), k


@pytest.mark.parametrize("name", ["alexnet", "mobilenet", "resnet18"])
def test_descriptor_model_end_to_end(name):
    """build_model wires each encoder through NetVLAD-FC to a unit-norm
    descriptor of the encoder's width."""
    cfg = PipelineConfig.i2i(name)
    assert cfg.model.encoder_dim == ENCODER_DIMS[name]
    assert cfg.index.dim == ENCODER_DIMS[name]
    model = build_model(
        cfg.model.replace(compute_dtype="float32"), VoxelConfig())
    x = jnp.asarray(np.random.RandomState(0).rand(2, 96, 96, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(variables, x)
    assert out.shape == (2, ENCODER_DIMS[name])
    # netvlad_fc's post-hidden1 descriptor is unnormalized (reference parity,
    # netvlad_fc.py:105) — just require finite, O(1)-scale output
    norms = np.linalg.norm(np.asarray(out), axis=1)
    assert np.all(np.isfinite(norms)) and np.all(norms < 100.0)
    assert is_image_encoder(name)
