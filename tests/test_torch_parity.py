"""Numeric parity against the REFERENCE PyTorch code.

These tests import the reference implementation from /root/reference (never
copying it) and check that our Flax reimplementation + the checkpoint
converter produce the same numbers. Skipped when torch or the reference tree
is unavailable, so the repo stays standalone.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


def _ref_netvlad(num_clusters, dim):
    sys.path.insert(0, REF)
    try:
        from model.netvlad_fc import NetVLAD as RefNetVLAD
    finally:
        sys.path.pop(0)
    return RefNetVLAD(num_clusters=num_clusters, dim=dim)


def test_netvlad_fc_matches_reference_torch():
    """Same weights → same descriptor (torch reference vs our einsum VLAD)."""
    import jax
    import jax.numpy as jnp

    from gloc3d_tpu.models import NetVLAD

    k, d = 8, 16
    torch.manual_seed(0)
    ref = _ref_netvlad(k, d).eval()

    x = np.random.RandomState(1).randn(2, d, 5, 7).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    ours = NetVLAD(num_clusters=k, dim=d, use_fc=True, vladv2=False,
                   compute_dtype=jnp.float32)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = ours.init(jax.random.PRNGKey(0), x_nhwc)["params"]
    # install reference weights (conv has no bias for vladv1)
    params["conv_weight"] = jnp.asarray(
        ref.conv.weight.detach().numpy()[:, :, 0, 0].T
    )
    params["centroids"] = jnp.asarray(ref.centroids.detach().numpy())
    params["hidden1_weights"] = jnp.asarray(
        ref.hidden1_weights.detach().numpy()
    )
    got = np.asarray(ours.apply({"params": params}, x_nhwc))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_vggvlad_converter_roundtrip(tmp_path):
    """Converter maps a synthetic VGGVLAD state dict; conv parity vs torch."""
    import jax
    import jax.numpy as jnp
    import torch.nn as tnn

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        from convert_torch_checkpoint import (
            VGG16_FEATURE_CONV_IDX, convert_vgg16_state_dict,
        )
    finally:
        sys.path.pop(0)

    from gloc3d_tpu.models.vgg import VGG16Encoder, load_torchvision_npz

    # build the torchvision-vgg16 features[:-2] topology in torch
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=True))
            in_ch = v
    torch_feats = tnn.Sequential(*layers[:-1])  # drop last ReLU (features[:-2])
    torch.manual_seed(2)
    for m in torch_feats.modules():
        if isinstance(m, tnn.Conv2d):
            tnn.init.normal_(m.weight, std=0.05)
            tnn.init.normal_(m.bias, std=0.05)

    sd = torch_feats.state_dict()
    # keys are '0.weight' etc; converter accepts bare indices
    npz = convert_vgg16_state_dict(sd)
    path = str(tmp_path / "vgg.npz")
    np.savez(path, **npz)

    x = np.random.RandomState(3).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = torch_feats(torch.from_numpy(x)).numpy()  # (1, 512, 4, 4)

    enc = VGG16Encoder(compute_dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    new = load_torchvision_npz(params["params"], path)
    got = np.asarray(enc.apply({"params": new}, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-3)


def test_vgg16_torchvision_key_layout_pinned(tmp_path):
    """A state_dict in torchvision's EXACT key layout (``features.N.weight``
    at N ∈ {0,2,5,7,10,12,14,17,19,21,24,26,28}, the IMAGENET1K_V1 file
    layout, main.py:531-541) converts and loads unmodified — so a real
    pretrained file works the day an environment has one."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        from convert_torch_checkpoint import (
            VGG16_FEATURE_CONV_IDX, convert_vgg16_state_dict,
        )
    finally:
        sys.path.pop(0)

    from gloc3d_tpu.models.vgg import VGG16Encoder, load_torchvision_npz

    channels = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    rng = np.random.RandomState(7)
    sd = {}
    in_ch = 3
    for li, ch in zip(VGG16_FEATURE_CONV_IDX, channels):
        sd[f"features.{li}.weight"] = torch.tensor(
            rng.randn(ch, in_ch, 3, 3).astype(np.float32) * 0.05)
        sd[f"features.{li}.bias"] = torch.tensor(
            rng.randn(ch).astype(np.float32) * 0.05)
        in_ch = ch
    # torchvision files also carry the classifier head; converter must skip it
    sd["classifier.0.weight"] = torch.zeros(4096, 25088)
    sd["classifier.0.bias"] = torch.zeros(4096)

    npz = convert_vgg16_state_dict(sd)
    path = str(tmp_path / "vgg_tv.npz")
    np.savez(path, **npz)

    enc = VGG16Encoder(compute_dtype=jnp.float32)
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    new = load_torchvision_npz(params["params"], path)
    # every conv must carry the converted weights in HWIO
    for i, (li, ch) in enumerate(zip(VGG16_FEATURE_CONV_IDX, channels)):
        want = sd[f"features.{li}.weight"].numpy().transpose(2, 3, 1, 0)
        np.testing.assert_array_equal(np.asarray(new[f"conv{i}"]["kernel"]), want)
        np.testing.assert_array_equal(
            np.asarray(new[f"conv{i}"]["bias"]),
            sd[f"features.{li}.bias"].numpy())
    out = enc.apply({"params": new}, x)
    assert out.shape == (1, 4, 4, 512) and bool(jnp.all(jnp.isfinite(out)))


def test_pointpillar_checkpoint_converter_matches_reference():
    """A reference s2s checkpoint (PointPillar + netvlad_fc state_dict)
    converted with tools/convert_torch_checkpoint.py must reproduce the torch
    forward in the Flax DescriptorModel."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(REF, ".."))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        from ab_torch_flax_s2s import (
            DIM, K_CLUSTERS, N_PTS, XB, YB, ZB, build_flax_model,
            build_torch_model, make_scans,
        )
        from ab_torch_flax import make_world
        from convert_torch_checkpoint import convert_pointpillar_checkpoint
    finally:
        sys.path.pop(0)
        sys.path.pop(0)

    from gloc3d_tpu.models.pointpillar import load_pointpillar_npz

    tmodel = build_torch_model(seed=0).eval()
    # pretend this is a trained checkpoint: the raw state_dict
    flat = convert_pointpillar_checkpoint(tmodel.state_dict())

    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, **flat)
        fmodel = build_flax_model()
        world = make_world(7)
        pts, mask = make_scans(world, [(0.0, 0.0, 0.0), (5.0, 2.0, 0.4)], 77)
        var = jax.jit(fmodel.init)(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(mask))
        var = load_pointpillar_npz(var, f.name)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(pts), torch.from_numpy(mask)).numpy()
    got = np.asarray(fmodel.apply(
        {"params": var["params"], "batch_stats": var["batch_stats"]},
        jnp.asarray(pts), jnp.asarray(mask)))
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    assert rel < 2e-2, f"converted checkpoint diverges: rel {rel}"
