#!/usr/bin/env python
"""Convert reference (PyTorch) checkpoints to gloc3d_tpu parameter trees.

Supports:
  1. torchvision VGG16 state_dicts (``features.N.weight/bias``) → the
     VGG16Encoder npz loaded by models/vgg.py:load_torchvision_npz. This is
     how IMAGENET1K_V1 pretraining enters the i2i path (main.py:533-535).
  2. GLoc3D VGGVLAD checkpoints (main.py:403-407 ``checkpoint.pth.tar`` with
     ``state_dict`` of encoder.N.* + pool.*) → a full DescriptorModel params
     dict (i2i, vgg16 + netvlad_fc), so trained reference models transfer.

Weight layout mappings:
  conv2d  (O, I, kH, kW) → (kH, kW, I, O)
  conv1x1 VLAD assignment (K, D, 1, 1) → (D, K)
  hidden1_weights (K·D, D) → unchanged (flatten order matches: K-major)

Usage:
  python tools/convert_torch_checkpoint.py vgg16 IN.pth OUT.npz
  python tools/convert_torch_checkpoint.py vggvlad IN.pth.tar OUT.npz
  python tools/convert_torch_checkpoint.py pointpillar IN.pth.tar OUT.npz
  (load with models.vgg.load_torchvision_npz / load_vggvlad_npz /
  models.pointpillar.load_pointpillar_npz)
"""

from __future__ import annotations

import sys

import numpy as np

# torchvision vgg16.features conv layer indices (features[:-2] keeps all 13)
VGG16_FEATURE_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def _to_numpy(t):
    return np.ascontiguousarray(t.detach().cpu().numpy())


def convert_vgg16_state_dict(state_dict) -> dict:
    """torchvision vgg16 (or its ``features.``-prefixed subset) → npz dict."""
    out = {}
    for i, li in enumerate(VGG16_FEATURE_CONV_IDX):
        for cand in (f"features.{li}", f"{li}", f"encoder.{li}"):
            wk, bk = f"{cand}.weight", f"{cand}.bias"
            if wk in state_dict:
                w = _to_numpy(state_dict[wk])
                out[f"conv{i}_kernel"] = w.transpose(2, 3, 1, 0)
                out[f"conv{i}_bias"] = _to_numpy(state_dict[bk])
                break
        else:
            raise KeyError(f"conv layer {li} not found in state dict")
    return out


def convert_vggvlad_checkpoint(state_dict) -> dict:
    """GLoc3D VGGVLAD (encoder + netvlad_fc pool) → flat npz dict.

    Keys produced:
      encoder: conv{i}_kernel / conv{i}_bias  (13 convs)
      pool: pool_conv_weight (D, K), pool_centroids (K, D),
            pool_hidden1_weights (K·D, D) [, pool_conv_bias (K,)]
    """
    # strip DataParallel prefixes
    sd = { k.replace("module.", ""): v for k, v in state_dict.items() }
    out = convert_vgg16_state_dict(sd)
    cw = _to_numpy(sd["pool.conv.weight"])          # (K, D, 1, 1)
    out["pool_conv_weight"] = cw[:, :, 0, 0].T      # (D, K)
    if "pool.conv.bias" in sd and sd["pool.conv.bias"] is not None:
        out["pool_conv_bias"] = _to_numpy(sd["pool.conv.bias"])
    out["pool_centroids"] = _to_numpy(sd["pool.centroids"])
    out["pool_hidden1_weights"] = _to_numpy(sd["pool.hidden1_weights"])
    for k in ("pool.context_gating.gating_weights",):
        if k in sd:
            out["pool_gating_weights"] = _to_numpy(sd[k])
    return out


def convert_pointpillar_checkpoint(state_dict) -> dict:
    """GLoc3D s2s checkpoint (PointPillar/PointPillarTest + netvlad_fc, the
    gen_libtorch_pointpillar.py:25-40 composition) → flat npz dict.

    Keys are '/'-joined paths into the flax variables tree
    (params/... and batch_stats/...), reloadable with
    models.pointpillar.load_pointpillar_npz. Torch Sequential indices:
    PillarBlock layers [Conv,BN,ReLU]×n → conv 3i / bn 3i+1; up1 [Conv,BN,
    ReLU] → 0/1; up2, up3 [Upsample,Conv,BN,ReLU] → 1/2; conv_out[_pose]
    [Conv,BN,ReLU,Conv,BN] → (0,1) and (3,4).
    """
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    out = {}

    def conv2d(src, dst):
        out[f"params/encoder/{dst}/Conv_0/kernel"] = _to_numpy(
            sd[f"encoder.{src}.weight"]).transpose(2, 3, 1, 0)

    def bn(src, dst):
        out[f"params/encoder/{dst}/BatchNorm_0/scale"] = _to_numpy(
            sd[f"encoder.{src}.weight"])
        out[f"params/encoder/{dst}/BatchNorm_0/bias"] = _to_numpy(
            sd[f"encoder.{src}.bias"])
        out[f"batch_stats/encoder/{dst}/BatchNorm_0/mean"] = _to_numpy(
            sd[f"encoder.{src}.running_mean"])
        out[f"batch_stats/encoder/{dst}/BatchNorm_0/var"] = _to_numpy(
            sd[f"encoder.{src}.running_var"])

    # PointNet: Conv1d(14→64, k=1) ≙ Dense
    out["params/encoder/pn/Dense_0/kernel"] = _to_numpy(
        sd["encoder.pn.pointnet.0.weight"])[:, :, 0].T
    bn("pn.pointnet.1", "pn")
    for name, nlayers in (("block1", 2), ("block2", 3), ("block3", 3)):
        for i in range(nlayers):
            conv2d(f"{name}.layers.{3*i}", f"{name}/ConvBNRelu_{i}")
            bn(f"{name}.layers.{3*i+1}", f"{name}/ConvBNRelu_{i}")
    for name, ci in (("up1", 0), ("up2", 1), ("up3", 1)):
        conv2d(f"{name}.{ci}", name)
        bn(f"{name}.{ci+1}", name)
    for head in ("conv_out", "conv_out_pose"):
        if f"encoder.{head}.0.weight" in sd:
            conv2d(f"{head}.0", f"{head}_0")
            bn(f"{head}.1", f"{head}_0")
            conv2d(f"{head}.3", f"{head}_1")
            bn(f"{head}.4", f"{head}_1")

    cw = _to_numpy(sd["pool.conv.weight"])          # (K, D, 1, 1)
    out["params/pool/conv_weight"] = cw[:, :, 0, 0].T
    if sd.get("pool.conv.bias") is not None:
        out["params/pool/conv_bias"] = _to_numpy(sd["pool.conv.bias"])
    out["params/pool/centroids"] = _to_numpy(sd["pool.centroids"])
    out["params/pool/hidden1_weights"] = _to_numpy(sd["pool.hidden1_weights"])
    return out


def main(argv):
    if len(argv) != 4 or argv[1] not in ("vgg16", "vggvlad", "pointpillar"):
        print(__doc__)
        return 1
    import torch

    kind, inp, outp = argv[1], argv[2], argv[3]
    blob = torch.load(inp, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    if kind == "vgg16":
        out = convert_vgg16_state_dict(state_dict)
    elif kind == "pointpillar":
        out = convert_pointpillar_checkpoint(state_dict)
    else:
        out = convert_vggvlad_checkpoint(state_dict)
    np.savez(outp, **out)
    print(f"wrote {outp}: {sorted(out)[:6]}... ({len(out)} arrays)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
