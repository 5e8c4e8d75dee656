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
  (load with models.vgg.load_torchvision_npz / load_vggvlad_npz)
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


def main(argv):
    if len(argv) != 4 or argv[1] not in ("vgg16", "vggvlad"):
        print(__doc__)
        return 1
    import torch

    kind, inp, outp = argv[1], argv[2], argv[3]
    blob = torch.load(inp, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    if kind == "vgg16":
        out = convert_vgg16_state_dict(state_dict)
    else:
        out = convert_vggvlad_checkpoint(state_dict)
    np.savez(outp, **out)
    print(f"wrote {outp}: {sorted(out)[:6]}... ({len(out)} arrays)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
