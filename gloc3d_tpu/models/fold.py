"""BatchNorm folding for serving.

Eval-mode BN is an affine map y = γ(x − μ)/√(σ² + ε) + β; folding it into
the preceding conv/dense (kernel' = kernel·γ/√(σ²+ε), bias' = β − γμ/√(σ²+ε))
removes ~10 fp32 elementwise passes over the feature maps from the serving
forward and lets XLA fuse the conv stack end to end. Train with the standard
model; fold once at deployment:

    folded_cfg = cfg.replace(model=cfg.model.replace(fold_bn=True))
    folded_model = build_model(folded_cfg.model, folded_cfg.voxel)
    folded_params = fold_batch_norm(params["params"], params["batch_stats"])

The reference has no analogous machinery (libtorch runs BN layers as-is);
this is a TPU-serving optimization, output-equal to the eval-mode standard
model up to fp32 rounding.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-5  # flax nn.BatchNorm default, matches torch


def _fold_pair(kernel, bn_params, bn_stats):
    """kernel (..., O) + BN(γ, β, μ, σ²) → (kernel', bias')."""
    gamma = np.asarray(bn_params["scale"], np.float32)
    beta = np.asarray(bn_params["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    inv = gamma / np.sqrt(var + _BN_EPS)
    k = np.asarray(kernel, np.float32) * inv  # broadcast over output channel
    b = beta - mean * inv
    return jnp.asarray(k), jnp.asarray(b)


def fold_batch_norm(params: dict, batch_stats: dict) -> dict:
    """Standard-model (params, batch_stats) → folded-model params.

    Walks the tree: any module containing both a conv/dense ("Conv_0" /
    "Dense_0", bias-free) and a "BatchNorm_0" is folded; everything else is
    copied through. The result matches the param structure of the same
    module tree built with fold_bn=True.
    """
    def walk(p, s):
        out = {}
        keys = set(p) | set(s or {})
        for k in keys:
            pv = p.get(k)
            sv = (s or {}).get(k)
            if k == "BatchNorm_0":
                continue  # consumed below by its sibling conv/dense
            if isinstance(pv, dict):
                out[k] = walk(pv, sv)
            elif pv is not None:
                out[k] = pv
        # fold at THIS level if the module holds conv/dense + BN
        for lin in ("Conv_0", "Dense_0"):
            if lin in p and "BatchNorm_0" in p:
                k_new, b_new = _fold_pair(
                    p[lin]["kernel"], p["BatchNorm_0"], s["BatchNorm_0"])
                out[lin] = {"kernel": k_new, "bias": b_new}
        return out

    return walk(params, batch_stats)
