"""BN folding: folded serving model must equal the eval-mode standard model."""

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import ModelConfig, VoxelConfig
from gloc3d_tpu.models import build_model
from gloc3d_tpu.models.fold import fold_batch_norm

N = 1024
XB, YB, ZB = (-8.0, 8.0, 0.5), (-4.0, 4.0, 0.5), (-10.0, 10.0, 20.0)


def _scan(seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((2, N, 4), np.float32)
    n = 700
    pts[:, :n, 0] = rng.uniform(-7, 7, (2, n))
    pts[:, :n, 1] = rng.uniform(-3.5, 3.5, (2, n))
    pts[:, :n, 2] = rng.uniform(0, 3, (2, n))
    pts[:, :n, 3] = rng.uniform(0, 1, (2, n))
    mask = np.zeros((2, N), np.float32)
    mask[:, :n] = 1.0
    return pts, mask


def test_folded_matches_standard_eval():
    mc = ModelConfig(encoder="pointpillar", encoder_dim=128,
                     compute_dtype="float32")
    vc = VoxelConfig(max_points=N, xbound=XB, ybound=YB, zbound=ZB)
    model = build_model(mc, vc)
    pts, mask = _scan()
    var = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(pts),
                              jnp.asarray(mask))
    # make BN non-trivial: fake running stats + scales
    import jax.tree_util as jtu

    def bump(path, x):
        name = jtu.keystr(path)
        rng = np.random.RandomState(abs(hash(name)) % 2**31)
        if "batch_stats" in name and name.endswith("mean']"):
            return jnp.asarray(rng.uniform(-0.5, 0.5, x.shape).astype(np.float32))
        if "batch_stats" in name and name.endswith("var']"):
            return jnp.asarray(rng.uniform(0.5, 2.0, x.shape).astype(np.float32))
        if "BatchNorm_0" in name and name.endswith("scale']"):
            return jnp.asarray(rng.uniform(0.5, 1.5, x.shape).astype(np.float32))
        if "BatchNorm_0" in name and name.endswith("bias']"):
            return jnp.asarray(rng.uniform(-0.3, 0.3, x.shape).astype(np.float32))
        return x

    var = jtu.tree_map_with_path(bump, var)
    want = model.apply(var, jnp.asarray(pts), jnp.asarray(mask))

    folded_model = build_model(mc.replace(fold_bn=True), vc)
    folded = fold_batch_norm(var["params"], var["batch_stats"])
    got = folded_model.apply({"params": folded}, jnp.asarray(pts),
                             jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-3)


def test_folded_param_structure_matches():
    mc = ModelConfig(encoder="pointpillar", encoder_dim=128,
                     compute_dtype="float32")
    vc = VoxelConfig(max_points=N, xbound=XB, ybound=YB, zbound=ZB)
    model = build_model(mc, vc)
    pts, mask = _scan()
    var = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(pts),
                              jnp.asarray(mask))
    folded_model = build_model(mc.replace(fold_bn=True), vc)
    ref = jax.jit(folded_model.init)(jax.random.PRNGKey(0), jnp.asarray(pts),
                                     jnp.asarray(mask))
    folded = fold_batch_norm(var["params"], var["batch_stats"])
    want = jax.tree_util.tree_structure(ref["params"])
    got = jax.tree_util.tree_structure(folded)
    assert got == want


def test_export_folded_cli(tmp_path):
    """gloc export --fold-bn produces a loadable StableHLO blob whose outputs
    match the standard export."""
    from gloc3d_tpu.cli import main as cli_main
    from gloc3d_tpu.config import (
        BEVConfig, IndexConfig, MatchConfig, ModelConfig, PipelineConfig,
        VoxelConfig,
    )
    from gloc3d_tpu.export import load_exported

    cfg = PipelineConfig(
        bev=BEVConfig(image_size=64, max_points=N),
        voxel=VoxelConfig(max_points=N, xbound=XB, ybound=YB, zbound=ZB),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                          compute_dtype="float32"),
        index=IndexConfig(dim=128),
        match=MatchConfig(image_size=64),
    )
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    out_a = str(tmp_path / "model.shlo")
    out_b = str(tmp_path / "model_folded.shlo")
    assert cli_main(["export", "--config", str(cfg_path), "--out", out_a]) == 0
    assert cli_main(["export", "--config", str(cfg_path), "--out", out_b,
                     "--fold-bn"]) == 0
    fa = load_exported(open(out_a, "rb").read())
    fb = load_exported(open(out_b, "rb").read())
    pts, mask = _scan(seed=7)
    da = np.asarray(fa(jnp.asarray(pts[:1]), jnp.asarray(mask[:1])))
    db = np.asarray(fb(jnp.asarray(pts[:1]), jnp.asarray(mask[:1])))
    np.testing.assert_allclose(da, db, atol=2e-4, rtol=2e-3)
