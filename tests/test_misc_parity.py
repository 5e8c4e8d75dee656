"""Small parity utilities: grid→points, other-negative mining, CLI export."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.ops.occupancy import grid_to_points
from gloc3d_tpu.train.mining import mine_other_negative


def test_grid_to_points():
    probs = jnp.zeros((8, 8)).at[2, 3].set(0.9).at[5, 1].set(0.7)
    pts, mask = grid_to_points(probs, jnp.array([10.0, 20.0]), 0.5)
    got = {tuple(np.round(p, 2)) for p, m in
           zip(np.asarray(pts), np.asarray(mask)) if m > 0}
    assert got == {(11.5, 21.0), (10.5, 22.5)}  # (x=o+col*res, y=o+row*res)
    assert float(mask.sum()) == 2.0
    # compaction: occupied first
    assert bool(mask[0]) and bool(mask[1]) and not bool(mask[2])


def test_mine_other_negative():
    nq, ndb, nneg = 2, 16, 3
    neg_mask = np.ones((nq, ndb), bool)
    neg_mask[:, :4] = False  # first 4 are positives
    neg_idx = jnp.asarray([[5, 6, 7], [8, 9, 10]], jnp.int32)
    other = mine_other_negative(
        jnp.asarray(neg_mask), jnp.arange(2), neg_idx, jax.random.PRNGKey(0)
    )
    other = np.asarray(other)
    assert other[0] not in (0, 1, 2, 3, 5, 6, 7)
    assert other[1] not in (0, 1, 2, 3, 8, 9, 10)


def test_cli_export(tmp_path):
    from gloc3d_tpu.cli import main as cli_main
    from gloc3d_tpu.config import (
        BEVConfig, ModelConfig, PipelineConfig, VoxelConfig,
    )

    cfg = PipelineConfig(
        bev=BEVConfig(image_size=64, max_points=128),
        voxel=VoxelConfig(max_points=128, xbound=(-8.0, 8.0, 0.5),
                          ybound=(-4.0, 4.0, 0.5)),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                          compute_dtype="float32"),
    )
    cfg_p = str(tmp_path / "cfg.json")
    open(cfg_p, "w").write(cfg.to_json())
    out = str(tmp_path / "model.stablehlo")
    rc = cli_main(["export", "--out", out, "--config", cfg_p])
    assert rc == 0
    blob = open(out, "rb").read()
    assert len(blob) > 1000

    from gloc3d_tpu.export import load_exported

    fn = load_exported(blob)
    d = fn(jnp.zeros((1, 128, 4)), jnp.ones((1, 128)))
    assert d.shape == (1, 128)
