"""Cross-process model hand-off: the serialized StableHLO blob is the
TorchScript file of this framework (main.py:189-198 save →
loop_detector.h:47-57 / s2s_feature_extract.cpp:144-160 load). These tests
prove the actual serving hand-off: a FRESH process that never imports any
gloc3d_tpu model code reloads the blob and reproduces descriptors
bit-for-bit, and `gloc query --from-export` serves a located query from it.
"""

import json
import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import ModelConfig, VoxelConfig
from gloc3d_tpu.export import (
    ExportedDescriptorModel, export_descriptor_model, load_exported,
)
from gloc3d_tpu.models import build_model

N_PTS = 512


def _model_and_inputs():
    mc = ModelConfig(encoder="pointpillar", encoder_dim=128,
                     compute_dtype="float32")
    vc = VoxelConfig(max_points=N_PTS, xbound=(-10.0, 10.0, 0.5),
                     ybound=(-6.0, 6.0, 0.5))
    model = build_model(mc, vc)
    rng = np.random.RandomState(0)
    pts = np.zeros((1, N_PTS, 4), np.float32)
    pts[..., 0] = rng.uniform(-9, 9, (1, N_PTS))
    pts[..., 1] = rng.uniform(-5, 5, (1, N_PTS))
    pts[..., 2] = rng.uniform(0, 3, (1, N_PTS))
    pts[..., 3] = rng.uniform(0, 1, (1, N_PTS))
    mask = np.ones((1, N_PTS), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(pts),
                                 jnp.asarray(mask))
    return model, params, pts, mask


FRESH_PROCESS_SCRIPT = textwrap.dedent("""
    import sys
    import numpy as np
    import jax
    from jax import export

    blob_path, pts_path, out_path = sys.argv[1:4]
    with open(blob_path, "rb") as f:
        fn = export.deserialize(f.read()).call
    d = np.load(pts_path)
    out = np.asarray(fn(d["pts"], d["mask"]))
    # the hand-off contract: NO model-building code was ever imported
    assert not any(m.split(".")[0] == "gloc3d_tpu" for m in sys.modules), \\
        "fresh process accidentally imported gloc3d_tpu"
    np.save(out_path, out)
""")


def test_fresh_process_reload_bit_identical(tmp_path):
    model, params, pts, mask = _model_and_inputs()
    blob = export_descriptor_model(model, params, jnp.asarray(pts),
                                   jnp.asarray(mask))

    # in-process: exported call vs live model (tight, not necessarily bitwise
    # -- export lowers through a separate StableHLO round trip)
    want_live = np.asarray(model.apply(params, jnp.asarray(pts),
                                       jnp.asarray(mask)))
    want_exported = np.asarray(load_exported(blob)(pts, mask))
    np.testing.assert_allclose(want_exported, want_live, rtol=1e-5,
                               atol=1e-6)

    blob_path = tmp_path / "model.hlo"
    blob_path.write_bytes(blob)
    np.savez(tmp_path / "inputs.npz", pts=pts, mask=mask)
    script = tmp_path / "reload.py"
    script.write_text(FRESH_PROCESS_SCRIPT)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    out_path = tmp_path / "desc.npy"
    r = subprocess.run(
        [sys.executable, str(script), str(blob_path),
         str(tmp_path / "inputs.npz"), str(out_path)],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, f"fresh process failed:\n{r.stderr[-2000:]}"
    got = np.load(out_path)
    # same program bytes, same platform: bit-for-bit
    assert np.array_equal(got, want_exported), (
        f"max diff {np.abs(got - want_exported).max()}")


def test_exported_model_shim_matches_live(tmp_path):
    model, params, pts, mask = _model_and_inputs()
    blob = export_descriptor_model(model, params, jnp.asarray(pts),
                                   jnp.asarray(mask))
    shim = ExportedDescriptorModel(blob)
    got = np.asarray(shim.apply({}, pts, mask))
    want = np.asarray(model.apply(params, jnp.asarray(pts),
                                  jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # keyword paths are refused, not silently wrong
    import pytest

    with pytest.raises(ValueError, match="voxel_stats"):
        shim.apply({}, pts, mask, voxel_stats=None)
