"""Config system tests: presets, JSON round-trip, derived quantities."""

from gloc3d_tpu import PipelineConfig


def test_json_roundtrip():
    cfg = PipelineConfig.i2i()
    assert PipelineConfig.from_json(cfg.to_json()) == cfg
    cfg = PipelineConfig.s2s()
    assert PipelineConfig.from_json(cfg.to_json()) == cfg


def test_presets():
    i2i = PipelineConfig.i2i()
    assert i2i.model.encoder == "vgg16"
    assert i2i.model.encoder_dim == 512
    assert i2i.index.dim == 512
    s2s = PipelineConfig.s2s()
    assert s2s.model.encoder == "pointpillar"
    assert s2s.index.dim == 128


def test_voxel_grid_size():
    # gen_libtorch_pointpillar.py:28-30 bounds -> 140 x 80 x 1 pillars
    assert PipelineConfig.s2s().voxel.grid_size == (140, 80, 1)


def test_replace_is_functional():
    cfg = PipelineConfig()
    cfg2 = cfg.replace(index=cfg.index.replace(top_k=5))
    assert cfg.index.top_k == 20 and cfg2.index.top_k == 5
