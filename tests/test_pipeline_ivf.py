"""GlobalLocalizer with the IVF map-scale index backend (config-selected)."""

import dataclasses

import numpy as np
import pytest

from gloc3d_tpu.pipeline import GlobalLocalizer
from test_pipeline import CFG, localizer, scan_at  # noqa: F401


@pytest.fixture(scope="module")
def ivf_localizer(localizer):  # noqa: F811
    cfg = CFG.replace(index=CFG.index.replace(
        backend="ivf", ivf_num_cells=4, ivf_cell_capacity=16, ivf_nprobe=4,
        ivf_train_sample=64,
    ))
    loc = GlobalLocalizer(cfg, localizer.model, localizer.params)
    db = np.stack([scan_at(*p)[0] for p in localizer.db_poses])
    mk = np.stack([scan_at(*p)[1] for p in localizer.db_poses])
    loc.add_keyframes(db, mk)
    loc.db_poses = localizer.db_poses
    return loc


def test_ivf_backend_locates(ivf_localizer, localizer):  # noqa: F811
    x, y, yaw = ivf_localizer.db_poses[4]
    pts, mask = scan_at(x + 1.0, y - 0.5, yaw + 0.15)
    res = ivf_localizer.locate(pts, mask)
    ref = localizer.locate(pts, mask)
    assert res.success and res.db_index == ref.db_index
    # nprobe == num_cells → exact search: identical candidate ranking
    np.testing.assert_array_equal(res.candidates, ref.candidates)


def test_ivf_backend_save_load(ivf_localizer, tmp_path):
    out = str(tmp_path / "ivf_index")
    ivf_localizer.save(out)
    loc2 = GlobalLocalizer(ivf_localizer.cfg, ivf_localizer.model,
                           ivf_localizer.params)
    loc2.load(out)
    assert len(loc2.bank) == len(ivf_localizer.bank)
    x, y, yaw = ivf_localizer.db_poses[1]
    pts, mask = scan_at(x - 1.0, y + 0.5, yaw - 0.1)
    r1 = ivf_localizer.locate(pts, mask)
    r2 = loc2.locate(pts, mask)
    assert r1.success == r2.success and r1.db_index == r2.db_index


def test_ivf_exclude_recent():
    """SLAM-mode exclude-recent on the IVF backend: recent ids filtered,
    results match the flat bank's windowed query."""
    from gloc3d_tpu.config import IndexConfig
    from gloc3d_tpu.pipeline import _IVFBankAdapter

    rng = np.random.RandomState(0)
    feats = rng.randn(64, 16).astype(np.float32)
    cfg = IndexConfig(dim=16, top_k=5, backend="ivf", ivf_num_cells=4,
                      ivf_nprobe=4, num_exclude_recent=8)
    bank = _IVFBankAdapter(cfg, dim=16)
    bank.add(feats)
    q = feats[3:4] + 0.01

    d2, idx = bank.query(q, k=5, exclude_recent=True)
    assert (idx[0] < 64 - 8).all()
    assert 3 in idx[0]  # the true neighbor (old entry) is retrievable

    # an entry inside the recent window must not be returned
    q_recent = feats[60:61] + 0.01
    _, idx_r = bank.query(q_recent, k=5, exclude_recent=True)
    assert 60 not in idx_r[0]
    assert (idx_r[0] < 56).all()
