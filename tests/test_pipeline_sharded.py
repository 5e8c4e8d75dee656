"""GlobalLocalizer with a mesh-sharded descriptor bank (8-device CPU mesh)."""

import numpy as np

from gloc3d_tpu.parallel import make_mesh
from test_pipeline import localizer, scan_at  # noqa: F401  (fixture reuse)


def test_sharded_bank_matches_flat(localizer, devices):  # noqa: F811
    x, y, yaw = localizer.db_poses[4]
    pts, mask = scan_at(x + 1.0, y - 0.5, yaw + 0.15)

    flat_res = localizer.locate(pts, mask)
    flat_bank = localizer.bank

    try:
        localizer.shard_bank(make_mesh())
        sharded_res = localizer.locate(pts, mask)
    finally:
        localizer.bank = flat_bank

    assert sharded_res.success == flat_res.success
    assert sharded_res.db_index == flat_res.db_index
    np.testing.assert_array_equal(sharded_res.candidates, flat_res.candidates)
    np.testing.assert_allclose(sharded_res.candidate_dists,
                               flat_res.candidate_dists, rtol=1e-4, atol=1e-4)
