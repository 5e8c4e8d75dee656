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


def test_sharded_bank_full_api(localizer, devices, tmp_path):  # noqa: F811
    """After shard_bank(): add_keyframes, SLAM exclude-recent queries, and
    save() all keep working (the adapter is API-complete)."""
    import jax.numpy as jnp

    from gloc3d_tpu.index.bank import DescriptorBank

    flat_bank = localizer.bank
    flat_kf = list(localizer.keyframes)
    try:
        localizer.shard_bank(make_mesh())
        n0 = len(localizer.bank)

        # add through the adapter (device-side append path)
        x, y, yaw = localizer.db_poses[0]
        pts, mask = scan_at(x + 40.0, y + 40.0, yaw)
        localizer.add_keyframes(pts[None], mask[None])
        assert len(localizer.bank) == n0 + 1
        assert len(localizer.keyframes) == n0 + 1

        # SLAM exclude-recent through the adapter: with the window covering
        # the whole bank nothing is searchable
        q = np.asarray(flat_bank.data[:1])
        d2, idx = localizer.bank.query(jnp.asarray(q), k=3,
                                       exclude_recent=True)
        if localizer.cfg.index.num_exclude_recent >= len(localizer.bank):
            assert np.isinf(d2).all()

        # save in the flat format and reload into a flat bank
        out = str(tmp_path / "sharded_db")
        localizer.save(out)
        back = DescriptorBank.load(out + "/bank.npz")
        assert len(back) == len(localizer.bank)
        np.testing.assert_allclose(
            np.asarray(back.data)[:n0], np.asarray(flat_bank.data),
            atol=1e-6,
        )
    finally:
        localizer.bank = flat_bank
        localizer.keyframes = flat_kf
