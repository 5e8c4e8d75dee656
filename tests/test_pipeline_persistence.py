"""GlobalLocalizer save/load round trip including ground transforms."""

import numpy as np

from test_pipeline_ground import localizer, tilted_scan  # noqa: F401


def test_save_load_roundtrip(localizer, tmp_path):  # noqa: F811
    out = str(tmp_path / "index")
    localizer.save(out)

    import jax

    # fresh localizer shell with same model/params
    from gloc3d_tpu.pipeline import GlobalLocalizer
    from test_pipeline_ground import CFG

    loc2 = GlobalLocalizer(CFG, localizer.model, localizer.params,
                           align_ground=True)
    loc2.load(out)
    assert len(loc2.bank) == len(localizer.bank)
    assert len(loc2.keyframes) == len(localizer.keyframes)
    assert loc2.keyframes[0].ground is not None
    np.testing.assert_allclose(
        np.asarray(loc2.keyframes[0].ground.translation),
        np.asarray(localizer.keyframes[0].ground.translation),
    )

    # a query localizes identically through the restored index
    x, y, yaw = localizer.db_poses[2]
    pts, mask = tilted_scan(x + 2.0, y + 1.0, yaw + 0.2, roll=0.02,
                            pitch=0.01, seed=55)
    r1 = localizer.locate(pts, mask)
    r2 = loc2.locate(pts, mask)
    assert r1.success == r2.success
    assert r1.db_index == r2.db_index
    # z composes through stored fp32 quats; ~1e-3 round-trip noise is expected
    np.testing.assert_allclose(
        np.asarray(r1.pose.translation), np.asarray(r2.pose.translation),
        atol=2e-3,
    )
