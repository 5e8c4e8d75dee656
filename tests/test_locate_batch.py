"""locate_batch must agree with per-query locate."""

import numpy as np

from test_pipeline import localizer, scan_at  # noqa: F401  (fixture reuse)


def test_locate_batch_matches_single(localizer):  # noqa: F811
    queries = []
    for i in (2, 6, 8):
        x, y, yaw = localizer.db_poses[i]
        queries.append(scan_at(x + 1.5, y - 1.0, yaw + 0.2))
    pts = np.stack([q[0] for q in queries])
    masks = np.stack([q[1] for q in queries])

    batch = localizer.locate_batch(pts, masks)
    singles = [localizer.locate(pts[i], masks[i]) for i in range(3)]

    for rb, rs in zip(batch, singles):
        assert rb.success == rs.success
        if rs.success:
            assert rb.db_index == rs.db_index
            np.testing.assert_allclose(rb.match_xy_yaw, rs.match_xy_yaw,
                                       atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(rb.pose.translation),
                np.asarray(rs.pose.translation), atol=1e-4,
            )
