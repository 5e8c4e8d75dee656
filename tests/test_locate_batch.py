"""locate_batch must agree with per-query locate."""

import contextlib

import numpy as np

from test_pipeline import localizer, scan_at  # noqa: F401  (fixture reuse)


@contextlib.contextmanager
def staged(loc, on: bool):
    old = loc.cfg
    loc.cfg = old.replace(match=old.match.replace(staged_first=on))
    try:
        yield loc
    finally:
        loc.cfg = old


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


def test_staged_splice_mixed_success(localizer):  # noqa: F811
    """Mixed batch (some top candidates succeed, some queries fail
    entirely): the staged splice must equal the unstaged full batch, and
    stage 2 must only re-register the failed queries."""
    rng = np.random.RandomState(3)
    queries = []
    for i in (1, 4, 7):  # near-db queries: top candidate succeeds
        x, y, yaw = localizer.db_poses[i]
        queries.append(scan_at(x + 1.0, y - 0.5, yaw + 0.1))
    # garbage scans: descriptor search returns candidates, matcher fails
    for seed in (0, 1):
        pts = np.zeros_like(queries[0][0])
        pts[:2000, 0] = rng.uniform(-30, 30, 2000)
        pts[:2000, 1] = rng.uniform(-30, 30, 2000)
        pts[:2000, 2] = rng.uniform(0, 3, 2000)
        mask = np.zeros_like(queries[0][1])
        mask[:2000] = 1.0
        queries.append((pts, mask))
    pts = np.stack([q[0] for q in queries])
    masks = np.stack([q[1] for q in queries])

    with staged(localizer, True):
        res_staged = localizer.locate_batch(pts, masks)
    with staged(localizer, False):
        res_full = localizer.locate_batch(pts, masks)

    n_succ = sum(r.success for r in res_staged)
    n_fail = sum(not r.success for r in res_staged)
    assert n_succ >= 3 and n_fail >= 1, (
        f"fixture drift: want mixed batch, got {n_succ} succ / {n_fail} fail"
    )
    for rs, rf in zip(res_staged, res_full):
        assert rs.success == rf.success
        assert rs.db_index == rf.db_index
        np.testing.assert_array_equal(rs.candidates, rf.candidates)
        if rs.success:
            np.testing.assert_allclose(rs.match_xy_yaw, rf.match_xy_yaw,
                                       atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(rs.pose.translation),
                np.asarray(rf.pose.translation), atol=1e-5,
            )
            np.testing.assert_allclose(rs.match_score, rf.match_score,
                                       atol=1e-5)


def test_fast_match_presets_locate(localizer):  # noqa: F811
    """fast_match() and fast_match(fm=True) still localize near-db queries
    to the same keyframes as the exact matcher (synthetic world, easy
    offsets)."""
    queries = []
    for i in (0, 5):
        x, y, yaw = localizer.db_poses[i]
        queries.append(scan_at(x + 1.0, y - 0.5, yaw + 0.1))
    pts = np.stack([q[0] for q in queries])
    masks = np.stack([q[1] for q in queries])

    exact = localizer.locate_batch(pts, masks)
    old = localizer.cfg
    try:
        for fm in (False, True):
            localizer.cfg = old.fast_match(fm=fm)
            got = localizer.locate_batch(pts, masks)
            for re_, rg in zip(exact, got):
                assert rg.success == re_.success, f"fm={fm}"
                if re_.success:
                    assert rg.db_index == re_.db_index, f"fm={fm}"
                    np.testing.assert_allclose(
                        rg.match_xy_yaw, re_.match_xy_yaw, atol=0.5)
    finally:
        localizer.cfg = old
