"""Visual-debugging utility tests."""

import os

import numpy as np

from gloc3d_tpu.data.viz import match_overlay, plot_split_trajectory


def test_plot_split_trajectory(tmp_path):
    p = str(tmp_path / "traj.png")
    ok = plot_split_trajectory(
        np.random.RandomState(0).randn(50, 2) * 100,
        np.random.RandomState(1).randn(10, 2) * 100, p,
    )
    assert ok and os.path.exists(p) and os.path.getsize(p) > 1000


def test_match_overlay_alignment():
    """A perfectly-registered pair renders overlapping pixels yellow."""
    s, res = 64, 0.5
    db = np.ones((s, s), np.float32)
    db[30, 20:40] = 0.0  # a wall in the db frame
    origin = np.array([-16.0, -16.0], np.float32)
    # query = same wall, shifted by (2, 1) meters in the world; the match
    # transform maps query->db exactly
    q = np.ones((s, s), np.float32)
    q[30 - 2, 16:36] = 0.0  # wall seen 4 cells left, 2 rows down in q frame
    q_origin = origin.copy()
    xy_yaw = np.array([4 * res, 2 * res, 0.0])  # +4 cols, +2 rows
    img = match_overlay(q, q_origin, db, origin, xy_yaw, res)
    yellow = (img == (230, 210, 60)).all(-1)
    assert yellow.sum() == 20  # the whole wall overlaps
    green = (img == (80, 200, 80)).all(-1)
    assert green.sum() == 0
