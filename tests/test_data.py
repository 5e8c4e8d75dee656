"""Data layer tests: decoders (incl. native loader), NCLT/nuScenes bindings."""

import os

import numpy as np
import pytest

from gloc3d_tpu.data.native import load_scan_batch, masks_from_counts
from gloc3d_tpu.data.readers import (
    interpolate_nearest, nclt_rtk_to_enu, read_kitti_bin, read_nclt_bin,
    read_nuscenes_bin,
)


def test_kitti_bin_roundtrip(tmp_path):
    pts = np.random.RandomState(0).randn(100, 4).astype(np.float32)
    p = str(tmp_path / "scan.bin")
    pts.tofile(p)
    out = read_kitti_bin(p)
    np.testing.assert_array_equal(out, pts)


def test_nuscenes_bin(tmp_path):
    pts5 = np.random.RandomState(1).randn(50, 5).astype(np.float32)
    p = str(tmp_path / "scan.bin")
    pts5.tofile(p)
    out = read_nuscenes_bin(p)
    np.testing.assert_array_equal(out, pts5[:, :4])


def test_nclt_bin(tmp_path):
    # pack a known point: x=1.0 m -> (1.0+100)/0.005 = 20200
    rec = np.zeros(8, np.uint8)
    rec[:2] = np.array([20200], "<u2").view(np.uint8)
    rec[2:4] = np.array([20000], "<u2").view(np.uint8)  # y = 0.0
    rec[4:6] = np.array([20400], "<u2").view(np.uint8)  # z = 2.0
    rec[6] = 77  # intensity
    p = str(tmp_path / "scan.bin")
    rec.tofile(p)
    out = read_nclt_bin(p)
    np.testing.assert_allclose(out[0], [1.0, 0.0, 2.0, 77.0], atol=1e-5)


def test_native_loader_matches_numpy(tmp_path):
    rng = np.random.RandomState(2)
    paths = []
    for i in range(5):
        pts = rng.randn(200 + 50 * i, 4).astype(np.float32)
        p = str(tmp_path / f"{i}.bin")
        pts.tofile(p)
        paths.append(p)
    out, counts = load_scan_batch(paths, "kitti", max_points=512)
    assert counts.tolist() == [200, 250, 300, 350, 400]
    for i, p in enumerate(paths):
        ref = read_kitti_bin(p)
        np.testing.assert_array_equal(out[i, : counts[i]], ref)
        assert (out[i, counts[i]:] == 0).all()
    masks = masks_from_counts(counts, 512)
    assert masks.sum() == counts.sum()


def test_native_loader_trims(tmp_path):
    pts = np.ones((1000, 4), np.float32)
    p = str(tmp_path / "big.bin")
    pts.tofile(p)
    out, counts = load_scan_batch([p], "kitti", max_points=128)
    assert counts[0] == 128


def test_native_library_built():
    from gloc3d_tpu.data import native

    lib = native._load_library()
    assert lib is not None, "native scan loader failed to build"


def test_nclt_split(tmp_path):
    root = tmp_path / "nclt"
    sess = "2013-04-05"
    vel = root / sess / "velodyne_sync"
    vel.mkdir(parents=True)
    rng = np.random.RandomState(3)
    n = 20
    ts0 = 1365177000000000
    for i in range(n):
        rec = rng.randint(0, 255, (64, 8)).astype(np.uint8)
        rec.tofile(str(vel / f"{ts0 + i * 100000}.bin"))
    # RTK: time, junk, sats, lat, lng, alt
    gps = np.zeros((200, 6))
    gps[:, 0] = np.linspace(ts0 - 1e6, ts0 + n * 1e5 + 1e6, 200)
    gps[:, 3] = 0.7405 + np.linspace(0, 1e-5, 200)   # lat rad
    gps[:, 4] = -1.4605 + np.linspace(0, 1e-5, 200)  # lng rad
    gps[:, 5] = 270.0
    np.savetxt(str(root / sess / f"groundtruth_{sess}.csv"), gps, delimiter=",")

    from gloc3d_tpu.data.nclt import generate_split

    split = generate_split(str(root), "val", skip_frames=2, query_fraction=0.25)
    total = len(split.db_files) + len(split.q_files)
    assert total == 10  # 20 frames, skip 2
    assert np.isfinite(split.utm_db).all()
    # ENU positions move monotonically with the linear lat ramp
    assert split.utm_db[:, 0].max() - split.utm_db[:, 0].min() < 100


def test_nuscenes_manifest_split(tmp_path):
    files = np.array([f"/data/lidar_{i}.bin" for i in range(10)])
    poses = np.tile(np.eye(4), (10, 1, 1))
    poses[:, 0, 3] = np.arange(10) * 5.0
    m = str(tmp_path / "manifest.npz")
    np.savez(m, files=files, poses=poses)

    from gloc3d_tpu.data.nuscenes import generate_split

    split = generate_split(m, query_fraction=0.3)
    assert len(split.q_files) == 3
    assert len(split.db_files) == 7
    assert split.utm_db.shape == (7, 2)


def test_native_loader_corrupt_and_missing_files(tmp_path):
    """Contract: a truncated file decodes its whole records without crashing;
    a MISSING file raises loudly (silent skips would desynchronize the
    index's keyframe<->descriptor alignment)."""
    import pytest

    from gloc3d_tpu.data.native import load_scan_batch

    good = tmp_path / "good.bin"
    np.random.RandomState(0).randn(100, 4).astype(np.float32).tofile(str(good))
    short = tmp_path / "short.bin"
    short.write_bytes(b"\x01\x02\x03" * 7)  # 21 bytes: 1 whole record + tail

    pts, counts = load_scan_batch([str(good), str(short)], "kitti",
                                  max_points=256)
    assert counts[0] == 100
    assert 0 <= counts[1] <= 1
    want = np.fromfile(str(good), np.float32).reshape(-1, 4)
    np.testing.assert_allclose(pts[0, :100], want[:100])

    with pytest.raises(Exception):
        load_scan_batch([str(tmp_path / "nope.bin")], "kitti", max_points=64)


def test_nuscenes_multisweep_aggregation(tmp_path):
    """aggregate_sweeps reproduces get_lidar_data (nuscenes_s2s.py:82-136):
    close-point filter, sensor->ref-ego transform per sweep, dt tagging,
    5-dim rows, reference-sample-first concatenation."""
    from gloc3d_tpu.data.nuscenes import aggregate_sweeps

    # sweep 0 (the reference sample): identity transform, dt 0
    s0 = np.array([
        [5.0, 0.0, 1.0, 0.7],
        [0.5, 0.5, 0.0, 0.2],   # close point: |x|<1 and |y|<1 -> dropped
        [0.0, 8.0, -1.0, 0.9],
    ], np.float32)
    # sweep 1: pure +x translation by 2 in the ref frame, dt 0.05
    s1 = np.array([
        [1.0, 2.0, 0.0, 0.4],
        [0.9, -0.5, 0.0, 0.1],  # close in SENSOR frame -> dropped pre-transform
    ], np.float32)
    paths = []
    for i, s in enumerate((s0, s1)):
        p = str(tmp_path / f"sweep{i}.bin")
        # nuScenes files are 5-float rows; writer pads a ring column
        np.concatenate([s, np.zeros((len(s), 1), np.float32)],
                       1).tofile(p)
        paths.append(p)

    tf = np.stack([np.eye(4), np.eye(4)]).astype(np.float64)
    tf[1, 0, 3] = 2.0
    pts, mask = aggregate_sweeps(
        np.array(paths), tf, np.array([0.0, 0.05]),
        np.array([True, True]), max_points=8, min_distance=1.0,
    )
    assert pts.shape == (8, 5) and mask.sum() == 3
    np.testing.assert_allclose(pts[0], [5.0, 0.0, 1.0, 0.7, 0.0], atol=1e-6)
    np.testing.assert_allclose(pts[1], [0.0, 8.0, -1.0, 0.9, 0.0], atol=1e-6)
    np.testing.assert_allclose(pts[2], [3.0, 2.0, 0.0, 0.4, 0.05], atol=1e-6)
    assert np.all(pts[3:] == 0.0)

    # invalid sweep slots are skipped; trimming keeps the newest points
    pts2, mask2 = aggregate_sweeps(
        np.array(paths), tf, np.array([0.0, 0.05]),
        np.array([True, False]), max_points=1, min_distance=1.0,
    )
    assert mask2.sum() == 1
    np.testing.assert_allclose(pts2[0], [5.0, 0.0, 1.0, 0.7, 0.0], atol=1e-6)


def test_nuscenes_manifest_sweep_fields_roundtrip(tmp_path):
    """A manifest carrying per-sample sweep chains feeds aggregate_sweeps."""
    from gloc3d_tpu.data.nuscenes import aggregate_sweeps

    n, nsweeps = 4, 3
    files = np.array([f"/data/lidar_{i}.bin" for i in range(n)])
    poses = np.tile(np.eye(4), (n, 1, 1))
    sweep_files = np.array([
        [f"/data/sw_{i}_{s}.bin" for s in range(nsweeps)] for i in range(n)
    ])
    sweep_tf = np.tile(np.eye(4), (n, nsweeps, 1, 1))
    sweep_dt = np.tile(np.arange(nsweeps) * 0.05, (n, 1))
    sweep_valid = np.ones((n, nsweeps), bool)
    m = str(tmp_path / "manifest_ms.npz")
    np.savez(m, files=files, poses=poses, sweep_files=sweep_files,
             sweep_tf=sweep_tf, sweep_dt=sweep_dt, sweep_valid=sweep_valid)

    d = np.load(m, allow_pickle=False)
    assert d["sweep_tf"].shape == (n, nsweeps, 4, 4)

    calls = []

    def fake_read(path):
        calls.append(path)
        return np.array([[3.0, 3.0, 0.0, 0.5, 0.0]], np.float32)

    pts, mask = aggregate_sweeps(
        d["sweep_files"][1], d["sweep_tf"][1], d["sweep_dt"][1],
        d["sweep_valid"][1], max_points=8, read_fn=fake_read,
    )
    assert calls == [f"/data/sw_1_{s}.bin" for s in range(nsweeps)]
    assert mask.sum() == nsweeps
    np.testing.assert_allclose(pts[:3, 4], [0.0, 0.05, 0.10], atol=1e-6)


def test_audit_sequence_overlap():
    """Bounding-box trajectory audit (kitti_s2s.py:507-563 semantics): the
    known KITTI answer is that 07 intersects 08 and nothing else does."""
    from gloc3d_tpu.data.kitti import audit_sequence_overlap

    r = np.random.RandomState(0)
    seqs = {
        # disjoint territories
        "00": r.rand(50, 2) * 100.0,
        "01": r.rand(50, 2) * 100.0 + [500.0, 0.0],
        # 07/08 share ground: 08's box starts inside 07's
        "07": r.rand(50, 2) * 100.0 + [0.0, 500.0],
        "08": r.rand(50, 2) * 100.0 + [60.0, 560.0],
    }
    assert audit_sequence_overlap(seqs) == [("07", "08")]

    # touching corners count as intersecting (closed boxes), like the
    # reference's minx > maxx strict-inequality test
    touch = {"a": np.array([[0.0, 0.0], [1.0, 1.0]]),
             "b": np.array([[1.0, 1.0], [2.0, 2.0]])}
    assert audit_sequence_overlap(touch) == [("a", "b")]

    with pytest.raises(ValueError):
        audit_sequence_overlap({"empty": np.zeros((0, 2))})
