"""Valset text-artifact export (reference write_valset_to_txt parity).

Format per dataset/kitti_i2i.py:76-122: index file with counts + scan paths +
banded per-query positives; pose file with (x,y,z,w) quaternion + translation
per scan, db first.
"""

import numpy as np

from gloc3d_tpu.data.valset import (
    banded_positives, read_valset, write_valset, _quat_xyzw_from_matrix,
)


class _Split:
    def __init__(self, n_db=5, n_q=3, seed=0):
        rng = np.random.RandomState(seed)
        self.db_files = [f"/data/db_{i:06d}.bin" for i in range(n_db)]
        self.q_files = [f"/data/q_{i:06d}.bin" for i in range(n_q)]

        def poses(n):
            out = np.tile(np.eye(4), (n, 1, 1))
            for i in range(n):
                a = rng.uniform(0, 2 * np.pi)
                c, s = np.cos(a), np.sin(a)
                out[i, :3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
                out[i, :3, 3] = rng.uniform(-50, 50, 3)
            return out

        self.db_poses = poses(n_db)
        self.q_poses = poses(n_q)
        self.utm_db = self.db_poses[:, :2, 3]
        self.utm_q = self.q_poses[:, :2, 3]


def test_quat_roundtrip():
    rng = np.random.RandomState(1)
    for _ in range(20):
        v = rng.randn(3)
        a = np.linalg.norm(v)
        k = v / a
        kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        rot = np.eye(3) + np.sin(a) * kx + (1 - np.cos(a)) * kx @ kx
        x, y, z, w = _quat_xyzw_from_matrix(rot)
        # rebuild and compare
        q = np.array([w, x, y, z])
        ww, xx, yy, zz = q
        rec = np.array([
            [1 - 2 * (yy**2 + zz**2), 2 * (xx * yy - ww * zz),
             2 * (xx * zz + ww * yy)],
            [2 * (xx * yy + ww * zz), 1 - 2 * (xx**2 + zz**2),
             2 * (yy * zz - ww * xx)],
            [2 * (xx * zz - ww * yy), 2 * (yy * zz + ww * xx),
             1 - 2 * (xx**2 + yy**2)],
        ])
        np.testing.assert_allclose(rec, rot, atol=1e-9)


def test_banded_positives_windows():
    utm_db = np.array([[0.0, 0], [4, 0], [7, 0], [12, 0], [30, 0]])
    utm_q = np.array([[0.0, 0]])
    easy, d_easy = banded_positives(utm_db, utm_q, "easy")
    med, _ = banded_positives(utm_db, utm_q, "medium")
    hard, _ = banded_positives(utm_db, utm_q, "hard")
    assert easy[0].tolist() == [0, 1] and d_easy[0].tolist() == [0.0, 4.0]
    assert med[0].tolist() == [2]
    assert hard[0].tolist() == [3]


def test_write_read_roundtrip(tmp_path):
    split = _Split()
    idx = str(tmp_path / "valset_index.txt")
    pose = str(tmp_path / "valset_pose.txt")
    write_valset(split, idx, pose, band="easy")
    db_files, q_files, positives, poses = read_valset(idx, pose)
    assert db_files == split.db_files and q_files == split.q_files
    assert len(positives) == len(split.q_files)
    want, _ = banded_positives(split.utm_db, split.utm_q, "easy")
    for got, exp in zip(positives, want):
        assert got.tolist() == exp.tolist()
    full = np.concatenate([split.db_poses, split.q_poses])
    np.testing.assert_allclose(poses, full, atol=1e-9)


def test_cli_gen_split_valset(tmp_path):
    # reuse the fake KITTI tree from test_cli via its fixture logic is module
    # scoped there; build a minimal one-sequence tree here instead.
    import os

    from gloc3d_tpu.cli import main as cli_main

    root = tmp_path / "kitti"
    rng = np.random.RandomState(0)
    for seq in ("08", "09"):
        velo = root / "sequences" / seq / "velodyne"
        velo.mkdir(parents=True)
        (root / "poses").mkdir(exist_ok=True)
        poses = []
        for i in range(4):
            scan = rng.uniform(-10, 10, (256, 4)).astype(np.float32)
            scan.tofile(str(velo / f"{i:06d}.bin"))
            t = np.eye(4)
            t[0, 3] = i * 3.0
            poses.append(t[:3].reshape(-1))
        np.savetxt(str(root / "poses" / f"{seq}.txt"), np.stack(poses))
        tr = np.eye(4)[:3].reshape(-1)
        (root / "sequences" / seq / "calib.txt").write_text(
            "Tr: " + " ".join(str(v) for v in tr) + "\n")
    out = str(tmp_path / "split.npz")
    prefix = str(tmp_path / "valset")
    rc = cli_main(["gen-split", "--root", str(root), "--which", "val",
                   "--skip-frames", "1", "--out", out,
                   "--valset-txt", prefix, "--band", "easy"])
    assert rc == 0
    assert os.path.exists(prefix + "_index.txt")
    assert os.path.exists(prefix + "_pose.txt")
    db_files, q_files, positives, poses = read_valset(
        prefix + "_index.txt", prefix + "_pose.txt")
    assert len(db_files) > 0 and len(q_files) > 0
    assert len(positives) == len(q_files)
    assert poses.shape == (len(db_files) + len(q_files), 4, 4)


def test_sampled_pairs_export(tmp_path):
    """max_pairs caps exported (q, db) pairs — the nuScenes <=100-pair
    subsample (nuscenes_s2s.py:277-334)."""
    rng = np.random.RandomState(5)
    n_db, n_q = 40, 10

    class S:
        db_files = [f"db_{i}.bin" for i in range(n_db)]
        q_files = [f"q_{i}.bin" for i in range(n_q)]
        db_poses = np.tile(np.eye(4), (n_db, 1, 1))
        q_poses = np.tile(np.eye(4), (n_q, 1, 1))
        utm_db = rng.uniform(0, 30, (n_db, 2))
        utm_q = rng.uniform(0, 30, (n_q, 2))

    split = S()
    idx_full = str(tmp_path / "full_index.txt")
    idx_cap = str(tmp_path / "cap_index.txt")
    pose = str(tmp_path / "pose.txt")
    write_valset(split, idx_full, pose, band="easy")
    full = read_valset(idx_full, pose)[2]
    total = sum(len(p) for p in full)
    assert total > 8  # fixture sanity

    cap = 8
    write_valset(split, idx_cap, pose, band="easy", max_pairs=cap, seed=1)
    sampled = read_valset(idx_cap, pose)[2]
    n_pairs = sum(len(p) for p in sampled)
    assert n_pairs == cap
    # every sampled pair exists in the full banded set
    full_set = {(qi, int(d)) for qi, p in enumerate(full) for d in p}
    # read_valset returns pair groups in file order; regenerate (q, db)
    # pairs by re-parsing the qIdx prefixes
    with open(idx_cap) as f:
        lines = [ln for ln in f][1 + n_db + n_q:]
    got = set()
    for ln in lines:
        if ":" not in ln:
            continue
        qi, rest = ln.split(":", 1)
        for tok in rest.split():
            got.add((int(qi), int(tok)))
    assert len(got) == cap and got <= full_set

    # determinism per seed
    write_valset(split, idx_cap, pose, band="easy", max_pairs=cap, seed=1)
    assert read_valset(idx_cap, pose)[2] and open(idx_cap).read()
