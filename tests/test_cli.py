"""CLI integration test on a synthetic on-disk KITTI odometry tree."""

import json
import os

import numpy as np
import pytest

from gloc3d_tpu.cli import main as cli_main
from gloc3d_tpu.config import (
    BEVConfig, IndexConfig, MatchConfig, ModelConfig, PipelineConfig, VoxelConfig,
)

N_PTS = 2048


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    """Fake KITTI odometry layout: sequences/{00,08}/velodyne + poses."""
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.RandomState(0)
    # structured world (wall segments) so BEV columns stack >=2 voxels
    walls = []
    for _ in range(60):
        x0, y0 = rng.uniform(-60, 60, 2)
        ang = rng.uniform(0, np.pi)
        ts = rng.uniform(0, rng.uniform(4, 10), 130)
        xs = x0 + np.cos(ang) * ts
        ys = y0 + np.sin(ang) * ts
        zs = rng.uniform(0, 2.5, 130)
        walls.append(np.stack([xs, ys, zs], 1))
    world = np.concatenate(walls).astype(np.float32)
    for seq in ("00", "08", "09"):
        velo = root / "sequences" / seq / "velodyne"
        velo.mkdir(parents=True)
        (root / "poses").mkdir(exist_ok=True)
        poses = []
        for i in range(6):
            x = i * 10.0
            keep = np.abs(world[:, 0] - x) < 30
            pts = world[keep].copy()
            pts[:, 0] -= x
            scan = np.concatenate(
                [pts, rng.uniform(0, 1, (len(pts), 1)).astype(np.float32)], 1
            ).astype(np.float32)
            scan.tofile(str(velo / f"{i:06d}.bin"))
            t = np.eye(4)
            t[0, 3] = x
            poses.append(t[:3].reshape(-1))
        np.savetxt(str(root / "poses" / f"{seq}.txt"), np.stack(poses))
        calib = root / "sequences" / seq / "calib.txt"
        tr = np.eye(4)[:3].reshape(-1)
        calib.write_text("Tr: " + " ".join(str(v) for v in tr) + "\n")
    return str(root)


@pytest.fixture(scope="module")
def small_config(tmp_path_factory):
    cfg = PipelineConfig(
        bev=BEVConfig(image_size=128, max_points=N_PTS),
        voxel=VoxelConfig(max_points=N_PTS),
        model=ModelConfig(encoder="pointpillar", encoder_dim=128,
                          compute_dtype="float32"),
        index=IndexConfig(dim=128, top_k=3, capacity=16),
        match=MatchConfig(image_size=128, min_score=0.1, min_overlap_pixels=16),
    )
    p = tmp_path_factory.mktemp("cfg") / "config.json"
    p.write_text(cfg.to_json())
    return str(p)


def test_gen_split(kitti_root, tmp_path):
    out = str(tmp_path / "split.npz")
    rc = cli_main(["gen-split", "--root", kitti_root, "--which", "val",
                   "--skip-frames", "1", "--out", out])
    assert rc == 0
    from gloc3d_tpu.data.kitti import SplitIndex

    s = SplitIndex.load(out)
    assert len(s.db_files) + len(s.q_files) == 12  # val = seqs 08 + 09
    assert s.db_poses.shape[1:] == (4, 4)


def test_preprocess_and_stats(kitti_root, small_config, tmp_path, capsys):
    scans = os.path.join(kitti_root, "sequences", "00", "velodyne")
    out = str(tmp_path / "prob_img")
    rc = cli_main(["preprocess", "--scans", scans, "--out", out,
                   "--config", small_config, "--batch", "4"])
    assert rc == 0
    files = [f for f in os.listdir(out) if f.endswith(".npz")]
    assert len(files) == 6
    d = np.load(os.path.join(out, files[0]))
    assert d["image"].shape == (128, 128)
    assert d["image"].dtype == np.uint8

    rc = cli_main(["stats", "--images", out])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.5 < stats["mean"] <= 1.0  # mostly free space


def test_match_submap_cli(kitti_root, small_config, tmp_path, capsys):
    """`gloc match-submap` recovers the known inter-scan offset: scan i sits
    at world x = 10·i, so placing scan 0 in scan 1's grid is (−10, 0, 0)."""
    scans = os.path.join(kitti_root, "sequences", "00", "velodyne")
    out = str(tmp_path / "prob_img")
    rc = cli_main(["preprocess", "--scans", scans, "--out", out,
                   "--config", small_config, "--batch", "4"])
    assert rc == 0
    capsys.readouterr()
    rc = cli_main(["match-submap",
                   "--grid", os.path.join(out, "000001.npz"),
                   "--scan", os.path.join(out, "000000.npz"),
                   "--config", small_config,
                   "--rotations", "64", "--budget", "1024"])
    assert rc == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    x, y, yaw = r["pose_xy_yaw"]
    assert abs(x - (-10.0)) < 0.5 and abs(y) < 0.5, r
    assert abs(yaw) < 2 * (2 * np.pi / 64), r
    assert r["score"] > 0.3
    assert isinstance(r["certified"], bool)
    # raw-scan query path exercises scan→BEV→virtual-points inside the CLI
    raw = os.path.join(scans, "000000.bin")
    rc = cli_main(["match-submap", "--grid", os.path.join(out, "000001.npz"),
                   "--scan", raw, "--config", small_config,
                   "--rotations", "64", "--budget", "1024"])
    assert rc == 0
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(r2["pose_xy_yaw"][0] - (-10.0)) < 0.5, r2


def test_build_index_and_query(kitti_root, small_config, tmp_path, capsys):
    split_p = str(tmp_path / "split.npz")
    cli_main(["gen-split", "--root", kitti_root, "--which", "val",
              "--skip-frames", "1", "--query-fraction", "0.34",
              "--out", split_p])
    idx_dir = str(tmp_path / "index")
    rc = cli_main(["build-index", "--split", split_p, "--out", idx_dir,
                   "--config", small_config, "--batch", "4"])
    assert rc == 0
    assert os.path.exists(os.path.join(idx_dir, "bank.npz"))
    assert os.path.exists(os.path.join(idx_dir, "keyframes.npz"))

    from gloc3d_tpu.data.kitti import SplitIndex

    split = SplitIndex.load(split_p)
    rc = cli_main(["query", "--index", idx_dir, "--scan", split.db_files[0],
                   "--config", small_config])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # querying a db scan itself: must succeed and match itself at db_index 0
    assert res["success"] is True
    assert res["db_index"] == 0


def test_query_from_export_and_dump_match(kitti_root, small_config, tmp_path,
                                          capsys):
    """The serving hand-off: export the model to a StableHLO blob, then
    locate a query THROUGH the blob (no model build) and dump the
    registration overlay artifact."""
    split_p = str(tmp_path / "split.npz")
    cli_main(["gen-split", "--root", kitti_root, "--which", "val",
              "--skip-frames", "1", "--query-fraction", "0.34",
              "--out", split_p])
    idx_dir = str(tmp_path / "index")
    cli_main(["build-index", "--split", split_p, "--out", idx_dir,
              "--config", small_config, "--batch", "4"])
    blob_p = str(tmp_path / "model.hlo")
    rc = cli_main(["export", "--out", blob_p, "--config", small_config])
    assert rc == 0
    capsys.readouterr()

    from gloc3d_tpu.data.kitti import SplitIndex

    split = SplitIndex.load(split_p)
    png = str(tmp_path / "match.png")
    rc = cli_main(["query", "--index", idx_dir, "--scan", split.db_files[0],
                   "--config", small_config, "--from-export", blob_p,
                   "--dump-match", png])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # export + build-index both init from PRNGKey(0): identical params, so
    # the blob-served query must reproduce the model-served result exactly
    assert res["success"] is True
    assert res["db_index"] == 0
    assert os.path.exists(png)
    # the overlay of a self-match is a real image with agreement pixels
    try:
        import matplotlib.pyplot as plt

        img = plt.imread(png)
        assert img.shape[:2] == (128, 128)
    except ImportError:
        pass


def test_preprocess_nclt_format(tmp_path, small_config):
    """The --fmt nclt dispatch: packed uint16 scans through the same kernel."""
    scans = tmp_path / "nclt_scans"
    scans.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        # pack points near the sensor: value = (x + 100) / 0.005
        n = 1500
        xyz = rng.uniform(-20, 20, (n, 3))
        xyz[:, 2] = rng.uniform(0, 3, n)
        rec = np.zeros((n, 8), np.uint8)
        u16 = ((xyz + 100.0) / 0.005).astype("<u2")
        rec[:, :6] = u16.view(np.uint8).reshape(n, 6)
        rec[:, 6] = rng.randint(0, 255, n)
        rec.tofile(str(scans / f"{i:06d}.bin"))
    out = str(tmp_path / "imgs")
    rc = cli_main(["preprocess", "--scans", str(scans), "--out", out,
                   "--config", small_config, "--fmt", "nclt", "--batch", "2"])
    assert rc == 0
    files = sorted(f for f in os.listdir(out) if f.endswith(".npz"))
    assert len(files) == 2
    img = np.load(os.path.join(out, files[0]))["image"]
    assert (img == 0).sum() > 0  # some occupied pixels decoded


def test_cluster_then_train_with_init(kitti_root, small_config, tmp_path,
                                      capsys):
    """cluster -> train --init-centroids round trip (--mode=cluster parity)."""
    split_p = str(tmp_path / "split.npz")
    cli_main(["gen-split", "--root", kitti_root, "--which", "val",
              "--skip-frames", "1", "--query-fraction", "0.34",
              "--out", split_p])
    train_cfg = json.loads(open(small_config).read())
    train_cfg["voxel"].update({"xbound": [-10.0, 10.0, 0.5],
                               "ybound": [-6.0, 6.0, 0.5]})
    cfg_small_grid = str(tmp_path / "smallgrid.json")
    open(cfg_small_grid, "w").write(json.dumps(train_cfg))
    cents_p = str(tmp_path / "centroids.npz")
    rc = cli_main(["cluster", "--split", split_p, "--out", cents_p,
                   "--config", cfg_small_grid, "--num-images", "8",
                   "--per-image", "40"])
    assert rc == 0
    cc = np.load(cents_p)
    assert cc["centroids"].shape == (64, 128)

    wd = str(tmp_path / "run")
    train_cfg["train"].update(
        {"batch_size": 2, "n_neg": 2, "n_neg_sample": 8, "epochs": 1,
         "cache_refresh_rate": 4}
    )
    cfg_p = str(tmp_path / "traincfg.json")
    open(cfg_p, "w").write(json.dumps(train_cfg))
    rc = cli_main(["train", "--split", split_p, "--workdir", wd,
                   "--config", cfg_p, "--init-centroids", cents_p])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "best_recall5" in out
    assert os.path.exists(os.path.join(wd, "ckpt_latest"))


def test_eval_registration_mode(kitti_root, small_config, tmp_path, capsys):
    """gloc eval --registration: the global_localization-binary flow."""
    split_p = str(tmp_path / "split.npz")
    cli_main(["gen-split", "--root", kitti_root, "--which", "val",
              "--skip-frames", "1", "--query-fraction", "0.34",
              "--out", split_p])
    capsys.readouterr()  # drop gen-split output
    wd = str(tmp_path / "evalout")
    rc = cli_main(["eval", "--split", split_p, "--config", small_config,
                   "--registration", "--workdir", wd, "--batch", "4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert "recognition_recall" in rep and "registration" in rep
    assert rep["registration"]["num_total"] == 4
    assert os.path.exists(os.path.join(wd, "eval_report.json"))
    assert os.path.exists(os.path.join(wd, "failed_detect_indices.txt"))


def test_eval_registration_i2i(kitti_root, tmp_path, capsys):
    """gloc eval --registration on the i2i (vgg16, image-input) path: BEV
    prob images from `preprocess` feed the detector directly
    (loop_detector.cpp:137-172)."""
    cfg = PipelineConfig(
        bev=BEVConfig(image_size=128, max_points=N_PTS),
        voxel=VoxelConfig(max_points=N_PTS),
        model=ModelConfig(encoder="vgg16", encoder_dim=512,
                          compute_dtype="float32"),
        index=IndexConfig(dim=512, top_k=3, capacity=16),
        match=MatchConfig(image_size=128, min_score=0.1,
                          min_overlap_pixels=16),
    )
    cfg_p = str(tmp_path / "i2i.json")
    open(cfg_p, "w").write(cfg.to_json())
    img_dir = str(tmp_path / "prob_img")
    for seq in ("08", "09"):
        scans = os.path.join(kitti_root, "sequences", seq, "velodyne")
        rc = cli_main(["preprocess", "--scans", scans, "--out", img_dir,
                       "--config", cfg_p, "--batch", "4"])
        assert rc == 0
    split_p = str(tmp_path / "split.npz")
    cli_main(["gen-split", "--root", kitti_root, "--which", "val",
              "--skip-frames", "1", "--query-fraction", "0.34",
              "--out", split_p])
    capsys.readouterr()
    wd = str(tmp_path / "evalout_i2i")
    rc = cli_main(["eval", "--split", split_p, "--config", cfg_p,
                   "--images", img_dir, "--registration",
                   "--workdir", wd, "--batch", "4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert "recognition_recall" in rep and "registration" in rep
    assert rep["registration"]["num_total"] == 4
    assert os.path.exists(os.path.join(wd, "eval_report.json"))


def test_build_index_dp_devices(kitti_root, small_config, tmp_path, capsys):
    """Data-parallel extraction build (--dp-devices) on the CPU mesh."""
    import jax
    import pytest

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    split = str(tmp_path / "split.npz")
    cli_main(["gen-split", "--root", kitti_root, "--which", "val",
              "--skip-frames", "1", "--out", split])
    out = str(tmp_path / "index_dp")
    rc = cli_main(["build-index", "--config", small_config, "--split", split,
                   "--out", out, "--batch", "8", "--dp-devices", "8"])
    assert rc == 0
    import os
    assert os.path.exists(out)


def test_encoder_flag_selects_backbone():
    """--encoder maps to the right ModelConfig/IndexConfig (main.py --arch)."""
    import argparse

    from gloc3d_tpu.cli import _load_cfg

    for enc, dim in (("alexnet", 256), ("mobilenet", 320),
                     ("resnet18", 512), ("vgg16", 512)):
        ns = argparse.Namespace(config=None, i2i=False, encoder=enc)
        cfg = _load_cfg(ns)
        assert cfg.model.encoder == enc
        assert cfg.model.encoder_dim == dim and cfg.index.dim == dim
    ns = argparse.Namespace(config=None, i2i=True, encoder=None)
    assert _load_cfg(ns).model.encoder == "vgg16"
    ns = argparse.Namespace(config=None, i2i=False, encoder="pointpillar")
    assert _load_cfg(ns).model.encoder == "pointpillar"
    ns = argparse.Namespace(config=None, i2i=False, encoder=None)
    assert _load_cfg(ns).model.encoder == "pointpillar"


def test_fast_match_flag_applies_preset():
    """--fast-match {preset,fm} applies the serving matcher preset."""
    import argparse

    from gloc3d_tpu.cli import _load_cfg

    base = dict(config=None, i2i=False, encoder=None)
    ns = argparse.Namespace(**base, fast_match=None)
    m = _load_cfg(ns).match
    assert m.fine_downsample == 1 and m.coarse_mode == "stack"  # exact default
    ns = argparse.Namespace(**base, fast_match="preset")
    m = _load_cfg(ns).match
    assert (m.fine_downsample, m.coarse_rot_downsample, m.fine_top_f,
            m.fine_argmax_downsample, m.coarse_mode) == (2, 8, 4, 2, "stack")
    ns = argparse.Namespace(**base, fast_match="fm")
    assert _load_cfg(ns).match.coarse_mode == "fm"


def test_build_index_no_host_mirror(kitti_root, small_config, tmp_path,
                                    capsys):
    """--no-host-mirror (map-scale ingest): index builds with HBM-only
    keyframes; the written artifact is loadable and query succeeds."""
    split_p = str(tmp_path / "split.npz")
    cli_main(["gen-split", "--root", kitti_root, "--which", "val",
              "--skip-frames", "1", "--query-fraction", "0.34",
              "--out", split_p])
    idx_dir = str(tmp_path / "index_nm")
    rc = cli_main(["build-index", "--split", split_p, "--out", idx_dir,
                   "--config", small_config, "--batch", "4",
                   "--no-host-mirror", "--host-stats"])
    assert rc == 0
    assert os.path.exists(os.path.join(idx_dir, "keyframes.npz"))

    from gloc3d_tpu.data.kitti import SplitIndex

    split = SplitIndex.load(split_p)
    rc = cli_main(["query", "--index", idx_dir, "--scan", split.db_files[0],
                   "--config", small_config, "--device-keyframes"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["success"] is True
    assert res["db_index"] == 0


def test_serve_streams_results(kitti_root, small_config, tmp_path, capsys,
                               monkeypatch):
    """gloc serve: index loads once, scan paths stream on stdin, one JSON
    result per line on stdout (the long-running production driver)."""
    import io

    split_p = str(tmp_path / "split.npz")
    cli_main(["gen-split", "--root", kitti_root, "--which", "val",
              "--skip-frames", "1", "--query-fraction", "0.34",
              "--out", split_p])
    idx_dir = str(tmp_path / "index_srv")
    rc = cli_main(["build-index", "--split", split_p, "--out", idx_dir,
                   "--config", small_config, "--batch", "4"])
    assert rc == 0
    capsys.readouterr()

    from gloc3d_tpu.data.kitti import SplitIndex

    split = SplitIndex.load(split_p)
    monkeypatch.setattr(
        "sys.stdin",
        io.StringIO(f"{split.db_files[1]}\n\n/nonexistent/scan.bin\n"))
    rc = cli_main(["serve", "--index", idx_dir, "--config", small_config,
                   "--device-keyframes"])
    assert rc == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["ready"] is True and lines[0]["fused"] is True
    # the fixture world's scans overlap heavily (10 m spacing, 30 m view),
    # so any overlapping keyframe is a legitimate localization — require
    # success with a registered pose, not a specific index
    assert lines[1]["success"] is True
    assert lines[1]["db_index"] in lines[1]["candidates"]
    assert "translation" in lines[1]
    assert lines[1]["scan"] == split.db_files[1]
    assert lines[2]["success"] is False and "error" in lines[2]


def test_serve_i2i_image_stream(kitti_root, tmp_path, capsys, monkeypatch):
    """gloc serve with an i2i index consumes BEV prob-image files (npz or
    reference JPEGs) per line, through the fused image path."""
    import io

    cfg = PipelineConfig(
        bev=BEVConfig(image_size=128, max_points=N_PTS),
        voxel=VoxelConfig(max_points=N_PTS),
        model=ModelConfig(encoder="vgg16", encoder_dim=512,
                          compute_dtype="float32"),
        index=IndexConfig(dim=512, top_k=3, capacity=16),
        match=MatchConfig(image_size=128, min_score=0.1,
                          min_overlap_pixels=16),
    )
    cfg_p = str(tmp_path / "i2i_config.json")
    with open(cfg_p, "w") as f:
        f.write(cfg.to_json())

    split_p = str(tmp_path / "split.npz")
    cli_main(["gen-split", "--root", kitti_root, "--which", "val",
              "--skip-frames", "1", "--query-fraction", "0.34",
              "--out", split_p])
    idx_dir = str(tmp_path / "index_i2i")
    rc = cli_main(["build-index", "--split", split_p, "--out", idx_dir,
                   "--config", cfg_p, "--batch", "4"])
    assert rc == 0

    # preprocess one db scan to the npz prob-image format
    from gloc3d_tpu.data.kitti import SplitIndex

    split = SplitIndex.load(split_p)
    img_dir = str(tmp_path / "imgs")
    scan_dir = str(tmp_path / "one_scan")
    os.makedirs(scan_dir)
    import shutil

    shutil.copy(split.db_files[0], scan_dir)
    rc = cli_main(["preprocess", "--scans", scan_dir, "--out", img_dir,
                   "--config", cfg_p])
    assert rc == 0
    img_file = [os.path.join(img_dir, f) for f in sorted(os.listdir(img_dir))
                if f.endswith(".npz")][0]
    capsys.readouterr()

    monkeypatch.setattr("sys.stdin", io.StringIO(img_file + "\n"))
    rc = cli_main(["serve", "--index", idx_dir, "--config", cfg_p,
                   "--device-keyframes"])
    assert rc == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["i2i"] is True and lines[0]["fused"] is True
    assert lines[1]["success"] is True
    assert lines[1]["db_index"] in lines[1]["candidates"]
