"""End-to-end evaluator test on the synthetic world (full GlocEvaluator flow)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.data.dataset import TripletDataset
from gloc3d_tpu.eval.evaluator import evaluate_split
from gloc3d_tpu.models import build_model
from gloc3d_tpu.pipeline import GlobalLocalizer
from test_pipeline import CFG, scan_at


def _pose(x, y, yaw):
    t = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    t[:2, :2] = [[c, -s], [s, c]]
    t[0, 3], t[1, 3] = x, y
    return t


def _world():
    db_poses = [(x, y, np.deg2rad(th)) for x, y, th in [
        (-30, -30, 0), (0, -30, 20), (30, -30, -10), (30, 30, 170),
        (0, 30, 180), (-30, 30, 200),
    ]]
    q_offsets = [(2.0, -1.0, 0.2), (-1.5, 2.0, -0.3), (8.0, 1.0, 0.1)]
    q_poses = [
        (db_poses[i][0] + dx, db_poses[i][1] + dy, db_poses[i][2] + dyaw)
        for i, (dx, dy, dyaw) in zip((0, 2, 4), q_offsets)
    ]
    db = [scan_at(*p) for p in db_poses]
    q = [scan_at(*p) for p in q_poses]
    ds = TripletDataset(
        db_inputs=np.stack([s[0] for s in db]),
        q_inputs=np.stack([s[0] for s in q]),
        utm_db=np.array([(p[0], p[1]) for p in db_poses]),
        utm_q=np.array([(p[0], p[1]) for p in q_poses]),
        db_masks=np.stack([s[1] for s in db]),
        q_masks=np.stack([s[1] for s in q]),
        db_poses=np.stack([_pose(*p) for p in db_poses]),
        q_poses=np.stack([_pose(*p) for p in q_poses]),
    )

    model = build_model(CFG.model, CFG.voxel)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(ds.db_inputs[:1]), jnp.asarray(ds.db_masks[:1]),
    )
    return ds, model, params


def test_evaluate_split(tmp_path):
    ds, model, params = _world()
    cfg = CFG.replace(index=CFG.index.replace(top_k=3))
    loc = GlobalLocalizer(cfg, model, params)
    out = str(tmp_path / "eval")
    report = evaluate_split(loc, ds, out_dir=out, batch=3, n_values=(1, 3))

    # all queries are close to distinctive sites: registration should succeed
    assert report.registration["num_total"] == 3
    assert report.registration["success_rate"] >= 2 / 3
    assert report.registration["mean_pos_err_m"] < 1.0
    assert report.recognition_recall[3] >= 2 / 3
    # banded stats exist (all queries are in the easy/medium bands)
    assert set(report.banded_success) == {"easy", "medium", "hard"}
    # artifacts written
    assert os.path.exists(os.path.join(out, "eval_report.json"))
    parsed = json.loads(open(os.path.join(out, "eval_report.json")).read())
    assert "recognition_recall" in parsed
    assert os.path.exists(os.path.join(out, "failed_detect_indices.txt"))
    assert report.latency_ms["locate_per_query"] > 0


def test_evaluate_split_fast_match_preset(tmp_path):
    """The serving-matcher preset (fm coarse + two-stage fine + pruning)
    must hold the evaluator's registration success on the synthetic world —
    the preset is a latency lever, not an accuracy trade."""
    ds, model, params = _world()
    cfg = CFG.replace(index=CFG.index.replace(top_k=3)).fast_match(fm=True)
    loc = GlobalLocalizer(cfg, model, params)
    out = str(tmp_path / "eval_fm")
    report = evaluate_split(loc, ds, out_dir=out, batch=3, n_values=(1, 3))
    assert report.registration["num_total"] == 3
    assert report.registration["success_rate"] >= 2 / 3
    assert report.registration["mean_pos_err_m"] < 1.0
    assert report.recognition_recall[3] >= 2 / 3
