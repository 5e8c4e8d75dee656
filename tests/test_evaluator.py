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


def test_failure_overlay_artifact(tmp_path):
    """A hopeless query (no view overlap with any db site) must fail
    registration AND leave a reg_fail_overlay PNG showing the query warped
    by the ground-truth pose onto its top-1 candidate."""
    ds, model, params = _world()
    far = (120.0, 120.0, 0.4)  # far outside every db site's 30 m view
    pts, mk = scan_at(*far)
    ds = TripletDataset(
        db_inputs=ds.db_inputs, q_inputs=np.stack([ds.q_inputs[0], pts]),
        utm_db=ds.utm_db, utm_q=np.stack([ds.utm_q[0], far[:2]]),
        db_masks=ds.db_masks, q_masks=np.stack([ds.q_masks[0], mk]),
        db_poses=ds.db_poses,
        q_poses=np.stack([ds.q_poses[0], _pose(*far)]),
    )
    cfg = CFG.replace(index=CFG.index.replace(top_k=3))
    loc = GlobalLocalizer(cfg, model, params)
    out = str(tmp_path / "eval_fail")
    report = evaluate_split(loc, ds, out_dir=out, batch=2, n_values=(1, 3))
    assert 1 in report.failed_registration_indices
    fc = os.path.join(out, "failure_cases")
    overlays = [f for f in os.listdir(fc)
                if f.startswith("reg_fail_overlay_1_")]
    assert overlays, f"no overlay dumped; files: {os.listdir(fc)}"


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
