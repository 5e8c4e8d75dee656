"""End-to-end global-localization evaluator (GlocEvaluator parity).

Drives the full pipeline over a db/query split and reports exactly what
registration/global_localization.cpp reports:
  - recognition recall@{1,5,10,20} over queries with GT positives
    (:221-268), with failed_detect_indices dumped;
  - registration success rate (err_pos < 1 m ∧ err_rot < 5°, 180° flip
    forgiven) + mean/std errors over successes (:270-335), with
    failed_registration_indices dumped;
  - stage latency aggregates (ground alignment / extraction / detection /
    match — the TicToc quantities, :433-524) measured with async-safe
    device timing.

Distance-banded variants (easy ≤5 m / medium 5-10 m / hard 10-15 m,
kitti_i2i.py:96-122 write_valset_to_txt) are reported when poses are given.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np

from gloc3d_tpu.core.transforms import Rigid3
from gloc3d_tpu.data.dataset import TripletDataset
from gloc3d_tpu.eval.recall import recall_at_n
from gloc3d_tpu.eval.registration import registration_errors, registration_stats
from gloc3d_tpu.pipeline import GlobalLocalizer


@dataclasses.dataclass
class EvalReport:
    recognition_recall: Dict[int, float]
    registration: Dict[str, float]
    banded_success: Dict[str, float]
    latency_ms: Dict[str, float]
    failed_detect_indices: List[int]
    failed_registration_indices: List[int]

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["recognition_recall"] = {str(k): v for k, v in
                                   self.recognition_recall.items()}
        return json.dumps(d, indent=2)


def _relative_pose(db_pose: np.ndarray, q_pose: np.ndarray) -> Rigid3:
    """GT query pose in the db keyframe frame: T_db⁻¹ · T_q
    (global_localization.cpp:287)."""
    import jax.numpy as jnp

    rel = np.linalg.inv(db_pose) @ q_pose
    return Rigid3.from_matrix(jnp.asarray(rel))


def evaluate_split(
    localizer: GlobalLocalizer,
    ds: TripletDataset,
    out_dir: Optional[str] = None,
    batch: int = 8,
    n_values=(1, 5, 10, 20),
) -> EvalReport:
    """Build the db from ds.db_inputs, then locate every query."""
    t = localizer.cfg.train
    nq = ds.num_q

    # ---- db build ----
    t0 = time.time()
    for i in range(0, ds.num_db, batch):
        chunk = slice(i, min(i + batch, ds.num_db))
        inputs = ds.db_inputs[chunk]
        masks = ds.db_masks[chunk] if ds.db_masks is not None else None
        origins = ds.db_origins[chunk] if ds.db_origins is not None else None
        pad = batch - inputs.shape[0]
        if pad:
            inputs = np.concatenate([inputs, np.zeros_like(inputs[:1].repeat(pad, 0))])
            if masks is not None:
                masks = np.concatenate([masks, np.zeros_like(masks[:1].repeat(pad, 0))])
            if origins is not None:
                origins = np.concatenate(
                    [origins, np.zeros_like(origins[:1].repeat(pad, 0))])
        localizer.add_keyframes(inputs, masks, origins)
        localizer.keyframes = localizer.keyframes[: min(i + batch, ds.num_db)]
    localizer.bank.truncate(ds.num_db)
    build_s = time.time() - t0

    positives = ds.eval_positives(t.pos_dist_thr)
    have_poses = ds.db_poses is not None and ds.q_poses is not None

    preds = []
    err_pos = np.full(nq, np.inf)
    err_rot = np.full(nq, np.inf)
    attempted = np.zeros(nq, bool)
    q_dists = np.full(nq, np.inf)
    failed_reg: List[int] = []
    detect_s = 0.0
    batch_times: List[float] = []

    # batched localization: one device round trip per batch instead of per
    # query (host syncs cost ~2 s each through the axon relay)
    for start in range(0, nq, batch):
        sl = slice(start, min(start + batch, nq))
        q_in = ds.q_inputs[sl]
        q_mk = ds.q_masks[sl] if ds.q_masks is not None else None
        q_or = ds.q_origins[sl] if ds.q_origins is not None else None
        pad = batch - q_in.shape[0]
        if pad:
            q_in = np.concatenate([q_in, np.repeat(q_in[-1:], pad, 0)])
            if q_mk is not None:
                q_mk = np.concatenate([q_mk, np.repeat(q_mk[-1:], pad, 0)])
            if q_or is not None:
                q_or = np.concatenate([q_or, np.repeat(q_or[-1:], pad, 0)])
        t0 = time.time()
        results = localizer.locate_batch(q_in, q_mk, q_or)
        batch_times.append(time.time() - t0)
        detect_s += batch_times[-1]
        for j, res in enumerate(results[: sl.stop - sl.start]):
            qi = start + j
            preds.append(np.asarray(res.candidates))
            if not res.success:
                failed_reg.append(qi)
                continue
            attempted[qi] = True
            if have_poses:
                gt = _relative_pose(ds.db_poses[res.db_index], ds.q_poses[qi])
                import jax.numpy as jnp

                ep, er = registration_errors(
                    Rigid3(jnp.asarray(res.pose.rotation),
                           jnp.asarray(res.pose.translation)), gt,
                )
                err_pos[qi] = float(ep)
                err_rot[qi] = float(er)
                q_dists[qi] = float(np.linalg.norm(gt.translation[:2]))

    preds_arr = np.stack(preds) if preds else np.zeros((0, 1), int)
    rec = recall_at_n(preds_arr, positives, n_values)
    hit1 = (
        np.take_along_axis(positives, preds_arr, axis=1).any(axis=1)
        if nq else np.zeros(0, bool)
    )
    failed_detect = [i for i in range(nq)
                     if positives[i].any() and not hit1[i]]

    stats = registration_stats(err_pos, err_rot, attempted)
    banded = {}
    if have_poses:
        bands = {"easy": (0.0, 5.0), "medium": (5.0, 10.0), "hard": (10.0, 15.0)}
        ok = attempted & (err_pos < 1.0) & (err_rot < 5.0)
        for name, (lo, hi) in bands.items():
            in_band = (q_dists >= lo) & (q_dists < hi) & np.isfinite(q_dists)
            banded[name] = (
                float((ok & in_band).sum()) / max(int(in_band.sum()), 1)
            )

    report = EvalReport(
        recognition_recall=rec,
        registration={
            "success_rate": stats.success_rate,
            "mean_rot_err_deg": stats.mean_rot_err,
            "std_rot_err_deg": stats.std_rot_err,
            "mean_pos_err_m": stats.mean_pos_err,
            "std_pos_err_m": stats.std_pos_err,
            "num_success": stats.num_success,
            "num_total": stats.num_total,
        },
        banded_success=banded,
        latency_ms={
            "db_build_per_scan": build_s / max(ds.num_db, 1) * 1000,
            "locate_per_query": detect_s / max(nq, 1) * 1000,
            # tail latency over locate_batch calls, per-query normalized
            # (beyond-reference: global_localization.cpp:521-524 reports
            # only the average match time). The first batch carries the
            # detect/match jit compiles — excluded so the tail reflects
            # serving, not compilation (kept in the average above, which
            # times the whole eval like the reference does).
            "locate_per_query_p50": (
                float(np.percentile(batch_times[1:] or batch_times, 50))
                / batch * 1000 if batch_times else 0.0),
            "locate_per_query_p95": (
                float(np.percentile(batch_times[1:] or batch_times, 95))
                / batch * 1000 if batch_times else 0.0),
        },
        failed_detect_indices=failed_detect,
        failed_registration_indices=failed_reg,
    )
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "eval_report.json"), "w") as f:
            f.write(report.to_json())
        # failure-case dumps (main.py:200-273 failure_case parity): for each
        # false-negative query, save its BEV next to its top prediction and
        # one GT positive for visual debugging.
        fc_dir = os.path.join(out_dir, "failure_cases")
        os.makedirs(fc_dir, exist_ok=True)
        # host_mirror=False keyframes carry no host-side image to dump
        dump_failures = (failed_detect
                         and localizer.keyframes[0].image is not None)
        for qi in failed_detect[:50] if dump_failures else []:
            q_in = ds.q_inputs[qi]
            q_mk = ds.q_masks[qi] if ds.q_masks is not None else None
            q_or = ds.q_origins[qi] if ds.q_origins is not None else None
            _, _, bev, _ = localizer.detect(
                q_in[None], q_mk[None] if q_mk is not None else None,
                q_or[None] if q_or is not None else None)
            top1 = int(preds_arr[qi, 0])
            gt_idx = int(np.nonzero(positives[qi])[0][0])
            np.savez(
                os.path.join(fc_dir, f"query_{qi}.npz"),
                query=np.asarray(bev.image[0] * 255).astype(np.uint8),
                top_prediction=localizer.keyframes[top1].image,
                gt_positive=localizer.keyframes[gt_idx].image,
                top_prediction_idx=top1, gt_idx=gt_idx,
            )
        # registration-failure overlays (i2i_util.py:540-620 /
        # loop_detector.cpp:224-232 equivalent): the query BEV warped by the
        # GROUND-TRUTH relative pose onto its top-1 candidate — shows what
        # the correct registration would have looked like (usually: how
        # little the two views actually overlap) when the match gate fires
        # a failure.
        dump_reg = (failed_reg and have_poses and localizer.keyframes
                    and localizer.keyframes[0].image is not None)
        for qi in failed_reg[:20] if dump_reg else []:
            from gloc3d_tpu.core.transforms import get_yaw
            from gloc3d_tpu.data.viz import match_overlay, save_png

            q_in = ds.q_inputs[qi]
            q_mk = ds.q_masks[qi] if ds.q_masks is not None else None
            q_or = ds.q_origins[qi] if ds.q_origins is not None else None
            _, _, bev, _ = localizer.detect(
                q_in[None], q_mk[None] if q_mk is not None else None,
                q_or[None] if q_or is not None else None)
            top1 = int(np.clip(preds_arr[qi, 0], 0,
                               len(localizer.keyframes) - 1))
            kf = localizer.keyframes[top1]
            gt = _relative_pose(ds.db_poses[top1], ds.q_poses[qi])
            xy_yaw = np.array([
                float(gt.translation[0]), float(gt.translation[1]),
                float(get_yaw(gt.rotation)),
            ])
            ov = match_overlay(
                np.asarray(bev.image[0]), np.asarray(bev.origin_xy[0]),
                kf.image, np.asarray(kf.origin_xy), xy_yaw,
                float(np.asarray(bev.resolution)))
            save_png(os.path.join(
                fc_dir, f"reg_fail_overlay_{qi}_vs_{top1}.png"), ov)
        # reference-format failure dumps (global_localization.cpp:258-267)
        with open(os.path.join(out_dir, "failed_detect_indices.txt"), "w") as f:
            f.write(" ".join(str(i) for i in failed_detect) + "\n")
        with open(os.path.join(out_dir,
                               "failed_registration_indices.txt"), "w") as f:
            f.write(" ".join(str(i) for i in failed_reg) + "\n")
    return report
