"""gloc — the framework CLI.

One typed-config command covering every mode of the reference's three
entry points: main.py (train/test/cluster/save_pt), the save_probability_img
preprocessing binary, and the global_localization evaluator.

  python -m gloc3d_tpu.cli preprocess --scans DIR --out DIR [--fmt kitti]
  python -m gloc3d_tpu.cli build-index --split SPLIT.npz --out BANK.npz
  python -m gloc3d_tpu.cli query --bank BANK.npz --scan FILE.bin
  python -m gloc3d_tpu.cli cluster|train|eval --split SPLIT.npz --workdir DIR
  python -m gloc3d_tpu.cli gen-split --root KITTI_ROOT --which train|val
  python -m gloc3d_tpu.cli stats --images DIR        (dataset mean/std)

All subcommands accept --config CONFIG.json (a PipelineConfig dump) and
persist the effective config next to their outputs (the flags.json
round-trip, main.py:431-450).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _load_cfg(args):
    from gloc3d_tpu.config import PipelineConfig

    # index-consuming commands (query/serve) default to the config the
    # index was BUILT with (save() persists it) — serving a bank with a
    # mismatched model/config returns silently wrong candidates.
    idx_cfg = (os.path.join(args.index, "config.json")
               if getattr(args, "index", None) else None)
    if getattr(args, "config", None):
        with open(args.config) as f:
            cfg = PipelineConfig.from_json(f.read())
    elif idx_cfg and os.path.exists(idx_cfg):
        with open(idx_cfg) as f:
            cfg = PipelineConfig.from_json(f.read())
    elif getattr(args, "i2i", False) or getattr(args, "encoder", None) not in (
            None, "pointpillar"):
        # --encoder picks the image backbone (main.py --arch, :519-564);
        # plain --i2i defaults to the published vgg16 configuration.
        cfg = PipelineConfig.i2i(getattr(args, "encoder", None) or "vgg16")
    else:
        cfg = PipelineConfig.s2s()
    if getattr(args, "quantize", None) not in (None, "none"):
        cfg = cfg.replace(index=cfg.index.replace(quantize=args.quantize))
    if getattr(args, "backend", None) not in (None, "flat"):
        cfg = cfg.replace(index=cfg.index.replace(backend=args.backend))
    if getattr(args, "optim", None):
        cfg = cfg.replace(train=cfg.train.replace(optimizer=args.optim))
    if getattr(args, "fast_match", None):
        # serving-matcher preset (RESULTS.md round 3): 'fm' adds the
        # Fourier-Mellin coarse estimator on top of the fine/prune levers
        cfg = cfg.fast_match(fm=args.fast_match == "fm")
    return cfg


def _save_cfg(cfg, outdir):
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "config.json"), "w") as f:
        f.write(cfg.to_json())


def _scan_files(d, exts=(".bin",)):
    return sorted(
        os.path.join(d, f) for f in os.listdir(d)
        if any(f.endswith(e) for e in exts)
    )


def cmd_preprocess(args):
    """Scans → BEV probability images (save_probability_img.cpp equivalent),
    batched through the fused TPU kernel."""
    import jax
    import jax.numpy as jnp

    from gloc3d_tpu.data.native import load_scan_batch, masks_from_counts
    from gloc3d_tpu.ops.bev import batch_scan_to_bev

    cfg = _load_cfg(args)
    files = _scan_files(args.scans)
    os.makedirs(args.out, exist_ok=True)
    _save_cfg(cfg, args.out)
    bev_fn = jax.jit(lambda p, m: batch_scan_to_bev(p, m, cfg.bev))
    b = args.batch
    for i in range(0, len(files), b):
        chunk = files[i : i + b]
        pts, counts = load_scan_batch(chunk, args.fmt, cfg.bev.max_points)
        masks = masks_from_counts(counts, cfg.bev.max_points)
        pad = b - len(chunk)
        if pad:
            pts = np.concatenate([pts, np.zeros((pad,) + pts.shape[1:], pts.dtype)])
            masks = np.concatenate([masks, np.zeros((pad,) + masks.shape[1:], masks.dtype)])
        out = bev_fn(jnp.asarray(pts[..., :3]), jnp.asarray(masks))
        imgs = np.asarray(out.image * 255.0).astype(np.uint8)
        origins = np.asarray(out.origin_xy)
        for j, path in enumerate(chunk):
            stem = os.path.splitext(os.path.basename(path))[0]
            np.savez(
                os.path.join(args.out, stem + ".npz"),
                image=imgs[j], origin_xy=origins[j],
                resolution=cfg.bev.resolution,
            )
        print(f"[{i+len(chunk)}/{len(files)}] preprocessed", flush=True)
    return 0


def cmd_stats(args):
    """Channel mean/std over preprocessed images (get_data_stats.py)."""
    if not os.path.isdir(args.images):
        print(f"error: no such directory: {args.images}", file=sys.stderr)
        return 1
    files = _scan_files(args.images, exts=(".npz",))
    if not files:
        print(f"error: no .npz images found in {args.images}", file=sys.stderr)
        return 1
    s = ss = n = 0.0
    for f in files:
        img = np.load(f)["image"].astype(np.float64) / 255.0
        s += img.sum()
        ss += (img * img).sum()
        n += img.size
    mean = s / n
    std = float(np.sqrt(ss / n - mean * mean))
    print(json.dumps({"mean": mean, "std": std, "files": len(files)}))
    return 0


def cmd_gen_split(args):
    if args.dataset == "kitti":
        from gloc3d_tpu.data.kitti import generate_split

        split = generate_split(args.root, args.which, args.skip_frames,
                               args.query_fraction, args.seed)
    elif args.dataset == "nclt":
        from gloc3d_tpu.data.nclt import generate_split

        split = generate_split(args.root, args.which, args.skip_frames,
                               args.query_fraction, args.seed,
                               session=args.session)
    else:  # nuscenes: root is the manifest npz (see data/nuscenes.py)
        from gloc3d_tpu.data.nuscenes import generate_split

        split = generate_split(args.root, args.skip_frames,
                               args.query_fraction, args.seed)
    split.save(args.out)
    print(f"wrote {args.out}: {len(split.db_files)} db, "
          f"{len(split.q_files)} queries")
    if args.valset_txt:
        from gloc3d_tpu.data.valset import write_valset

        idx_path = args.valset_txt + "_index.txt"
        pose_path = args.valset_txt + "_pose.txt"
        write_valset(split, idx_path, pose_path, band=args.band,
                     max_pairs=args.valset_max_pairs, seed=args.seed)
        print(f"wrote valset artifact: {idx_path}, {pose_path} "
              f"(band={args.band}, max_pairs={args.valset_max_pairs})")
    return 0


def _build_localizer(cfg, args, align_ground=False):
    import jax
    import jax.numpy as jnp

    from gloc3d_tpu.models import build_model
    from gloc3d_tpu.pipeline import GlobalLocalizer

    blob_path = getattr(args, "from_export", None)
    if blob_path:
        # serve from a serialized StableHLO blob with NO model-building
        # code: the TorchScript→C++ hand-off equivalent (main.py:189-198 →
        # loop_detector.h:47-57). Params live inside the blob.
        from gloc3d_tpu.export import ExportedDescriptorModel

        if getattr(args, "host_stats", False):
            raise SystemExit(
                "--from-export serves the plain forward; it cannot be "
                "combined with --host-stats (needs the real model)")
        with open(blob_path, "rb") as f:
            model = ExportedDescriptorModel(f.read())
        no_mirror = getattr(args, "no_host_mirror", False)
        return GlobalLocalizer(
            cfg, model, {}, align_ground=align_ground,
            device_keyframes=(getattr(args, "device_keyframes", False)
                              or no_mirror),
            host_mirror=not no_mirror,
        )
    model = build_model(cfg.model, cfg.voxel)
    n_pts = cfg.voxel.max_points if cfg.model.encoder == "pointpillar" else cfg.bev.max_points
    dummy_p = jnp.zeros((1, n_pts, 4))
    dummy_m = jnp.zeros((1, n_pts))
    if cfg.model.encoder == "pointpillar":
        params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy_p, dummy_m)
    else:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.bev.image_size, cfg.bev.image_size, 3)),
        )
    if args.checkpoint:
        params = _restore_params(params, args.checkpoint)
    no_mirror = getattr(args, "no_host_mirror", False)
    return GlobalLocalizer(
        cfg, model, params, align_ground=align_ground,
        host_stats=getattr(args, "host_stats", False),
        device_keyframes=(getattr(args, "device_keyframes", False)
                          or no_mirror),
        host_mirror=not no_mirror,
    )


def _restore_params(params, path):
    import jax.numpy as jnp

    if path.endswith(".npz"):
        import numpy as np

        keys = np.load(path).files
        if any(k.startswith("params/") for k in keys):
            # converted s2s checkpoint (tools/convert_torch_checkpoint.py
            # pointpillar mode): path-encoded params + batch_stats
            from gloc3d_tpu.models.pointpillar import load_pointpillar_npz

            return load_pointpillar_npz(params, path)
        from gloc3d_tpu.models.vgg import load_vggvlad_npz

        return {"params": load_vggvlad_npz(params["params"], path),
                **{k: v for k, v in params.items() if k != "params"}}
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), params)
    return restored


def cmd_build_index(args):
    from gloc3d_tpu.data.kitti import SplitIndex
    from gloc3d_tpu.data.native import load_scan_batch, masks_from_counts

    cfg = _load_cfg(args)
    split = SplitIndex.load(args.split)
    loc = _build_localizer(cfg, args, align_ground=args.align_ground)
    b = args.batch
    if getattr(args, "dp_devices", 1) > 1:
        from gloc3d_tpu.config import MeshConfig
        from gloc3d_tpu.parallel import make_mesh

        mesh = make_mesh(MeshConfig(num_devices=args.dp_devices))
        loc.shard_extraction(mesh)
        b = ((b + args.dp_devices - 1) // args.dp_devices) * args.dp_devices
    files = split.db_files
    for i in range(0, len(files), b):
        chunk = files[i : i + b]
        pts, counts = load_scan_batch(chunk, args.fmt, cfg.voxel.max_points)
        masks = masks_from_counts(counts, cfg.voxel.max_points)
        if len(chunk) < b:
            pts = np.concatenate([pts, np.zeros((b - len(chunk),) + pts.shape[1:], pts.dtype)])
            masks = np.concatenate([masks, np.zeros((b - len(chunk),) + masks.shape[1:], masks.dtype)])
        loc.add_keyframes(pts, masks)
        loc.keyframes = loc.keyframes[: i + len(chunk)]  # drop padded tail
        print(f"[{i+len(chunk)}/{len(files)}] indexed", flush=True)
    loc.bank.truncate(len(files))
    loc.save(args.out)
    print(f"index written to {args.out}")
    return 0


def _result_json(res) -> dict:
    out = {
        "success": bool(res.success),
        "db_index": int(res.db_index),
        "candidates": np.asarray(res.candidates).tolist(),
        "score": res.match_score,
    }
    if res.pose is not None:
        out["translation"] = np.asarray(res.pose.translation).tolist()
        out["rotation_wxyz"] = np.asarray(res.pose.rotation).tolist()
    return out


def cmd_serve(args):
    """Long-running localization server: scan paths on stdin (one per
    line), one JSON LocalizationResult per line on stdout. The production
    driver shape: load the index once, keep every jit warm, stream queries
    through the one-program fused path (locate_fused) when the device
    store is on, else locate()."""
    from gloc3d_tpu.data.native import load_scan_batch, masks_from_counts

    cfg = _load_cfg(args)
    if not os.path.exists(os.path.join(args.index, "bank.npz")):
        print(f"error: no index at {args.index} (missing bank.npz)",
              file=sys.stderr)
        return 1
    loc = _build_localizer(cfg, args, align_ground=args.align_ground)
    loc.load(args.index)
    from gloc3d_tpu.models.encoders import is_image_encoder

    i2i = is_image_encoder(cfg.model.encoder)
    use_fused = (loc.device_keyframes and not cfg.match.refine_icp
                 and cfg.index.backend != "sharded")
    print(json.dumps({"ready": True, "db_size": len(loc.bank),
                      "fused": use_fused, "i2i": i2i}), flush=True)
    for line in sys.stdin:
        path = line.strip()
        if not path:
            continue
        try:
            if i2i:
                # i2i index: the line names a BEV prob image (.npz or the
                # reference's .jpg/.png prob_img artifacts)
                from gloc3d_tpu.data.images import load_bev_images

                imgs, origins = load_bev_images([path], cfg.bev.image_size)
                res = (loc.locate_fused(imgs[0], origin=origins[0])
                       if use_fused
                       else loc.locate(imgs[0], origin=origins[0]))
            else:
                pts, counts = load_scan_batch([path], args.fmt,
                                              cfg.voxel.max_points)
                masks = masks_from_counts(counts, cfg.voxel.max_points)
                res = (loc.locate_fused(pts[0], masks[0]) if use_fused
                       else loc.locate(pts[0], masks[0]))
            out = _result_json(res)
        except Exception as e:  # long-running server: NO per-scan error
            # (corrupt file, precondition RuntimeError, ...) may kill the
            # stream — it becomes a per-line error result instead
            out = {"success": False, "error": f"{type(e).__name__}: {e}"}
        out["scan"] = path
        print(json.dumps(out), flush=True)
    return 0


def cmd_query(args):
    from gloc3d_tpu.data.native import load_scan_batch, masks_from_counts

    cfg = _load_cfg(args)
    if not os.path.exists(os.path.join(args.index, "bank.npz")):
        print(f"error: no index at {args.index} (missing bank.npz)",
              file=sys.stderr)
        return 1
    loc = _build_localizer(cfg, args, align_ground=args.align_ground)
    loc.load(args.index)
    pts, counts = load_scan_batch([args.scan], args.fmt, cfg.voxel.max_points)
    masks = masks_from_counts(counts, cfg.voxel.max_points)
    res = loc.locate(pts[0], masks[0])
    if getattr(args, "dump_match", None):
        _dump_match_overlay(loc, pts[0], masks[0], res, args.dump_match)
    print(json.dumps(_result_json(res)))
    return 0


def cmd_match_submap(args):
    """Full-submap matching at the CLI surface: place a query scan in a
    submap BEV grid with the certificate→fallback matcher policy
    (the TestGridMatch / MatchFullSubmap evaluator role,
    global_registration.cpp:778-840, fast_correlative_scan_matcher_2d.cpp:
    248-268). Query = a raw scan (.bin) or a preprocessed BEV (.npz); the
    submap grid = a preprocess-format .npz (image, origin_xy, resolution).
    """
    import math

    import jax.numpy as jnp

    from gloc3d_tpu.ops.occupancy import ProbabilityGrid2D
    from gloc3d_tpu.ops.refine import bev_to_virtual_points
    from gloc3d_tpu.ops.scan_match import match_full_submap

    cfg = _load_cfg(args)
    g = np.load(args.grid)
    img = g["image"].astype(np.float32)
    if img.max() > 1.5:  # preprocess writes uint8 0..255
        img = img / 255.0
    res_m = float(g["resolution"])
    grid = ProbabilityGrid2D.from_bev_image(
        jnp.asarray(img), jnp.asarray(g["origin_xy"], jnp.float32), res_m)

    if args.scan.endswith(".npz"):
        q = np.load(args.scan)
        q_img = q["image"].astype(np.float32)
        if q_img.max() > 1.5:
            q_img = q_img / 255.0
        q_org = np.asarray(q["origin_xy"], np.float32)
        q_res = float(q["resolution"])
    else:
        import jax

        from gloc3d_tpu.data.native import load_scan_batch, masks_from_counts
        from gloc3d_tpu.ops.bev import scan_to_bev

        pts, counts = load_scan_batch([args.scan], args.fmt,
                                      cfg.bev.max_points)
        masks = masks_from_counts(counts, cfg.bev.max_points)
        bev = jax.jit(lambda p, m: scan_to_bev(p, m, cfg.bev))(
            jnp.asarray(pts[0, :, :3]), jnp.asarray(masks[0]))
        q_img = np.asarray(bev.image)
        q_org = np.asarray(bev.origin_xy)
        q_res = cfg.bev.resolution
    # query BEV → virtual scan in the query's own frame (the grid→cloud
    # trick, fast_correlative_scan_matcher_2d.cpp:78-95)
    pts_xy, valid = bev_to_virtual_points(
        jnp.asarray(q_img), jnp.asarray(q_org), q_res, args.budget)
    r = match_full_submap(
        grid, pts_xy, valid,
        num_rotations=args.rotations, max_scan_range=args.max_range,
        fallback=args.fallback)
    pose = np.asarray(r.pose, np.float64)
    print(json.dumps({
        "pose_xy_yaw": [round(float(pose[0]), 4), round(float(pose[1]), 4),
                        round(float(pose[2]), 6)],
        "yaw_deg": round(math.degrees(float(pose[2])), 3),
        "score": round(float(r.score), 5),
        "certified": bool(r.certified),
        "used_fallback": bool(r.used_fallback),
        "fallback_policy": args.fallback,
    }))
    return 0


def _dump_match_overlay(loc, points, mask, res, out_path):
    """Registration-overlay debug artifact (`query --dump-match`): query BEV
    warped by the recovered (dx, dy, yaw) onto the matched db BEV. On match
    failure the overlay uses the identity transform against the top-1
    candidate — the raw misalignment is still the useful debug picture."""
    import numpy as np

    from gloc3d_tpu.data.viz import match_overlay, save_png

    cand = res.db_index if res.success else (
        int(res.candidates[0]) if len(res.candidates) else -1)
    if cand < 0 or cand >= len(loc.keyframes):
        print(f"note: no candidate to overlay; skipping {out_path}",
              file=sys.stderr)
        return
    kf = loc.keyframes[cand]
    if kf.image is None:
        print("note: keyframes have no host-side images "
              f"(host_mirror=False index); skipping {out_path}",
              file=sys.stderr)
        return
    _, _, bev, _ = loc.detect(points[None],
                              mask[None] if mask is not None else None)
    xy_yaw = (np.asarray(res.match_xy_yaw, np.float64)
              if res.success else np.zeros(3))
    ov = match_overlay(
        np.asarray(bev.image[0]), np.asarray(bev.origin_xy[0]),
        kf.image, np.asarray(kf.origin_xy), xy_yaw,
        float(np.asarray(bev.resolution)))
    if save_png(out_path, ov):
        state = "registered" if res.success else "FAILED match, identity"
        print(f"wrote {out_path} ({state}, db keyframe {cand})",
              file=sys.stderr)


def cmd_export(args):
    """AOT-export the descriptor model (main.py --mode=save_pt parity)."""
    import jax
    import jax.numpy as jnp

    from gloc3d_tpu.export import export_descriptor_model
    from gloc3d_tpu.models import build_model

    cfg = _load_cfg(args)
    model = build_model(cfg.model, cfg.voxel)
    if cfg.model.encoder == "pointpillar":
        ex = (jnp.zeros((1, cfg.voxel.max_points, 4)),
              jnp.zeros((1, cfg.voxel.max_points)))
    else:
        ex = (jnp.zeros((1, cfg.bev.image_size, cfg.bev.image_size, 3)),)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *ex)
    if args.checkpoint:
        params = _restore_params(params, args.checkpoint)
    if getattr(args, "fold_bn", False) and cfg.model.encoder == "pointpillar":
        from gloc3d_tpu.models.fold import fold_batch_norm

        model = build_model(cfg.model.replace(fold_bn=True), cfg.voxel)
        params = {"params": fold_batch_norm(params["params"],
                                            params["batch_stats"])}
    blob = export_descriptor_model(model, params, *ex)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob)} bytes, StableHLO)")
    return 0


def _load_split_dataset(cfg, split, args):
    """s2s: decode raw scans; i2i: load preprocessed BEV images (--images)."""
    from gloc3d_tpu.models.encoders import is_image_encoder

    if is_image_encoder(cfg.model.encoder):
        if not getattr(args, "images", None):
            raise SystemExit(
                f"i2i ({cfg.model.encoder}) train/eval needs --images DIR of "
                "preprocessed BEV npz files (see `preprocess`)")
        from gloc3d_tpu.data.images import load_split_images

        return load_split_images(split, args.images, cfg.bev.image_size)
    from gloc3d_tpu.data.kitti import load_split_scans

    return load_split_scans(split, cfg.voxel.max_points)


def _example_inputs(ds):
    import jax.numpy as jnp

    if ds.db_masks is None:
        return (jnp.asarray(ds.db_inputs[:1]),)
    return (jnp.asarray(ds.db_inputs[:1]), jnp.asarray(ds.db_masks[:1]))


def cmd_cluster(args):
    """VLAD centroid initialization (main.py --mode=cluster): sample encoder
    descriptors over the db set, k-means them, save centroids + samples
    (the desc_cen.hdf5 equivalent) for train --init-centroids."""
    import jax

    from gloc3d_tpu.data.kitti import SplitIndex
    from gloc3d_tpu.models import build_model
    from gloc3d_tpu.train.cluster import init_vlad_from_data

    cfg = _load_cfg(args)
    split = SplitIndex.load(args.split)
    ds = _load_split_dataset(cfg, split, args)
    model = build_model(cfg.model, cfg.voxel)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *_example_inputs(ds))
    _, cents, descs = init_vlad_from_data(
        cfg, model, params, ds.db_inputs, ds.db_masks,
        jax.random.PRNGKey(cfg.train.seed),
        num_images=args.num_images, per_image=args.per_image,
    )
    np.savez(args.out, centroids=cents, descriptors=descs)
    print(f"wrote {args.out}: centroids {cents.shape}, "
          f"descriptors {descs.shape}")
    return 0


def cmd_train(args):
    import jax

    from gloc3d_tpu.data.kitti import SplitIndex, load_split_scans
    from gloc3d_tpu.models import build_model
    from gloc3d_tpu.train import Trainer

    cfg = _load_cfg(args)
    if getattr(args, "host_stats", False):
        # s2s fast path: host pillar stats + counting sort feed the
        # zero-device-scatter train step (TrainConfig.host_stats)
        cfg = cfg.replace(train=cfg.train.replace(host_stats=True))
    split = SplitIndex.load(args.split)
    ds = _load_split_dataset(cfg, split, args)
    model = build_model(cfg.model, cfg.voxel)
    import jax.numpy as jnp

    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.train.seed),
        *_example_inputs(ds),
    )
    if args.init_centroids:
        from gloc3d_tpu.models.netvlad import init_netvlad_params

        cc = np.load(args.init_centroids)
        params = dict(params)
        params["params"] = init_netvlad_params(
            params["params"], cc["centroids"], cc["descriptors"],
            vladv2=cfg.model.vladv2, path=("pool",),
        )
    tmask = None
    if cfg.model.encoder != "pointpillar" and not args.fromscratch:
        # main.py:531-541: pretrained image encoders train only their top
        # block; --fromscratch lifts the freeze (reference --fromscratch)
        from gloc3d_tpu.models.encoders import encoder_trainable_mask

        tmask = jax.tree.map(lambda _: True, dict(params["params"]))
        tmask["encoder"] = encoder_trainable_mask(
            cfg.model.encoder, params["params"]["encoder"])
    trainer = Trainer(cfg, model, ds, args.workdir, trainable_mask=tmask)
    state = trainer.init_state(params["params"], params.get("batch_stats"))
    if args.resume:
        state = trainer.load_checkpoint(args.resume, state)
    state = trainer.fit(state)
    print(json.dumps({"best_recall5": trainer.best_recall5,
                      "epochs": len(trainer.history)}))
    return 0


def cmd_eval(args):
    from gloc3d_tpu.data.kitti import SplitIndex
    from gloc3d_tpu.models import build_model

    cfg = _load_cfg(args)
    split = SplitIndex.load(args.split)
    ds = _load_split_dataset(cfg, split, args)
    model = build_model(cfg.model, cfg.voxel)
    import jax
    import jax.numpy as jnp

    params = jax.jit(model.init)(jax.random.PRNGKey(0), *_example_inputs(ds))
    if args.checkpoint:
        params = _restore_params(params, args.checkpoint)

    if args.registration:
        # full GlocEvaluator flow: recognition + registration + failures
        from gloc3d_tpu.eval.evaluator import evaluate_split
        from gloc3d_tpu.pipeline import GlobalLocalizer

        loc = GlobalLocalizer(cfg, model, params,
                              align_ground=args.align_ground)
        report = evaluate_split(loc, ds, out_dir=args.workdir,
                                batch=args.batch)
        print(report.to_json())
        return 0

    from gloc3d_tpu.train import Trainer

    trainer = Trainer(cfg, model, ds, args.workdir or "/tmp/gloc_eval")
    state = trainer.init_state(params["params"], params.get("batch_stats"))
    rec = trainer.evaluate(state, ds)
    print(json.dumps({"recall": {str(k): v for k, v in rec.items()}}))
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="gloc", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, fmt=True):
        sp.add_argument("--config", default=None)
        sp.add_argument("--i2i", action="store_true")
        sp.add_argument(
            "--encoder", default=None,
            choices=("vgg16", "alexnet", "mobilenet", "resnet18",
                     "pointpillar"),
            help="backbone (main.py --arch choices + the s2s pointpillar)")
        sp.add_argument("--checkpoint", default=None)
        sp.add_argument("--batch", type=int, default=8)
        sp.add_argument("--quantize", default=None, choices=("none", "int8"),
                        help="descriptor-bank storage: int8 stores per-row "
                             "symmetric codes + exact norms (4x less HBM "
                             "at map scale; beyond-reference mode)")
        sp.add_argument("--backend", default=None, choices=("flat", "ivf"),
                        help="index backend: flat exact bank or IVF "
                             "partitioned cells (map scale; composes "
                             "with --quantize int8)")
        sp.add_argument("--fast-match", default=None, dest="fast_match",
                        choices=("preset", "fm"),
                        help="serving-matcher preset (÷2 two-stage fine + "
                             "pooled θ-argmax + top-4 pruning); 'fm' adds "
                             "the Fourier-Mellin coarse estimator — "
                             "defaults stay exact-parity")
        sp.add_argument("--host-stats", action="store_true",
                        help="pointpillar fast path: pillar stats/sort on "
                             "the host during IO; for train this feeds the "
                             "zero-device-scatter step (1.8x step "
                             "throughput, RESULTS.md)")
        sp.add_argument("--device-keyframes", action="store_true",
                        help="bit-packed HBM keyframe store (72 KB/frame "
                             "at 768²; match gathers candidates by index)")
        sp.add_argument("--no-host-mirror", action="store_true",
                        help="map-scale ingest: keep keyframe images ONLY "
                             "in the HBM store (implies --device-keyframes; "
                             "no host RAM copy / per-batch fetch)")
        if fmt:
            sp.add_argument("--fmt", default="kitti",
                            choices=("kitti", "nuscenes", "nclt"))

    sp = sub.add_parser("preprocess", help="scans → BEV images")
    sp.add_argument("--scans", required=True)
    sp.add_argument("--out", required=True)
    common(sp)
    sp.set_defaults(fn=cmd_preprocess)

    sp = sub.add_parser("stats", help="image mean/std")
    sp.add_argument("--images", required=True)
    sp.set_defaults(fn=cmd_stats)

    sp = sub.add_parser("gen-split", help="build train/val split index")
    sp.add_argument("--root", required=True,
                    help="dataset root (kitti/nclt) or manifest npz (nuscenes)")
    sp.add_argument("--dataset", default="kitti",
                    choices=("kitti", "nclt", "nuscenes"))
    sp.add_argument("--session", default=None, help="NCLT session override")
    sp.add_argument("--which", default="train", choices=("train", "val"))
    sp.add_argument("--skip-frames", type=int, default=5)
    sp.add_argument("--query-fraction", type=float, default=0.2)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--out", required=True)
    sp.add_argument("--valset-txt", default=None,
                    help="also export the two-file text valset artifact "
                         "(reference write_valset_to_txt format) with this "
                         "path prefix")
    sp.add_argument("--valset-max-pairs", type=int, default=None,
                    help="cap exported (query, db) pairs by random sampling "
                         "(nuScenes exporter's <=100, nuscenes_s2s.py:295)")
    sp.add_argument("--band", default="easy",
                    choices=("easy", "medium", "hard"))
    sp.set_defaults(fn=cmd_gen_split)

    sp = sub.add_parser("build-index", help="extract db descriptors + grids")
    sp.add_argument("--split", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--align-ground", action="store_true")
    sp.add_argument("--dp-devices", type=int, default=1,
                    help="data-parallel extraction over this many devices "
                         "(batch shards over a jax mesh)")
    common(sp)
    sp.set_defaults(fn=cmd_build_index)

    sp = sub.add_parser("query", help="localize one scan against an index")
    sp.add_argument("--index", required=True)
    sp.add_argument("--scan", required=True)
    sp.add_argument("--align-ground", action="store_true")
    sp.add_argument("--from-export", metavar="BLOB",
                    help="extract the query descriptor with a serialized "
                         "StableHLO model (`gloc export`) instead of "
                         "building the model — the TorchScript hand-off "
                         "equivalent; no model code or checkpoint needed")
    sp.add_argument("--dump-match", metavar="PNG",
                    help="write a registration-overlay debug image: the "
                         "query BEV warped by the recovered (dx, dy, yaw) "
                         "onto the matched db BEV (i2i_util.py:540-620 / "
                         "loop_detector.cpp:224-232 equivalent)")
    common(sp)
    sp.set_defaults(fn=cmd_query)

    sp = sub.add_parser(
        "serve", help="stream localization: scan paths on stdin → JSON "
                      "results on stdout (load index once, jits stay warm)")
    sp.add_argument("--index", required=True)
    sp.add_argument("--align-ground", action="store_true")
    common(sp)
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser(
        "match-submap",
        help="place a scan in a submap grid (full 360° certified matcher)")
    sp.add_argument("--grid", required=True,
                    help="submap BEV .npz (image, origin_xy, resolution)")
    sp.add_argument("--scan", required=True,
                    help="query: raw scan (.bin/.fmt) or BEV .npz")
    sp.add_argument("--fmt", default="kitti")
    sp.add_argument("--config")
    sp.add_argument("--rotations", type=int, default=None,
                    help="rotation count (default: the Olson sub-cell "
                    "bound at --max-range)")
    sp.add_argument("--max-range", type=float, default=50.0)
    sp.add_argument("--fallback", default="full",
                    choices=["full", "theta", "none"])
    sp.add_argument("--budget", type=int, default=4096,
                    help="virtual-scan point budget")
    sp.set_defaults(fn=cmd_match_submap)

    sp = sub.add_parser("export", help="AOT-export the descriptor model")
    sp.add_argument("--out", required=True)
    sp.add_argument("--fold-bn", action="store_true",
                    help="fold BatchNorm into conv weights before export "
                         "(serving; pointpillar only)")
    common(sp, fmt=False)
    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser("cluster", help="VLAD centroid init (k-means)")
    sp.add_argument("--split", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--images", default=None)
    sp.add_argument("--num-images", type=int, default=500)
    sp.add_argument("--per-image", type=int, default=100)
    common(sp, fmt=False)
    sp.set_defaults(fn=cmd_cluster)

    sp = sub.add_parser("train", help="triplet training")
    sp.add_argument("--split", required=True)
    sp.add_argument("--workdir", required=True)
    sp.add_argument("--optim", default=None, choices=("sgd", "adam"),
                    help="optimizer (main.py --optim: ADAM is plain "
                         "Adam(lr), SGD gets momentum+wd+StepLR)")
    sp.add_argument("--fromscratch", action="store_true",
                    help="train the whole image encoder (default freezes "
                         "below the top block, main.py:531-541)")
    sp.add_argument("--init-centroids", default=None,
                    help="centroids npz from the cluster subcommand")
    sp.add_argument("--images", default=None,
                    help="preprocessed BEV npz dir (required for i2i)")
    sp.add_argument("--resume", default=None)
    common(sp, fmt=False)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("eval", help="recall@N / full localization evaluation")
    sp.add_argument("--split", required=True)
    sp.add_argument("--workdir", default=None)
    sp.add_argument("--images", default=None,
                    help="preprocessed BEV npz dir (required for i2i)")
    sp.add_argument("--registration", action="store_true",
                    help="full end-to-end eval incl. registration "
                         "(global_localization binary parity)")
    sp.add_argument("--align-ground", action="store_true")
    common(sp, fmt=False)
    sp.set_defaults(fn=cmd_eval)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
