"""Preprocessed-BEV-image loading for the i2i path.

The reference's primary workflow trains VGG16+NetVLAD-FC on pre-rendered
768×768 probability JPEGs (i2i_util.py:156, kitti_i2i prob_img dirs). Here
the preprocessing CLI writes .npz images (image uint8 + origin + resolution);
this module loads them into model-ready arrays: center pad/crop to the
configured size with 255 fill (i2i_util.py:53-91) and 1/255 scaling to the
float images the network eats (ToScaledTensor, i2i_util.py:26-31), replicated
to 3 channels like the reference's BGR JPEGs.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def pad_and_crop(img: np.ndarray, size: int, fill: int = 255) -> np.ndarray:
    """Center pad/crop a (H, W) uint8 image to (size, size), 255 fill
    (i2i_util.py:53-69 semantics)."""
    h, w = img.shape[:2]
    out = np.full((size, size), fill, img.dtype)
    ch, cw = min(h, size), min(w, size)
    it, il = (h - ch) // 2, (w - cw) // 2
    ot, ol = (size - ch) // 2, (size - cw) // 2
    out[ot:ot + ch, ol:ol + cw] = img[it:it + ch, il:il + cw]
    return out


def load_bev_images(
    paths: Sequence[str], size: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """npz image files → ((N, size, size, 3) float32 in [0,1], (N, 2) origins).

    Origins are propagated through the center pad/crop: output pixel (0, 0)
    corresponds to input pixel (it−ot, il−ol), so the metric origin shifts by
    that pixel offset × resolution (rows = y, cols = x)."""
    imgs = np.empty((len(paths), size, size, 3), np.float32)
    origins = np.zeros((len(paths), 2), np.float32)
    for i, p in enumerate(paths):
        if p.lower().endswith((".jpg", ".jpeg", ".png")):
            # the reference's own prob_img artifacts (save_probability_img
            # JPEGs, i2i_util.py:156): grayscale decode; the projection is
            # submap-centered so the metric origin is the image center
            # (submap_3d.cpp:265-276 offsets by num_*_cells/2)
            from PIL import Image

            src = np.asarray(Image.open(p).convert("L"))
            res = 0.2
            d = None
        else:
            d = np.load(p)
            src = d["image"]
            res = float(d["resolution"]) if "resolution" in d else 0.2
        img = pad_and_crop(src, size)
        imgs[i] = (img.astype(np.float32) / 255.0)[..., None].repeat(3, -1)
        h, w = src.shape[:2]
        it, il = (h - min(h, size)) // 2, (w - min(w, size)) // 2
        ot, ol = (size - min(h, size)) // 2, (size - min(w, size)) // 2
        base = (np.asarray(d["origin_xy"], np.float32) if d is not None
                else np.float32([-(w // 2) * res, -(h // 2) * res]))
        origins[i] = base + np.asarray(
            [(il - ol) * res, (it - ot) * res], np.float32
        )
    return imgs, origins


def image_paths_for_scans(scan_files: Sequence[str], img_dir: str,
                          ext: str = ".npz") -> List[str]:
    """Map scan file names to their preprocessed image files (the
    velodyne→prob_img path rewrite, kitti_i2i.py:170-173). When the ``ext``
    file is absent, probes the reference's JPEG/PNG prob_img artifacts so a
    directory produced by save_probability_img ingests unmodified."""
    out = []
    for f in scan_files:
        stem = os.path.splitext(os.path.basename(f))[0]
        p = os.path.join(img_dir, stem + ext)
        if not os.path.exists(p):
            for alt in (".jpg", ".jpeg", ".png"):
                q = os.path.join(img_dir, stem + alt)
                if os.path.exists(q):
                    p = q
                    break
        out.append(p)
    return out


def load_split_images(split, img_dir: str, size: int = 768):
    """SplitIndex + preprocessed image dir → i2i TripletDataset."""
    from gloc3d_tpu.data.dataset import TripletDataset

    db_paths = image_paths_for_scans(split.db_files, img_dir)
    q_paths = image_paths_for_scans(split.q_files, img_dir)
    db_imgs, db_origins = load_bev_images(db_paths, size)
    q_imgs, q_origins = load_bev_images(q_paths, size)
    return TripletDataset(
        db_inputs=db_imgs, q_inputs=q_imgs,
        utm_db=split.utm_db, utm_q=split.utm_q,
        db_poses=split.db_poses, q_poses=split.q_poses,
        db_origins=db_origins, q_origins=q_origins,
    )
