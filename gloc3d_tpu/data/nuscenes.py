"""nuScenes dataset binding.

The reference (dataset/nuscenes_s2s.py, byte-identical nuscenes_i2i.py) walks
nuscenes-devkit for scenes in 'singapore-onenorth' (:167), takes each sample's
LIDAR_TOP ego pose as the position (:209-275), and exports ≤100 sampled val
pairs (:277-334). The devkit is an optional dependency here: when installed,
``build_manifest`` extracts the same table; the split generator itself only
needs the manifest (an npz of file paths + ego poses), keeping the binding
usable in devkit-less environments.
"""

from __future__ import annotations

import os
import numpy as np

from gloc3d_tpu.data.kitti import SplitIndex

DEFAULT_LOCATION = "singapore-onenorth"


def build_manifest(dataroot: str, out_path: str,
                   location: str = DEFAULT_LOCATION,
                   version: str = "v1.0-trainval") -> None:
    """Extract (lidar path, ego pose) per sample via nuscenes-devkit."""
    try:
        from nuscenes.nuscenes import NuScenes
        from pyquaternion import Quaternion
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "nuscenes-devkit is required to build a manifest; install it or "
            "provide a prebuilt manifest npz"
        ) from e

    nusc = NuScenes(version=version, dataroot=dataroot, verbose=False)
    files, poses = [], []
    for scene in nusc.scene:
        log = nusc.get("log", scene["log_token"])
        if log["location"] != location:
            continue
        token = scene["first_sample_token"]
        while token:
            sample = nusc.get("sample", token)
            sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
            ego = nusc.get("ego_pose", sd["ego_pose_token"])
            t = np.eye(4)
            t[:3, :3] = Quaternion(ego["rotation"]).rotation_matrix
            t[:3, 3] = ego["translation"]
            files.append(os.path.join(dataroot, sd["filename"]))
            poses.append(t)
            token = sample["next"]
    np.savez(out_path, files=np.array(files), poses=np.stack(poses))


def generate_split(
    manifest_path: str,
    skip_frames: int = 1,
    query_fraction: float = 0.2,
    seed: int = 0,
) -> SplitIndex:
    """Split a manifest into db/queries (same scheme as KITTI/NCLT)."""
    d = np.load(manifest_path, allow_pickle=False)
    files = [str(f) for f in d["files"]][::skip_frames]
    poses = d["poses"][::skip_frames]
    utm = poses[:, :2, 3]

    rng = np.random.RandomState(seed)
    n = len(files)
    nq = int(n * query_fraction)
    q_index = rng.choice(n, nq, replace=False)
    q_set = set(q_index.tolist())
    db_idx = [i for i in range(n) if i not in q_set]
    return SplitIndex(
        db_files=[files[i] for i in db_idx],
        q_files=[files[i] for i in q_index],
        db_poses=poses[db_idx], q_poses=poses[q_index],
        utm_db=utm[db_idx], utm_q=utm[q_index],
    )
