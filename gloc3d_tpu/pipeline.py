"""End-to-end global localization engine.

The TPU-native counterpart of the reference's RpyPCLoopDetector +
GlocEvaluator loop (loop_detector.cpp, global_localization.cpp): build a
database of keyframes (descriptor + BEV image + ground alignment), detect
top-k place candidates for a query, register the query BEV against candidates
in one batched dense search, and compose the full 6-DoF pose.

Device/host split: descriptors live in the HBM bank; BEV images are stored
host-side as uint8 (0 = occupied, 255 = free, exactly the reference's cv::Mat
convention) and shipped to the device per query as a (K, S, S) candidate
stack — or, with ``device_keyframes=True``, kept bit-packed in HBM and
gathered by index inside the match jit (the serving mode; 36× on the K=20
relay call, RESULTS.md). All compute stages are jitted once per shape.
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gloc3d_tpu.config import PipelineConfig
from gloc3d_tpu.core.transforms import Rigid3, transform_points
from gloc3d_tpu.eval.registration import compose_6dof
from gloc3d_tpu.index.bank import DescriptorBank
from gloc3d_tpu.ops.bev import BEVImage, scan_to_bev
from gloc3d_tpu.ops.bev_match import MatchResult, match_bev_topk
from gloc3d_tpu.ops.ground import estimate_ground
from gloc3d_tpu.ops.voxelize import device_pillar_sort_stats

Array = jax.Array


class Keyframe(NamedTuple):
    image: Optional[np.ndarray]  # (S, S) uint8 BEV occupancy image (None in
                                 # host_mirror=False mode: HBM store only)
    origin_xy: np.ndarray    # (2,) metric origin of pixel (0, 0)
    ground: Optional[Rigid3]  # T_lidar→ground (None if align_ground off)
    cloud: Optional[np.ndarray] = None  # (P, 4) downsampled scan in the BEV
                                        # frame: xyz + validity column
                                        # (stored when match.refine_icp is
                                        # on, for 3-D ICP polish)


class LocalizationResult(NamedTuple):
    success: bool
    db_index: int
    pose: Optional[Rigid3]        # query pose in the db keyframe's frame
    candidates: np.ndarray        # (k,) ranked candidate indices
    candidate_dists: np.ndarray   # (k,) descriptor distances²
    match_score: float
    match_xy_yaw: Optional[np.ndarray]


class _ShardedBankAdapter:
    """DescriptorBank-shaped facade over the mesh-sharded store, so the full
    GlobalLocalizer API (add_keyframes, SLAM queries, save) keeps working
    after shard_bank()."""

    def __init__(self, inner, cfg):
        self._inner = inner
        self.cfg = cfg

    def __len__(self):
        return len(self._inner)

    def add(self, feats):
        self._inner.add(np.asarray(feats))

    def query(self, queries, k=None, exclude_recent=False):
        exclude_after = (
            len(self._inner) - self.cfg.num_exclude_recent
            if exclude_recent else None
        )
        return self._inner.query(queries, k or self.cfg.top_k,
                                 exclude_after=exclude_after)

    def truncate(self, n):
        self._inner.truncate(min(n, len(self._inner)))

    def save(self, path):
        """Persist in the flat bank.npz format (reloadable anywhere)."""
        np.savez(path, bank=self._inner.to_host(), dim=self._inner.dim,
                 cfg=self.cfg.to_json())


class _IVFBankAdapter:
    """DescriptorBank-shaped facade over the IVF index (map-scale maps).

    The quantizer needs the descriptor distribution before it can partition,
    so adds are buffered host-side and the index trains + bulk-ingests
    lazily on the first query after a change (build-once query-many, the
    GlobalLocalizer usage pattern)."""

    def __init__(self, cfg, dim):
        from gloc3d_tpu.index.ivf import IVFBank

        self.cfg = cfg
        self.dim = dim
        self._ivf = IVFBank(
            dim=dim, num_cells=cfg.ivf_num_cells,
            cell_capacity=cfg.ivf_cell_capacity, nprobe=cfg.ivf_nprobe,
            quantize=cfg.quantize,
        )
        self._pending: List[np.ndarray] = []
        self._size = 0

    def __len__(self):
        return self._size

    def add(self, feats):
        feats = np.atleast_2d(np.asarray(feats, np.float32))
        self._pending.append(feats)
        self._size += len(feats)

    def truncate(self, n):
        if n < self._size - sum(len(p) for p in self._pending):
            raise ValueError("IVF backend cannot truncate ingested rows")
        drop = self._size - n
        while drop > 0 and self._pending:
            tail = self._pending[-1]
            if len(tail) <= drop:
                drop -= len(tail)
                self._pending.pop()
            else:
                self._pending[-1] = tail[:-drop]
                drop = 0
        self._size = n

    def _flush(self):
        if not self._pending:
            return
        batch = np.concatenate(self._pending)
        self._pending = []
        if self._ivf.centroids is None:
            import jax as _jax

            sample = batch[np.random.RandomState(0).permutation(len(batch))[
                : self.cfg.ivf_train_sample]]
            self._ivf.train(sample, key=_jax.random.PRNGKey(0))
        self._ivf.add(batch)

    def query(self, queries, k=None, exclude_recent=False):
        self._flush()
        k = k or self.cfg.top_k
        if not exclude_recent:
            return self._ivf.query(queries, k)
        # SLAM-mode exclude-recent: ids are insertion order
        # (loop_detector.cpp:66-68); the bound is applied INSIDE the jitted
        # scan as a validity mask (index/ivf.py::_ivf_query limit) — no
        # over-fetch, no host post-filter.
        limit = len(self) - self.cfg.num_exclude_recent
        return self._ivf.query(queries, k, exclude_after=limit)

    def shard(self, mesh) -> None:
        """Distribute the cell tensor over a device mesh (ShardedIVF);
        queries keep the same results bitwise."""
        from gloc3d_tpu.index.ivf import ShardedIVF

        self._flush()
        if self._ivf.centroids is None:
            raise RuntimeError("cannot shard an untrained/empty IVF index")
        self._ivf = ShardedIVF(mesh, self._ivf)

    def save(self, path):
        self._flush()
        self._ivf.save(path)

    @classmethod
    def load(cls, path, cfg):
        from gloc3d_tpu.index.ivf import IVFBank

        adapter = cls.__new__(cls)
        adapter.cfg = cfg
        adapter._ivf = IVFBank.load(path)
        adapter.dim = adapter._ivf.dim
        adapter._pending = []
        adapter._size = len(adapter._ivf)
        return adapter


def _pack_bits(images: jax.Array) -> jax.Array:
    """(B, S, S) BEV images (free=1.0/occupied=0.0) → (B, S, S//8) uint8
    occupancy bitmap (bit set = occupied; little-endian within the byte).

    Matching only ever consumes images through the <0.5 occupancy threshold
    (ops/bev_match.py::_occupancy), so the packing is LOSSLESS for the
    matcher — grayscale i2i JPEG values binarize here exactly as they would
    inside the matcher."""
    occ = (images < 0.5).astype(jnp.uint8)
    b, s, _ = occ.shape
    w = jnp.left_shift(jnp.uint8(1), jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(
        occ.reshape(b, s, s // 8, 8) * w, axis=-1).astype(jnp.uint8)


def _unpack_bits(packed: jax.Array) -> jax.Array:
    """(K, S, S//8) uint8 bitmap → (K, S, S) float BEV image (occupied=0.0)."""
    bits = jnp.bitwise_and(
        jnp.right_shift(packed[..., None], jnp.arange(8, dtype=jnp.uint8)),
        jnp.uint8(1))
    k, s, sb, _ = bits.shape
    return 1.0 - bits.reshape(k, s, sb * 8).astype(jnp.float32)


def _splice_staged(res1: MatchResult, res2: MatchResult,
                   failed: np.ndarray, b: int, k: int) -> MatchResult:
    """Assemble the (b, k) MatchResult from the stage-1 top-candidate pass
    (res1: (b, 1)) and the stage-2 full pass over failed queries only
    (res2: (nb ≥ len(failed), k); bucket-padding rows are dropped).

    Queries outside `failed` keep their stage-1 k=0 lane; their untested
    lanes read success=False / score=0, which first-success-wins never
    consults (k_star = 0 for them)."""

    def leaf(l1, l2):
        l1, l2 = np.asarray(l1), np.asarray(l2)
        out = np.zeros((b, k) + l1.shape[2:], l1.dtype)
        out[:, :1] = l1
        out[failed] = l2[: len(failed)]
        return out

    return MatchResult(*(leaf(a, c) for a, c in zip(res1, res2)))


class GlobalLocalizer:
    """Build-once query-many localization engine.

    Args:
      cfg: full pipeline config.
      model: a DescriptorModel (models/descriptor.py).
      params: its Flax params.
      align_ground: gravity-align scans before BEV/descriptor extraction
        (the reference's align_ground_ mode, global_localization.cpp:573).
    """

    def __init__(self, cfg: PipelineConfig, model, params,
                 align_ground: bool = False, seed: int = 0,
                 host_stats: bool = False, device_keyframes: bool = False,
                 host_mirror: bool = True, device_sort: bool = False):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.align_ground = align_ground
        # device_sort=True bins all-device pointpillar forwards via ONE
        # packed-key sort + cumsum segment sums (ops/voxelize.py::
        # device_pillar_sort_stats) instead of two XLA scatters — the
        # strategy that wins when the sort happens on the HOST (host_stats).
        # ON DEVICE it loses: per-stage isolation on v5e measures the sorted
        # forward at 6.4 ms vs 3.05 ms for the scatter forward at
        # N = 122,480 (tools/profile_aligned.py round 4) — the 122k packed
        # sort + row gathers + fp32 cumsums cost more than the two segment
        # scatters they replace. Default False (scatter path,
        # points_to_voxels); the sorted path stays available for parity
        # testing and for hosts that cannot pre-sort.
        self.device_sort = (device_sort
                            and cfg.model.encoder == "pointpillar"
                            and getattr(model, "supports_voxel_stats", True))
        # serving fast path: pillar stats + counting sort on the host
        # (native loader), zero device scatters. Only meaningful for the
        # pointpillar encoder. Composes with align_ground: a small device
        # pass estimates the ground plane and aligns the cloud FIRST, the
        # aligned points come back to the host for the stats/sort/BEV pass,
        # and the device then runs the descriptor-only program — the
        # reference's aligned db construction (global_localization.cpp:
        # 419-449) on the fast path.
        self.host_stats = (host_stats
                           and cfg.model.encoder == "pointpillar")
        if cfg.index.backend == "ivf":
            self.bank = _IVFBankAdapter(cfg.index, dim=cfg.index.dim)
        else:
            self.bank = DescriptorBank(cfg.index, dim=cfg.index.dim)
        self.keyframes: List[Keyframe] = []
        # device-resident keyframe store (serving mode): occupancy bitmaps
        # live in HBM ((cap, S, S/8) uint8, 72 KB/keyframe at 768²) and the
        # match jit gathers candidates BY INDEX — no (K, S, S) f32 host →
        # device stack per query. The reference keeps grids in host RAM and
        # re-uploads per match (loop_detector.cpp:183-288); on TPU the map
        # belongs in HBM next to the descriptor bank.
        self.device_keyframes = device_keyframes
        # host_mirror=False (map-scale ingest): keep BEV images ONLY in the
        # HBM store — no per-batch device→host image fetch during ingest and
        # no host RAM copy (a 100k-keyframe 768² map would mirror 59 GB on
        # the host; the packed store holds it in 7 GB of HBM). Keyframe
        # metadata (origin, ground, ICP cloud) is still host-side; save()
        # reconstructs binarized images from the store.
        if not host_mirror and not device_keyframes:
            raise ValueError("host_mirror=False requires device_keyframes")
        self.host_mirror = host_mirror
        self._kf_store = None       # (cap, S, S//8) uint8
        self._kf_origins = None     # (cap, 2) f32
        self._kf_cap = 0
        self._kf_sharding = None    # set by shard_keyframes(mesh)
        self._key = jax.random.PRNGKey(seed)
        self._extract = jax.jit(self._extract_impl)
        self._extract_sorted = jax.jit(self._extract_sorted_impl)
        self._extract_images = jax.jit(self._extract_images_impl)
        self._match_topk = jax.jit(self._match_topk_impl)
        self._match_topk_store = jax.jit(self._match_topk_store_impl)
        self._kf_add = jax.jit(
            lambda store, origs, images, origins, off: (
                jax.lax.dynamic_update_slice(
                    store, _pack_bits(images), (off, 0, 0)),
                jax.lax.dynamic_update_slice(origs, origins, (off, 0)),
            ),
            donate_argnums=(0, 1),
        )
        self._refine_icp = jax.jit(self._refine_icp_impl)
        self._align = jax.jit(self._align_impl)
        self._locate_fused = jax.jit(self._locate_fused_impl)
        self._locate_fused_sorted = jax.jit(self._locate_fused_sorted_impl)
        self._locate_fused_images = jax.jit(self._locate_fused_images_impl)

    # ------------------------------------------------------------ extraction
    def _align_impl(self, points, mask, key):
        """Batched ground alignment: estimate the plane per scan and rotate
        the cloud into the gravity-aligned frame (ground_estimator.cpp:194
        semantics). Returns (aligned points with trailing features kept,
        vmapped ground estimates)."""
        cfg = self.cfg

        def one_ground(pts, mk, k):
            est = estimate_ground(pts[..., :3], mk, cfg.ground, k)
            aligned = transform_points(est.transform, pts[..., :3])
            return aligned, est

        keys = jax.random.split(key, points.shape[0])
        aligned_xyz, ground = jax.vmap(one_ground)(points, mask, keys)
        return (
            jnp.concatenate([aligned_xyz, points[..., 3:]], axis=-1), ground,
        )

    def _extract_impl(self, params, points, mask, key):
        """Batched: ground-align → BEV project → model forward.

        points: (B, N, ≥3); mask: (B, N). Returns descriptors, uint8-able
        images, origins, and ground transforms.
        """
        cfg = self.cfg

        if self.align_ground:
            points, ground = self._align_impl(points, mask, key)
        else:
            ground = None

        bev = jax.vmap(lambda p, m: scan_to_bev(p, m, cfg.bev))(
            points[..., :3], mask
        )

        if cfg.model.encoder != "pointpillar":  # image encoders
            imgs = jnp.repeat(bev.image[..., None], 3, axis=-1)
            desc = self.model.apply(params, imgs)
        elif self.device_sort:
            # sorted binning on device: one packed-key sort + cumsum
            # segment sums replace the two big scatters of the unsorted
            # forward (same outputs up to fp reorder; SLOWER on v5e —
            # 6.4 vs 3.05 ms at N = 122,480 — hence off by default, see
            # __init__)
            vcfg = cfg.voxel
            ps, vs, ids, starts, raw_counts, centroids = jax.vmap(
                lambda p, m: device_pillar_sort_stats(
                    p, m, vcfg.xbound, vcfg.ybound, vcfg.zbound)
            )(points, mask)
            desc = self.model.apply(
                params, ps, vs,
                voxel_stats=(ids, raw_counts, centroids, starts))
        else:
            desc = self.model.apply(params, points, mask)
        return desc, bev, ground

    def _extract_sorted_impl(self, params, points, mask, ids, counts,
                             centroids, starts, pp):
        """host_stats serving path, device half: descriptor only — the BEV
        image comes from the host (data/native.py::compute_bev_host,
        bit-identical to scan_to_bev), both segment reductions are
        host-precomputed/Pallas, and the per-point stats rows arrive
        pre-gathered (pp). Zero device scatters, sorts, or by-index reads."""
        desc = self.model.apply(
            params, points, mask,
            voxel_stats=(ids, counts, centroids, starts, pp))
        return desc

    def shard_extraction(self, mesh, axis: str = "data") -> None:
        """Data-parallel extraction over a device mesh (index builds).

        The scan batch shards on its leading axis, params replicate, and each
        chip runs the full BEV+descriptor forward on its rows with no
        communication (SURVEY §2.3: data parallelism for extraction). Batches
        passed to extract/add_keyframes must be divisible by the mesh size.
        Complements shard_bank(), which distributes the QUERY side.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        row3 = NamedSharding(mesh, P(axis, None, None))
        row2 = NamedSharding(mesh, P(axis, None))
        self._extract_dp = jax.jit(
            self._extract_impl, in_shardings=(repl, row3, row2, repl)
        )
        # host_stats composes: the descriptor-only device program shards the
        # same way (points/mask/ids/counts/centroids/starts/pp on 'data')
        self._extract_sorted_dp = jax.jit(
            self._extract_sorted_impl,
            in_shardings=(repl, row3, row2, row2, row2, row3, row2, row3),
        )
        self._dp_devices = mesh.devices.size

    def shard_spatial(self, mesh, axis: str = "data") -> None:
        """Spatial-partition (SP) the i2i image forward over a device mesh.

        One image's conv stack is computed cooperatively by ALL chips: the
        (B, S, S, 3) input shards on its height axis, XLA's SPMD partitioner
        inserts the 3×3-conv halo exchanges and the NetVLAD psum. Unlike
        shard_extraction (DP: more throughput, same latency) this cuts the
        B=1 forward LATENCY ~n_devices× (parallel/spatial.py). Image-encoder
        configs only — the s2s pillar path is binning-bound, not conv-bound.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gloc3d_tpu.parallel.spatial import check_divisible

        if self.cfg.model.encoder == "pointpillar":
            raise ValueError(
                "shard_spatial applies to image (i2i) encoders; the s2s "
                "pillar path shards on the batch axis (shard_extraction)")
        check_divisible(self.cfg.bev.image_size, mesh.devices.size)
        repl = NamedSharding(mesh, P())
        img4 = NamedSharding(mesh, P(None, axis, None, None))
        self._extract_images = jax.jit(
            self._extract_images_impl,
            in_shardings=(repl, img4, repl), out_shardings=repl,
        )

    def _extract_images_impl(self, params, images, origins):
        """i2i: BEV probability images in directly, no scan_to_bev.

        The reference's detector consumes prob images straight from disk
        (loop_detector.cpp:137-172, i2i_util.py:156); here the (B, S, S, 3)
        float image (free = 1.0) feeds the CNN, and channel 0 doubles as the
        registration BEV. Returns (desc, BEVImage, None).
        """
        cfg = self.cfg
        desc = self.model.apply(params, images)
        img2d = images[..., 0]
        bev = BEVImage(
            image=img2d,
            origin_xy=origins,
            resolution=jnp.float32(cfg.bev.resolution),
            num_occupied=jnp.sum(img2d < 0.5, axis=(1, 2)).astype(jnp.int32),
        )
        return desc, bev, None

    def _default_origins(self, n: int) -> np.ndarray:
        """Scan-centered origin for images without recorded origins."""
        half = self.cfg.bev.image_size / 2.0 * self.cfg.bev.resolution
        return np.full((n, 2), -half, np.float32)

    def extract(self, inputs: np.ndarray, mask: Optional[np.ndarray] = None,
                origins: Optional[np.ndarray] = None):
        """Host API: batched extraction.

        s2s: inputs (B, N, ≥3) padded clouds + mask (B, N).
        i2i: inputs (B, S, S, 3) BEV probability images (free = 1.0), mask
        None; ``origins`` are each image's pixel-(0,0) metric coordinates
        (defaults to scan-centered).
        """
        if np.ndim(inputs) == 4:  # image mode
            if origins is None:
                origins = self._default_origins(len(inputs))
            return self._extract_images(
                self.params, jnp.asarray(inputs), jnp.asarray(origins)
            )
        if self.host_stats:
            from gloc3d_tpu.data.native import (
                compute_bev_host, compute_voxel_stats_host_sorted,
            )

            vc = self.cfg.voxel
            counts = np.asarray(np.asarray(mask).sum(axis=1), np.int64)
            pts = np.asarray(inputs, np.float32)
            if pts.shape[-1] < 4:  # host pass expects xyzi rows
                pad = np.zeros(pts.shape[:-1] + (4 - pts.shape[-1],),
                               np.float32)
                pts = np.concatenate([pts, pad], axis=-1)
            ground = None
            if self.align_ground:
                # device round trip: estimate + apply the ground transform
                # (the SAME jitted program as the all-device path), then the
                # host pass bins the aligned floats — BEV and stats are
                # bit-identical to the all-device aligned path
                self._key, sub = jax.random.split(self._key)
                aligned, ground = self._align(
                    jnp.asarray(pts), jnp.asarray(mask), sub)
                pts = np.asarray(aligned)
            s_p, s_v, s_i, s_c, s_g, s_s, s_pp = (
                compute_voxel_stats_host_sorted(
                    pts, counts, vc.xbound, vc.ybound, vc.zbound, crop=False,
                    per_point=True,
                ))
            # BEV on the host too (bit-identical to scan_to_bev; uses the
            # ORIGINAL row order — sorted rows are not prefix-padded)
            imgs, origins, nocc = compute_bev_host(pts, counts, self.cfg.bev)
            dp = getattr(self, "_dp_devices", 0)
            fn = (self._extract_sorted_dp
                  if dp and len(pts) % dp == 0 else self._extract_sorted)
            desc = fn(
                self.params, jnp.asarray(s_p), jnp.asarray(s_v),
                jnp.asarray(s_i), jnp.asarray(s_c), jnp.asarray(s_g),
                jnp.asarray(s_s), jnp.asarray(s_pp),
            )
            bev = BEVImage(
                image=imgs, origin_xy=origins,
                resolution=np.float32(self.cfg.bev.resolution),
                num_occupied=nocc,
            )
            return desc, bev, ground
        self._key, sub = jax.random.split(self._key)
        dp = getattr(self, "_dp_devices", 0)
        if dp and len(inputs) % dp == 0:
            return self._extract_dp(
                self.params, jnp.asarray(inputs), jnp.asarray(mask), sub
            )
        return self._extract(
            self.params, jnp.asarray(inputs), jnp.asarray(mask), sub
        )

    # ------------------------------------------------------------ db build
    def add_keyframes(self, points: np.ndarray,
                      mask: Optional[np.ndarray] = None,
                      origins: Optional[np.ndarray] = None) -> None:
        """Extract and store a batch of database keyframes (scans or images)."""
        desc, bev, ground = self.extract(points, mask, origins)
        self.bank.add(desc)
        if self.device_keyframes:
            self._store_keyframes(bev.image, bev.origin_xy,
                                  offset=len(self.keyframes))
        imgs = origins = None
        if self.host_mirror:
            # device→host fetches sync the async dispatch queue (costly
            # through the axon relay); host_mirror=False ingest defers them —
            # images/origins stay in the HBM store, save() reads them once.
            imgs = np.asarray(bev.image * 255.0).astype(np.uint8)
            origins = np.asarray(bev.origin_xy)
        n_new = int(bev.origin_xy.shape[0])
        store_clouds = (
            self.cfg.match.refine_icp and mask is not None
            and np.ndim(points) == 3
        )
        for i in range(n_new):
            g = None
            if ground is not None:
                g = Rigid3(
                    np.asarray(ground.transform.rotation[i]),
                    np.asarray(ground.transform.translation[i]),
                )
            cloud = None
            if store_clouds:
                xyz, cvalid = self._downsample_cloud(points[i], mask[i])
                if g is not None:  # store in the (aligned) BEV frame
                    xyz = np.asarray(transform_points(
                        Rigid3(jnp.asarray(g.rotation),
                               jnp.asarray(g.translation)),
                        jnp.asarray(xyz),
                    ))
                cloud = np.concatenate([xyz, cvalid[:, None]], 1)
            self.keyframes.append(Keyframe(
                imgs[i] if imgs is not None else None,
                origins[i] if origins is not None else None,
                g, cloud))

    # ------------------------------------------------------------ matching
    def _match_topk_impl(self, q_image, q_origin, db_images, db_origins):
        cfg = self.cfg
        query = BEVImage(
            image=q_image, origin_xy=q_origin,
            resolution=jnp.float32(cfg.bev.resolution),
            num_occupied=jnp.sum(q_image < 0.5).astype(jnp.int32),
        )
        return match_bev_topk(query, db_images, db_origins, cfg.match,
                              resolution=cfg.bev.resolution)

    def _match_topk_store_impl(self, q_image, q_origin, idx, store,
                               store_origins):
        """match against candidates gathered FROM THE DEVICE STORE by index
        (device_keyframes mode): one (k, S, S/8) row gather + bit unpack
        replaces the host-side image stack and its HBM upload."""
        from gloc3d_tpu.ops.gather import row_gather

        return self._match_topk_impl(
            q_image, q_origin, _unpack_bits(row_gather(store, idx)),
            row_gather(store_origins, idx))

    def _ensure_kf_capacity(self, n_needed: int, s: int) -> None:
        if self._kf_store is None:
            cap = 1024
            while cap < n_needed:
                cap *= 2
            self._kf_store = jnp.zeros((cap, s, s // 8), jnp.uint8)
            self._kf_origins = jnp.zeros((cap, 2), jnp.float32)
            self._kf_cap = cap
        while self._kf_cap < n_needed:
            self._kf_cap *= 2
            self._kf_store = jnp.zeros(
                (self._kf_cap,) + self._kf_store.shape[1:], jnp.uint8
            ).at[: self._kf_store.shape[0]].set(self._kf_store)
            self._kf_origins = jnp.zeros(
                (self._kf_cap, 2), jnp.float32
            ).at[: self._kf_origins.shape[0]].set(self._kf_origins)

    def _store_keyframes(self, images, origins, offset: int) -> None:
        """Append a batch of BEV images to the device store at ``offset``
        (bit-packed inside one jit; sharded DP-extraction outputs are
        gathered to one device first, as in locate_batch)."""
        if (isinstance(images, jax.Array)
                and len(images.sharding.device_set) > 1):
            one_dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            images = jax.device_put(images, one_dev)
            origins = jax.device_put(origins, one_dev)
        self._ensure_kf_capacity(offset + images.shape[0], images.shape[-1])
        self._kf_store, self._kf_origins = self._kf_add(
            self._kf_store, self._kf_origins, jnp.asarray(images),
            jnp.asarray(origins, jnp.float32), jnp.int32(offset),
        )
        if self._kf_sharding is not None:  # keep post-shard adds sharded
            self._kf_store = jax.device_put(self._kf_store,
                                            self._kf_sharding)
            self._kf_origins = jax.device_put(self._kf_origins,
                                              self._kf_org_sharding)

    def _fused_tail(self, desc, q_image, q_origin, bank, size, store,
                    store_origins):
        """In-jit bank search + staged store-gather registration (the tail
        shared by both locate_fused variants). ``staged_first`` becomes a
        ``lax.cond``: the top candidate registers alone, and the full-K
        branch executes ON DEVICE only when it fails — first-success-wins
        (global_localization.cpp:511-524) without a host round trip."""
        from gloc3d_tpu.index.ivf import _ivf_query, _ivf_query_int8
        from gloc3d_tpu.ops.topk import l2_topk, l2_topk_int8

        k = self.cfg.index.top_k
        if isinstance(bank, tuple) and len(bank) == 5:
            # IVF backend: (centroids, cells, bsq, scales|None, ids)
            cents, cells, bsq, scales, ids = bank
            nprobe = min(self.cfg.index.ivf_nprobe, cells.shape[0])
            if scales is not None:
                d2, idx = _ivf_query_int8(cents, cells, scales, bsq, ids,
                                          desc, k, nprobe)
            else:
                d2, idx = _ivf_query(cents, cells, bsq, ids, desc, k, nprobe)
        elif isinstance(bank, tuple):          # int8: (codes, scales, bsq)
            codes, scales, bsq = bank
            valid = jnp.arange(codes.shape[0]) < size
            d2, idx = l2_topk_int8(desc, codes, scales, bsq, k, valid)
        else:
            valid = jnp.arange(bank.shape[0]) < size
            d2, idx = l2_topk(desc, bank, k, valid)
        idx0 = jnp.clip(idx[0], 0, jnp.maximum(size - 1, 0)).astype(jnp.int32)

        def full(_):
            return self._match_topk_store_impl(
                q_image, q_origin, idx0, store, store_origins)

        if not self.cfg.match.staged_first:
            return d2, idx, full(None)

        res1 = self._match_topk_store_impl(
            q_image, q_origin, idx0[:1], store, store_origins)

        def keep(_):
            def pad(x):
                return jnp.concatenate(
                    [x, jnp.zeros((k - 1,) + x.shape[1:], x.dtype)])
            return MatchResult(
                xy_yaw=pad(res1.xy_yaw), score=pad(res1.score),
                overlap=pad(res1.overlap),
                success=jnp.concatenate(
                    [res1.success, jnp.zeros((k - 1,), bool)]),
                scale=pad(res1.scale), ratio=pad(res1.ratio),
            )

        res = jax.lax.cond(res1.success[0], keep, full, None)
        return d2, idx, res

    def _locate_fused_impl(self, params, points, mask, key, bank, size,
                           store, store_origins):
        """ONE device program for a full located query (all-device
        extraction): scan → descriptor → top-k bank search → candidate
        gather from the HBM store → staged registration. The host only
        uploads the scan and fetches the small result tuple."""
        desc, bev, ground = self._extract_impl(params, points, mask, key)
        d2, idx, res = self._fused_tail(
            desc, bev.image[0], bev.origin_xy[0], bank, size, store,
            store_origins)
        return d2, idx, res, ground

    def _locate_fused_sorted_impl(self, params, points, mask, ids, counts,
                                  centroids, starts, pp, q_image, q_origin,
                                  bank, size, store, store_origins):
        """Fused locate, host_stats serving variant: the native loader's
        stats/sort/BEV happen at IO time (before the device call — host
        PRE-work, not a mid-query round trip), then one device program runs
        descriptor → search → staged registration."""
        desc = self._extract_sorted_impl(params, points, mask, ids, counts,
                                         centroids, starts, pp)
        d2, idx, res = self._fused_tail(desc, q_image, q_origin, bank, size,
                                        store, store_origins)
        return d2, idx, res

    def _locate_fused_images_impl(self, params, images, origins, bank, size,
                                  store, store_origins):
        """Fused locate, i2i variant: CNN forward on the (1, S, S, 3) BEV
        probability image + the shared search/gather/registration tail."""
        desc, bev, _ = self._extract_images_impl(params, images, origins)
        return self._fused_tail(desc, bev.image[0], bev.origin_xy[0], bank,
                                size, store, store_origins)

    def _refine_icp_impl(self, q_cloud, q_valid, db_cloud, db_valid, xy_yaw):
        """3-D ICP polish of an accepted match (the reference's optional
        pcl::IterativeClosestPoint step, global_registration.cpp:1388-1398):
        downsampled scan clouds in their BEV frames, seeded by the dense
        match; the refined transform is projected back to (x, y, yaw)."""
        from gloc3d_tpu.core.transforms import quat_from_rpy, quat_to_matrix
        from gloc3d_tpu.ops.refine import icp_point_to_point

        m = self.cfg.match
        z = jnp.zeros(())
        init = Rigid3(
            quat_from_rpy(z, z, xy_yaw[2]),
            jnp.array([xy_yaw[0], xy_yaw[1], 0.0]),
        )
        res = icp_point_to_point(
            q_cloud, q_valid, db_cloud, db_valid, init,
            iterations=m.refine_icp_iters,
            max_corr_dist=m.refine_icp_max_corr,
        )
        r = quat_to_matrix(res.transform.rotation)
        yaw = jnp.arctan2(r[1, 0], r[0, 0])
        return jnp.array([
            res.transform.translation[0], res.transform.translation[1], yaw,
        ])

    def _downsample_cloud(self, points: np.ndarray, mask: np.ndarray
                          ) -> Tuple[np.ndarray, np.ndarray]:
        """Uniform-stride subsample of the valid points to the ICP budget."""
        budget = self.cfg.match.refine_icp_points
        pts = np.asarray(points)[..., :3]
        valid_idx = np.nonzero(np.asarray(mask) > 0)[0]
        take = valid_idx[
            np.linspace(0, len(valid_idx) - 1,
                        min(budget, max(len(valid_idx), 1))).astype(int)
        ] if len(valid_idx) else np.zeros(0, int)
        out = np.zeros((budget, 3), np.float32)
        out[: len(take)] = pts[take]
        v = np.zeros(budget, np.float32)
        v[: len(take)] = 1.0
        return out, v

    def _query_clouds(self, points, masks, ground):
        """Downsampled query clouds (in the BEV frame) for the ICP polish;
        None when refinement is off or inputs are images."""
        if (not self.cfg.match.refine_icp or masks is None
                or np.ndim(points) != 3):
            return None
        clouds, valids = [], []
        for q in range(points.shape[0]):
            xyz, v = self._downsample_cloud(points[q], masks[q])
            if self.align_ground and ground is not None:
                xyz = np.asarray(transform_points(
                    Rigid3(ground.transform.rotation[q],
                           ground.transform.translation[q]),
                    jnp.asarray(xyz),
                ))
            clouds.append(xyz)
            valids.append(v)
        return np.stack(clouds), np.stack(valids)

    def _maybe_refine(self, q_cloud, q_valid, db_idx: int, xy_yaw):
        if not self.cfg.match.refine_icp or q_cloud is None:
            return xy_yaw
        kf = self.keyframes[db_idx]
        if kf.cloud is None:
            return xy_yaw
        return self._refine_icp(
            jnp.asarray(q_cloud), jnp.asarray(q_valid),
            jnp.asarray(kf.cloud[:, :3]), jnp.asarray(kf.cloud[:, 3]),
            jnp.asarray(xy_yaw),
        )

    # ------------------------------------------------------------ query
    def detect(self, points: np.ndarray, mask: Optional[np.ndarray] = None,
               origins: Optional[np.ndarray] = None):
        """Top-k place candidates for a batch of query scans or images."""
        desc, bev, ground = self.extract(points, mask, origins)
        d2, idx = self.bank.query(desc, k=self.cfg.index.top_k)
        return d2, idx, bev, ground

    def shard_bank(self, mesh) -> None:
        """Migrate the descriptor bank onto a device mesh (database-dimension
        sharding). Flat backend: rows shard, queries run local-topk per chip
        + an all_gather merge. IVF backend: centroids replicate, cells shard
        (index/ivf.py::ShardedIVF) — map-scale and multi-chip compose.
        Call after the db build; results are identical either way."""
        from gloc3d_tpu.parallel.sharding import ShardedBank

        if isinstance(self.bank, _IVFBankAdapter):
            self.bank.shard(mesh)
            return
        if not isinstance(self.bank, DescriptorBank):
            raise TypeError(
                "shard_bank migrates a flat DescriptorBank or an IVF "
                f"backend; current backend is {type(self.bank).__name__}"
            )
        n_dev = mesh.devices.size
        cap = max(self.bank._capacity, n_dev)
        sharded = ShardedBank(mesh, dim=self.bank.dim, capacity=cap,
                              quantize=self.cfg.index.quantize)
        if len(self.bank):
            sharded.add(np.asarray(self.bank.data))

        self.bank = _ShardedBankAdapter(sharded, self.cfg.index)

    def shard_keyframes(self, mesh, axis: str = "data") -> None:
        """Distribute the HBM keyframe store over a device mesh on the
        keyframe axis (requires ``device_keyframes=True``).

        City-scale maps exceed one chip's HBM (72 KB/keyframe at 768²: 1M
        keyframes ≈ 72 GB); sharding the bit-packed store puts 1/N of the
        map on each chip and the match jit's by-index gather crosses the
        mesh via XLA's SPMD partitioner (ICI moves only the K gathered
        bitmaps, ~1.4 MB for K=20). Results are identical to the
        single-device store (tests/test_device_keyframes.py)."""
        from jax.sharding import NamedSharding, PartitionSpec

        if not self.device_keyframes or self._kf_store is None:
            raise RuntimeError(
                "shard_keyframes requires device_keyframes=True and a "
                "built store")
        n_dev = mesh.devices.size
        if self._kf_cap % n_dev:
            self._ensure_kf_capacity(
                -(-self._kf_cap // n_dev) * n_dev, self._kf_store.shape[1])
        self._kf_sharding = NamedSharding(mesh, PartitionSpec(axis, None,
                                                              None))
        self._kf_org_sharding = NamedSharding(mesh, PartitionSpec(axis,
                                                                  None))
        self._kf_store = jax.device_put(self._kf_store, self._kf_sharding)
        self._kf_origins = jax.device_put(self._kf_origins,
                                          self._kf_org_sharding)

    # ------------------------------------------------------------ persistence
    def save(self, out_dir: str) -> None:
        """Persist the built database: descriptor bank + keyframe grids +
        ground alignments (the serialized index format, SURVEY.md §5 —
        replaces the reference's TorchScript/valset-txt hand-off)."""
        os.makedirs(out_dir, exist_ok=True)
        self.bank.save(os.path.join(out_dir, "bank.npz"))
        has_ground = any(k.ground is not None for k in self.keyframes)
        if self.host_mirror:
            images = np.stack([k.image for k in self.keyframes])
            origins = np.stack([k.origin_xy for k in self.keyframes])
        else:
            # reconstruct from the HBM store: binarized at the matcher's own
            # <0.5 threshold (the only consumer of the saved images), 0/255.
            # Chunked: one unpack of a 100k-row store would materialize an
            # (n, S, S) float image stack far beyond HBM (the scale this
            # mode exists for); 256 rows ≈ 150 MB per chunk at 768².
            n = len(self.keyframes)
            s = self._kf_store.shape[1]
            images = np.empty((n, s, s), np.uint8)
            for i in range(0, n, 256):
                chunk = _unpack_bits(self._kf_store[i : i + 256])
                images[i : i + 256] = (
                    np.asarray(chunk) * 255.0).astype(np.uint8)[: n - i]
            origins = np.asarray(self._kf_origins[:n])
        kw = dict(images=images, origins=origins)
        if has_ground:
            kw["ground_q"] = np.stack(
                [np.asarray(k.ground.rotation) for k in self.keyframes]
            )
            kw["ground_t"] = np.stack(
                [np.asarray(k.ground.translation) for k in self.keyframes]
            )
        if all(k.cloud is not None for k in self.keyframes):
            kw["clouds"] = np.stack([k.cloud for k in self.keyframes])
        np.savez(os.path.join(out_dir, "keyframes.npz"), **kw)
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            f.write(self.cfg.to_json())

    def load(self, out_dir: str) -> None:
        """Restore a database written by save()."""
        from gloc3d_tpu.index.bank import DescriptorBank

        if self.cfg.index.backend == "ivf":
            self.bank = _IVFBankAdapter.load(
                os.path.join(out_dir, "bank.npz"), self.cfg.index
            )
        else:
            self.bank = DescriptorBank.load(os.path.join(out_dir, "bank.npz"))
        kf = np.load(os.path.join(out_dir, "keyframes.npz"))
        has_ground = "ground_q" in kf
        has_clouds = "clouds" in kf
        self.keyframes = [
            Keyframe(
                kf["images"][i] if self.host_mirror else None,
                kf["origins"][i],
                Rigid3(kf["ground_q"][i], kf["ground_t"][i])
                if has_ground else None,
                kf["clouds"][i] if has_clouds else None,
            )
            for i in range(kf["images"].shape[0])
        ]
        if self.device_keyframes:
            # repack the loaded grids into the HBM store (batched)
            n = kf["images"].shape[0]
            for i in range(0, n, 256):
                chunk = kf["images"][i : i + 256].astype(np.float32) / 255.0
                self._store_keyframes(
                    jnp.asarray(chunk), jnp.asarray(kf["origins"][i : i + 256]),
                    offset=i)

    def locate_batch(self, points: np.ndarray,
                     masks: Optional[np.ndarray] = None,
                     origins: Optional[np.ndarray] = None,
                     ) -> List[LocalizationResult]:
        """Localize a batch of query scans (or BEV images, i2i) with one
        device round trip per stage (extraction, search, and all B×top_k
        registrations in one jit).

        On the axon relay each host↔device synchronization costs ~2 s, so
        the per-query ``locate`` loop is dominated by round trips; batching
        amortizes them across B queries.
        """
        if not self.keyframes:
            return [self._empty_result() for _ in range(points.shape[0])]
        d2, idx, bev, ground = self.detect(points, masks, origins)
        q_clouds = self._query_clouds(points, masks, ground)
        b = points.shape[0]
        k = idx.shape[1]
        idx = np.clip(idx, 0, len(self.keyframes) - 1)
        use_store = self.device_keyframes and self._kf_store is not None
        if use_store:
            idx_d = jnp.asarray(idx.astype(np.int32))      # (B, k)
            if not hasattr(self, "_match_topk_batch_store"):
                self._match_topk_batch_store = jax.jit(jax.vmap(
                    self._match_topk_store_impl,
                    in_axes=(0, 0, 0, None, None)))
        else:
            stacks = np.stack(
                [[self.keyframes[i].image for i in idx[q]] for q in range(b)]
            ).astype(np.float32) / 255.0                  # (B, k, S, S)
            origins = np.stack(
                [[self.keyframes[i].origin_xy for i in idx[q]]
                 for q in range(b)]
            )
        if not hasattr(self, "_match_topk_batch"):
            self._match_topk_batch = jax.jit(
                jax.vmap(self._match_topk_impl, in_axes=(0, 0, 0, 0))
            )
        # DP-extracted batches arrive sharded over the mesh; the matcher
        # runs on one device (candidate stacks ship from the host anyway,
        # and XLA:CPU's partitioned FFT rejects sharded layouts) — gather
        # the query images once here. No-op for unsharded inputs.
        if (isinstance(bev.image, jax.Array)
                and len(bev.image.sharding.device_set) > 1):
            one_dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            bev = bev._replace(
                image=jax.device_put(bev.image, one_dev),
                origin_xy=jax.device_put(bev.origin_xy, one_dev),
            )
        if self.cfg.match.staged_first:
            # stage 1: every query's TOP candidate in one (B, 1) batch —
            # first-success-wins means stage 2 (full top_k) only runs for
            # queries whose top candidate failed, and only for THOSE queries:
            # the failed rows are gathered into a bucket-padded batch (next
            # power of two, so jit programs stay bounded at log2(B) shapes)
            # and the results spliced back. Queries whose top candidate
            # succeeded keep the staged result — first-success-wins reads
            # only their k=0 lane, so the splice is result-identical to the
            # unstaged full batch (tests/test_locate_batch.py).
            if use_store:
                res1: MatchResult = self._match_topk_batch_store(
                    bev.image, bev.origin_xy, idx_d[:, :1],
                    self._kf_store, self._kf_origins,
                )
            else:
                res1 = self._match_topk_batch(
                    bev.image, bev.origin_xy, jnp.asarray(stacks[:, :1]),
                    jnp.asarray(origins[:, :1]),
                )
            succ1 = np.asarray(res1.success)[:, 0]
            if succ1.all():
                res = res1
            else:
                failed = np.nonzero(~succ1)[0]
                nb = 1 << (len(failed) - 1).bit_length()  # bucket size
                rows = np.concatenate(
                    [failed, np.full(nb - len(failed), failed[0], np.int64)]
                )
                if use_store:
                    res2: MatchResult = self._match_topk_batch_store(
                        bev.image[jnp.asarray(rows)],
                        bev.origin_xy[jnp.asarray(rows)],
                        idx_d[jnp.asarray(rows)],
                        self._kf_store, self._kf_origins,
                    )
                else:
                    res2 = self._match_topk_batch(
                        bev.image[jnp.asarray(rows)],
                        bev.origin_xy[jnp.asarray(rows)],
                        jnp.asarray(stacks[rows]), jnp.asarray(origins[rows]),
                    )
                res = _splice_staged(res1, res2, failed, b, k)
        elif use_store:
            res = self._match_topk_batch_store(
                bev.image, bev.origin_xy, idx_d,
                self._kf_store, self._kf_origins,
            )
        else:
            res = self._match_topk_batch(
                bev.image, bev.origin_xy, jnp.asarray(stacks),
                jnp.asarray(origins),
            )
        succ = np.asarray(res.success)
        xy_yaws = np.asarray(res.xy_yaw)
        scores = np.asarray(res.score)
        out = []
        for q in range(b):
            if not succ[q].any():
                out.append(LocalizationResult(
                    False, -1, None, idx[q], d2[q], float(scores[q].max()),
                    None,
                ))
                continue
            k_star = int(np.argmax(succ[q]))
            db_idx = int(idx[q, k_star])
            xy_yaw = jnp.asarray(xy_yaws[q, k_star])
            if q_clouds is not None:
                xy_yaw = self._maybe_refine(
                    q_clouds[0][q], q_clouds[1][q], db_idx, xy_yaw
                )
            t_q = t_db = None
            if self.align_ground and ground is not None:
                t_q = Rigid3(ground.transform.rotation[q],
                             ground.transform.translation[q])
                t_db = self._db_ground(db_idx)
            pose = compose_6dof(xy_yaw, t_q, t_db)
            out.append(LocalizationResult(
                True, db_idx,
                Rigid3(np.asarray(pose.rotation), np.asarray(pose.translation)),
                idx[q], d2[q], float(scores[q, k_star]), np.asarray(xy_yaw),
            ))
        return out

    def _empty_result(self) -> LocalizationResult:
        k = self.cfg.index.top_k
        return LocalizationResult(
            False, -1, None, np.full(k, -1), np.full(k, np.inf), 0.0, None,
        )

    def locate_fused(self, points: np.ndarray,
                     mask: Optional[np.ndarray] = None,
                     origin: Optional[np.ndarray] = None,
                     ) -> LocalizationResult:
        """Localize ONE query — scan (N, ≥3) or i2i image (S, S, 3) — in a
        single device call.

        The classic :meth:`locate` makes two device calls with a host
        synchronization between them (detect → fetch candidates → match);
        through a dispatch layer each synchronization costs real latency.
        This runs extraction, bank search, candidate gather from the HBM
        keyframe store, and staged registration in ONE jit — the host
        uploads the scan (plus, in host_stats mode, the IO-time stats/BEV)
        and fetches one small result tuple. Results are identical to
        ``locate`` (tests/test_locate_fused.py).

        Requires ``device_keyframes=True`` and the flat ``DescriptorBank``
        (fp32 or int8-quantized) or the IVF backend (map-scale city
        serving: IVF routing + int8 cells + HBM keyframe store + staged
        registration, one device program); ``match.refine_icp`` is not
        supported (the ICP polish needs stored clouds — use ``locate``).
        """
        if not self.keyframes:
            return self._empty_result()
        if not (self.device_keyframes and self._kf_store is not None):
            raise RuntimeError("locate_fused requires device_keyframes=True"
                               " and a built store")
        if not isinstance(self.bank, (DescriptorBank, _IVFBankAdapter)):
            raise RuntimeError("locate_fused requires the flat "
                               "DescriptorBank or the IVF backend")
        if self.cfg.match.refine_icp:
            raise RuntimeError("locate_fused does not compose with "
                               "match.refine_icp (use locate)")
        if isinstance(self.bank, _IVFBankAdapter):
            self.bank._flush()
            ivf = self.bank._ivf
            cells_d, bsq_d, scales_d, ids_d = ivf._device_arrays()
            bank = (ivf.centroids, cells_d, bsq_d, scales_d, ids_d)
        elif self.bank._quantized:
            bank = (self.bank._bank, self.bank._scales, self.bank._bsq)
        else:
            bank = self.bank._bank
        size = jnp.int32(len(self.bank))
        ground = None
        if np.ndim(points) == 3:
            # i2i image query (S, S, 3): CNN forward + search + store
            # gather + staged registration in the same one program
            org = (jnp.asarray(np.asarray(origin, np.float32)[None])
                   if origin is not None
                   else jnp.asarray(self._default_origins(1)))
            d2, idx, res = self._locate_fused_images(
                self.params, jnp.asarray(points[None]), org, bank, size,
                self._kf_store, self._kf_origins)
        elif self.host_stats:
            from gloc3d_tpu.data.native import (
                compute_bev_host, compute_voxel_stats_host_sorted,
            )

            vc = self.cfg.voxel
            pts = np.asarray(points, np.float32)[None]
            counts = np.asarray([np.asarray(mask).sum()], np.int64)
            if pts.shape[-1] < 4:
                pad = np.zeros(pts.shape[:-1] + (4 - pts.shape[-1],),
                               np.float32)
                pts = np.concatenate([pts, pad], axis=-1)
            if self.align_ground:
                # alignment is a separate device program (same as extract())
                self._key, sub = jax.random.split(self._key)
                aligned, ground = self._align(
                    jnp.asarray(pts), jnp.asarray(mask[None]), sub)
                pts = np.asarray(aligned)
            s_p, s_v, s_i, s_c, s_g, s_s, s_pp = (
                compute_voxel_stats_host_sorted(
                    pts, counts, vc.xbound, vc.ybound, vc.zbound, crop=False,
                    per_point=True))
            imgs, origins, _ = compute_bev_host(pts, counts, self.cfg.bev)
            d2, idx, res = self._locate_fused_sorted(
                self.params, jnp.asarray(s_p), jnp.asarray(s_v),
                jnp.asarray(s_i), jnp.asarray(s_c), jnp.asarray(s_g),
                jnp.asarray(s_s), jnp.asarray(s_pp), jnp.asarray(imgs[0]),
                jnp.asarray(origins[0]), bank, size,
                self._kf_store, self._kf_origins)
        else:
            self._key, sub = jax.random.split(self._key)
            d2, idx, res, ground = self._locate_fused(
                self.params, jnp.asarray(points[None]),
                jnp.asarray(mask[None]) if mask is not None else None, sub,
                bank, size, self._kf_store, self._kf_origins)
        d2 = np.asarray(d2)
        idx0 = np.clip(np.asarray(idx)[0], 0, len(self.keyframes) - 1)
        succ = np.asarray(res.success)
        if not succ.any():
            return LocalizationResult(
                False, -1, None, idx0, d2[0],
                float(np.asarray(res.score).max()), None)
        k_star = int(np.argmax(succ))
        db_idx = int(idx0[k_star])
        xy_yaw = jnp.asarray(np.asarray(res.xy_yaw)[k_star])
        t_q = t_db = None
        if self.align_ground and ground is not None:
            t_q = Rigid3(ground.transform.rotation[0],
                         ground.transform.translation[0])
            t_db = self._db_ground(db_idx)
        pose = compose_6dof(xy_yaw, t_q, t_db)
        return LocalizationResult(
            True, db_idx,
            Rigid3(np.asarray(pose.rotation), np.asarray(pose.translation)),
            idx0, d2[0], float(np.asarray(res.score)[k_star]),
            np.asarray(xy_yaw),
        )

    def _db_ground(self, db_idx: int) -> Optional[Rigid3]:
        """The db keyframe's ground transform for 6-DoF composition, or
        None when that keyframe was ingested without a ground estimate
        (align_ground off at ingest time): its BEV is in the raw lidar
        frame, and ``compose_6dof`` treats None as identity — assumed
        already level rather than crashing on a mixed-mode map."""
        g = self.keyframes[db_idx].ground
        if g is None:
            return None
        return Rigid3(jnp.asarray(g.rotation), jnp.asarray(g.translation))

    def match_keyframe(self, points: Optional[np.ndarray] = None,
                       mask: Optional[np.ndarray] = None,
                       origin: Optional[np.ndarray] = None,
                       db_index: int = 0, *, bev=None,
                       ground=None) -> LocalizationResult:
        """Register ONE query scan/image against a CHOSEN db keyframe.

        The reference's ``loop_detector_.match(query, db_idx)``
        (loop_detector.cpp:183-288): the SLAM loop-closure step after
        ``bank.detect_loop()`` names a candidate, and the building block for
        external candidate selection. Same matcher, refinement, and 6-DoF
        composition as locate(), without the bank search.

        Pass ``bev``/``ground`` from a prior :meth:`extract` of the SAME
        query to skip the redundant model forward — the SLAM loop extracts
        once for the descriptor proposal and then verifies up to top-k
        candidates against that one extraction.
        """
        if not 0 <= db_index < len(self.keyframes):
            raise IndexError(
                f"db_index {db_index} outside [0, {len(self.keyframes)})")
        if bev is None:
            if points is None:
                raise ValueError("match_keyframe needs points or bev=")
            _, bev, ground = self.extract(
                points[None], mask[None] if mask is not None else None,
                origin[None] if origin is not None else None,
            )
        use_store = self.device_keyframes and self._kf_store is not None
        if use_store:
            res = self._match_topk_store(
                bev.image[0], bev.origin_xy[0],
                jnp.asarray([db_index], jnp.int32),
                self._kf_store, self._kf_origins)
        else:
            kf = self.keyframes[db_index]
            res = self._match_topk(
                bev.image[0], bev.origin_xy[0],
                jnp.asarray(kf.image.astype(np.float32)[None] / 255.0),
                jnp.asarray(kf.origin_xy[None]),
            )
        cand = np.array([db_index])
        dists = np.array([np.nan])
        if not bool(np.asarray(res.success)[0]):
            return LocalizationResult(
                False, -1, None, cand, dists,
                float(np.asarray(res.score)[0]), None)
        xy_yaw = jnp.asarray(np.asarray(res.xy_yaw)[0])
        q_clouds = (self._query_clouds(
            points[None], mask[None] if mask is not None else None, ground)
            if points is not None else None)  # ICP polish needs the scan
        if q_clouds is not None:
            xy_yaw = self._maybe_refine(
                q_clouds[0][0], q_clouds[1][0], db_index, xy_yaw)
        t_q = t_db = None
        if self.align_ground and ground is not None:
            t_q = Rigid3(ground.transform.rotation[0],
                         ground.transform.translation[0])
            t_db = self._db_ground(db_index)
        pose = compose_6dof(xy_yaw, t_q, t_db)
        return LocalizationResult(
            True, db_index,
            Rigid3(np.asarray(pose.rotation), np.asarray(pose.translation)),
            cand, dists, float(np.asarray(res.score)[0]),
            np.asarray(xy_yaw),
        )

    def locate(self, points: np.ndarray, mask: Optional[np.ndarray] = None,
               origin: Optional[np.ndarray] = None) -> LocalizationResult:
        """Full pipeline for ONE query: scan (N, ≥3) or image (S, S, 3)."""
        if not self.keyframes:
            return self._empty_result()
        d2, idx, bev, ground = self.detect(
            points[None], mask[None] if mask is not None else None,
            origin[None] if origin is not None else None,
        )
        idx0 = idx[0]
        # a db smaller than top_k returns inf-distance filler candidates
        # pointing at unwritten slots — clamp them to a real keyframe (their
        # inf distance keeps them ranked last; matching a duplicate is
        # harmless and shapes stay static)
        idx0 = np.clip(idx0, 0, len(self.keyframes) - 1)
        use_store = self.device_keyframes and self._kf_store is not None
        if use_store:
            idx_d = jnp.asarray(idx0.astype(np.int32))

            def run(rows):
                return self._match_topk_store(
                    bev.image[0], bev.origin_xy[0], rows,
                    self._kf_store, self._kf_origins)
        else:
            stack = np.stack(
                [self.keyframes[i].image for i in idx0]
            ).astype(np.float32) / 255.0
            origins = np.stack([self.keyframes[i].origin_xy for i in idx0])

            def run(rows):
                return self._match_topk(
                    bev.image[0], bev.origin_xy[0],
                    jnp.asarray(stack[: len(rows)]),
                    jnp.asarray(origins[: len(rows)]),
                )
        res = None
        if self.cfg.match.staged_first:
            # first-success-wins (global_localization.cpp:511-524): the top
            # candidate succeeds in the common case, so register it ALONE
            # first (1/top_k the matcher work) and only fall back to the
            # batched top-k registration when it fails. Results are
            # identical either way — the scan order is preserved.
            res1: MatchResult = run(idx_d[:1] if use_store else idx0[:1])
            if bool(np.asarray(res1.success)[0]):
                res = res1
        if res is None:
            res = run(idx_d if use_store else idx0)
        succ = np.asarray(res.success)
        if not succ.any():
            return LocalizationResult(
                False, -1, None, idx0, d2[0], float(np.asarray(res.score).max()),
                None,
            )
        k_star = int(np.argmax(succ))  # first success in candidate order
        db_idx = int(idx0[k_star])
        xy_yaw = jnp.asarray(np.asarray(res.xy_yaw)[k_star])
        q_clouds = self._query_clouds(
            points[None], mask[None] if mask is not None else None, ground
        )
        if q_clouds is not None:
            xy_yaw = self._maybe_refine(
                q_clouds[0][0], q_clouds[1][0], db_idx, xy_yaw
            )

        t_q = t_db = None
        if self.align_ground and ground is not None:
            t_q = Rigid3(ground.transform.rotation[0],
                         ground.transform.translation[0])
            t_db = self._db_ground(db_idx)
        pose = compose_6dof(xy_yaw, t_q, t_db)
        return LocalizationResult(
            True, db_idx,
            Rigid3(np.asarray(pose.rotation), np.asarray(pose.translation)),
            idx0, d2[0],
            float(np.asarray(res.score)[k_star]),
            np.asarray(xy_yaw),
        )
