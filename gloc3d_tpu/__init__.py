"""gloc3d_tpu — a TPU-native (JAX/XLA/Pallas) LiDAR global-localization framework.

A from-scratch rebuild of the capabilities of GLoc3D ("Global Localization in
Large-scale Point Clouds via Roll-pitch-yaw Invariant Place Recognition and
Low-overlap Global Registration"), designed TPU-first:

- ``core``      SE(2)/SE(3) geometry as pure, vmappable JAX functions.
- ``ops``       the compute kernels: fused voxelize→BEV projection, ground-plane
                RANSAC, exhaustive rotation×translation BEV registration,
                tiled L2 top-k over HBM descriptor banks.
- ``models``    Flax models: PointPillar encoder, VGG16 encoder, NetVLAD /
                NetVLAD-FC pooling, metric-learning losses.
- ``index``     TPU-resident descriptor bank (build / serialize / query) and
                k-means for VLAD initialization.
- ``parallel``  device-mesh sharding: data-parallel training, bank sharding
                with cross-chip top-k merge.
- ``data``      KITTI / NCLT / nuScenes readers, split generation, batching.
- ``train``     triplet training with on-device hard-negative mining.
- ``eval``      recall@N, registration success metrics, latency harness.
- ``pipeline``  the end-to-end global-localization engine.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: first compiles through the axon
# remote-compile tunnel run ~100 s per model-scale jit; cached reruns are
# near-instant. Opt out with GLOC3D_COMPILE_CACHE="" (empty).
_cache_dir = _os.environ.get("GLOC3D_COMPILE_CACHE", "/tmp/gloc3d_jax_cache")
if _cache_dir and "cpu" in _os.environ.get("JAX_PLATFORMS", ""):
    # CPU runs (the forced-host test mesh) get their own cache: CPU AOT
    # entries are machine-feature-stamped, and mixing them with entries
    # written under other flag sets trips xla's cpu_aot_loader mismatch
    # path (warns about potential SIGILL)
    _cache_dir += "-cpu"
if _cache_dir:
    import jax as _jax

    # Stale-entry guard: a cached TPU executable is only valid for the
    # relay-server instance that compiled it — entries surviving from a
    # previous container "hit" but hang forever at execution. /tmp can
    # outlive the container, so drop any entry older than this container's
    # boot (the ctime of PID 1). Costs one re-compile pass per container
    # start; prevents an unkillable hang in bench/serving. CPU AOT entries
    # are not relay-bound and stay valid across containers — the "-cpu"
    # cache is exempt.
    if not _cache_dir.endswith("-cpu"):
        try:
            _boot = _os.stat("/proc/1").st_ctime
            with _os.scandir(_cache_dir) as _it:
                for _e in _it:
                    if _e.is_file() and _e.stat().st_mtime < _boot:
                        _os.unlink(_e.path)
        except OSError:
            pass

    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gloc3d_tpu.config import (  # noqa: F401
    BEVConfig,
    GroundConfig,
    IndexConfig,
    MatchConfig,
    MeshConfig,
    ModelConfig,
    PipelineConfig,
    TrainConfig,
    VoxelConfig,
)
