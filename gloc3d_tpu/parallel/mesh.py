"""Device-mesh construction.

New capability relative to the reference (SURVEY.md §2.3: the reference is
single-process, single-GPU nn.DataParallel only). One 1-D mesh axis covers
both uses: data parallelism for training/extraction, and bank sharding (the
database dimension) for queries. On multi-host TPU pods, call
``jax.distributed.initialize()`` before ``make_mesh`` and the same code runs
over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

from gloc3d_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    cfg = cfg or MeshConfig()
    if devices is None:
        devices = jax.devices()
        if cfg.num_devices:
            devices = devices[: cfg.num_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (cfg.data_axis,))
