"""Spatial partitioning (SP): one image's forward computed by ALL chips.

Bank sharding (sharding.py) and DP extraction scale the database and batch
axes, but neither shrinks the latency of a single forward — the model is
replicated, so a B=1 query pays the full conv stack on one chip (bench.py
states this explicitly). Spatial partitioning closes that gap for the image
(i2i) path: the (B, H, W, C) activation is sharded on its HEIGHT axis over
the mesh, every conv runs on an H/n_devices slab, and XLA's SPMD partitioner
inserts the halo exchanges (collective-permute of the 1-row borders that a
3×3 kernel needs) and the psum for NetVLAD's spatial reductions
automatically. Per-device conv FLOPs drop n×; the collectives move
O(W·C) rows per conv over ICI — negligible against the conv compute.

This is the "let XLA insert the collectives" recipe: the program is the
ordinary model.apply, the parallelism is entirely in the in_shardings
annotation. No model change, no manual ppermute.

The s2s (PointPillar) path is NOT spatially sharded here: its conv stack is
tiny (≈0.4 ms of a 1.9 ms query at the 80×140 pillar grid) and its cost is
row/bandwidth-bound binning, which shards on the batch axis instead (DP).

New capability relative to the reference (SURVEY §2.3: the reference's only
parallelism is single-process nn.DataParallel).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def spatial_sharded_apply(
    mesh: Mesh,
    model,
    axis: str = "data",
    donate: bool = False,
):
    """Jitted ``fn(params, images) -> descriptors`` with images sharded on H.

    params replicate; images (B, H, W, C) shard as P(None, axis, None, None);
    the descriptor output is replicated (every chip holds the result after
    the final psum). H must be divisible by the mesh size at every pooling
    level (768 over 8 chips → 96-row slabs → 12 rows entering conv5: fine).
    """
    repl = NamedSharding(mesh, P())
    img = NamedSharding(mesh, P(None, axis, None, None))

    def fn(params, images):
        return model.apply(params, images)

    return jax.jit(fn, in_shardings=(repl, img), out_shardings=repl,
                   donate_argnums=(1,) if donate else ())


def check_divisible(image_size: int, n_devices: int, n_pools: int = 4) -> None:
    """Raise unless every pooled resolution still splits evenly over the mesh
    (uneven slabs force XLA into padded halos with wasted lanes)."""
    h = image_size
    for _ in range(n_pools + 1):
        if h % n_devices != 0:
            raise ValueError(
                f"image height {image_size} does not tile {n_devices} devices "
                f"at every pooling level (failed at {h} rows)"
            )
        h //= 2
