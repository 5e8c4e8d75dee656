from gloc3d_tpu.parallel.mesh import make_mesh  # noqa: F401
from gloc3d_tpu.parallel.sharding import (  # noqa: F401
    shard_batch,
    replicate,
    sharded_topk,
    ShardedBank,
)
from gloc3d_tpu.parallel.spatial import (  # noqa: F401
    spatial_sharded_apply,
)
