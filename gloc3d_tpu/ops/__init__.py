from gloc3d_tpu.ops.voxelize import points_to_voxels, pad_or_trim  # noqa: F401
from gloc3d_tpu.ops.bev import scan_to_bev, BEVImage  # noqa: F401
