from gloc3d_tpu.index.bank import DescriptorBank  # noqa: F401
from gloc3d_tpu.index.kmeans import kmeans  # noqa: F401
from gloc3d_tpu.index.ivf import IVFBank  # noqa: F401
