from gloc3d_tpu.train.mining import mine_triplets  # noqa: F401
from gloc3d_tpu.train.trainer import Trainer, TrainState  # noqa: F401
from gloc3d_tpu.train.cluster import init_vlad_from_data  # noqa: F401
