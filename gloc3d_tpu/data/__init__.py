from gloc3d_tpu.data.dataset import TripletDataset  # noqa: F401
