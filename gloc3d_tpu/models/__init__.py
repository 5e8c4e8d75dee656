from gloc3d_tpu.models.netvlad import NetVLAD, GatingContext, init_netvlad_params  # noqa: F401
from gloc3d_tpu.models.pointpillar import PointPillar, PointNet, PillarBlock  # noqa: F401
from gloc3d_tpu.models.vgg import VGG16Encoder  # noqa: F401
from gloc3d_tpu.models.descriptor import DescriptorModel, build_model  # noqa: F401
from gloc3d_tpu.models import losses  # noqa: F401
