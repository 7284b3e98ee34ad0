from lsfa_tpu.models.resnet import ResNetBackbone  # noqa: F401
from lsfa_tpu.models.flownet import FlowNetS  # noqa: F401
from lsfa_tpu.models.lsfa import LSFA  # noqa: F401
from lsfa_tpu.models.rfcn import RFCN  # noqa: F401
