from .resnet import build_resnet, build_resnet50, build_resnet101  # noqa: F401
from .vgg import build_vgg16  # noqa: F401
from .mobilenet import build_mobilenet_v1, build_mobilenet_v2  # noqa: F401
