from .batcher import ContinuousBatcher  # noqa: F401
from .monitor import DeviceMonitor, DeviceStatus  # noqa: F401
from .rpc import AnakinService, RpcClient, serve  # noqa: F401
