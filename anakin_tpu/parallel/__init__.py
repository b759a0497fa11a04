from .mesh import DATA_AXIS, MODEL_AXIS, make_mesh, replicated  # noqa: F401
from .sharding import input_sharding, output_sharding, shard_graph_params  # noqa: F401
from .distributed import initialize, is_distributed, local_device_count  # noqa: F401
from .pipeline import PipelinedNet, split_graph  # noqa: F401
from .ring_attention import ring_attention  # noqa: F401
