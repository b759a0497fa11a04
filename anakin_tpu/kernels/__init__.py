from .autotune import AutoTuner, autotune_graph  # noqa: F401
from .matmul_int8 import matmul_int8  # noqa: F401
