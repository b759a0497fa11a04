from .ir import Graph, GraphBuilder, Node, topological_order  # noqa: F401
from .shape_infer import infer_shapes  # noqa: F401
