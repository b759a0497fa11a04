"""anakin_tpu — a TPU-native quantized inference engine.

Brand-new framework with the capabilities of the reference engine
(PaddlePaddle/Anakin, surveyed in SURVEY.md), designed for TPU:
a Python graph IR + rewriter compiling whole models via XLA/pjit, fused
Pallas int8 MXU kernels, KL-divergence calibration, GSPMD multi-chip
sharding, and an async serving runtime.
"""

__version__ = "0.1.0"

from .graph import Graph, GraphBuilder, Node, infer_shapes, topological_order  # noqa: F401
from .graph.passes import optimize  # noqa: F401
from .runtime.net import Net  # noqa: F401
