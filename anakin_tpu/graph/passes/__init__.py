"""Pass driver.

`optimize(graph)` is the counterpart of the reference's `Graph::Optimize`
(`framework/graph/graph.cpp:350-470`) which ran: fusion pattern matching →
exec-order scheduler → conv-eltwise scheduler → lane scheduler → memory
scheduler.  Here the TPU pipeline is:

  1. remove_identity_nodes    (split/dropout aliases)
  2. fold_batch_norms         (weight folding, parameter_fusion.h math)
  3. fuse_activations         (conv/dense/eltwise + act epilogues)
  4. fuse_conv_eltwise        (ResNet residual into conv epilogue)
  5. stem_space_to_depth      (7x7s2 RGB stem -> s2d + 4x4s1, bf16-pinned)
  6. eliminate_dead_nodes

Exec-order, lane and memory scheduling have no runtime role under XLA
(whole-graph compile owns scheduling and buffer reuse); the arena planner in
`memory.py` exists for the serving-side host arena and for parity reporting.
"""

from __future__ import annotations

from ..ir import Graph
from .cleanup import eliminate_dead_nodes, remove_identity_nodes
from .fold import fold_batch_norms
from .combine import horizontal_combine
from .fusion import fuse_activations, fuse_conv_eltwise
from .stem import stem_space_to_depth
from .strideup import stride_up

__all__ = [
    "optimize",
    "horizontal_combine",
    "remove_identity_nodes",
    "fold_batch_norms",
    "fuse_activations",
    "fuse_conv_eltwise",
    "stem_space_to_depth",
    "stride_up",
    "eliminate_dead_nodes",
]

_DEFAULT_PIPELINE = (
    remove_identity_nodes,
    fold_batch_norms,
    fuse_activations,
    fuse_conv_eltwise,
    stem_space_to_depth,
    eliminate_dead_nodes,
)


def optimize(graph: Graph, pipeline=None, autotune: bool = False,
             tuner_cache: str = None) -> Graph:
    """Run the optimization pipeline; `autotune=True` additionally times
    implementation candidates per eligible node on the ACTIVE backend
    (reference `pick_best` analog) — run it on the deployment TPU, with
    `tuner_cache` pointing at a JSON file so decisions persist."""
    g = graph
    for p in pipeline or _DEFAULT_PIPELINE:
        g = p(g)
    if autotune:
        from ...kernels.autotune import AutoTuner, autotune_graph

        g = autotune_graph(g, AutoTuner(tuner_cache))
    g.validate()
    return g
