"""Shape/dtype inference over a Graph.

The reference implements `InferShape` per operator helper
(`framework/core/operator/operator.h:141`, called per step in the hot loop
`framework/core/net/net.cpp:418-510`).  We instead derive shapes from the op
implementations themselves with `jax.eval_shape` — zero-cost abstract
evaluation, a single source of truth, and it runs once at build time because
jitted TPU programs are static-shape.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import get_op
from .ir import Graph, topological_order

__all__ = ["infer_shapes"]


def infer_shapes(graph: Graph) -> Dict[str, jax.ShapeDtypeStruct]:
    """Return edge name -> ShapeDtypeStruct for every edge in the graph."""
    env: Dict[str, jax.ShapeDtypeStruct] = {}
    for e in graph.inputs:
        shape, dtype = graph.input_specs[e]
        env[e] = jax.ShapeDtypeStruct(shape, jnp.dtype(dtype))
    for e, v in graph.params.items():
        env[e] = jax.ShapeDtypeStruct(v.shape, v.dtype)
    for node in topological_order(graph):
        run = get_op(node.op)
        ins = [env[e] for e in node.inputs]
        try:
            outs = jax.eval_shape(lambda *xs: run(node, list(xs)), *ins)
        except Exception as exc:  # pragma: no cover - diagnostics
            raise RuntimeError(
                f"shape inference failed at node {node.name} ({node.op}), "
                f"inputs={[(i.shape, str(i.dtype)) for i in ins]}: {exc}"
            ) from exc
        for edge, s in zip(node.outputs, outs):
            env[edge] = s
    return env
