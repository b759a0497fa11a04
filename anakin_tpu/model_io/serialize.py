"""Model file format: graph JSON + safetensors weights in one directory.

TPU-native replacement for the reference's protobuf model format
(`framework/model_parser/proto/graph.proto`, `node.proto`, `tensor.proto`;
load/save `framework/model_parser/parser/parser.cpp:29-115`):

  <path>/graph.json     — nodes/edges/attrs/inputs/outputs + per-edge
                          quantization scales + per-node precisions +
                          applied_passes (the reference round-trips its
                          optimized graph incl. `is_optimized`,
                          `graph.cpp:361-370`; ours round-trips the pass
                          list + fused attrs + int8 ops the same way)
  <path>/weights.safetensors — all params (fp32/int8/scales), zero-copy
                          mmap-able at load — the role of CacheDate blobs.

A model saved after `optimize()` + `quantize_graph()` loads straight into
`Net` with no re-optimization.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

from ..graph.ir import Graph

__all__ = ["save_model", "load_model", "FORMAT_VERSION"]

FORMAT_VERSION = 1


def _attrs_to_json(attrs: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in attrs.items():
        if isinstance(v, tuple):
            v = list(v)
        if isinstance(v, np.generic):
            v = v.item()
        out[k] = v
    return out


def save_model(graph: Graph, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    doc = {
        "format_version": FORMAT_VERSION,
        "name": graph.name,
        "inputs": graph.inputs,
        "outputs": graph.outputs,
        "input_specs": {k: [list(s), d] for k, (s, d) in graph.input_specs.items()},
        "scales": graph.scales,
        "precisions": graph.precisions,
        "applied_passes": graph.applied_passes,
        "nodes": [
            {
                "name": n.name,
                "op": n.op,
                "inputs": n.inputs,
                "outputs": n.outputs,
                "attrs": _attrs_to_json(n.attrs),
            }
            for n in graph.nodes.values()
        ],
    }
    with open(os.path.join(path, "graph.json"), "w") as f:
        json.dump(doc, f, indent=1)
    from safetensors.numpy import save_file

    # safetensors has no bool/float64 surprises here; ensure contiguity
    # (w4 params are nibble-packed int8 — safetensors-native by design)
    save_file({k: np.ascontiguousarray(v) for k, v in graph.params.items()},
              os.path.join(path, "weights.safetensors"))


def load_model(path: str) -> Graph:
    with open(os.path.join(path, "graph.json")) as f:
        doc = json.load(f)
    if doc.get("format_version", 0) > FORMAT_VERSION:
        raise ValueError(f"model format {doc['format_version']} is newer than "
                         f"supported {FORMAT_VERSION}")
    g = Graph(doc.get("name", "net"))
    g.inputs = list(doc["inputs"])
    g.outputs = list(doc["outputs"])
    g.input_specs = {k: (tuple(s), d) for k, (s, d) in doc["input_specs"].items()}
    g.scales = {k: float(v) for k, v in doc.get("scales", {}).items()}
    g.precisions = dict(doc.get("precisions", {}))
    g.applied_passes = list(doc.get("applied_passes", []))
    for nd in doc["nodes"]:
        attrs = {
            k: tuple(v) if isinstance(v, list) and k in _TUPLE_ATTRS else v
            for k, v in nd["attrs"].items()
        }
        g.add_node(nd["name"], nd["op"], nd["inputs"], nd["outputs"], **attrs)
    weights_path = os.path.join(path, "weights.safetensors")
    # native mmap loader first (zero-copy; pages fault in on demand — the
    # C++ model-parser role, `native/anakin_host.cpp` ak_st_*), falling
    # back to the safetensors package
    from ..native.host import load_safetensors

    params = load_safetensors(weights_path)
    if params is None:
        from safetensors.numpy import load_file

        params = load_file(weights_path)
    g.params = params
    g.validate()
    return g


# attrs whose list values are semantically tuples (kept as lists works too —
# ops accept both — but round-tripping to tuple keeps attr equality stable)
_TUPLE_ATTRS = {"strides", "padding", "dilation", "window", "out_hw",
                "pad_h", "pad_w", "pad_c", "pooled_hw", "order", "img_hw"}
