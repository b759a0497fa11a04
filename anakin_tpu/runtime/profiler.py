"""Profiling utilities.

Parity with the reference's tracing story (SURVEY.md section 5.1:
ENABLE_OP_TIMER per-op SaberTimer + summary dump):

  * `Net(enable_op_timer=True)` gives the per-op table (net.py).
  * `trace(...)` wraps jax.profiler for a device-level Perfetto/TensorBoard
    trace of the real fused program — the XLA-era equivalent of per-op
    timers, since ops no longer exist at runtime.
  * `flops_estimate(graph)` gives an analytic per-node FLOP/byte table used
    for roofline reporting (`bench_report`).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator

import numpy as np

import jax

from ..graph.ir import Graph, topological_order
from ..graph.shape_infer import infer_shapes

__all__ = ["trace", "flops_estimate", "roofline_report"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Device trace context (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _conv_flops(node, shapes) -> int:
    if node.op not in ("conv2d", "conv2d_int8", "dense", "dense_int8",
                       "matmul", "deconv2d"):
        return 0
    out = shapes[node.outputs[0]].shape
    w = shapes[node.inputs[1]].shape
    if node.op == "deconv2d":
        inp = shapes[node.inputs[0]].shape
        return 2 * int(np.prod(inp)) * w[0] * w[1] * w[3]
    if node.op in ("conv2d", "conv2d_int8"):
        kh, kw, cin_g, cout = w
        return 2 * int(np.prod(out)) * kh * kw * cin_g
    if node.op in ("dense", "dense_int8"):
        return 2 * int(np.prod(out)) * w[0]
    if node.op == "matmul":
        a = shapes[node.inputs[0]].shape
        return 2 * int(np.prod(out)) * a[-1]
    return 0


def flops_estimate(graph: Graph) -> Dict[str, Dict[str, float]]:
    """{node: {flops, bytes}} analytic cost table."""
    shapes = infer_shapes(graph)
    table: Dict[str, Dict[str, float]] = {}
    for node in topological_order(graph):
        byts = 0
        for e in list(node.inputs) + list(node.outputs):
            s = shapes[e]
            byts += int(np.prod(s.shape)) * s.dtype.itemsize
        table[node.name] = {
            "op": node.op,
            "flops": float(_conv_flops(node, shapes)),
            "bytes": float(byts),
        }
    return table


def roofline_report(graph: Graph, step_seconds: float,
                    peak_flops: float = 394e12,
                    hbm_bw: float = 819e9) -> str:
    """Summarize measured step time against analytic compute/memory bounds.

    Defaults are TPU v5e: 394 TOPS int8 (197 bf16), 819 GB/s HBM.
    """
    table = flops_estimate(graph)
    flops = sum(v["flops"] for v in table.values())
    byts = sum(v["bytes"] for v in table.values())
    t_compute = flops / peak_flops
    t_memory = byts / hbm_bw
    bound = "compute" if t_compute > t_memory else "memory"
    util = (max(t_compute, t_memory) / step_seconds) if step_seconds else 0.0
    return (
        f"model: {flops/1e9:.1f} GFLOP, {byts/1e6:.1f} MB moved (analytic)\n"
        f"roofline: compute {t_compute*1e3:.3f} ms vs memory {t_memory*1e3:.3f} ms "
        f"-> {bound}-bound\n"
        f"measured: {step_seconds*1e3:.3f} ms -> {util*100:.1f}% of roofline"
    )
