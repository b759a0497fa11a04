"""Per-(model, batch) precision policy — the measured defaults as CODE.

Reference analog: per-target/precision pattern gating in
`framework/graph/graph.cpp:378-392` (the reference excluded fusion
patterns per target the same way we gate quantization per workload).

The policy encodes the round-2 measurements (docs/BENCH_NOTES.md,
`tools/exp_mobilenet_r2.py`, `artifacts/bench_suite.json`):

  * Depthwise-dominated nets (MobileNet class) are per-op-overhead /
    VPU-bound at small batch — bf16 wins at b <= 32 — and become
    bandwidth/MXU-bound at large batch where full int8 (including the
    depthwise layers; `skip_depthwise` only adds boundary requants at
    b >= 64) wins by ~1.3x.  Crossover measured between b32 and b128;
    the serving default switches at b >= 64.
  * Dense conv nets (ResNet/VGG class) win with int8 at every batch.

`choose_precision` is the decision; `apply_precision_policy` is the
serving entry point that builds the graph the decision implies.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

__all__ = ["is_depthwise_dominated", "is_detection_graph",
           "choose_precision", "apply_precision_policy",
           "INT8_DEPTHWISE_MIN_BATCH", "INT8_DETECTION_MIN_BATCH"]

# measured crossover: bf16 wins at b<=32, int8 wins at b>=128 on
# MobileNet v1/v2 (BENCH_NOTES round-2 depthwise study); 64 splits it
INT8_DEPTHWISE_MIN_BATCH = 64

# measured crossover on yolo-v3-tiny@416 (round-4 attribution study,
# artifacts/detection_attribution_r4.json + BENCH_NOTES): int8 loses at
# b1 (-18%) and b8 (-8%), wins at b32 (+14%).  Mechanism (per-fusion
# xplane diff): the high-res stem conv compiles to IDENTICAL cycle
# counts in both precisions (C=3 pads 32 int8 lanes vs 16 bf16 — no MXU
# gain), and at small batch the added quantize/requant fusions + worse
# tiny-spatial emitter picks (EmitAllBatchInSublanes at 13x13, b1) cost
# more than the deep-C convs save.  Same convention as the depthwise
# rule: the midpoint of the measured lose/win batches splits it.
INT8_DETECTION_MIN_BATCH = 16

_DETECTION_OPS = frozenset({
    "priorbox", "detection_output", "yolo_box", "roi_align", "roi_pool",
    "ps_roi_pooling", "sroi_align", "anchor_generator", "box_coder",
    "box_clip", "rcnn_detection_output", "generate_proposals",
    "rcnn_proposal", "rpn_proposal_ssd", "sproposal"})


def is_detection_graph(graph) -> bool:
    """True when the graph carries detection-head ops (YOLO/SSD/RCNN
    class) — the workload family where int8's batch crossover is late."""
    return any(n.op in _DETECTION_OPS for n in graph.nodes.values())


def is_depthwise_dominated(graph) -> bool:
    """True when >=1/3 of the graph's convs are depthwise (MobileNet
    class).  Depthwise = grouped conv with one input channel per group."""
    convs = dw = 0
    for node in graph.nodes.values():
        if node.op != "conv2d":
            continue
        convs += 1
        groups = int(node.attr("groups", 1))
        w = graph.params.get(node.inputs[1])
        if w is None or groups <= 1:
            continue
        cin = w.shape[2] * groups
        if groups == cin:
            dw += 1
    return convs > 0 and dw * 3 >= convs


def choose_precision(graph, batch: int) -> str:
    """"int8" or "bf16" for a conv graph at this serving batch size."""
    if is_depthwise_dominated(graph) and batch < INT8_DEPTHWISE_MIN_BATCH:
        return "bf16"
    if is_detection_graph(graph) and batch < INT8_DETECTION_MIN_BATCH:
        return "bf16"
    return "int8"


def apply_precision_policy(graph, batch: int,
                           scales: Optional[Dict[str, np.ndarray]] = None):
    """Serving entry point: return the graph quantized (or not) per the
    measured per-(model, batch) policy.

    With `scales=None` an int8 decision falls back to bf16 (no calibration
    data -> no int8), so callers can pass whatever they have.
    """
    if "quantize_graph" in graph.applied_passes:
        return graph, "int8"  # already quantized upstream
    decision = choose_precision(graph, batch)
    if decision == "int8" and scales is not None:
        from .quantize import quantize_graph

        return quantize_graph(graph, scales), "int8"
    return graph, "bf16"
