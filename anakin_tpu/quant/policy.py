"""Per-(model, batch) precision policy — the measured defaults as CODE.

Reference analog: per-target/precision pattern gating in
`framework/graph/graph.cpp:378-392` (the reference excluded fusion
patterns per target the same way we gate quantization per workload).

The policy encodes the round-2/4/5 measurements (docs/BENCH_NOTES.md,
`tools/exp_mobilenet_r2.py`, `tools/exp_dispatch_r5.py`,
`tools/exp_depthwise_r5.py`, `artifacts/bench_suite.json`):

  * Depthwise-dominated nets (MobileNet class): the round-2 "bf16 wins
    below b64" rule is RETIRED — it predated the round-3 stem/emitter
    fixes and the honest chained protocol.  Re-measured round 5
    (`artifacts/depthwise_crossover_r5.json`): int8 wins at b8/b32/b128
    on v1 AND v2 (up to +56%), and even at b1 on v2 (+51%); the one
    remaining bf16 win is v1 at b1 (+9%).  The family default switches
    at b >= 4 (midpoint of the b1-lose / b8-win anchors); v2-class
    nets leave a measured b1 win on the table there — acceptable for a
    conservative default.
  * Dense conv nets (ResNet/VGG class) win with int8 ON DEVICE at
    every batch (round-5 attribution: in-jit int8 beats bf16 at r101
    b1 AND r50 b8, `artifacts/dispatch_attribution_r5.json`; xplane
    device totals agree).  But per-request DISPATCH serving pays a
    per-call cost proportional to the param pytree (~3 us/array
    through the relay), and the int8 rewrite carries ~1.5x the arrays
    (weights + per-channel scales + preserved fp biases) — below the
    measured crossover the dispatch overhead exceeds the device win
    and int8 serves FEWER img/s (the suite's two-round
    "resnet101_int8_b1 regression", finally attributed round 5).
    Measured: int8 loses the dispatch protocol at b1 (2.3x) and b8
    (~10%), wins at b32/b128 — the midpoint rule puts the serving
    switch at b >= 16.  Callers that amortize dispatch (in-graph
    loops, pipelined serving) pass `dispatch_bound=False` and get
    int8 at every batch, matching the device truth.

`choose_precision` is the decision; `apply_precision_policy` is the
serving entry point that builds the graph the decision implies.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

__all__ = ["is_depthwise_dominated", "is_detection_graph",
           "choose_precision", "apply_precision_policy",
           "INT8_DEPTHWISE_MIN_BATCH", "INT8_DETECTION_MIN_BATCH",
           "INT8_DISPATCH_MIN_GFLOPS"]

# round-5 re-measured crossover (protocol v2, post-stem-s2d int8 path):
# int8 wins MobileNet v1/v2 at b>=8 and v2 even at b1; bf16's last win
# is v1 b1 — the b1-lose/b8-win midpoint puts the switch at 4
# (artifacts/depthwise_crossover_r5.json; supersedes the round-2 b64 rule)
INT8_DEPTHWISE_MIN_BATCH = 4

# round-5 dispatch-bound crossover for plain conv nets (ResNet/VGG
# class): the fixed per-dispatch pytree penalty is covered once the
# DEVICE COMPUTE PER DISPATCH is large enough.  Measured bracket
# (artifacts/bench_suite.json + dispatch_attribution_r5.json):
# int8 loses at 66 GFLOP/dispatch (r50 b8, -10%) and 8-16 GFLOP (b1,
# tie/-57%), wins at 125 (r101 b8, +13%), 248 (vgg b8, +32%), 262+
# (r50 b32/b128) — midpoint convention rounds the gate to 100 GFLOP.
INT8_DISPATCH_MIN_GFLOPS = 100.0

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


def _dispatch_gflops(graph, batch: int) -> float:
    """Device compute per dispatch at the given serving batch (analytic,
    resolution-aware: a 64px ResNet at b128 really does present ~12x
    less work per dispatch than the 224px one)."""
    from ..runtime.profiler import flops_estimate

    total = sum(v["flops"] for v in flops_estimate(graph).values())
    spec = graph.input_specs.get("input")
    graph_batch = spec[0][0] if spec else 1
    return total / max(1, graph_batch) * batch / 1e9


def choose_precision(graph, batch: int, dispatch_bound: bool = True) -> str:
    """"int8" or "bf16" for a conv graph at this serving batch size.

    `dispatch_bound=True` (default — per-request serving, one device
    dispatch per prediction) applies the round-5 plain-conv gate: int8
    only when the device compute per dispatch covers the int8
    param-tree's extra per-call cost (`dispatch_attribution_r5.json` —
    int8 wins ON DEVICE at every batch; the host pays ~1.5x the arg
    handles per dispatch).  Pass False when dispatch is amortized
    (in-graph loops, pipelined serving): int8 at every batch for dense
    conv nets, matching the device truth."""
    if is_depthwise_dominated(graph) and batch < INT8_DEPTHWISE_MIN_BATCH:
        return "bf16"
    if is_detection_graph(graph) and batch < INT8_DETECTION_MIN_BATCH:
        return "bf16"
    if dispatch_bound and not is_depthwise_dominated(graph) \
            and not is_detection_graph(graph) \
            and _dispatch_gflops(graph, batch) < INT8_DISPATCH_MIN_GFLOPS:
        return "bf16"
    return "int8"


def apply_precision_policy(graph, batch: int,
                           scales: Optional[Dict[str, np.ndarray]] = None,
                           dispatch_bound: bool = True):
    """Serving entry point: return the graph quantized (or not) per the
    measured per-(model, batch) policy.

    With `scales=None` an int8 decision falls back to bf16 (no calibration
    data -> no int8), so callers can pass whatever they have.
    """
    if "quantize_graph" in graph.applied_passes:
        return graph, "int8"  # already quantized upstream
    decision = choose_precision(graph, batch, dispatch_bound)
    if decision == "int8" and scales is not None:
        from .quantize import quantize_graph

        return quantize_graph(graph, scales), "int8"
    return graph, "bf16"
