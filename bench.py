"""Headline benchmark: ResNet-50 throughput (images/sec/chip) on TPU.

Protocol follows the reference (`benchmark/CNN/run.sh:13-19`: warmup, many
timed iterations, average), adapted to the remote-dispatch environment:
inputs are device-resident and iterations are queued (depth amortizes the
~28 ms tunnel round-trip latency; on-pod serving pipelines H2D the same
way).  `vs_baseline` compares against the reference's best published
ResNet-50 batch-1 INT8 number: 1.615 ms on Tesla P4 (`README.md:63`)
= 619.2 images/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_IMG_S = 1000.0 / 1.615  # reference ResNet-50 b1 INT8 on Tesla P4


def bench_chained(net, graph, x_np, warmup=8, iters=50):
    """Honest steady-state timing: each step's input depends on the previous
    step's output (a chained scalar), and the final scalar is fetched to the
    host — so elapsed time provably covers all `iters` executions even
    though dispatch is pipelined through the remote-TPU relay."""
    import jax
    import jax.numpy as jnp

    out_edge = graph.outputs[0]
    x = jax.device_put(x_np)

    @jax.jit
    def step(params, x, s):
        out = net.forward(params, {"input": x + s * 1e-30})[out_edge]
        return jnp.sum(out.astype(jnp.float32))

    s = jnp.float32(0)
    for _ in range(warmup):
        s = step(net.params, x, s)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(net.params, x, s)
    float(s)  # value fetch == full sync
    return (time.perf_counter() - t0) / iters


def main():
    import os

    import anakin_tpu as ak
    from anakin_tpu.models import build_resnet50
    from anakin_tpu.quant import calibrate, quantize_graph, read_scale_table

    batch = 128
    graph = ak.optimize(build_resnet50(batch=batch, image_size=224))

    # INT8 scales for the deterministic seed-0 model: use the checked-in
    # calibration sidecar (regenerate with artifacts/README instructions if
    # absent) — same role as the reference's scale-table text file.
    table = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "artifacts", "resnet50_seed0_scales.txt")
    if os.path.exists(table):
        scales = read_scale_table(table)
    else:
        g1 = ak.optimize(build_resnet50(batch=1, image_size=224))
        cal = [{"input": np.random.default_rng(i).normal(
            size=(1, 224, 224, 3)).astype(np.float32)} for i in range(4)]
        scales = calibrate(g1, cal, method="max")
    gq = quantize_graph(graph, scales)
    net = ak.Net(gq, precision="bf16")
    x = np.random.default_rng(0).normal(size=(batch, 224, 224, 3)).astype(np.float32)

    dt = bench_chained(net, gq, x)
    img_s = batch / dt
    print(json.dumps({
        "metric": "resnet50_int8_images_per_sec_per_chip",
        "value": round(img_s, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
