"""Headline benchmark: ResNet-50 images/sec/chip.

Protocol mirrors the reference (`benchmark/CNN/run.sh:13-19`: warmup 10,
timed iterations, average).  Baseline for `vs_baseline` is the reference's
best published ResNet-50 batch-1 INT8 number: 1.615 ms on a Tesla P4
(`README.md:63`) = 619.2 images/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Run on the real TPU chip (the default JAX platform in this environment).
"""

import json
import sys
import time

import numpy as np


BASELINE_IMG_S = 1000.0 / 1.615  # reference ResNet-50 b1 INT8 on Tesla P4


def bench_model(net, graph, x, warmup=10, iters=100):
    import jax

    out_edge = graph.outputs[0]
    for _ in range(warmup):
        y = net.prediction({"input": x})
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = net.prediction({"input": x})
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    import anakin_tpu as ak
    from anakin_tpu.models import build_resnet50

    batch = 8
    graph = ak.optimize(build_resnet50(batch=batch, image_size=224))
    net = ak.Net(graph, precision="bf16")
    x = np.random.default_rng(0).normal(size=(batch, 224, 224, 3)).astype(np.float32)

    dt = bench_model(net, graph, x)
    img_s = batch / dt
    print(json.dumps({
        "metric": "resnet50_bf16_images_per_sec_per_chip",
        "value": round(img_s, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
