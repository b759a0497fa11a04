"""Round-5 re-measurement of the MobileNet int8 crossover.

The round-2 study (protocol v1) put bf16 ahead at b<=32; the round-4
suite refresh (honest chained protocol v2) has int8 WINNING at b8
(v1: 9.7k vs 6.2k; v2: 7.6k vs 6.6k).  The stale b>=64 policy
threshold needs fresh b1/b32 anchors under the current protocol and
the current int8 path (round-3 stem s2d + emitter fixes changed the
small-batch picture).

Writes artifacts/depthwise_crossover_r5.json.  Run ALONE on the TPU.
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import anakin_tpu as ak
    from anakin_tpu.models import build_mobilenet_v1, build_mobilenet_v2
    from anakin_tpu.quant import calibrate, quantize_graph
    from tools.bench_suite import bench_chained

    rng = np.random.default_rng(0)
    rows = []
    for nm, builder in (("mobilenet_v1", build_mobilenet_v1),
                        ("mobilenet_v2", build_mobilenet_v2)):
        g1 = ak.optimize(builder(batch=1, image_size=224))
        cal = [{"input": rng.normal(size=(1, 224, 224, 3))
                .astype(np.float32)} for _ in range(2)]
        scales = calibrate(g1, cal, method="max")
        for batch in (1, 32):
            g = ak.optimize(builder(batch=batch, image_size=224))
            feed = {"input": rng.normal(
                size=(batch, 224, 224, 3)).astype(np.float32)}
            for prec, gq in (("bf16", g),
                             ("int8", quantize_graph(g, scales))):
                net = ak.Net(gq, precision="bf16")
                dt = bench_chained(net, gq, feed, 40)
                row = {"name": f"{nm}_{prec}_b{batch}",
                       "ms_per_batch": round(dt * 1e3, 3),
                       "throughput": round(batch / dt, 1)}
                rows.append(row)
                print(json.dumps(row), flush=True)
    with open("artifacts/depthwise_crossover_r5.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote artifacts/depthwise_crossover_r5.json")


if __name__ == "__main__":
    main()
