"""Round-2 MobileNet end-to-end policy study on the real TPU.

Per-op depthwise numbers are floor-bound at b8 (exp_dw_r2: every variant
~0.1 ms regardless of bytes), so the int8-vs-bf16 decision must be made
END-TO-END.  Variants per model/batch:

  bf16        : whole net bf16 (round-1 winner)
  int8        : full quantization (depthwise included, XLA lowering)
  int8-skipdw : depthwise stays fp (quantize_graph(skip_depthwise=True))
  int8-pl     : full quantization + Pallas depthwise kernel (impl=pallas
                on dw nodes)

Run ALONE: timeout 3000 python tools/exp_mobilenet_r2.py [batches...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

LOOP_N = 64


def bench_net(net, graph, feed_np, iters=LOOP_N):
    out_edge = graph.outputs[0]
    feed = {k: jax.device_put(jnp.asarray(v)) for k, v in feed_np.items()}
    prime = next(iter(feed))

    @jax.jit
    def run(params, feed):
        def body(_, s):
            f = dict(feed)
            f[prime] = f[prime] + (s * 1e-30).astype(f[prime].dtype)
            out = net.forward(params, f)[out_edge]
            return jnp.sum(out.astype(jnp.float32))

        return lax.fori_loop(0, iters, body, jnp.float32(0))

    float(run(net.params, feed))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(net.params, feed))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    batches = [int(a) for a in sys.argv[1:]] or [8, 32, 128]
    import anakin_tpu as ak
    from anakin_tpu.models import build_mobilenet_v1, build_mobilenet_v2
    from anakin_tpu.quant import calibrate, quantize_graph

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  loop={LOOP_N}", flush=True)

    for name, builder in (("v1", build_mobilenet_v1),
                          ("v2", build_mobilenet_v2)):
        g1 = ak.optimize(builder(batch=1, image_size=224))
        cal = [{"input": rng.normal(size=(1, 224, 224, 3))
                .astype(np.float32)} for _ in range(2)]
        scales = calibrate(g1, cal, method="max")
        for batch in batches:
            g = ak.optimize(builder(batch=batch, image_size=224))
            x = {"input": rng.normal(size=(batch, 224, 224, 3))
                 .astype(np.float32)}
            rows = []

            def variant(tag, graph, precision="bf16"):
                net = ak.Net(graph, precision=precision)
                ms = bench_net(net, graph, x)
                rows.append(f"{tag} {ms:8.3f}ms {batch/(ms*1e-3):8.0f}img/s")

            variant("bf16", g)
            gq = quantize_graph(g, scales)
            variant("int8", gq)
            gq_skip = quantize_graph(g, scales, skip_depthwise=True)
            variant("skipdw", gq_skip)
            gq_pl = quantize_graph(g, scales)
            n_pl = 0
            for node in gq_pl.nodes.values():
                if node.op == "conv2d_int8" and int(node.attr("groups", 1)) > 1:
                    node.attrs["impl"] = "pallas"
                    n_pl += 1
            try:
                variant(f"i8pl[{n_pl}]", gq_pl)
            except Exception as e:
                rows.append(f"i8pl FAIL {type(e).__name__}"[:40])
            print(f"mobilenet_{name} b{batch:<4d} | " + " | ".join(rows),
                  flush=True)


if __name__ == "__main__":
    main()
