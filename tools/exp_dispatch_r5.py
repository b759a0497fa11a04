"""Round-5: is the resnet101_int8_b1 "2.3x regression" device or host?

The xplane traces (artifacts/convnet_attribution_r5_*.json) say int8 is
FASTER on device (0.197 vs 0.224 ms/iter at r101 b1) while the suite's
chained-dispatch protocol says it is 2.3x slower.  Hypothesis: at b1 the
device program is ~0.2 ms but every `step(params, feed, s)` dispatch
ships the whole param pytree's arg handles through the relay — the int8
graph carries ~2x the param leaves (w8 weights + per-channel scales +
preserved biases), so the b1 rows measure DISPATCH cost, not compute.

Protocol per (model, batch, precision):
  * suite-style chained dispatch (bench_chained) — what the suite reports
  * in-jit fori_loop (N steps inside ONE program, FULL output carried —
    the round-2 timed_carry discipline, tools/exp_conv_r2.py) — honest
    device ms/iter
  * param leaf count + total bytes

Writes artifacts/dispatch_attribution_r5.json.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_case(model, batch, precision, iters_disp=60, inner=256):
    import jax
    import jax.numpy as jnp

    import anakin_tpu as ak
    from tools.bench_suite import bench_chained

    rng = np.random.default_rng(0)
    if model == "resnet50":
        from anakin_tpu.models import build_resnet50 as builder
    else:
        from anakin_tpu.models import build_resnet101 as builder
    g = ak.optimize(builder(batch=batch, image_size=224))
    feed = {"input": rng.normal(
        size=(batch, 224, 224, 3)).astype(np.float32)}
    if precision == "int8":
        from anakin_tpu.quant import calibrate, quantize_graph

        g1 = ak.optimize(builder(batch=1, image_size=224))
        cal = [{"input": rng.normal(
            size=(1, 224, 224, 3)).astype(np.float32)} for _ in range(2)]
        g = quantize_graph(g, calibrate(g1, cal, method="max"))
    net = ak.Net(g, precision="bf16")
    out_edge = g.outputs[0]

    # 1) suite-style chained dispatch
    disp = bench_chained(net, g, feed, iters_disp)

    # 2) in-jit loop: N dependent steps in ONE program, full output
    #    carried through the input perturbation so nothing DCEs
    x0 = jnp.asarray(feed["input"])

    @jax.jit
    def loop(params, x0):
        def body(t, carry):
            x, acc = carry
            out = net.forward(params, {"input": x})[out_edge]
            s = jnp.sum(out.astype(jnp.float32))
            # fold the WHOLE output back into the next input (value ~0)
            xn = x0 + (jnp.mean(out.astype(jnp.float32)) * 1e-30)
            return (xn, acc + s)

        _, acc = jax.lax.fori_loop(0, inner, body, (x0, jnp.float32(0)))
        return acc

    float(loop(net.params, x0))          # compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(net.params, x0))
        best = min(best, time.perf_counter() - t0)
    injit = best / inner

    leaves = jax.tree_util.tree_leaves(net.params)
    return {
        "model": model, "batch": batch, "precision": precision,
        "dispatch_ms_per_iter": round(disp * 1e3, 4),
        "injit_ms_per_iter": round(injit * 1e3, 4),
        "dispatch_overhead_ms": round((disp - injit) * 1e3, 4),
        "param_leaves": len(leaves),
        "param_mbytes": round(sum(v.size * v.dtype.itemsize
                                  for v in leaves) / 1e6, 1),
    }


def main():
    rows = []
    for model, batch in (("resnet101", 1), ("resnet50", 8)):
        for precision in ("bf16", "int8"):
            r = run_case(model, batch, precision)
            rows.append(r)
            print(json.dumps(r), flush=True)
    with open("artifacts/dispatch_attribution_r5.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote artifacts/dispatch_attribution_r5.json")


if __name__ == "__main__":
    main()
