"""Per-layer roofline accounting for int8 ResNet-50 (VERDICT item 1).

For every distinct conv/dense shape in the optimized+quantized ResNet-50
graph this computes the analytic per-layer roofline

    t_roof = max(bytes_min / HBM_BW, macs / INT8_PEAK)

where bytes_min counts each tensor once at its true dtype (int8 edges,
int8 weights, fp32 scale vectors) — the time a perfect implementation
cannot beat — and optionally measures the layer with the timed_carry
protocol on the real chip.  Output: per-layer ratio measured/roofline,
the aggregate roofline for the whole net, and the measured end-to-end
step, i.e. exactly the "is the remaining gap HBM-bound?" evidence.

Run ALONE: timeout 3000 python tools/roofline_r2.py [batch] [--measure]
Writes artifacts/roofline_r02.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

HBM_BW = 819e9
INT8_PEAK = 394e12       # MACs/s counted as 2 ops/MAC -> 197e12 MAC/s
MAC_PEAK = INT8_PEAK / 2
LOOP_N = 256


def timed_carry(body, x, y0, loop=LOOP_N):
    def run(x, y0):
        def it(_, y_prev):
            xx = x + (y_prev[(0,) * y_prev.ndim].astype(jnp.float32)
                      > 1e30).astype(x.dtype)
            return body(xx)

        y = lax.fori_loop(0, loop, it, y0)
        return jnp.sum(y.astype(jnp.float32))

    f = jax.jit(run)
    float(f(x, y0))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        float(f(x, y0))
        best = min(best, (time.perf_counter() - t0) / loop)
    return best * 1e3


def conv_layers(batch):
    """Distinct (kh, kw, stride, cin, cout, hin) conv classes of the
    optimized int8 ResNet-50 with their multiplicities."""
    import anakin_tpu as ak
    from anakin_tpu.graph.shape_infer import infer_shapes
    from anakin_tpu.models import build_resnet50
    from anakin_tpu.quant import calibrate, quantize_graph

    rng = np.random.default_rng(0)
    g = ak.optimize(build_resnet50(batch=batch, image_size=224))
    cal = [{"input": rng.normal(size=(batch, 224, 224, 3))
            .astype(np.float32)}]
    gq = quantize_graph(g, calibrate(g, cal, method="max"))
    shapes = infer_shapes(gq)
    classes = {}
    for node in gq.nodes.values():
        if node.op not in ("conv2d_int8", "dense_int8"):
            continue
        xs = shapes[node.inputs[0]].shape
        ws = shapes[node.inputs[1]].shape
        if node.op == "dense_int8":
            key = ("dense", 1, 1, 1, ws[0], ws[1], 1)
        else:
            s = node.attr("strides", (1, 1))[0]
            key = ("conv", ws[0], ws[1], s, ws[2], ws[3], xs[1])
        rec = classes.setdefault(key, {"count": 0, "node": node,
                                       "x_shape": xs})
        rec["count"] += 1
    return gq, classes


def layer_cost(key, x_shape, batch):
    kind, kh, kw, s, cin, cout, hin = key
    if kind == "dense":
        m = batch
        macs = m * cin * cout
        bytes_min = m * cin + cin * cout + m * cout * 4
        return macs, bytes_min
    hout = hin // s
    macs = batch * hout * hout * kh * kw * cin * cout
    bytes_min = (batch * hin * hin * cin          # x int8
                 + kh * kw * cin * cout           # w int8
                 + cout * 4                       # scales f32
                 + batch * hout * hout * cout)    # y int8 (requant out)
    return macs, bytes_min


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 128
    measure = "--measure" in sys.argv
    print(f"devices: {jax.devices()}  batch={batch}", flush=True)

    gq, classes = conv_layers(batch)
    rng = np.random.default_rng(1)
    rows = []
    total_roof = 0.0
    for key, rec in sorted(classes.items(), key=lambda kv: -kv[1]["count"]):
        macs, bytes_min = layer_cost(key, rec["x_shape"], batch)
        t_bw = bytes_min / HBM_BW * 1e3
        t_mxu = macs / MAC_PEAK * 1e3
        t_roof = max(t_bw, t_mxu)
        total_roof += t_roof * rec["count"]
        row = {
            "layer": "{}{}x{} s{} {}->{} @{}".format(*key),
            "count": rec["count"],
            "macs": macs, "bytes_min": bytes_min,
            "t_bw_ms": round(t_bw, 4), "t_mxu_ms": round(t_mxu, 4),
            "t_roofline_ms": round(t_roof, 4),
            "bound": "hbm" if t_bw > t_mxu else "mxu",
        }
        if measure:
            kind, kh, kw, s, cin, cout, hin = key
            if kind == "conv":
                x = jnp.asarray(rng.integers(-127, 128,
                                (batch, hin, hin, cin)).astype(np.int8))
                w = jnp.asarray(rng.integers(-127, 128,
                                (kh, kw, cin, cout)).astype(np.int8))
                ws = jnp.asarray(rng.uniform(1e-3, 1e-2, (cout,))
                                 .astype(np.float32))
                pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))

                def body(xx, w=w, ws=ws, s=s, pad=pad):
                    acc = lax.conv_general_dilated(
                        xx, w, (s, s), pad,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.int32)
                    y = jnp.maximum(acc.astype(jnp.float32) * (3e-4 * ws), 0)
                    return jnp.clip(jnp.round(y * 20.0), -127,
                                    127).astype(jnp.int8)

                ms = timed_carry(body, x, body(x))
                row["t_measured_ms"] = round(ms, 4)
                row["ratio"] = round(ms / t_roof, 2)
                row["eff_top_s"] = round(2 * macs / (ms * 1e-3) / 1e12, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"batch": batch, "hbm_bw": HBM_BW, "int8_peak_ops": INT8_PEAK,
           "total_roofline_ms": round(total_roof, 3), "layers": rows}
    if measure:
        meas = sum(r["t_measured_ms"] * r["count"] for r in rows
                   if "t_measured_ms" in r)
        out["sum_measured_ms"] = round(meas, 3)
    path = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts",
                        "roofline_r02.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"TOTAL analytic roofline: {total_roof:.3f} ms "
          f"({batch / (total_roof * 1e-3):.0f} img/s ceiling)", flush=True)
    if measure:
        print(f"SUM of measured isolated layers: {out['sum_measured_ms']:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
