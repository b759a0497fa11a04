"""Dense-conv int8 small-batch attribution (round-5, VERDICT task 2).

The suite has carried resnet101_int8_b1 at 2.3x SLOWER than bf16 (517 vs
1191 img/s) and resnet50_int8_b8 ~10% slower (6549 vs 7252) for two
rounds while `quant/policy.py` claimed "int8 wins at every batch" for
plain ResNets.  This tool traces the ACTUAL suite programs (bf16 vs
int8-quantized ResNet-50/101 at any batch) with the round-3 xplane
instrument and emits a per-fusion diff so the regression gets a
mechanism and a measured policy gate.

  python tools/profile_convnet_r5.py trace --model resnet101 --batch 1 \
      --precision int8
  python tools/profile_r3.py parse --logdir /tmp/anakin_cnn_resnet101_b1_int8 \
      --out artifacts/profile_r101_b1_int8.json
  python tools/profile_convnet_r5.py diff \
      --a artifacts/profile_r101_b1_bf16.json \
      --b artifacts/profile_r101_b1_int8.json \
      --out artifacts/convnet_attribution_r5.json

Run each subcommand in its OWN process (tensorflow must not load into
the TPU process), TPU steps alone on the chip.  Reference bar: per-op
timing + param-keyed buckets, `framework/core/net/net.cpp:232-273`.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")


def _build_step(model: str, precision: str, batch: int):
    import numpy as np

    import jax
    import jax.numpy as jnp

    import anakin_tpu as ak

    rng = np.random.default_rng(0)
    if model == "resnet50":
        from anakin_tpu.models import build_resnet50 as builder
    elif model == "resnet101":
        from anakin_tpu.models import build_resnet101 as builder
    else:
        raise SystemExit(f"unknown model {model}")
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
    feed_dev = {k: jax.device_put(v) for k, v in feed.items()}

    @jax.jit
    def step(params, feed, s):
        f = dict(feed)
        f["input"] = f["input"] + s * 1e-30
        out = net.forward(params, f)[out_edge]
        return jnp.sum(out.astype(jnp.float32))

    return step, net, feed_dev


def cmd_trace(args):
    import time

    import jax
    import jax.numpy as jnp

    step, net, feed = _build_step(args.model, args.precision, args.batch)
    s = jnp.float32(0)
    for _ in range(8):
        s = step(net.params, feed, s)
    float(s)
    logdir = args.logdir or \
        f"/tmp/anakin_cnn_{args.model}_b{args.batch}_{args.precision}"
    os.makedirs(logdir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for _ in range(args.iters):
            s = step(net.params, feed, s)
        float(s)
    wall = time.perf_counter() - t0
    print(json.dumps({"logdir": logdir, "iters": args.iters,
                      "model": args.model, "batch": args.batch,
                      "precision": args.precision,
                      "ms_per_iter_walled": round(wall / args.iters * 1e3,
                                                  3)}))


def cmd_hlo(args):
    """Dump the optimized HLO so fusion names join to op content."""
    import jax.numpy as jnp

    step, net, feed = _build_step(args.model, args.precision, args.batch)
    compiled = step.lower(net.params, feed, jnp.float32(0)).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(json.dumps({"out": args.out, "bytes": len(txt)}))


def cmd_diff(args):
    """Join two parsed profiles (bf16 vs int8) and rank the biggest
    per-fusion regressions — where int8 loses its MXU gain (same joiner
    as profile_detection_r4)."""
    a = json.load(open(args.a))
    b = json.load(open(args.b))

    def rows(d):
        iters = 1
        for r in d["rows"]:
            if r["line"] == "XLA Modules" and r["op"].startswith("jit_step"):
                iters = max(iters, r["count"])
        out = {}
        for r in d["rows"]:
            if r["line"] != "XLA Ops":
                continue
            e = out.setdefault(r["op"], {"ms_per_iter": 0.0})
            e["ms_per_iter"] += r["total_ms"] / iters
        return out

    ra, rb = rows(a), rows(b)
    total_a = sum(r.get("ms_per_iter", 0) for r in ra.values())
    total_b = sum(r.get("ms_per_iter", 0) for r in rb.values())

    def by_kind(rs):
        kinds = {}
        for name, r in rs.items():
            kind = ("conv" if "conv" in name else
                    "dot" if "dot" in name or "gemm" in name else
                    "copy" if "copy" in name or "transpose" in name else
                    "reduce" if "reduce" in name else
                    "fusion")
            kinds.setdefault(kind, 0.0)
            kinds[kind] += r.get("ms_per_iter", 0)
        return kinds

    out = {"a": args.a, "b": args.b,
           "total_ms": {"a": round(total_a, 3), "b": round(total_b, 3)},
           "by_kind_ms": {"a": {k: round(v, 3)
                                for k, v in sorted(by_kind(ra).items())},
                          "b": {k: round(v, 3)
                                for k, v in sorted(by_kind(rb).items())}},
           "top_b": sorted(
               [{"name": n[:140],
                 "ms": round(r.get("ms_per_iter", 0), 4)}
                for n, r in rb.items()], key=lambda r: -r["ms"])[:30],
           "top_a": sorted(
               [{"name": n[:140],
                 "ms": round(r.get("ms_per_iter", 0), 4)}
                for n, r in ra.items()], key=lambda r: -r["ms"])[:30]}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["by_kind_ms"], indent=1))
    print("wrote", args.out)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("trace")
    t.add_argument("--model", required=True,
                   choices=("resnet50", "resnet101"))
    t.add_argument("--batch", type=int, default=1)
    t.add_argument("--precision", default="bf16", choices=("bf16", "int8"))
    t.add_argument("--iters", type=int, default=48)
    t.add_argument("--logdir", default=None)
    h = sub.add_parser("hlo")
    h.add_argument("--model", required=True,
                   choices=("resnet50", "resnet101"))
    h.add_argument("--batch", type=int, default=1)
    h.add_argument("--precision", default="bf16", choices=("bf16", "int8"))
    h.add_argument("--out", required=True)
    d = sub.add_parser("diff")
    d.add_argument("--a", required=True)
    d.add_argument("--b", required=True)
    d.add_argument("--out", default="artifacts/convnet_attribution_r5.json")
    args = ap.parse_args()
    if args.cmd == "trace":
        cmd_trace(args)
    elif args.cmd == "hlo":
        cmd_hlo(args)
    else:
        cmd_diff(args)


if __name__ == "__main__":
    main()
