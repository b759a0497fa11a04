"""In-context per-fusion attribution of the b128 int8 ResNet-50 program.

VERDICT round-2 task 1: the per-op timer measures nodes in ISOLATION; the
2.4 ms gap between the measured whole-program time (6.45 ms) and the
aggregate roofline (4.06 ms) needs a per-fusion breakdown of the ACTUAL
running program.  Reference analog: ENABLE_OP_TIMER measured inside the
running net (`framework/core/net/net.cpp:418-505`).

Two subcommands (separate processes — tensorflow must not load into the
TPU process):

  python tools/profile_r3.py trace [--iters 12] [--logdir DIR]
      builds the headline b128 int8 net, warms it, runs `iters` chained
      steps inside jax.profiler.trace, prints the trace dir.

  python tools/profile_r3.py parse --logdir DIR [--out artifacts/...]
      parses the .xplane.pb device plane (TF's xplane proto), aggregates
      per-fusion durations across steps, joins against the analytic
      roofline (artifacts/roofline_r02.json style), writes JSON.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, ".")


def _build_step(batch):
    """The EXACT headline program: optimized int8 ResNet-50, chained
    scalar input dependency (same jit as bench.py's step)."""
    import numpy as np

    import anakin_tpu as ak
    from anakin_tpu.models import build_resnet50
    from anakin_tpu.quant import calibrate, quantize_graph, read_scale_table

    import jax
    import jax.numpy as jnp

    graph = ak.optimize(build_resnet50(batch=batch, image_size=224))
    table = os.path.join("artifacts", "resnet50_seed0_scales.txt")
    if os.path.exists(table):
        scales = read_scale_table(table)
    else:
        g1 = ak.optimize(build_resnet50(batch=1, image_size=224))
        cal = [{"input": np.random.default_rng(i).normal(
            size=(1, 224, 224, 3)).astype(np.float32)} for i in range(4)]
        scales = calibrate(g1, cal, method="max")
    gq = quantize_graph(graph, scales)
    net = ak.Net(gq, precision="bf16")
    out_edge = gq.outputs[0]
    x = jax.device_put(np.random.default_rng(0).normal(
        size=(batch, 224, 224, 3)).astype(np.float32))

    @jax.jit
    def step(params, x, s):
        out = net.forward(params, {"input": x + s * 1e-30})[out_edge]
        return jnp.sum(out.astype(jnp.float32))

    return step, net, x


def cmd_hlo(args):
    """Dump the optimized (post-fusion, post-scheduling) HLO of the SAME
    program the trace runs, so profile fusion names join to conv shapes."""
    step, net, x = _build_step(args.batch)
    import jax.numpy as jnp

    compiled = step.lower(net.params, x, jnp.float32(0)).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(json.dumps({"out": args.out, "bytes": len(txt)}))


def cmd_trace(args):
    import time

    import jax
    import jax.numpy as jnp

    batch = args.batch
    step, net, x = _build_step(batch)

    s = jnp.float32(0)
    for _ in range(8):
        s = step(net.params, x, s)
    float(s)

    os.makedirs(args.logdir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.logdir):
        for _ in range(args.iters):
            s = step(net.params, x, s)
        float(s)
    wall = time.perf_counter() - t0
    print(json.dumps({"logdir": args.logdir, "iters": args.iters,
                      "batch": batch,
                      "ms_per_iter_walled": round(wall / args.iters * 1e3, 3)}))


def _xplane_files(logdir):
    return glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                     recursive=True)


def cmd_parse(args):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = _xplane_files(args.logdir)
    if not files:
        print(f"no .xplane.pb under {args.logdir}", file=sys.stderr)
        return 1
    per_op = {}
    plane_names = []
    step_total_ps = 0
    for path in files:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            plane_names.append(plane.name)
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            meta = plane.event_metadata
            stat_meta = plane.stat_metadata
            for line in plane.lines:
                # the XLA Ops / XLA Modules lines carry compute events
                if line.name and "op" not in line.name.lower() \
                        and "step" not in line.name.lower():
                    # keep module/ops lines; skip e.g. host threads
                    pass
                for ev in line.events:
                    m = meta.get(ev.metadata_id)
                    name = (m.display_name or m.name) if m else str(ev.metadata_id)
                    stats = {}
                    for st in ev.stats:
                        sm = stat_meta.get(st.metadata_id)
                        if sm:
                            stats[sm.name] = True
                    key = (plane.name, line.name, name)
                    rec = per_op.setdefault(
                        key, {"count": 0, "dur_ps": 0})
                    rec["count"] += 1
                    rec["dur_ps"] += ev.duration_ps
                    if "step" in line.name.lower():
                        step_total_ps += ev.duration_ps

    # aggregate across lines: report per (line, op)
    rows = []
    for (plane, line, name), rec in per_op.items():
        rows.append({
            "plane": plane, "line": line, "op": name,
            "count": rec["count"],
            "total_ms": round(rec["dur_ps"] / 1e9, 4),
        })
    rows.sort(key=lambda r: -r["total_ms"])
    out = {
        "logdir": args.logdir,
        "planes": sorted(set(plane_names)),
        "rows": rows[: args.top],
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out} ({len(rows)} ops, showing {args.top})")
    else:
        print(json.dumps(out, indent=1))
    return 0


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("trace")
    t.add_argument("--iters", type=int, default=12)
    t.add_argument("--batch", type=int, default=128)
    t.add_argument("--logdir", default="/tmp/anakin_trace_r3")
    t.set_defaults(fn=cmd_trace)
    h = sub.add_parser("hlo")
    h.add_argument("--batch", type=int, default=128)
    h.add_argument("--out", default="/tmp/anakin_hlo_r3.txt")
    h.set_defaults(fn=cmd_hlo)
    p = sub.add_parser("parse")
    p.add_argument("--logdir", default="/tmp/anakin_trace_r3")
    p.add_argument("--out", default=None)
    p.add_argument("--top", type=int, default=400)
    p.set_defaults(fn=cmd_parse)
    args = ap.parse_args()
    return args.fn(args) or 0


if __name__ == "__main__":
    sys.exit(main())
