"""Standalone model server entry point.

`python -m anakin_tpu.serving.server --model-dir DIR --name NAME --port P`

Loads a saved model directory (see model_io), builds the bucketed
continuous batcher, and serves the gRPC AnakinService until killed — the
per-process server the daemon supervises (reference: the per-device server
processes forked by `framework/service/service_daemon.cpp`).
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--name", default="model")
    ap.add_argument("--port", type=int, default=50051)
    ap.add_argument("--precision", default="bf16",
                    help='"fp32" | "bf16" | "int8" | "auto" — auto applies '
                         "the measured per-(model, batch) policy "
                         "(quant/policy.py): int8 when the graph+batch "
                         "profits, bf16 otherwise")
    ap.add_argument("--buckets", default="1,2,4,8")
    ap.add_argument("--max-delay-ms", type=float, default=2.0)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) before init")
    ap.add_argument("--overlap", default=None, choices=("default", "aggressive"),
                    help="enable XLA collective/compute overlap flags "
                         "(multi-chip serving; must precede backend init)")
    args = ap.parse_args(argv)

    if args.overlap:
        from anakin_tpu.parallel.overlap import enable_collective_overlap

        enable_collective_overlap(args.overlap)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import anakin_tpu as ak
    from anakin_tpu.model_io import load_model
    from anakin_tpu.serving import AnakinService, ContinuousBatcher, serve

    graph = load_model(args.model_dir)

    def factory(batch):
        g = graph.clone()
        for name in g.inputs:
            shape, dt = g.input_specs[name]
            g.input_specs[name] = ((batch,) + shape[1:], dt)
        if args.precision == "auto":
            from anakin_tpu.quant import apply_precision_policy

            g, chosen = apply_precision_policy(
                g, batch, graph.scales or None)
            print(f"precision policy: batch {batch} -> {chosen}",
                  flush=True)
            return ak.Net(g, precision="bf16")
        return ak.Net(g, precision=args.precision)

    batcher = ContinuousBatcher(
        factory, list(graph.inputs),
        buckets=tuple(int(b) for b in args.buckets.split(",")),
        max_delay_ms=args.max_delay_ms)
    svc = AnakinService()
    svc.initial(args.name, batcher)
    server = serve(svc, port=args.port)
    print(f"anakin_tpu server: model {args.name!r} on port "
          f"{server._bound_port}", flush=True)

    stop = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    signal.signal(signal.SIGINT, lambda *_: stop.set())
    stop.wait()
    # wait for grpc shutdown to finish before exiting (see
    # examples/serve_model.py: an unwaited stop races grpc's C++ threads
    # against interpreter teardown and can abort after successful serving)
    server.stop(grace=2).wait(timeout=15)
    svc.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
