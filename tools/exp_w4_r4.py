"""Round-4 w4 study: why does w4-Pallas lose the DISTINCT-position ladder?

Round 3 measured: aligned ladder w4 3.49 ms/step BEATS w8 3.62, but the
continuous-batching case (distinct per-slot positions, cache_update=
"rows") flips it — w4 4.68 vs w8 3.79 (+1.19 ms, where w8 only pays
+0.17 for the same cache-write change).  The dense kernels are IDENTICAL
between the two ladders, so the regression must be scheduling: how XLA
places the pallas_call fusion barriers against the unrolled per-row
DUS cache-write chain.  This tool traces the actual ladder programs so
the +1.19 ms has a per-op attribution.

  python tools/exp_w4_r4.py trace --weights w4 --pos distinct
  python tools/profile_r3.py parse --logdir /tmp/anakin_w4_w4_distinct \
      --out artifacts/profile_w4_distinct.json
  python tools/profile_detection_r4.py diff --a ... --b ...

Also: `bench --variant v3` A/Bs the per-group batched-dot kernel
(matmul_w4 variant="v3") on the ladder.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def _build_ladder(weights: str, pos: str, batch=8, steps=32,
                  variant=None):
    """The EXACT llm1b ladder program from tools/bench_suite.py
    bench_transformer_decode (w8/w4 + kv8, aligned or rows-distinct)."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax

    import anakin_tpu as ak
    from anakin_tpu.models.transformer import (TransformerConfig,
                                               build_transformer_decode_step,
                                               make_transformer_params)
    from anakin_tpu.quant import weight_only_quantize

    cfg = TransformerConfig(vocab=32000, embed=2048, heads=16, kv_heads=8,
                            layers=16, max_seq=2048)
    params = make_transformer_params(cfg, 0)
    aligned = pos == "aligned"
    g = build_transformer_decode_step(
        cfg, batch, params, kv_cache_dtype="int8", aligned_pos=aligned,
        cache_update="blend" if aligned else "rows")
    g = weight_only_quantize(g, bits=4 if weights == "w4" else 8)
    if weights == "w4":
        for n in g.nodes.values():
            if n.op == "dense_w4":
                n.attrs["impl"] = "pallas"
                if variant:
                    n.attrs["variant"] = variant
    net = ak.Net(g, precision="bf16")
    logits_e = g.outputs[0]
    cache_out = [(g.nodes[f"dec_att_{i}"].outputs[1],
                  g.nodes[f"dec_att_{i}"].outputs[2])
                 for i in range(cfg.layers)]
    cache_shape = (batch, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
    if pos == "distinct":
        base = (np.arange(batch, dtype=np.int32)
                * max(1, (cfg.max_seq - steps - 1) // max(1, batch - 1)))
        base = jnp.asarray(np.minimum(base, cfg.max_seq - steps - 1))
    else:
        base = jnp.zeros((batch,), jnp.int32)

    @jax.jit
    def decode_T(params, tok0, caches):
        def body(t, carry):
            tok, caches = carry
            feed = {"input": tok, "pos": base + t}
            for i in range(cfg.layers):
                feed[f"cache_k_{i}"] = caches[2 * i]
                feed[f"cache_v_{i}"] = caches[2 * i + 1]
            out = net.forward(params, feed)
            nxt = jnp.argmax(out[logits_e][:, 0, :], -1).astype(jnp.int32)
            new = []
            for i in range(cfg.layers):
                new += [out[cache_out[i][0]], out[cache_out[i][1]]]
            return (nxt[:, None], tuple(new))

        tok, _ = lax.fori_loop(0, steps, body, (tok0, caches))
        return jnp.sum(tok)

    tok0 = jnp.zeros((batch, 1), jnp.int32)
    caches = tuple(jnp.zeros(cache_shape, jnp.int8)
                   for _ in range(2 * cfg.layers))
    return decode_T, net, tok0, caches, steps


def cmd_trace(args):
    import jax

    decode_T, net, tok0, caches, steps = _build_ladder(
        args.weights, args.pos, variant=args.variant)
    float(decode_T(net.params, tok0, caches))          # compile + warm
    logdir = args.logdir or \
        f"/tmp/anakin_w4_{args.weights}_{args.pos}"
    os.makedirs(logdir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for _ in range(args.iters):
            float(decode_T(net.params, tok0, caches))
    wall = time.perf_counter() - t0
    print(json.dumps({
        "logdir": logdir, "iters": args.iters,
        "ms_per_step_walled": round(wall / args.iters / steps * 1e3, 3)}))


def cmd_bench(args):
    decode_T, net, tok0, caches, steps = _build_ladder(
        args.weights, args.pos, variant=args.variant)
    float(decode_T(net.params, tok0, caches))          # compile
    best = 1e9
    for _ in range(args.runs):
        t0 = time.perf_counter()
        float(decode_T(net.params, tok0, caches))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "weights": args.weights, "pos": args.pos,
        "variant": args.variant,
        "ms_per_step": round(best / steps * 1e3, 4),
        "tok_s": round(8 * steps / best, 1)}))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("trace", "bench"):
        p = sub.add_parser(name)
        p.add_argument("--weights", default="w4", choices=("w4", "w8"))
        p.add_argument("--pos", default="distinct",
                       choices=("aligned", "distinct"))
        p.add_argument("--variant", default=None)
        if name == "trace":
            p.add_argument("--iters", type=int, default=8)
            p.add_argument("--logdir", default=None)
        else:
            p.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    (cmd_trace if args.cmd == "trace" else cmd_bench)(args)


if __name__ == "__main__":
    main()
