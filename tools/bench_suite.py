"""Full benchmark suite across the BASELINE.json configs.

Run ALONE on the TPU (concurrent host load corrupts dispatch timing):

    python tools/bench_suite.py [--quick]

Covers: ResNet-50 fp32-highest/bf16/int8 at batch 1/8/32, VGG16 1/8,
MobileNet v1/v2 bf16+int8, LSTM language model — the reference's benchmark
grid (`benchmark/CNN/run.sh`, `benchmark/RNN/`) re-run on TPU with the
honest chained protocol, plus roofline utilization per model.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_chained(net, graph, feed_np, iters):
    import jax
    import jax.numpy as jnp

    out_edge = graph.outputs[0]
    feed_dev = {k: jax.device_put(v) for k, v in feed_np.items()}
    floats = [k for k, v in feed_np.items()
              if np.issubdtype(np.asarray(v).dtype, np.floating)]
    prime = floats[0] if floats else next(iter(feed_np))

    @jax.jit
    def step(params, feed, s):
        f = dict(feed)
        if floats:
            f[prime] = f[prime] + s * 1e-30
        else:
            # integer inputs: route the dependency through a value-preserving
            # float round-trip (adding 1e-30 then truncating keeps the ids)
            p = f[prime]
            f[prime] = (p.astype(jnp.float32) + s * 1e-30).astype(p.dtype)
        out = net.forward(params, f)[out_edge]
        return jnp.sum(out.astype(jnp.float32))

    s = jnp.float32(0)
    for _ in range(8):
        s = step(net.params, feed_dev, s)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(net.params, feed_dev, s)
    float(s)
    return (time.perf_counter() - t0) / iters


def bench_transformer_decode(batch=32, steps=64, timed_runs=3,
                             weight_only=False, kv_cache_dtype="float32",
                             cfg=None, aligned_pos=False, name_prefix="",
                             cache_update="blend", distinct_pos=False):
    """Greedy KV-cache decode throughput: `steps` chained decode-graph
    invocations inside one jit (caches + next token as fori_loop carry).

    `distinct_pos=True` gives every batch row its OWN cache position
    (spread across max_seq) — the continuous-batching case, where the
    aligned single-row write is ineligible and `cache_update`
    ("blend" | "rows" | "scatter") decides the write strategy."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    import anakin_tpu as ak
    from anakin_tpu.models.transformer import (
        TransformerConfig, build_transformer_decode_step,
        make_transformer_params)

    cfg = cfg or TransformerConfig(vocab=16000, embed=1024, heads=16,
                                   kv_heads=8, layers=8, max_seq=256)
    params = make_transformer_params(cfg, 0)
    g = build_transformer_decode_step(cfg, batch, params,
                                      kv_cache_dtype=kv_cache_dtype,
                                      aligned_pos=aligned_pos,
                                      cache_update=cache_update)
    if weight_only:
        from anakin_tpu.quant import weight_only_quantize

        # weight_only: True/"w8" = int8 per-channel; "w4" = int4 group-wise
        g = weight_only_quantize(g, bits=4 if weight_only == "w4" else 8)
        if weight_only == "w4":
            # the measured winner (autotune_graph picks the same on TPU —
            # margin 1.0 for dense_w4; set directly here so suite rows
            # don't depend on a tuner cache): Pallas VMEM nibble-unpack
            for n in g.nodes.values():
                if n.op == "dense_w4":
                    n.attrs["impl"] = "pallas"
    net = ak.Net(g, precision="bf16")
    logits_e = g.outputs[0]
    cache_out = [(g.nodes[f"dec_att_{i}"].outputs[1],
                  g.nodes[f"dec_att_{i}"].outputs[2])
                 for i in range(cfg.layers)]
    cache_shape = (batch, cfg.kv_heads, cfg.max_seq, cfg.head_dim)

    # distinct per-row positions: row i decodes at base_i + t, bases
    # spread over [0, max_seq - steps) like live continuous-batching slots
    if distinct_pos:
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
    cache_dt = jnp.int8 if kv_cache_dtype == "int8" else jnp.bfloat16
    caches = tuple(jnp.zeros(cache_shape, cache_dt)
                   for _ in range(2 * cfg.layers))
    float(decode_T(net.params, tok0, caches))  # compile
    best = 1e9
    for _ in range(timed_runs):
        t0 = time.perf_counter()
        float(decode_T(net.params, tok0, caches))
        best = min(best, time.perf_counter() - t0)
    tok_s = batch * steps / best
    tag = "bf16" if not weight_only else (
        "w4" if weight_only == "w4" else "w8")
    if kv_cache_dtype == "int8":
        tag += "_kv8"
    if aligned_pos:
        tag += "_aligned"
    if distinct_pos:
        tag += f"_{cache_update}_distinct"
    return {"name": f"{name_prefix}transformer_decode_{tag}_b{batch}",
            "ms_per_token_step": round(best / steps * 1e3, 4),
            "throughput": round(tok_s, 1),
            "tflops_effective": 0.0}


def bench_decode_scheduler(batch=8, n_requests=16, prompt_len=24,
                           max_new=32, prefill_chunk=8, fuse_window=0,
                           cfg=None, kv_cache_dtype="float32",
                           weight_only=False, name=None,
                           prefill_mode="bucket", stop_early=False):
    """Continuous-batching DecodeScheduler end-to-end throughput: mixed
    prefill + decode.  fuse_window=0 is the host-driven per-step path
    (one relay dispatch per step — the round-3 178 tok/s row);
    fuse_window=K runs steady-state decode as one dispatch per K steps
    (the round-4 fused window closing the gap to the in-jit
    `llm1b_*_rows_distinct` rows).

    Round-5: `prefill_mode="bucket"` (default) admits each prompt wave
    in ONE flash-prefill dispatch per bucket, so `prompt_len` 512/2048
    rows are finally measurable (VERDICT task 1 — round 4's 1,433 tok/s
    headline rode 24-token prompts at ~47 ms per 8-token chunk);
    `admission_ms_per_prompt` reports the cost.  `stop_early=True`
    replays the greedy run with each request's mid-stream token as its
    stop id — tokens/sec of USEFUL tokens with device-side early exit
    (VERDICT task 3)."""
    import time as _t

    from anakin_tpu.models.transformer import (TransformerConfig,
                                               make_transformer_params)
    from anakin_tpu.runtime.decode_scheduler import DecodeScheduler

    cfg = cfg or TransformerConfig(vocab=16000, embed=1024, heads=16,
                                   kv_heads=8, layers=8, max_seq=256)
    params = make_transformer_params(cfg, 0)
    sched = DecodeScheduler(cfg, batch=batch, precision="bf16",
                            params=params, prefill_chunk=prefill_chunk,
                            kv_cache_dtype=kv_cache_dtype,
                            fuse_window=fuse_window,
                            weight_only=weight_only or None,
                            prefill_mode=prefill_mode)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab, size=(prompt_len,))
               .astype(np.int32) for _ in range(n_requests)]

    def reset():
        sched.steps_run = sched.prefill_steps_run = 0
        sched.fused_windows_run = sched.tokens_served = 0
        sched.bucket_prefills_run = 0
        for k in sched.phase_seconds:
            sched.phase_seconds[k] = 0.0

    def serve(stop_map=None):
        t0 = _t.perf_counter()
        futs = [sched.submit(
            p, max_new_tokens=max_new,
            stop_tokens=(stop_map or {}).get(i, ()))
            for i, p in enumerate(prompts)]
        outs = [f.result() for f in futs]
        return outs, _t.perf_counter() - t0

    # warm all compiled programs (decode T=1 + prefill bucket/chunk +
    # window), then RESET counters: the first window/step pays jit
    # compile wall (minutes through the relay) which must not leak into
    # the rates.  Warm with the REAL prompt length so the right bucket
    # program compiles.
    sched.submit(prompts[0], max_new_tokens=max(2, fuse_window + 1)).result()
    reset()
    outs, dt = serve()
    stop_map = None
    if stop_early:
        # each request stops at its own token from index ~max_new/2 (first
        # occurrence there, so the replay genuinely ends mid-stream)
        stop_map = {}
        for i, o in enumerate(outs):
            gen = [int(t) for t in o[prompt_len:]]
            half = max_new // 2
            idx = next((j for j in range(half, max_new)
                        if gen[j] not in gen[:j]), None)
            if idx is not None:
                stop_map[i] = (gen[idx],)
        reset()
        outs, dt = serve(stop_map)
    steps = sched.steps_run
    windows = sched.fused_windows_run
    decode_steps = steps - sched.prefill_steps_run
    phases = {k: round(v, 3) for k, v in sched.phase_seconds.items()}
    prefill_dispatches = (sched.bucket_prefills_run
                          if prefill_mode == "bucket"
                          else sched.prefill_steps_run)
    gen_tokens = sched.tokens_served
    sched.close()
    if stop_map is None:
        # futures resolve to prompt + generated tokens
        assert all(len(o) == prompt_len + max_new for o in outs)
    else:
        assert any(len(o) < prompt_len + max_new for o in outs), \
            "stop_early run never stopped early"
    tag = f"decode_scheduler_b{batch}_{prefill_mode}"
    if fuse_window:
        tag += f"_fused{fuse_window}"
    decode_s = phases["window"] + phases["step"]
    return {"name": name or tag,
            "requests": n_requests, "prompt_len": prompt_len,
            "max_new": max_new, "wall_s": round(dt, 3),
            "steps": steps, "fused_windows": windows,
            "prefill_dispatches": prefill_dispatches,
            "ms_per_step": round(dt / max(1, steps) * 1e3, 3),
            # pure decode rate (prefill excluded) — the number to
            # compare against the in-jit llm1b_*_rows_distinct rows
            "decode_ms_per_step": round(
                decode_s / max(1, decode_steps) * 1e3, 3),
            # admission cost: bucket-prefill wall over admitted prompts
            "admission_ms_per_prompt": round(
                phases["prefill"] / max(1, n_requests) * 1e3, 3),
            "admission_tok_per_s": round(
                n_requests * prompt_len / max(1e-9, phases["prefill"]), 1)
            if phases["prefill"] else None,
            "gen_tokens": gen_tokens,
            "phase_seconds": phases,
            "throughput": round(gen_tokens / dt, 1),
            "tflops_effective": 0.0}


def bench_prefill_longctx(batch=2, seq=2048, iters=20):
    """Long-context prefill: dense attention vs the autotuned graph (on TPU
    the tuner picks the Pallas flash kernel per the round-2 attention
    study).  Returns rows + the tuner's per-node decisions."""
    import anakin_tpu as ak
    from anakin_tpu.kernels.autotune import AutoTuner, autotune_graph
    from anakin_tpu.models.transformer import (
        TransformerConfig,
        build_transformer_lm,
    )
    from anakin_tpu.runtime.profiler import flops_estimate

    rng = np.random.default_rng(0)
    cfg = TransformerConfig(vocab=8000, embed=1024, heads=8, kv_heads=8,
                            layers=4, max_seq=seq)
    g = build_transformer_lm(cfg, batch=batch, seq_len=seq,
                             with_lengths=False)
    feed = {"input": rng.integers(0, cfg.vocab,
                                  size=(batch, seq)).astype(np.int32)}
    flops = sum(v["flops"] for v in flops_estimate(g).values())
    rows = []
    tuner = AutoTuner("artifacts/autotune_tpu.json")
    for name, graph in (("dense", g), ("tuned", autotune_graph(g, tuner))):
        net = ak.Net(graph, precision="bf16")
        dt = bench_chained(net, graph, feed, iters)
        impls = sorted({n.attrs.get("impl", "dense")
                        for n in graph.nodes.values()
                        if n.op == "multi_head_attention"})
        rows.append({"name": f"transformer_prefill_{name}_b{batch}xS{seq}",
                     "ms_per_batch": round(dt * 1e3, 3),
                     "throughput": round(batch * seq / dt, 1),
                     "tflops_effective": round(flops / dt / 1e12, 1),
                     "attention_impl": "/".join(impls)})
    return rows


def bench_speculative(k=4, new_tokens=192, timed_runs=3):
    """Speculative decoding at batch 1 (the latency path).

    Row 1 (`spec_verify_chunk`): target-only chunk scoring — tokens/sec of
    verify chunks of k+1 tokens chained in one jit.  This is the
    acceptance=100% ceiling: one weight read scores k+1 positions, vs one
    read per token in plain decode.
    Row 2 (`spec_fused`): the full fused loop (draft + verify + acceptance
    in one while_loop program) with a small draft.  Random weights give
    near-zero acceptance, so this is the overhead floor; real-model
    acceptance (0.6-0.9) lands between the rows (docs/BENCH_NOTES.md).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from anakin_tpu.models.transformer import TransformerConfig
    from anakin_tpu.runtime.speculative import SpeculativeSession

    cfg = TransformerConfig(vocab=16000, embed=1024, heads=16, kv_heads=8,
                            layers=8, max_seq=256)
    dcfg = TransformerConfig(vocab=16000, embed=256, heads=4, kv_heads=4,
                             layers=2, max_seq=256)
    sess = SpeculativeSession(cfg, dcfg, k=k, precision="bf16")
    rows = []

    # ceiling: chained verify chunks, one jit
    tnet, tgraph = sess.verify_net, sess.verify_graph
    t_att = [tgraph.nodes[f"ver_att_{i}"] for i in range(cfg.layers)]
    logits_e = tgraph.outputs[0]
    chunks = (cfg.max_seq - 1) // (k + 1)

    @jax.jit
    def verify_T(params, tok0):
        def body(t, carry):
            tok, caches = carry
            feed = {"input": tok,
                    "pos": jnp.full((1,), t * (k + 1), jnp.int32)}
            for i in range(cfg.layers):
                feed[f"cache_k_{i}"] = caches[2 * i]
                feed[f"cache_v_{i}"] = caches[2 * i + 1]
            out = tnet.forward(params, feed)
            nxt = jnp.argmax(out[logits_e][:, -1, :], -1).astype(jnp.int32)
            new = []
            for i in range(cfg.layers):
                new += [out[t_att[i].outputs[1]], out[t_att[i].outputs[2]]]
            return (jnp.broadcast_to(nxt[:, None], (1, k + 1)), tuple(new))

        # bf16 to match the bf16-precision net's emitted caches (the carry
        # must be dtype-stable across fori_loop iterations)
        caches0 = tuple(jnp.zeros((1, cfg.kv_heads, cfg.max_seq,
                                   cfg.head_dim), jnp.bfloat16)
                        for _ in range(2 * cfg.layers))
        tok, _ = lax.fori_loop(0, chunks, body, (tok0, caches0))
        return jnp.sum(tok)

    tok0 = jnp.zeros((1, k + 1), jnp.int32)
    float(verify_T(tnet.params, tok0))            # compile
    best = 1e9
    for _ in range(timed_runs):
        t0 = time.perf_counter()
        float(verify_T(tnet.params, tok0))
        best = min(best, time.perf_counter() - t0)
    tok_s = chunks * (k + 1) / best
    rows.append({"name": f"spec_verify_chunk{k + 1}_b1",
                 "ms_per_token": round(best / (chunks * (k + 1)) * 1e3, 4),
                 "throughput": round(tok_s, 1),
                 "tflops_effective": 0.0})

    # round-fused: ONE dispatch per round (k drafts + verify + accept),
    # host loop over rounds — the split-compile mode sized to pass the
    # relay's program-size cap (round-4; the whole-loop program below
    # exceeded it in round 3).  This is the hardware speculative number.
    prompt = np.arange(1, 17, dtype=np.int32)[None] % cfg.vocab
    try:
        sess.generate_round_fused(prompt, new_tokens)   # compile
        best = 1e9
        for _ in range(timed_runs):
            t0 = time.perf_counter()
            sess.generate_round_fused(prompt, new_tokens)
            best = min(best, time.perf_counter() - t0)
        rows.append({"name": f"spec_round_fused_k{k}_b1",
                     "ms_per_token": round(best / new_tokens * 1e3, 4),
                     "throughput": round(new_tokens / best, 1),
                     "acceptance": round(sess.acceptance_rate, 3),
                     "tflops_effective": 0.0})
    except Exception as e:  # pragma: no cover - relay dependent
        rows.append({"name": f"spec_round_fused_k{k}_b1",
                     "skipped": f"{type(e).__name__}: {str(e)[:160]}",
                     "tflops_effective": 0.0})

    # floor: the full fused loop with the small random draft.  The fused
    # program's serialized MLIR can exceed the remote-compile relay's
    # request-size cap (HTTP 413) — an environment limit, not a model
    # one — so degrade to the rows above instead of losing the suite.
    try:
        sess.generate_fused(prompt, new_tokens)   # compile
    except Exception as e:  # pragma: no cover - relay-size dependent
        rows.append({"name": f"spec_fused_k{k}_b1",
                     "skipped": f"{type(e).__name__}: {str(e)[:160]}",
                     "tflops_effective": 0.0})
        return rows
    best = 1e9
    for _ in range(timed_runs):
        t0 = time.perf_counter()
        sess.generate_fused(prompt, new_tokens)
        best = min(best, time.perf_counter() - t0)
    rows.append({"name": f"spec_fused_k{k}_b1",
                 "ms_per_token": round(best / new_tokens * 1e3, 4),
                 "throughput": round(new_tokens / best, 1),
                 "acceptance": round(sess.acceptance_rate, 3),
                 "tflops_effective": 0.0})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    iters = 20 if args.quick else 60

    import anakin_tpu as ak
    from anakin_tpu.models import (
        build_mobilenet_v1,
        build_mobilenet_v2,
        build_resnet50,
        build_vgg16,
    )
    from anakin_tpu.models.lstm_lm import build_lstm_lm
    from anakin_tpu.quant import calibrate, quantize_graph
    from anakin_tpu.runtime.profiler import flops_estimate

    rng = np.random.default_rng(0)
    results = []

    class _FlushList(list):
        """Rewrite the artifact after every row so a late-row failure
        (or a timeout) never loses the measured prefix."""

        def append(self, rec):
            super().append(rec)
            with open("artifacts/bench_suite.json", "w") as f:
                json.dump(list(self), f, indent=1)

    results = _FlushList()

    def run(name, graph, feed, precision="bf16", quant_scales=None,
            unit_per_batch=None):
        g = graph
        if quant_scales is not None:
            g = quantize_graph(g, quant_scales)
        net = ak.Net(g, precision=precision)
        dt = bench_chained(net, g, feed, iters)
        flops = sum(v["flops"] for v in flops_estimate(g).values())
        rec = {
            "name": name,
            "ms_per_batch": round(dt * 1e3, 3),
            "throughput": round((unit_per_batch or 1) / dt, 1),
            "tflops_effective": round(flops / dt / 1e12, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    def cal_scales(builder, shape, **kw):
        g1 = ak.optimize(builder(batch=1, **kw))
        cal = [{"input": rng.normal(size=(1,) + shape).astype(np.float32)}
               for _ in range(2)]
        return calibrate(g1, cal, method="max")

    # ResNet-50 (b128 = the BENCH_r03 headline configuration)
    scales_r50 = cal_scales(build_resnet50, (224, 224, 3), image_size=224)
    for batch in (1, 8, 32, 128):
        g = ak.optimize(build_resnet50(batch=batch, image_size=224))
        x = {"input": rng.normal(size=(batch, 224, 224, 3)).astype(np.float32)}
        run(f"resnet50_bf16_b{batch}", g, x, "bf16", unit_per_batch=batch)
        run(f"resnet50_int8_b{batch}", g, x, "bf16", quant_scales=scales_r50,
            unit_per_batch=batch)
    g = ak.optimize(build_resnet50(batch=1, image_size=224))
    x = {"input": rng.normal(size=(1, 224, 224, 3)).astype(np.float32)}
    run("resnet50_fp32_b1", g, x, "fp32", unit_per_batch=1)

    # ResNet-101 (BASELINE README.md:73 rows)
    from anakin_tpu.models import build_resnet101
    scales_r101 = cal_scales(build_resnet101, (224, 224, 3), image_size=224)
    for batch in (1, 8):
        g = ak.optimize(build_resnet101(batch=batch, image_size=224))
        x = {"input": rng.normal(size=(batch, 224, 224, 3)).astype(np.float32)}
        run(f"resnet101_bf16_b{batch}", g, x, "bf16", unit_per_batch=batch)
        run(f"resnet101_int8_b{batch}", g, x, "bf16",
            quant_scales=scales_r101, unit_per_batch=batch)

    # GoogLeNet (BASELINE README.md:157 row; exercises horizontal-combine)
    from anakin_tpu.models import build_googlenet
    g = ak.optimize(build_googlenet(batch=8, image_size=224))
    x = {"input": rng.normal(size=(8, 224, 224, 3)).astype(np.float32)}
    run("googlenet_bf16_b8", g, x, "bf16", unit_per_batch=8)

    # VGG16-SSD detection (BASELINE README.md:104 row)
    from anakin_tpu.models import build_ssd_vgg16
    g = ak.optimize(build_ssd_vgg16(batch=1, image_size=300))
    x = {"input": rng.normal(size=(1, 300, 300, 3)).astype(np.float32)}
    run("ssd_vgg16_bf16_b1", g, x, "bf16", unit_per_batch=1)

    # VGG16
    scales_vgg = cal_scales(build_vgg16, (224, 224, 3), image_size=224)
    for batch in (1, 8):
        g = ak.optimize(build_vgg16(batch=batch, image_size=224))
        x = {"input": rng.normal(size=(batch, 224, 224, 3)).astype(np.float32)}
        run(f"vgg16_bf16_b{batch}", g, x, "bf16", unit_per_batch=batch)
    run("vgg16_int8_b8", g, x, "bf16", quant_scales=scales_vgg,
        unit_per_batch=8)

    # MobileNets — b8 (small-batch regime: bf16 wins) AND b128 (the
    # crossover evidence behind quant/policy.py's b>=64 int8 switch)
    for nm, builder in (("mobilenet_v1", build_mobilenet_v1),
                        ("mobilenet_v2", build_mobilenet_v2)):
        scales = cal_scales(builder, (224, 224, 3), image_size=224)
        for batch in (8, 128):
            g = ak.optimize(builder(batch=batch, image_size=224))
            x = {"input": rng.normal(
                size=(batch, 224, 224, 3)).astype(np.float32)}
            run(f"{nm}_bf16_b{batch}", g, x, "bf16", unit_per_batch=batch)
            run(f"{nm}_int8_b{batch}", g, x, "bf16", quant_scales=scales,
                unit_per_batch=batch)

    # Detection graphs (BASELINE config 5 / VERDICT round-2 task 7):
    # full two-stage Faster-RCNN and YOLOv3-tiny, bf16 + int8 backbone
    from anakin_tpu.models import build_faster_rcnn
    from anakin_tpu.models.detection import build_yolo_v3_tiny

    g = ak.optimize(build_faster_rcnn(batch=1, image_size=224))
    frc_feed = {
        "input": rng.normal(size=(1, 224, 224, 3)).astype(np.float32),
        "im_info": np.array([[224.0, 224.0, 1.0]], np.float32),
    }
    run("faster_rcnn_bf16_b1", g, frc_feed, "bf16", unit_per_batch=1)
    cal = [{**frc_feed,
            "input": rng.normal(size=(1, 224, 224, 3)).astype(np.float32)}
           for _ in range(2)]
    run("faster_rcnn_int8_b1", g, frc_feed, "bf16",
        quant_scales=calibrate(g, cal, method="max"), unit_per_batch=1)

    g = ak.optimize(build_yolo_v3_tiny(batch=1, image_size=416))
    yolo_feed = {
        "input": rng.normal(size=(1, 416, 416, 3)).astype(np.float32),
        "img_size": np.array([[416, 416]], np.int32),
    }
    run("yolo_v3_tiny_bf16_b1", g, yolo_feed, "bf16", unit_per_batch=1)
    cal = [{**yolo_feed,
            "input": rng.normal(size=(1, 416, 416, 3)).astype(np.float32)}
           for _ in range(2)]
    run("yolo_v3_tiny_int8_b1", g, yolo_feed, "bf16",
        quant_scales=calibrate(g, cal, method="max"), unit_per_batch=1)

    # LSTM LM (tokens/sec)
    g = build_lstm_lm(batch=8, seq_len=64)
    feed = {"input": rng.integers(0, 10000, size=(8, 64)).astype(np.int32),
            "lengths": np.full((8,), 64, np.int32)}
    run("lstm_lm_bf16_b8xT64", g, feed, "bf16", unit_per_batch=8 * 64)

    # Transformer KV-cache decode (tokens/sec, whole loop in ONE jit so
    # the relay RTT cannot masquerade as per-token latency)
    for wo, kv in ((False, "float32"), (True, "float32"), (True, "int8")):
        rec = bench_transformer_decode(batch=32, steps=64, weight_only=wo,
                                       kv_cache_dtype=kv)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # 1B-class serving decode (production scale: E=2048, 16 layers, GQA 8,
    # max_seq 2048) — the kv8 + aligned single-row-write ladder
    from anakin_tpu.models.transformer import TransformerConfig
    cfg_1b = TransformerConfig(vocab=32000, embed=2048, heads=16, kv_heads=8,
                               layers=16, max_seq=2048)
    for wo, kv, al in ((False, "float32", False), (True, "float32", False),
                       (True, "int8", False), (True, "int8", True),
                       ("w4", "int8", False), ("w4", "int8", True)):
        rec = bench_transformer_decode(batch=8, steps=32, weight_only=wo,
                                       kv_cache_dtype=kv, cfg=cfg_1b,
                                       aligned_pos=al, name_prefix="llm1b_")
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # cache-write strategy A/B at DISTINCT per-row positions (the
    # continuous-batching case where `aligned_pos` is ineligible): one-hot
    # blend (rewrites the whole 2048-row cache) vs per-row
    # dynamic_update_slice chain vs XLA scatter (VERDICT round-2 task 8)
    for upd in ("blend", "rows", "scatter"):
        rec = bench_transformer_decode(batch=8, steps=32, weight_only=True,
                                       kv_cache_dtype="int8", cfg=cfg_1b,
                                       name_prefix="llm1b_",
                                       cache_update=upd, distinct_pos=True)
        results.append(rec)
        print(json.dumps(rec), flush=True)
    # w4 at the SAME distinct+rows protocol — the round-4 finding: round 3
    # only ever ran w4 with the blend write (4.68 ms) and concluded "w4
    # loses continuous batching" against w8+rows (3.79); w4+rows measures
    # 3.58 and WINS by ~6% (the weight-byte story holds once the cache
    # write strategy matches)
    rec = bench_transformer_decode(batch=8, steps=32, weight_only="w4",
                                   kv_cache_dtype="int8", cfg=cfg_1b,
                                   name_prefix="llm1b_",
                                   cache_update="rows", distinct_pos=True)
    results.append(rec)
    print(json.dumps(rec), flush=True)

    # continuous-batching scheduler end-to-end (mixed prefill+decode).
    # Per-step host dispatch vs the fused K-step window (round-4: one
    # dispatch per 16 steps), plus the window at the 1B-class w8+kv8
    # config — the row to compare against llm1b_*_rows_distinct above.
    for fw in (0, 16):
        rec = bench_decode_scheduler(fuse_window=fw)
        results.append(rec)
        print(json.dumps(rec), flush=True)
    # legacy chunked admission (round-3/4 path) for the bucket-vs-chunk
    # admission comparison at the same config
    rec = bench_decode_scheduler(fuse_window=16, prefill_mode="chunked",
                                 name="decode_scheduler_b8_chunk8_fused16")
    results.append(rec)
    print(json.dumps(rec), flush=True)
    for wo in ("w8", "w4"):
        rec = bench_decode_scheduler(
            fuse_window=32, cfg=cfg_1b, kv_cache_dtype="int8",
            weight_only=wo, n_requests=8, max_new=96,
            name=f"decode_scheduler_llm1b_{wo}_kv8_fused32_b8")
        results.append(rec)
        print(json.dumps(rec), flush=True)
    # round-5 serving headline config: whole-budget windows (early exit
    # makes oversizing free) + bucketed cache views (both defaults)
    for wo in ("w8", "w4"):
        rec = bench_decode_scheduler(
            fuse_window=96, cfg=cfg_1b, kv_cache_dtype="int8",
            weight_only=wo, n_requests=8, max_new=96,
            name=f"decode_scheduler_llm1b_{wo}_kv8_fused96_b8")
        results.append(rec)
        print(json.dumps(rec), flush=True)
    # llama-class recipe (RMSNorm + SwiGLU) through the same serving path
    cfg_llama = TransformerConfig(vocab=32000, embed=2048, heads=16,
                                  kv_heads=8, layers=16, max_seq=2048,
                                  norm="rms", mlp="swiglu")
    rec = bench_decode_scheduler(
        fuse_window=96, cfg=cfg_llama, kv_cache_dtype="int8",
        weight_only="w8", n_requests=8, max_new=96,
        name="decode_scheduler_llama1b_w8_kv8_fused96_b8")
    results.append(rec)
    print(json.dumps(rec), flush=True)

    # round-5 (VERDICT task 1): REALISTIC prompt lengths.  Bucket
    # admission makes 512/2048-token prompts one dispatch per wave;
    # admission_ms_per_prompt is the number round 4 never measured
    # (the chunked path cost ~47 ms x ceil(P/8) ≈ 3 s at P=512).
    for wo in ("w8", "w4"):
        rec = bench_decode_scheduler(
            fuse_window=32, cfg=cfg_1b, kv_cache_dtype="int8",
            weight_only=wo, n_requests=8, max_new=96, prompt_len=512,
            name=f"decode_scheduler_llm1b_{wo}_kv8_fused32_b8_p512")
        results.append(rec)
        print(json.dumps(rec), flush=True)
    cfg_1b_long = TransformerConfig(vocab=32000, embed=2048, heads=16,
                                    kv_heads=8, layers=16, max_seq=2176)
    rec = bench_decode_scheduler(
        fuse_window=32, cfg=cfg_1b_long, kv_cache_dtype="int8",
        weight_only="w8", n_requests=8, max_new=96, prompt_len=2048,
        name="decode_scheduler_llm1b_w8_kv8_fused32_b8_p2048")
    results.append(rec)
    print(json.dumps(rec), flush=True)

    # round-5 (VERDICT task 3): requests that stop early via device-side
    # stop tokens — throughput counts USEFUL tokens only; the fused
    # window early-exits instead of decoding dead tokens to max_new
    rec = bench_decode_scheduler(
        fuse_window=32, cfg=cfg_1b, kv_cache_dtype="int8",
        weight_only="w8", n_requests=8, max_new=96, stop_early=True,
        name="decode_scheduler_llm1b_w8_kv8_fused32_b8_stopearly")
    results.append(rec)
    print(json.dumps(rec), flush=True)

    # long-context prefill: dense vs autotuned (Pallas flash on TPU)
    for rec in bench_prefill_longctx():
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # batch-1 latency path: plain decode vs speculative verify/fused
    rec = bench_transformer_decode(batch=1, steps=64)
    results.append(rec)
    print(json.dumps(rec), flush=True)
    for rec in bench_speculative():
        results.append(rec)
        print(json.dumps(rec), flush=True)

    with open("artifacts/bench_suite.json", "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote artifacts/bench_suite.json ({len(results)} rows)")


if __name__ == "__main__":
    main()
