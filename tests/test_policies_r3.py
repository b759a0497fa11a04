"""Round-3 policy-as-code tests: per-(model, batch) precision chooser,
prompt-length bucketing, per-row cache-write modes, flash seq padding,
autotuner cache schema versioning (VERDICT round-2 tasks 3, 8, 9)."""

import json

import numpy as np
import pytest

import anakin_tpu as ak


# ------------------------------------------------------------ precision
def test_choose_precision_depthwise_batch_branches():
    from anakin_tpu.models import build_mobilenet_v1, build_resnet50
    from anakin_tpu.quant import choose_precision, is_depthwise_dominated

    mb = ak.optimize(build_mobilenet_v1(batch=8, image_size=64))
    rn = ak.optimize(build_resnet50(batch=8, image_size=64))
    assert is_depthwise_dominated(mb)
    assert not is_depthwise_dominated(rn)
    # round-5 refreshed policy (depthwise_crossover_r5): int8 wins the
    # MobileNet class from b8 down to b4-by-convention; bf16 only at b1-3
    assert choose_precision(mb, 1) == "bf16"
    assert choose_precision(mb, 4) == "int8"
    assert choose_precision(mb, 8) == "int8"
    assert choose_precision(mb, 32) == "int8"
    assert choose_precision(mb, 128) == "int8"
    # dense conv nets (round-5 dispatch attribution): int8 wins ON
    # DEVICE at every batch, but per-request dispatch serving pays the
    # ~1.5x int8 param-tree per call — int8 only once the device compute
    # per dispatch covers it (100 GFLOP gate, resolution-aware)
    rn224 = ak.optimize(build_resnet50(batch=8, image_size=224))
    assert choose_precision(rn224, 1) == "bf16"     # 8 GFLOP
    assert choose_precision(rn224, 8) == "bf16"     # 66 GFLOP (suite -10%)
    assert choose_precision(rn224, 16) == "int8"    # 131 GFLOP
    assert choose_precision(rn224, 128) == "int8"
    # a 64px graph presents ~12x less work per dispatch: gate follows
    assert choose_precision(rn, 16) == "bf16"
    assert choose_precision(rn, 256) == "int8"
    # dispatch-amortized callers (in-graph loops) get the device truth
    assert choose_precision(rn224, 1, dispatch_bound=False) == "int8"


def test_apply_precision_policy_quantizes_when_chosen(rng):
    from anakin_tpu.models import build_mobilenet_v1
    from anakin_tpu.quant import apply_precision_policy, calibrate

    g = ak.optimize(build_mobilenet_v1(batch=1, image_size=32))
    cal = [{"input": rng.normal(size=(1, 32, 32, 3)).astype(np.float32)}]
    scales = calibrate(g, cal, method="max")

    g_lo, p_lo = apply_precision_policy(g, 1, scales)
    assert p_lo == "bf16" and "quantize_graph" not in g_lo.applied_passes
    g_hi, p_hi = apply_precision_policy(g, 128, scales)
    assert p_hi == "int8" and "quantize_graph" in g_hi.applied_passes
    # no scales -> int8 decision degrades to bf16 instead of crashing
    g_ns, p_ns = apply_precision_policy(g, 128, None)
    assert p_ns == "bf16"
    # already-quantized graphs pass through untouched
    g2, p2 = apply_precision_policy(g_hi, 8, scales)
    assert p2 == "int8" and g2 is g_hi


# ------------------------------------------------------------- bucketing
def test_generation_session_buckets_prompt_lengths(rng):
    """Odd prompt lengths share one bucketed prefill program and produce
    the exact tokens an exact-length prefill produces (causal padding is
    a no-op for the last real position)."""
    from anakin_tpu.models.transformer import TransformerConfig
    from anakin_tpu.runtime.generate import GenerationSession

    cfg = TransformerConfig(vocab=50, embed=32, heads=2, kv_heads=2,
                            layers=2, max_seq=128)
    sess = GenerationSession(cfg, batch=1)
    exact = GenerationSession(cfg, batch=1)
    exact._bucket = lambda P: P  # disable bucketing for the reference

    for P in (5, 37, 38, 65):
        prompt = rng.integers(0, 50, size=(1, P)).astype(np.int32)
        got = sess.generate(prompt, max_new_tokens=6)
        want = exact.generate(prompt, max_new_tokens=6)
        np.testing.assert_array_equal(got, want, err_msg=f"P={P}")
    # 5 -> 32; 37 and 38 share the 64-bucket; 65 lands in 128
    assert set(sess._prefill_nets) == {32, 64, 128}
    assert set(exact._prefill_nets) == {5, 37, 38, 65}


def test_bucket_boundaries():
    from anakin_tpu.models.transformer import TransformerConfig
    from anakin_tpu.runtime.generate import GenerationSession

    cfg = TransformerConfig(vocab=16, embed=16, heads=2, kv_heads=2,
                            layers=1, max_seq=1024)
    s = GenerationSession(cfg, batch=1)
    assert s._bucket(1) == 32 and s._bucket(32) == 32
    assert s._bucket(33) == 64 and s._bucket(64) == 64
    assert s._bucket(65) == 128 and s._bucket(129) == 256
    assert s._bucket(1000) == 1024  # capped at max_seq


# ------------------------------------------------- cache update modes
@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
@pytest.mark.parametrize("mode", ["rows", "scatter"])
def test_cache_update_modes_match_blend(rng, mode, kv_dtype):
    """Distinct per-row positions: the per-row DUS chain and the scatter
    write the same cache and logits as the one-hot blend."""
    from anakin_tpu.models.transformer import (
        TransformerConfig, build_transformer_decode_step,
        make_transformer_params)

    cfg = TransformerConfig(vocab=40, embed=32, heads=2, kv_heads=2,
                            layers=1, max_seq=16)
    params = make_transformer_params(cfg, 3)
    B = 4
    feed = {"input": rng.integers(0, 40, size=(B, 1)).astype(np.int32),
            "pos": np.array([0, 3, 7, 15], np.int32)}
    cdt = np.int8 if kv_dtype == "int8" else np.float32
    shape = (B, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
    for i in range(cfg.layers):
        feed[f"cache_k_{i}"] = rng.integers(-5, 5, shape).astype(cdt)
        feed[f"cache_v_{i}"] = rng.integers(-5, 5, shape).astype(cdt)

    outs = {}
    for upd in ("blend", mode):
        g = build_transformer_decode_step(cfg, B, params,
                                          kv_cache_dtype=kv_dtype,
                                          kv_scale=0.05, cache_update=upd)
        outs[upd] = {e: np.asarray(v)
                     for e, v in ak.Net(g).prediction(feed).items()}
    for e in outs["blend"]:
        np.testing.assert_allclose(outs[mode][e], outs["blend"][e],
                                   rtol=1e-5, atol=1e-6, err_msg=e)


# ------------------------------------------------------- flash padding
def test_flash_pads_unaligned_seq(rng, monkeypatch):
    """multi_head_attention impl=flash at S=300 (not a 128 multiple) pads
    internally and matches the dense path on all real rows."""
    monkeypatch.setenv("ANAKIN_PALLAS_INTERPRET", "1")
    from anakin_tpu.graph.ir import GraphBuilder

    B, S, E, H = 2, 300, 32, 2
    x = rng.normal(size=(B, S, E)).astype(np.float32)
    ws = {k: rng.normal(0, E ** -0.5, (E, E)).astype(np.float32)
          for k in ("wq", "wk", "wv", "wo")}
    outs = {}
    for impl in (None, "flash"):
        b = GraphBuilder("attn")
        xi = b.input((B, S, E), name="x")
        e = {k: b.graph.add_param(k, v) for k, v in ws.items()}
        y = b.op("multi_head_attention",
                 [xi, e["wq"], e["wk"], e["wv"], e["wo"]],
                 num_heads=H, causal=True, rope=True,
                 **({} if impl is None else {"impl": impl}))
        b.output(y)
        g = b.finish()
        outs[impl] = np.asarray(ak.Net(g).prediction({"x": x})[g.outputs[0]])
    np.testing.assert_allclose(outs["flash"], outs[None],
                               rtol=2e-4, atol=2e-5)


def test_flash_rejects_unaligned_blocks_on_hardware_path(rng):
    """Without interpret mode, an odd S raises a clear error instead of
    hitting Mosaic's sublane constraint at compile time (ADVICE round-2)."""
    import jax

    from anakin_tpu.kernels.flash_attention import flash_attention

    q = np.zeros((1, 1, 300, 8), np.float32)
    with pytest.raises((ValueError, jax.errors.JaxRuntimeError),
                       match="8-aligned|multiple of 128"):
        np.asarray(flash_attention(q, q, q, interpret=False))


# ------------------------------------------------- autotuner cache schema
def test_autotuner_cache_schema_versioning(tmp_path):
    from anakin_tpu.kernels.autotune import _CACHE_SCHEMA, AutoTuner

    p = str(tmp_path / "tune.json")
    # legacy flat format (pre-schema): silently dropped, not kept forever
    with open(p, "w") as f:
        json.dump({"old-key": "pallas"}, f)
    t = AutoTuner(p)
    assert t.cache == {}
    # new entries round-trip through the versioned envelope
    t.cache["k1"] = "xla"
    t._save()
    with open(p) as f:
        doc = json.load(f)
    assert doc["__schema__"] == _CACHE_SCHEMA and doc["entries"]["k1"] == "xla"
    assert AutoTuner(p).cache == {"k1": "xla"}
    # a future schema bump also invalidates
    doc["__schema__"] = _CACHE_SCHEMA + 1
    with open(p, "w") as f:
        json.dump(doc, f)
    assert AutoTuner(p).cache == {}


def test_scheduler_cache_update_auto_policy():
    """DecodeScheduler picks blend at small max_seq, per-row writes at
    production cache sizes (the measured crossover policy as code)."""
    from anakin_tpu.models.transformer import TransformerConfig
    from anakin_tpu.runtime.decode_scheduler import DecodeScheduler

    small = TransformerConfig(vocab=32, embed=32, heads=2, kv_heads=2,
                              layers=1, max_seq=64)
    big = TransformerConfig(vocab=32, embed=32, heads=2, kv_heads=2,
                            layers=1, max_seq=2048)
    s1 = DecodeScheduler(small, batch=2, prefill_chunk=1)
    s2 = DecodeScheduler(big, batch=2, prefill_chunk=1)
    try:
        assert s1.cache_update == "blend"
        assert s2.cache_update == "rows"
        att = s2.graph.nodes["dec_att_0"]
        assert att.attr("cache_update") == "rows"
        # generation through the rows path stays correct
        out = s2.submit(np.array([3, 5, 7], np.int32),
                        max_new_tokens=4).result(timeout=60)
        assert out.shape == (7,)
    finally:
        s1.close()
        s2.close()


def test_verify_rows_cache_update_matches_blend(rng):
    """mha_verify chunk writes via per-row block DUS == one-hot blend."""
    from anakin_tpu.models.transformer import (
        TransformerConfig, build_transformer_verify_step,
        make_transformer_params)

    cfg = TransformerConfig(vocab=40, embed=32, heads=2, kv_heads=2,
                            layers=1, max_seq=32)
    params = make_transformer_params(cfg, 3)
    B, T = 3, 4
    feed = {"input": rng.integers(0, 40, size=(B, T)).astype(np.int32),
            "pos": np.array([0, 5, 28], np.int32)}
    shape = (B, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
    for i in range(cfg.layers):
        feed[f"cache_k_{i}"] = rng.normal(size=shape).astype(np.float32)
        feed[f"cache_v_{i}"] = rng.normal(size=shape).astype(np.float32)
    outs = {}
    for upd in ("blend", "rows"):
        g = build_transformer_verify_step(cfg, B, T, params,
                                          cache_update=upd)
        outs[upd] = {e: np.asarray(v)
                     for e, v in ak.Net(g).prediction(feed).items()}
    for e in outs["blend"]:
        np.testing.assert_allclose(outs["rows"][e], outs["blend"][e],
                                   rtol=1e-5, atol=1e-6, err_msg=e)


def test_detection_precision_policy(rng):
    """Round-4 detection rule: detection-head graphs (YOLO/SSD/RCNN
    class) stay bf16 below the measured b32 crossover (int8 lost -18%
    at b1, -8% at b8, won +14% at b32 on yolo-tiny@416 — BENCH_NOTES
    round-4 attribution study); dense conv nets keep int8 at b1."""
    import anakin_tpu as ak
    from anakin_tpu.models import build_resnet50
    from anakin_tpu.models.detection import build_yolo_v3_tiny
    from anakin_tpu.quant.policy import (INT8_DETECTION_MIN_BATCH,
                                         choose_precision,
                                         is_detection_graph)

    yolo = ak.optimize(build_yolo_v3_tiny(batch=1, image_size=160,
                                          num_classes=5))
    resnet = ak.optimize(build_resnet50(batch=1, image_size=64))
    assert is_detection_graph(yolo)
    assert not is_detection_graph(resnet)
    assert choose_precision(yolo, 1) == "bf16"
    assert choose_precision(yolo, 8) == "bf16"
    assert choose_precision(yolo, INT8_DETECTION_MIN_BATCH) == "int8"
    assert choose_precision(yolo, 32) == "int8"
    # round-5: plain conv nets gate on the dispatch crossover (GFLOP
    # per dispatch; device-level int8 win holds: dispatch_bound=False)
    assert choose_precision(resnet, 1) == "bf16"
    assert choose_precision(resnet, 1, dispatch_bound=False) == "int8"
    assert choose_precision(resnet, 256) == "int8"   # 64px graph
