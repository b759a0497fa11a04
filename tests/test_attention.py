"""Attention stack tests: flash kernel, MHA op, KV-cache decode, ring
attention on the virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import anakin_tpu as ak
from anakin_tpu.kernels.flash_attention import flash_attention, mha_reference


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_matches_reference(rng, causal):
    B, H, S, D = 2, 3, 256, 64
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    got = np.asarray(flash_attention(q, k, v, causal=causal, interpret=True))
    want = np.asarray(mha_reference(q, k, v, causal=causal))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flash_attention_segments(rng):
    B, H, S, D = 1, 2, 256, 64
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    segs = jnp.asarray(rng.integers(0, 3, size=(B, S)).astype(np.int32))
    got = np.asarray(flash_attention(q, k, v, segs, segs, interpret=True))
    want = np.asarray(mha_reference(q, k, v, segs, segs))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mha_op_vs_torch(rng):
    """Graph-level MHA (no rope, full heads) vs torch reference."""
    import torch

    B, S, E, H = 2, 8, 32, 4
    D = E // H
    x = rng.normal(size=(B, S, E)).astype(np.float32)
    wq = rng.normal(size=(E, E)).astype(np.float32) * 0.2
    wk = rng.normal(size=(E, E)).astype(np.float32) * 0.2
    wv = rng.normal(size=(E, E)).astype(np.float32) * 0.2
    wo = rng.normal(size=(E, E)).astype(np.float32) * 0.2
    from tests.test_ops import run_op

    got = run_op("multi_head_attention", [x, wq, wk, wv, wo],
                 num_heads=H, causal=False, rope=False)[0]
    mha = torch.nn.MultiheadAttention(E, H, batch_first=True, bias=False)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.from_numpy(
            np.concatenate([wq.T, wk.T, wv.T], axis=0)))
        mha.out_proj.weight.copy_(torch.from_numpy(wo.T))
    xt = torch.from_numpy(x)
    want, _ = mha(xt, xt, xt, need_weights=False)
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=2e-4, atol=2e-4)


def test_transformer_prefill_vs_decode_cache(rng):
    """Decode-step logits with KV cache must equal prefill logits."""
    from anakin_tpu.models.transformer import (
        TransformerConfig, build_transformer_lm, make_transformer_params)
    from anakin_tpu.runtime.generate import GenerationSession

    cfg = TransformerConfig(vocab=50, embed=32, heads=4, kv_heads=2,
                            layers=2, max_seq=12)
    params = make_transformer_params(cfg, seed=1)
    B, S = 2, 6
    ids = rng.integers(0, 50, size=(B, S)).astype(np.int32)
    g = build_transformer_lm(cfg, B, S, params, with_lengths=False)
    prefill = np.asarray(ak.Net(g).prediction({"input": ids})[g.outputs[0]])

    sess = GenerationSession(cfg, batch=B, params=params)
    caches = sess._empty_caches()
    outs = []
    for t in range(S):
        logits, caches = sess._step(ids[:, t], t, caches)
        outs.append(np.asarray(logits)[:, 0])
    decode = np.stack(outs, axis=1)
    np.testing.assert_allclose(decode, prefill, rtol=1e-4, atol=1e-5)


def test_generate_deterministic(rng):
    from anakin_tpu.models.transformer import TransformerConfig
    from anakin_tpu.runtime.generate import GenerationSession

    cfg = TransformerConfig(vocab=30, embed=32, heads=2, kv_heads=2,
                            layers=1, max_seq=16)
    sess = GenerationSession(cfg, batch=1)
    prompt = rng.integers(0, 30, size=(1, 4)).astype(np.int32)
    out1 = sess.generate(prompt, max_new_tokens=6)
    out2 = sess.generate(prompt, max_new_tokens=6)
    assert out1.shape == (1, 10)
    np.testing.assert_array_equal(out1, out2)
    np.testing.assert_array_equal(out1[:, :4], prompt)


def test_transformer_lm_with_lengths_masks_padding(rng):
    from anakin_tpu.models.transformer import (
        TransformerConfig, build_transformer_lm, make_transformer_params)

    cfg = TransformerConfig(vocab=40, embed=32, heads=4, kv_heads=4,
                            layers=1, max_seq=16)
    params = make_transformer_params(cfg, seed=2)
    B, S = 1, 8
    ids = rng.integers(0, 40, size=(B, S)).astype(np.int32)
    g = build_transformer_lm(cfg, B, S, params, with_lengths=True)
    net = ak.Net(g)
    # with length 5, logits at positions < 5 must not depend on ids >= 5
    base = np.asarray(net.prediction(
        {"input": ids, "lengths": np.array([5], np.int32)})[g.outputs[0]])
    ids2 = ids.copy()
    ids2[0, 6] = (ids2[0, 6] + 7) % 40
    alt = np.asarray(net.prediction(
        {"input": ids2, "lengths": np.array([5], np.int32)})[g.outputs[0]])
    np.testing.assert_allclose(base[0, :5], alt[0, :5], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_dense(rng, causal):
    from anakin_tpu.parallel import make_mesh
    from anakin_tpu.parallel.ring_attention import ring_attention

    mesh = make_mesh(model=1)  # 8-way data axis
    B, H, S, D = 1, 2, 64, 32  # S sharded 8 x 8
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    got = np.asarray(ring_attention(q, k, v, mesh, axis="data", causal=causal))
    want = np.asarray(mha_reference(q, k, v, causal=causal))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_prefill_caches_match_decode_steps(rng):
    """mha_prefill's emitted caches == sequential mha_decode caches."""
    import numpy as np

    import anakin_tpu as ak
    from anakin_tpu.models.transformer import (
        TransformerConfig, build_transformer_decode_step,
        build_transformer_prefill, make_transformer_params)

    cfg = TransformerConfig(vocab=64, embed=64, heads=4, kv_heads=2,
                            layers=2, max_seq=12)
    params = make_transformer_params(cfg, 3)
    B, P = 2, 5
    prompt = rng.integers(0, 64, (B, P)).astype(np.int32)

    pg = build_transformer_prefill(cfg, B, P, params)
    pout = ak.Net(pg).prediction({"input": prompt})

    dg = build_transformer_decode_step(cfg, B, params)
    dnet = ak.Net(dg)
    shape = (B, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
    caches = {}
    for i in range(cfg.layers):
        caches[f"cache_k_{i}"] = np.zeros(shape, np.float32)
        caches[f"cache_v_{i}"] = np.zeros(shape, np.float32)
    logits = None
    for t in range(P):
        feed = dict(caches)
        feed["input"] = prompt[:, t:t + 1]
        feed["pos"] = np.full((B,), t, np.int32)
        out = dnet.prediction(feed)
        logits = out[dg.outputs[0]]
        for i in range(cfg.layers):
            node = dg.nodes[f"dec_att_{i}"]
            caches[f"cache_k_{i}"] = out[node.outputs[1]]
            caches[f"cache_v_{i}"] = out[node.outputs[2]]

    for i in range(cfg.layers):
        node = pg.nodes[f"pre_att_{i}"]
        np.testing.assert_allclose(
            np.asarray(pout[node.outputs[1]]),
            np.asarray(caches[f"cache_k_{i}"]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(pout[node.outputs[2]]),
            np.asarray(caches[f"cache_v_{i}"]), rtol=1e-4, atol=1e-5)
    # last-position prefill logits == last decode-step logits
    np.testing.assert_allclose(
        np.asarray(pout[pg.outputs[0]])[:, P - 1], np.asarray(logits)[:, 0],
        rtol=1e-4, atol=1e-4)


def test_int8_kv_cache_decode(rng):
    """int8 KV cache: prefill+decode chain agrees with the fp-cache chain
    (argmax-exact at these scales, small logit drift allowed)."""
    import numpy as np

    import anakin_tpu as ak
    from anakin_tpu.models.transformer import (
        TransformerConfig, build_transformer_decode_step,
        build_transformer_prefill, make_transformer_params)

    cfg = TransformerConfig(vocab=64, embed=64, heads=4, kv_heads=2,
                            layers=2, max_seq=16)
    params = make_transformer_params(cfg, 1)
    B, P = 2, 4
    prompt = rng.integers(0, 64, (B, P)).astype(np.int32)

    outs = {}
    for dt in ("float32", "int8"):
        pg = build_transformer_prefill(cfg, B, P, params, kv_cache_dtype=dt,
                                       kv_scale=0.02)
        pout = ak.Net(pg).prediction({"input": prompt})
        dg = build_transformer_decode_step(cfg, B, params, kv_cache_dtype=dt,
                                           kv_scale=0.02)
        dnet = ak.Net(dg)
        feed = {"input": prompt[:, -1:],
                "pos": np.full((B,), P, np.int32)}
        for i in range(cfg.layers):
            node = pg.nodes[f"pre_att_{i}"]
            feed[f"cache_k_{i}"] = pout[node.outputs[1]]
            feed[f"cache_v_{i}"] = pout[node.outputs[2]]
        if dt == "int8":
            assert np.asarray(feed["cache_k_0"]).dtype == np.int8
        out = dnet.prediction(feed)
        outs[dt] = np.asarray(out[dg.outputs[0]])[:, 0]
    a, b = outs["float32"], outs["int8"]
    np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-6) < 0.08


def test_mha_prefill_flash_matches_dense(rng, monkeypatch):
    """impl="flash" prefill == dense prefill on valid rows (GQA + lengths);
    emitted KV caches must be identical (cache emission is impl-independent)."""
    monkeypatch.setenv("ANAKIN_PALLAS_INTERPRET", "1")
    from tests.test_ops import run_op

    B, S, E, H, Hkv = 2, 256, 32, 4, 2
    x = rng.normal(size=(B, S, E)).astype(np.float32)
    wq = rng.normal(size=(E, E)).astype(np.float32) * 0.2
    wk = rng.normal(size=(E, E // 2)).astype(np.float32) * 0.2
    wv = rng.normal(size=(E, E // 2)).astype(np.float32) * 0.2
    wo = rng.normal(size=(E, E)).astype(np.float32) * 0.2
    lengths = np.array([256, 192], np.int32)
    kw = dict(num_heads=H, num_kv_heads=Hkv, causal=True, rope=True,
              has_lengths=True, max_seq=S)
    yd, ckd, cvd = run_op("mha_prefill", [x, wq, wk, wv, wo, lengths], **kw)
    yf, ckf, cvf = run_op("mha_prefill", [x, wq, wk, wv, wo, lengths],
                          impl="flash", **kw)
    np.testing.assert_allclose(np.asarray(ckf), np.asarray(ckd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cvf), np.asarray(cvd),
                               rtol=1e-5, atol=1e-5)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(yf)[b, :lengths[b]],
                                   np.asarray(yd)[b, :lengths[b]],
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dt", ["float32", "int8"])
def test_aligned_pos_decode_matches_blend(rng, dt):
    """aligned_pos single-row cache write == one-hot blend (logits AND
    caches bit-match when every batch row shares the decode position)."""
    import anakin_tpu as ak
    from anakin_tpu.models.transformer import (
        TransformerConfig, build_transformer_decode_step,
        make_transformer_params)

    cfg = TransformerConfig(vocab=64, embed=64, heads=4, kv_heads=2,
                            layers=2, max_seq=16)
    params = make_transformer_params(cfg, 1)
    B = 2
    cache_shape = (B, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
    cache_np = (rng.integers(-10, 10, (2 * cfg.layers,) + cache_shape)
                .astype(np.int8) if dt == "int8" else
                rng.normal(size=(2 * cfg.layers,) + cache_shape)
                .astype(np.float32) * 0.02)
    feed = {"input": rng.integers(0, 64, (B, 1)).astype(np.int32),
            "pos": np.full((B,), 5, np.int32)}
    for i in range(cfg.layers):
        feed[f"cache_k_{i}"] = cache_np[2 * i]
        feed[f"cache_v_{i}"] = cache_np[2 * i + 1]
    outs = {}
    for aligned in (False, True):
        g = build_transformer_decode_step(cfg, B, params, kv_cache_dtype=dt,
                                          kv_scale=0.02,
                                          aligned_pos=aligned)
        outs[aligned] = {e: np.asarray(v)
                         for e, v in ak.Net(g).prediction(feed).items()}
    for e in outs[False]:
        np.testing.assert_allclose(outs[True][e], outs[False][e],
                                   rtol=1e-5, atol=1e-6, err_msg=e)


def test_generate_flash_prefill_matches_dense(rng, monkeypatch):
    """GenerationSession(prefill_attention="flash") emits the same greedy
    tokens as the dense prefill (interpret-mode Pallas on CPU)."""
    monkeypatch.setenv("ANAKIN_PALLAS_INTERPRET", "1")
    from anakin_tpu.models.transformer import TransformerConfig
    from anakin_tpu.runtime.generate import GenerationSession

    cfg = TransformerConfig(vocab=30, embed=32, heads=2, kv_heads=2,
                            layers=1, max_seq=520)
    prompt = rng.integers(0, 30, size=(1, 512)).astype(np.int32)
    outs = {}
    logits = {}
    for impl in ("dense", "flash"):
        sess = GenerationSession(cfg, batch=1, prefill_attention=impl)
        logits[impl], _ = sess._prefill(prompt)
        outs[impl] = sess.generate(prompt, max_new_tokens=4)
    # the robust check: final-position logits agree to tolerance (the two
    # impls differ numerically — online softmax + finfo mask vs dense +
    # -1e30 mask)
    np.testing.assert_allclose(logits["flash"], logits["dense"],
                               rtol=2e-4, atol=2e-5)
    # exact greedy-token equality additionally holds at THIS pinned seed
    # (rng fixture, seed 1234); a near-tie argmax could break it on other
    # seeds/platforms without indicating a bug
    np.testing.assert_array_equal(outs["flash"], outs["dense"])
