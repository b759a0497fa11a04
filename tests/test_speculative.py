"""Speculative decoding tests.

The load-bearing invariant: greedy speculative output is EXACTLY the
vanilla greedy output of the target model, for any draft.  Acceptance
rate only changes the dispatch count.  (Random-weight logits are
near-uniform, so chunk-vs-single-token float reassociation flips argmax
on near-ties — acceptance is asserted loosely, equality exactly.)
"""

import numpy as np

from anakin_tpu.models.transformer import (
    TransformerConfig,
    build_transformer_decode_step,
    build_transformer_verify_step,
    make_transformer_params,
)
from anakin_tpu.runtime.generate import GenerationSession
from anakin_tpu.runtime.net import Net
from anakin_tpu.runtime.speculative import SpeculativeSession

CFG = dict(vocab=97, embed=64, heads=4, kv_heads=2, layers=2, max_seq=64)


def test_verify_chunk1_matches_decode(rng):
    """mha_verify with chunk=1 must reproduce mha_decode numerics
    (same cache row writes, same masked attention)."""
    cfg = TransformerConfig(**CFG)
    params = make_transformer_params(cfg, 0)
    ver_g = build_transformer_verify_step(cfg, 1, 1, params)
    ver = Net(ver_g)

    shape = (1, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
    caches = {}
    for i in range(cfg.layers):
        caches[f"cache_k_{i}"] = rng.standard_normal(shape).astype(np.float32)
        caches[f"cache_v_{i}"] = rng.standard_normal(shape).astype(np.float32)
    feed = dict(caches)
    feed["input"] = np.array([[7]], np.int32)
    feed["pos"] = np.array([5], np.int32)

    dg = build_transformer_decode_step(cfg, 1, params)
    dnet = Net(dg)
    out_d = dnet.prediction(feed)
    out_v = ver.prediction(feed)
    ld = np.asarray(out_d[dg.outputs[0]])
    lv = np.asarray(out_v[ver_g.outputs[0]])
    np.testing.assert_allclose(lv, ld, rtol=1e-4, atol=1e-4)
    for i in range(cfg.layers):
        nd = dg.nodes[f"dec_att_{i}"]
        nv = ver_g.nodes[f"ver_att_{i}"]
        np.testing.assert_allclose(np.asarray(out_v[nv.outputs[1]]),
                                   np.asarray(out_d[nd.outputs[1]]),
                                   rtol=1e-4, atol=1e-4)


def test_exact_equality_same_draft(rng):
    """Draft == target: output identical to vanilla greedy, high
    acceptance, >1 token committed per target dispatch."""
    cfg = TransformerConfig(**CFG)
    params = make_transformer_params(cfg, 0)
    prompt = (np.arange(1, 9, dtype=np.int32) % CFG["vocab"])[None]

    vanilla = GenerationSession(cfg, batch=1, params=params).generate(
        prompt, 20)
    spec = SpeculativeSession(cfg, cfg, params=params, draft_params=params,
                              k=4)
    out = spec.generate(prompt, 20)
    np.testing.assert_array_equal(vanilla, out)
    assert spec.acceptance_rate >= 0.5          # near-tie argmax flips only
    assert spec.tokens_committed / spec.rounds > 1.5


def test_exact_equality_random_draft(rng):
    """Arbitrary (bad) draft: output must STILL equal vanilla greedy —
    the draft can only cost dispatches, never change tokens."""
    cfg = TransformerConfig(**CFG)
    params = make_transformer_params(cfg, 0)
    dcfg = TransformerConfig(vocab=97, embed=32, heads=2, kv_heads=2,
                             layers=1, max_seq=64)
    prompt = (np.arange(3, 11, dtype=np.int32) % CFG["vocab"])[None]

    vanilla = GenerationSession(cfg, batch=1, params=params).generate(
        prompt, 18)
    spec = SpeculativeSession(cfg, dcfg, params=params, k=3)
    out = spec.generate(prompt, 18)
    np.testing.assert_array_equal(vanilla, out)
    # every round commits at least the correction token
    assert spec.tokens_committed >= spec.rounds


def test_speculative_int8_kv_cache(rng):
    """Speculative path composes with int8 KV caches (verify chunk writes
    quantized rows with the same static scales as decode)."""
    cfg = TransformerConfig(**CFG)
    params = make_transformer_params(cfg, 0)
    prompt = (np.arange(5, 12, dtype=np.int32) % CFG["vocab"])[None]

    vanilla = GenerationSession(
        cfg, batch=1, params=params, kv_cache_dtype="int8",
        kv_scale=0.05).generate(prompt, 12)
    spec = SpeculativeSession(cfg, cfg, params=params, draft_params=params,
                              k=3, kv_cache_dtype="int8", kv_scale=0.05)
    out = spec.generate(prompt, 12)
    np.testing.assert_array_equal(vanilla, out)


def test_fused_equals_host_loop(rng):
    """generate_fused (whole loop in ONE jitted while_loop) is token-exact
    with the host loop and therefore with vanilla greedy."""
    cfg = TransformerConfig(**CFG)
    params = make_transformer_params(cfg, 0)
    dcfg = TransformerConfig(vocab=97, embed=32, heads=2, kv_heads=2,
                             layers=1, max_seq=64)
    prompt = (np.arange(2, 10, dtype=np.int32) % CFG["vocab"])[None]

    vanilla = GenerationSession(cfg, batch=1, params=params).generate(
        prompt, 16)
    spec = SpeculativeSession(cfg, dcfg, params=params, k=3)
    out = spec.generate_fused(prompt, 16)
    np.testing.assert_array_equal(vanilla, out)
    assert spec.rounds >= 1


def test_round_fused_equals_host_loop(rng):
    """generate_round_fused (ONE dispatch per round, host loop over
    rounds — the split-compile mode for the relay's program-size cap) is
    token-exact with vanilla greedy, across prompt lengths with one
    compiled program (position-parameterized)."""
    cfg = TransformerConfig(**CFG)
    params = make_transformer_params(cfg, 0)
    dcfg = TransformerConfig(vocab=97, embed=32, heads=2, kv_heads=2,
                             layers=1, max_seq=64)
    spec = SpeculativeSession(cfg, dcfg, params=params, k=3)
    for P, N in ((8, 16), (5, 11)):
        prompt = (np.arange(2, 2 + P, dtype=np.int32) % CFG["vocab"])[None]
        vanilla = GenerationSession(cfg, batch=1, params=params).generate(
            prompt, N)
        out = spec.generate_round_fused(prompt, N)
        np.testing.assert_array_equal(vanilla, out)
    assert spec.rounds >= 2
