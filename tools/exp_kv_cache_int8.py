"""Decode throughput: fp vs int8 KV cache (both weight-only int8).

Result (v5e b32): 1.19 -> 0.76 ms/step = 42k tok/s (1.56x), adopted as
the kv_cache_dtype="int8" option.  Run: timeout 3000 python tools/exp_kv_cache_int8.py
"""

import os
import sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import anakin_tpu as ak
from anakin_tpu.models.transformer import (TransformerConfig,
    build_transformer_decode_step, make_transformer_params)
from anakin_tpu.quant import weight_only_quantize

cfg = TransformerConfig(vocab=16000, embed=1024, heads=16, kv_heads=8,
                        layers=8, max_seq=256)
params = make_transformer_params(cfg, 0)
batch, steps = 32, 64

for dt in ("float32", "int8"):
    g = build_transformer_decode_step(cfg, batch, params, kv_cache_dtype=dt,
                                      kv_scale=0.05)
    g = weight_only_quantize(g)
    net = ak.Net(g, precision="bf16")
    logits_e = g.outputs[0]
    couts = [(g.nodes[f"dec_att_{i}"].outputs[1],
              g.nodes[f"dec_att_{i}"].outputs[2]) for i in range(cfg.layers)]
    cshape = (batch, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
    cdt = jnp.int8 if dt == "int8" else jnp.bfloat16

    @jax.jit
    def decode_T(params, tok0, caches):
        def body(t, carry):
            tok, caches = carry
            feed = {"input": tok, "pos": jnp.full((batch,), t, jnp.int32)}
            for i in range(cfg.layers):
                feed[f"cache_k_{i}"] = caches[2*i]
                feed[f"cache_v_{i}"] = caches[2*i+1]
            out = net.forward(params, feed)
            nxt = jnp.argmax(out[logits_e][:, 0, :], -1).astype(jnp.int32)
            new = []
            for i in range(cfg.layers):
                new += [out[couts[i][0]], out[couts[i][1]]]
            return (nxt[:, None], tuple(new))
        tok, _ = lax.fori_loop(0, steps, body, (tok0, caches))
        return jnp.sum(tok)

    tok0 = jnp.zeros((batch, 1), jnp.int32)
    caches = tuple(jnp.zeros(cshape, cdt) for _ in range(2*cfg.layers))
    float(decode_T(net.params, tok0, caches))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(decode_T(net.params, tok0, caches))
        best = min(best, time.perf_counter() - t0)
    print(f"kv={dt}: {best/steps*1e3:.4f} ms/step  {batch*steps/best:,.0f} tok/s", flush=True)
