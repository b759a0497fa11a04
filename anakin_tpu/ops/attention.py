"""Attention ops: multi-head attention (prefill) and cached decode step.

LLM-class capability beyond the reference (SURVEY.md section 5.7): the
reference's sequence stack topped out at LSTM/GRU; modern serving needs
transformer attention with KV caches.  TPU-first design:

  * `multi_head_attention`: full-sequence (prefill) attention.  GQA via
    `num_kv_heads`; rotary embeddings; causal + length masking.  The
    score computation uses the Pallas flash kernel when attr
    `impl == "flash"` (autotunable), else the dense jnp path.
  * `mha_decode`: one-token decode against a static-shape KV cache.  The
    cache is ordinary graph IO (SSA edges in AND out), so a decode step is
    just another jitted Net — generation loops live in
    `runtime/generate.py`.

Weights: wq [E, H*D], wk/wv [E, Hkv*D], wo [H*D, E].
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .registry import register

__all__ = ["apply_rope"]


def _rope_freqs(D: int, theta: float = 10000.0) -> jnp.ndarray:
    return 1.0 / (theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray,
               theta: float = 10000.0) -> jnp.ndarray:
    """Rotary position embedding.  x: [B, H, S, D], positions: [B, S]."""
    B, H, S, D = x.shape
    freqs = _rope_freqs(D, theta)                      # [D/2]
    ang = positions.astype(jnp.float32)[:, None, :, None] * freqs  # [B,1,S,D/2]
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    x1 = x[..., 0::2].astype(jnp.float32)
    x2 = x[..., 1::2].astype(jnp.float32)
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    out = jnp.stack([r1, r2], axis=-1).reshape(B, H, S, D)
    return out.astype(x.dtype)


def _project(x, w, B, S, heads, D):
    y = jnp.einsum("bse,ehd->bhsd",
                   x, w.reshape(w.shape[0], heads, D).astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


@register("multi_head_attention")
def multi_head_attention(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Prefill attention.

    inputs: x [B,S,E], wq, wk, wv, wo, [lengths].
    attrs: num_heads, num_kv_heads (GQA; default num_heads), causal (True),
    rope (True), impl ("flash"|"dense"|None).
    """
    it = iter(xs)
    x, wq, wk, wv, wo = (next(it) for _ in range(5))
    lengths = next(it) if node.attr("has_lengths", False) else None
    B, S, E = x.shape
    H = int(node.attr("num_heads"))
    Hkv = int(node.attr("num_kv_heads", H))
    D = wq.shape[1] // H
    causal = bool(node.attr("causal", True))
    q = _project(x, wq, B, S, H, D)      # [B, H, S, D]
    k = _project(x, wk, B, S, Hkv, D)
    v = _project(x, wv, B, S, Hkv, D)
    if node.attr("rope", True):
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        q = apply_rope(q, pos)
        k = apply_rope(k, pos)
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    seg_q = seg_kv = None
    if lengths is not None:
        t = jnp.arange(S, dtype=jnp.int32)[None]
        seg_q = jnp.where(t < lengths[:, None].astype(jnp.int32), 0, 1)
        seg_kv = seg_q
    if node.attr("impl") == "flash":
        from ..kernels.flash_attention import flash_attention

        o = flash_attention(q, k, v, seg_q, seg_kv, causal=causal)
    else:
        from ..kernels.flash_attention import mha_reference

        o = mha_reference(q, k, v, seg_q, seg_kv, causal=causal)
    y = jnp.einsum("bhsd,hde->bse", o.astype(x.dtype),
                   wo.reshape(H, D, E).astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return [y.astype(x.dtype)]


@register("mha_prefill")
def mha_prefill(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Prefill attention that ALSO emits the KV cache in one pass.

    Same inputs/attrs as multi_head_attention plus attr `max_seq`; returns
    (y [B,S,E], cache_k [B,Hkv,max_seq,D], cache_v) with rows 0..S-1
    filled — replaces the token-at-a-time prefill loop (O(S) dispatches)
    with one jitted call.
    """
    it = iter(xs)
    x, wq, wk, wv, wo = (next(it) for _ in range(5))
    lengths = next(it) if node.attr("has_lengths", False) else None
    B, S, E = x.shape
    H = int(node.attr("num_heads"))
    Hkv = int(node.attr("num_kv_heads", H))
    D = wq.shape[1] // H
    Smax = int(node.attr("max_seq"))
    q = _project(x, wq, B, S, H, D)
    k = _project(x, wk, B, S, Hkv, D)
    v = _project(x, wv, B, S, Hkv, D)
    if node.attr("rope", True):
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        q = apply_rope(q, pos)
        k = apply_rope(k, pos)
    if node.attr("kv_cache_dtype") == "int8":
        ks = float(node.attr("k_scale"))
        vs = float(node.attr("v_scale"))
        k8 = jnp.clip(jnp.round(k.astype(jnp.float32) / ks),
                      -127, 127).astype(jnp.int8)
        v8 = jnp.clip(jnp.round(v.astype(jnp.float32) / vs),
                      -127, 127).astype(jnp.int8)
        cache_k = jnp.pad(k8, ((0, 0), (0, 0), (0, Smax - S), (0, 0)))
        cache_v = jnp.pad(v8, ((0, 0), (0, 0), (0, Smax - S), (0, 0)))
    else:
        cache_k = jnp.pad(k, ((0, 0), (0, 0), (0, Smax - S), (0, 0)))
        cache_v = jnp.pad(v, ((0, 0), (0, 0), (0, Smax - S), (0, 0)))
    if node.attr("impl") == "flash":
        # long-context prefill: the Pallas flash kernel (v5e-measured
        # 1.6-4x faster than the dense path from S=512 up — round-2
        # attention study, docs/BENCH_NOTES.md)
        from ..kernels.flash_attention import flash_attention

        rep = H // Hkv
        kr = jnp.repeat(k, rep, axis=1) if rep > 1 else k
        vr = jnp.repeat(v, rep, axis=1) if rep > 1 else v
        seg = None
        if lengths is not None:
            t = jnp.arange(S, dtype=jnp.int32)[None]
            seg = jnp.where(t < lengths[:, None].astype(jnp.int32), 0, 1)
        o = flash_attention(q, kr, vr, seg, seg,
                            causal=bool(node.attr("causal", True)))
        o = o.astype(jnp.float32)
    else:
        rep = H // Hkv
        qg = q.reshape(B, Hkv, rep, S, D)
        s = jnp.einsum("bgrsd,bgkd->bgrsk", qg.astype(jnp.float32),
                       k.astype(jnp.float32)) / np.sqrt(D)
        if node.attr("causal", True):
            t = jnp.arange(S, dtype=jnp.int32)
            s = jnp.where(t[None, None, None, :, None] >= t[None, None, None,
                                                            None, :],
                          s, -1e30)
        if lengths is not None:
            tt = jnp.arange(S, dtype=jnp.int32)[None]
            ok = tt < lengths[:, None].astype(jnp.int32)
            s = jnp.where(ok[:, None, None, None, :], s, -1e30)
        p_att = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bgrsk,bgkd->bgrsd", p_att, v.astype(jnp.float32))
        o = o.reshape(B, H, S, D)
    y = jnp.einsum("bhsd,hde->bse", o.astype(x.dtype),
                   wo.reshape(H, D, E).astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return [y.astype(x.dtype), cache_k, cache_v]


@register("mha_decode")
def mha_decode(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """One-token decode with a static-shape KV cache.

    inputs: x [B,1,E], wq, wk, wv, wo, cache_k [B,Hkv,Smax,D],
    cache_v [B,Hkv,Smax,D], pos [B] int32 (current position).
    outputs: y [B,1,E], new_cache_k, new_cache_v.
    """
    x, wq, wk, wv, wo, cache_k, cache_v, pos = xs
    B, _, E = x.shape
    H = int(node.attr("num_heads"))
    Hkv = int(node.attr("num_kv_heads", H))
    Smax = cache_k.shape[2]
    D = wq.shape[1] // H
    q = _project(x, wq, B, 1, H, D)      # [B, H, 1, D]
    k = _project(x, wk, B, 1, Hkv, D)
    v = _project(x, wv, B, 1, Hkv, D)
    if node.attr("rope", True):
        p = pos.astype(jnp.int32)[:, None]
        q = apply_rope(q, p)
        k = apply_rope(k, p)
    # cache update = one-hot BLEND, deliberately not a scatter: measured
    # on v5e (BENCH_NOTES round-2), jnp .at[].set lowers to a serialized
    # TPU scatter costing +21% per decode step, while the blend is one
    # fused vectorized pass over the cache that XLA aliases in place.
    # EXCEPTION — attr `aligned_pos`: when every batch row decodes at the
    # SAME position (benchmark-style generation; the continuous-batching
    # scheduler keeps per-slot positions and stays on the blend), a single
    # dynamic_update_slice writes one [B, Hkv, 1, D] row instead of
    # rewriting the whole cache — at production cache sizes (max_seq 2048)
    # the blend's full-cache write is ~half the step's HBM traffic.
    aligned = bool(node.attr("aligned_pos", False))
    kv_int8 = node.attr("kv_cache_dtype") == "int8"
    if aligned:
        p0 = pos.astype(jnp.int32)[0]
        if kv_int8:
            ks = float(node.attr("k_scale"))
            vs = float(node.attr("v_scale"))
            rk = jnp.clip(jnp.round(k.astype(jnp.float32) / ks),
                          -127, 127).astype(jnp.int8)
            rv = jnp.clip(jnp.round(v.astype(jnp.float32) / vs),
                          -127, 127).astype(jnp.int8)
        else:
            rk, rv = k.astype(cache_k.dtype), v.astype(cache_v.dtype)
        ck = jax.lax.dynamic_update_slice(cache_k, rk, (0, 0, p0, 0))
        cv = jax.lax.dynamic_update_slice(cache_v, rv, (0, 0, p0, 0))
        if kv_int8:
            k_read = ck.astype(jnp.float32) * float(node.attr("k_scale"))
            v_read = cv.astype(jnp.float32) * float(node.attr("v_scale"))
        else:
            k_read = ck.astype(jnp.float32)
            v_read = cv.astype(jnp.float32)
    elif kv_int8:
        # int8 KV cache: rows quantize with static per-layer scales and
        # dequantize inside the attention reads — halves the decode step's
        # dominant HBM traffic (opt-in; scales from the calibrator or the
        # builder's estimate)
        ks = float(node.attr("k_scale"))
        vs = float(node.attr("v_scale"))
        qk = jnp.clip(jnp.round(k.astype(jnp.float32) / ks),
                      -127, 127).astype(jnp.int8)
        qv = jnp.clip(jnp.round(v.astype(jnp.float32) / vs),
                      -127, 127).astype(jnp.int8)
        sel = jax.nn.one_hot(pos.astype(jnp.int32), Smax,
                             dtype=jnp.bool_)[:, None, :, None]
        ck = jnp.where(sel, qk, cache_k)
        cv = jnp.where(sel, qv, cache_v)
        k_read = ck.astype(jnp.float32) * ks
        v_read = cv.astype(jnp.float32) * vs
    else:
        onehot = jax.nn.one_hot(pos.astype(jnp.int32), Smax,
                                dtype=cache_k.dtype)      # [B, Smax]
        ck = cache_k * (1 - onehot[:, None, :, None]) \
            + onehot[:, None, :, None] * k
        cv = cache_v * (1 - onehot[:, None, :, None]) \
            + onehot[:, None, :, None] * v
        k_read = ck.astype(jnp.float32)
        v_read = cv.astype(jnp.float32)
    # GQA: group q heads against shared KV heads (no materialized repeat)
    rep = H // Hkv
    qg = q.reshape(B, Hkv, rep, D)
    s = jnp.einsum("bgrd,bgkd->bgrk", qg.astype(jnp.float32),
                   k_read) / np.sqrt(D)
    t = jnp.arange(Smax, dtype=jnp.int32)[None]
    valid = t <= pos.astype(jnp.int32)[:, None]       # [B, Smax]
    s = jnp.where(valid[:, None, None, :], s, -1e30)
    p_att = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bgrk,bgkd->bgrd", p_att, v_read)
    o = o.reshape(B, H, 1, D)
    y = jnp.einsum("bhsd,hde->bse", o.astype(x.dtype),
                   wo.reshape(H, D, E).astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return [y.astype(x.dtype), ck, cv]


@register("mha_verify")
def mha_verify(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Chunk-verify attention: T tokens at positions pos..pos+T-1 against
    an existing KV cache (speculative-decoding verify pass / chunked
    prefill-with-history).  Generalizes `mha_decode` from T=1 to T=chunk:
    one jitted call scores a whole draft chunk, so acceptance of `a`
    tokens costs 1 target dispatch instead of `a`.

    inputs: x [B,T,E], wq, wk, wv, wo, cache_k [B,Hkv,Smax,D], cache_v,
    pos [B] int32 (position of the FIRST chunk token).
    outputs: y [B,T,E], new_cache_k, new_cache_v (rows pos..pos+T-1
    overwritten — stale rows from rejected drafts are masked off by the
    per-token causal position test and overwritten by later chunks).
    """
    x, wq, wk, wv, wo, cache_k, cache_v, pos = xs
    B, T, E = x.shape
    H = int(node.attr("num_heads"))
    Hkv = int(node.attr("num_kv_heads", H))
    Smax = cache_k.shape[2]
    D = wq.shape[1] // H
    q = _project(x, wq, B, T, H, D)      # [B, H, T, D]
    k = _project(x, wk, B, T, Hkv, D)
    v = _project(x, wv, B, T, Hkv, D)
    positions = pos.astype(jnp.int32)[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    if node.attr("rope", True):
        q = apply_rope(q, positions)
        k = apply_rope(k, positions)
    # chunk cache write: one-hot blend over the T rows (same no-scatter
    # rationale as mha_decode)
    s_idx = jnp.arange(Smax, dtype=jnp.int32)
    onehot = (positions[:, :, None] == s_idx[None, None, :])   # [B, T, Smax]
    any_row = onehot.any(axis=1)[:, None, :, None]             # [B,1,Smax,1]
    if node.attr("kv_cache_dtype") == "int8":
        ks = float(node.attr("k_scale"))
        vs = float(node.attr("v_scale"))
        k8 = jnp.clip(jnp.round(k.astype(jnp.float32) / ks),
                      -127, 127).astype(jnp.int8)
        v8 = jnp.clip(jnp.round(v.astype(jnp.float32) / vs),
                      -127, 127).astype(jnp.int8)
        wk_rows = jnp.einsum("bts,bhtd->bhsd",
                             onehot.astype(jnp.int8), k8)
        wv_rows = jnp.einsum("bts,bhtd->bhsd",
                             onehot.astype(jnp.int8), v8)
        ck = jnp.where(any_row, wk_rows, cache_k)
        cv = jnp.where(any_row, wv_rows, cache_v)
        k_read = ck.astype(jnp.float32) * ks
        v_read = cv.astype(jnp.float32) * vs
    else:
        oh = onehot.astype(cache_k.dtype)
        wk_rows = jnp.einsum("bts,bhtd->bhsd", oh, k)
        wv_rows = jnp.einsum("bts,bhtd->bhsd", oh, v)
        ck = jnp.where(any_row, wk_rows, cache_k)
        cv = jnp.where(any_row, wv_rows, cache_v)
        k_read = ck.astype(jnp.float32)
        v_read = cv.astype(jnp.float32)
    rep = H // Hkv
    qg = q.reshape(B, Hkv, rep, T, D)
    s = jnp.einsum("bgrtd,bgsd->bgrts", qg.astype(jnp.float32),
                   k_read) / np.sqrt(D)
    valid = s_idx[None, None, :] <= positions[:, :, None]      # [B, T, Smax]
    s = jnp.where(valid[:, None, None, :, :], s, -1e30)
    p_att = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bgrts,bgsd->bgrtd", p_att, v_read)
    o = o.reshape(B, H, T, D)
    y = jnp.einsum("bhsd,hde->bse", o.astype(x.dtype),
                   wo.reshape(H, D, E).astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return [y.astype(x.dtype), ck, cv]
