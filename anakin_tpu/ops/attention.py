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


def _flash_attn_padded(q, k, v, seg_q, seg_kv, causal):
    """Run the Pallas flash kernel, padding the sequence dim up to a
    multiple of 128 (Mosaic tile alignment — the kernel rejects unaligned
    blocks).  Pad rows get segment id 1 so they only attend each other;
    their output rows are sliced off before returning.

    Valid-rows-only contract: when `lengths` masking is active, output
    rows at positions >= length are NOT numerically identical to the
    dense path (dense gives them a -1e30-masked softmax over nothing;
    flash groups them into the pad segment where they attend each other).
    Consumers must only read rows < length — every builder in
    `models/` indexes the last REAL position.
    """
    from ..kernels.flash_attention import flash_attention

    B, H, S, D = q.shape
    Sp = -(-S // 128) * 128
    if Sp == S:
        return flash_attention(q, k, v, seg_q, seg_kv, causal=causal)
    pad = Sp - S
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    if seg_q is None:
        t = jnp.arange(Sp, dtype=jnp.int32)[None]
        seg = jnp.broadcast_to(jnp.where(t < S, 0, 1), (B, Sp))
        seg_qp = seg_kvp = seg
    else:
        seg_qp = jnp.pad(seg_q, ((0, 0), (0, pad)), constant_values=1)
        seg_kvp = jnp.pad(seg_kv, ((0, 0), (0, pad)), constant_values=1)
    o = flash_attention(qp, kp, vp, seg_qp, seg_kvp, causal=causal)
    return o[:, :, :S, :]


def _write_rows(cache, rows, pos32, B):
    """Per-row cache write: row b's [1, Hkv, T, D] block lands at its own
    position via dynamic_update_slice.  UNROLLED over the (static, small)
    batch — a fori_loop-of-DUS here nests a while inside the decode loop
    and trips an XLA:TPU copy-insertion RET_CHECK on int8 caches
    (hlo_instruction.cc:3572, observed on v5e libtpu); B DUS ops in a row
    compile clean and schedule as parallel DMAs.  Falls back to the loop
    form above B=64 where unrolling would bloat the program."""
    if B <= 64:
        c = cache
        for b in range(B):
            blk = jax.lax.dynamic_slice_in_dim(rows, b, 1, axis=0)
            c = jax.lax.dynamic_update_slice(c, blk, (b, 0, pos32[b], 0))
        return c

    def body(b, c):
        blk = jax.lax.dynamic_slice_in_dim(rows, b, 1, axis=0)
        return jax.lax.dynamic_update_slice(c, blk, (b, 0, pos32[b], 0))
    return jax.lax.fori_loop(0, B, body, cache)


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
        o = _flash_attn_padded(q, k, v, seg_q, seg_kv, causal=causal)
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
        # attention study, docs/BENCH_NOTES.md).  Non-128-multiple S is
        # padded inside `_flash_attn_padded` rather than falling back.
        rep = H // Hkv
        kr = jnp.repeat(k, rep, axis=1) if rep > 1 else k
        vr = jnp.repeat(v, rep, axis=1) if rep > 1 else v
        seg = None
        if lengths is not None:
            t = jnp.arange(S, dtype=jnp.int32)[None]
            seg = jnp.where(t < lengths[:, None].astype(jnp.int32), 0, 1)
        o = _flash_attn_padded(q, kr, vr, seg, seg,
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
    # Cache-write policy (all modes bit-identical for in-range pos):
    #  * "blend" (default): one-hot select over the whole cache — one fused
    #    vectorized pass XLA aliases in place.  Right answer at SMALL
    #    max_seq (a scatter measured +21% at max_seq=128, BENCH_NOTES), but
    #    it rewrites the WHOLE cache (~537 MB/step at 1B-class max_seq=2048).
    #  * attr `aligned_pos=True`: every batch row decodes at the SAME
    #    position — a single dynamic_update_slice writes one
    #    [B, Hkv, 1, D] row (the round-2 1.33x decode-ladder win).
    #    CONTRACT: the op reads pos[0] only; callers with divergent
    #    per-row positions get silently corrupted caches, and pos >=
    #    max_seq CLAMPS (overwrites the last row) where the blend would
    #    no-op — `GenerationSession` (the only aligned caller) asserts
    #    P + max_new_tokens <= max_seq up front.
    #  * attr `cache_update="rows"`: per-row dynamic_update_slice chain
    #    (fori_loop over B) — distinct per-row positions with O(B·row)
    #    write traffic; the continuous-batching scheduler's path at
    #    production cache sizes.  Same pos < max_seq clamping as aligned.
    #  * attr `cache_update="scatter"`: jnp .at[].set — XLA scatter,
    #    kept as an A/B candidate (tools/exp_cache_write_r3.py).
    aligned = bool(node.attr("aligned_pos", False))
    update = node.attr("cache_update", "blend")
    kv_int8 = node.attr("kv_cache_dtype") == "int8"
    if kv_int8:
        ks = float(node.attr("k_scale"))
        vs = float(node.attr("v_scale"))
        rk = jnp.clip(jnp.round(k.astype(jnp.float32) / ks),
                      -127, 127).astype(jnp.int8)
        rv = jnp.clip(jnp.round(v.astype(jnp.float32) / vs),
                      -127, 127).astype(jnp.int8)
    else:
        rk, rv = k.astype(cache_k.dtype), v.astype(cache_v.dtype)
    if aligned:
        p0 = pos.astype(jnp.int32)[0]
        ck = jax.lax.dynamic_update_slice(cache_k, rk, (0, 0, p0, 0))
        cv = jax.lax.dynamic_update_slice(cache_v, rv, (0, 0, p0, 0))
    elif update == "rows":
        pos32 = pos.astype(jnp.int32)
        ck = _write_rows(cache_k, rk, pos32, B)
        cv = _write_rows(cache_v, rv, pos32, B)
    elif update == "scatter":
        bidx = jnp.arange(B)
        ck = cache_k.at[bidx, :, pos.astype(jnp.int32), :].set(rk[:, :, 0, :])
        cv = cache_v.at[bidx, :, pos.astype(jnp.int32), :].set(rv[:, :, 0, :])
    else:
        sel = jax.nn.one_hot(pos.astype(jnp.int32), Smax,
                             dtype=jnp.bool_)[:, None, :, None]
        ck = jnp.where(sel, rk, cache_k)
        cv = jnp.where(sel, rv, cache_v)
    # attr `cache_view`: attention READS only rows [0, view) — a STATIC
    # slice of the full cache (the write above still lands in the full
    # buffer).  The serving scheduler picks the view per fused window as
    # the next bucket >= max(pos)+steps, cutting the dominant decode HBM
    # traffic (the dense path otherwise streams all max_seq rows every
    # step: 536 MB/step at 1B-class b8/S2048 — round-5).  CONTRACT:
    # every row's pos must stay < view for the program's lifetime.
    view = int(node.attr("cache_view", 0) or 0)
    if view and view < Smax:
        ck_r = jax.lax.slice_in_dim(ck, 0, view, axis=2)
        cv_r = jax.lax.slice_in_dim(cv, 0, view, axis=2)
        Sr = view
    else:
        ck_r, cv_r = ck, cv
        Sr = Smax
    if kv_int8:
        k_read = ck_r.astype(jnp.float32) * ks
        v_read = cv_r.astype(jnp.float32) * vs
    else:
        k_read = ck_r.astype(jnp.float32)
        v_read = cv_r.astype(jnp.float32)
    # GQA: group q heads against shared KV heads (no materialized repeat)
    rep = H // Hkv
    qg = q.reshape(B, Hkv, rep, D)
    s = jnp.einsum("bgrd,bgkd->bgrk", qg.astype(jnp.float32),
                   k_read) / np.sqrt(D)
    t = jnp.arange(Sr, dtype=jnp.int32)[None]
    valid = t <= pos.astype(jnp.int32)[:, None]       # [B, Sr]
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
    # chunk cache write.  The chunk rows pos[b]..pos[b]+T-1 are CONTIGUOUS
    # per batch row, so attr `cache_update="rows"` writes each row's
    # [1, Hkv, T, D] block with one dynamic_update_slice (O(B*T*row)
    # traffic — the production path at big max_seq, same crossover as
    # mha_decode); default "blend" keeps the one-hot pass (fastest at
    # small caches).  Same pos+T <= Smax clamping contract as mha_decode.
    s_idx = jnp.arange(Smax, dtype=jnp.int32)
    update = node.attr("cache_update", "blend")
    if node.attr("kv_cache_dtype") == "int8":
        ks = float(node.attr("k_scale"))
        vs = float(node.attr("v_scale"))
        rk = jnp.clip(jnp.round(k.astype(jnp.float32) / ks),
                      -127, 127).astype(jnp.int8)
        rv = jnp.clip(jnp.round(v.astype(jnp.float32) / vs),
                      -127, 127).astype(jnp.int8)
    else:
        rk, rv = k.astype(cache_k.dtype), v.astype(cache_v.dtype)
    if update == "rows":
        pos32 = pos.astype(jnp.int32)
        ck = _write_rows(cache_k, rk, pos32, B)
        cv = _write_rows(cache_v, rv, pos32, B)
    else:
        onehot = (positions[:, :, None] == s_idx[None, None, :])  # [B,T,Smax]
        any_row = onehot.any(axis=1)[:, None, :, None]            # [B,1,S,1]
        wk_rows = jnp.einsum("bts,bhtd->bhsd", onehot.astype(rk.dtype), rk)
        wv_rows = jnp.einsum("bts,bhtd->bhsd", onehot.astype(rv.dtype), rv)
        ck = jnp.where(any_row, wk_rows, cache_k)
        cv = jnp.where(any_row, wv_rows, cache_v)
    if node.attr("kv_cache_dtype") == "int8":
        k_read = ck.astype(jnp.float32) * ks
        v_read = cv.astype(jnp.float32) * vs
    else:
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
