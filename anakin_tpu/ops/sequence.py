"""Sequence / RNN ops.

TPU-native re-design of the reference's LoD-tensor sequence stack
(SURVEY.md section 5.7): the reference threads per-batch `_seq_offset`
vectors through Tensor (`saber/core/tensor.h:469-481`) and runs ragged
batches inside CUDA kernels (`saber/funcs/impl/cuda/base/cuda_c/
saber_gru.cu`, `saber_lstmp.cu`).  On TPU, ragged batching becomes **dense
padded [B, T, D] activations + an explicit `lengths` [B] int32 edge**; time
loops are `lax.scan` (static trip count, compiler-friendly) and validity
masks replace offsets.

Gate layouts (documented, enforced by importers):
  LSTM: w_ih [D, 4H], w_hh [H, 4H], b [4H], gate order (i, f, g, o)
  GRU:  w_ih [D, 3H], w_hh [H, 3H], b [3H], gate order (r, z, n)
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from jax import lax

from .registry import register
from .nn import apply_activation


def _time_mask(lengths: jnp.ndarray, T: int) -> jnp.ndarray:
    """[B, T] validity mask from lengths."""
    t = lax.broadcasted_iota(jnp.int32, (1, T), 1)
    return t < lengths.astype(jnp.int32)[:, None]


def _lstm_cell(x_t, h, c, w_ih, w_hh, b):
    gates = (
        jnp.dot(x_t, w_ih, preferred_element_type=jnp.float32)
        + jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
    )
    if b is not None:
        gates = gates + b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


@register("lstm")
def lstm(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Masked batched LSTM over padded [B, T, D]
    (reference: `saber/funcs/lstm.h`).

    inputs: x, w_ih, w_hh, [bias], [lengths].  attrs: reverse, has_bias,
    has_lengths.  Output: hidden sequence [B, T, H] (zeros past length).
    """
    it = iter(xs)
    x, w_ih, w_hh = next(it), next(it), next(it)
    b = next(it) if node.attr("has_bias", True) else None
    lengths = next(it) if node.attr("has_lengths", False) else None
    B, T, D = x.shape
    H = w_hh.shape[0]
    dt = jnp.float32
    xf = x.astype(dt)
    if node.attr("reverse", False):
        xf = jnp.flip(xf, axis=1)
    mask = _time_mask(lengths, T) if lengths is not None else None

    def step(carry, inp):
        h, c = carry
        x_t, m_t = inp
        h_new, c_new = _lstm_cell(x_t, h, c, w_ih.astype(dt), w_hh.astype(dt),
                                  None if b is None else b.astype(dt))
        if m_t is not None:
            m = m_t[:, None]
            h_new = jnp.where(m, h_new, h)
            c_new = jnp.where(m, c_new, c)
        return (h_new, c_new), h_new

    init = (jnp.zeros((B, H), dt), jnp.zeros((B, H), dt))
    xs_t = jnp.swapaxes(xf, 0, 1)  # [T, B, D]
    scan_in = (xs_t, jnp.swapaxes(mask, 0, 1)) if mask is not None else (xs_t, None)
    if mask is None:
        (_, _), hs = lax.scan(lambda cr, x_t: step(cr, (x_t, None)), init, xs_t)
    else:
        (_, _), hs = lax.scan(step, init, scan_in)
    y = jnp.swapaxes(hs, 0, 1)
    if node.attr("reverse", False):
        y = jnp.flip(y, axis=1)
    if mask is not None:
        y = jnp.where(mask[:, :, None], y, 0.0)
    return [y.astype(x.dtype)]


@register("lstmp")
def lstmp(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """LSTM with recurrent projection (reference:
    `saber/funcs/lstmp.h`, kernel `cuda_c/saber_lstmp.cu`).

    inputs: x, w_ih [D,4H], w_hh [P,4H], w_proj [H,P], [bias], [lengths].
    Output: projected sequence [B, T, P].
    """
    it = iter(xs)
    x, w_ih, w_hh, w_proj = next(it), next(it), next(it), next(it)
    b = next(it) if node.attr("has_bias", True) else None
    lengths = next(it) if node.attr("has_lengths", False) else None
    B, T, D = x.shape
    H = w_proj.shape[0]
    P = w_proj.shape[1]
    dt = jnp.float32
    xf = x.astype(dt)
    mask = _time_mask(lengths, T) if lengths is not None else None

    def step(carry, inp):
        p, c = carry
        x_t, m_t = inp
        h_new, c_new = _lstm_cell(x_t, p, c, w_ih.astype(dt), w_hh.astype(dt),
                                  None if b is None else b.astype(dt))
        p_new = jnp.dot(h_new, w_proj.astype(dt), preferred_element_type=jnp.float32)
        if m_t is not None:
            m = m_t[:, None]
            p_new = jnp.where(m, p_new, p)
            c_new = jnp.where(m, c_new, c)
        return (p_new, c_new), p_new

    init = (jnp.zeros((B, P), dt), jnp.zeros((B, H), dt))
    xs_t = jnp.swapaxes(xf, 0, 1)
    if mask is None:
        (_, _), ps = lax.scan(lambda cr, x_t: step(cr, (x_t, None)), init, xs_t)
    else:
        (_, _), ps = lax.scan(step, init, (xs_t, jnp.swapaxes(mask, 0, 1)))
    y = jnp.swapaxes(ps, 0, 1)
    if mask is not None:
        y = jnp.where(mask[:, :, None], y, 0.0)
    return [y.astype(x.dtype)]


@register("gru", "standard_rnn")
def gru(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Masked batched GRU (reference: `saber/funcs/gru.h`,
    kernel `cuda_c/saber_gru.cu`). Gate order (r, z, n)."""
    it = iter(xs)
    x, w_ih, w_hh = next(it), next(it), next(it)
    b = next(it) if node.attr("has_bias", True) else None
    lengths = next(it) if node.attr("has_lengths", False) else None
    B, T, D = x.shape
    H = w_hh.shape[0]
    dt = jnp.float32
    xf = x.astype(dt)
    if node.attr("reverse", False):
        xf = jnp.flip(xf, axis=1)
    mask = _time_mask(lengths, T) if lengths is not None else None

    def step(h, inp):
        x_t, m_t = inp
        gi = jnp.dot(x_t, w_ih.astype(dt), preferred_element_type=jnp.float32)
        gh = jnp.dot(h, w_hh.astype(dt), preferred_element_type=jnp.float32)
        if b is not None:
            gi = gi + b.astype(dt)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1 - z) * n + z * h
        if m_t is not None:
            h_new = jnp.where(m_t[:, None], h_new, h)
        return h_new, h_new

    init = jnp.zeros((B, H), dt)
    xs_t = jnp.swapaxes(xf, 0, 1)
    if mask is None:
        _, hs = lax.scan(lambda h, x_t: step(h, (x_t, None)), init, xs_t)
    else:
        _, hs = lax.scan(step, init, (xs_t, jnp.swapaxes(mask, 0, 1)))
    y = jnp.swapaxes(hs, 0, 1)
    if node.attr("reverse", False):
        y = jnp.flip(y, axis=1)
    if mask is not None:
        y = jnp.where(mask[:, :, None], y, 0.0)
    return [y.astype(x.dtype)]


@register("sequence_pool")
def sequence_pool(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Pool over the time axis with length masking
    (reference: `saber/funcs/sequence_pool.h`).
    modes: average, sum, sqrt, max, last, first."""
    x = xs[0]
    lengths = xs[1] if len(xs) > 1 else None
    mode = node.attr("mode", "average")
    B, T = x.shape[0], x.shape[1]
    xf = x.astype(jnp.float32)
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    m = _time_mask(lengths, T)[..., None].astype(jnp.float32)
    cnt = jnp.maximum(lengths.astype(jnp.float32), 1.0)[:, None]
    if mode in ("average", "avg", "mean"):
        y = jnp.sum(xf * m, axis=1) / cnt
    elif mode == "sum":
        y = jnp.sum(xf * m, axis=1)
    elif mode == "sqrt":
        y = jnp.sum(xf * m, axis=1) / jnp.sqrt(cnt)
    elif mode == "max":
        y = jnp.max(jnp.where(m > 0, xf, -jnp.inf), axis=1)
        y = jnp.where(jnp.isfinite(y), y, 0.0)
    elif mode == "last":
        idx = jnp.maximum(lengths.astype(jnp.int32) - 1, 0)
        y = xf[jnp.arange(B), idx]
    elif mode == "first":
        y = xf[:, 0]
    else:
        raise ValueError(f"unknown sequence_pool mode {mode!r}")
    return [y.astype(x.dtype)]


@register("sequence_concat")
def sequence_concat(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Feature-wise concat of aligned sequences
    (reference: `saber/funcs/sequence_concat.h`)."""
    return [jnp.concatenate(xs, axis=-1)]


@register("seq_concat_seq_pool_soft_sign")
def seq_concat_seq_pool_soft_sign(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Fused seq-concat + sum-pool + soft_sign (reference fusion op
    `framework/operators/fusion_ops/seq_concat_seq_pool_soft_sign.cpp`)."""
    feats = xs[:-1] if node.attr("has_lengths", False) else xs
    lengths = xs[-1] if node.attr("has_lengths", False) else None
    x = jnp.concatenate(feats, axis=-1)
    B, T = x.shape[0], x.shape[1]
    xf = x.astype(jnp.float32)
    if lengths is not None:
        m = _time_mask(lengths, T)[..., None].astype(jnp.float32)
        y = jnp.sum(xf * m, axis=1)
    else:
        y = jnp.sum(xf, axis=1)
    return [(y / (1.0 + jnp.abs(y))).astype(x.dtype)]


@register("sequence_expand")
def sequence_expand(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Broadcast each batch row across time of a reference sequence
    (reference: `saber/funcs/sequence_expand.h`): x [B, D] -> [B, T, D]."""
    x, ref = xs[0], xs[1]
    T = ref.shape[1]
    return [jnp.broadcast_to(x[:, None, :], (x.shape[0], T, x.shape[-1]))]


@register("sequence_conv")
def sequence_conv(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """1D context-window conv over time (reference:
    `saber/funcs/sequence_conv.h`): w [context_length * D, O]."""
    it = iter(xs)
    x, w = next(it), next(it)
    b = next(it) if node.attr("has_bias", False) else None
    ctx_len = int(node.attr("context_length", 3))
    ctx_start = int(node.attr("context_start", -(ctx_len // 2)))
    B, T, D = x.shape
    cols = []
    for k in range(ctx_len):
        off = ctx_start + k
        shifted = jnp.roll(x, -off, axis=1)
        if off < 0:
            m = lax.broadcasted_iota(jnp.int32, (1, T, 1), 1) >= (-off)
        else:
            m = lax.broadcasted_iota(jnp.int32, (1, T, 1), 1) < (T - off)
        cols.append(jnp.where(m, shifted, 0.0))
    xc = jnp.concatenate(cols, axis=-1)  # [B, T, ctx_len*D]
    y = jnp.dot(xc, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return [y.astype(x.dtype)]


@register("sequence_pool_concat")
def sequence_pool_concat(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Fused sequence_pool + concat over multiple sequences
    (reference: `saber/funcs/sequence_pool_concat.h`)."""
    mode = node.attr("mode", "sum")
    pooled = []
    for x in xs:
        xf = x.astype(jnp.float32)
        if mode in ("sum",):
            pooled.append(jnp.sum(xf, axis=1))
        elif mode in ("average", "avg"):
            pooled.append(jnp.mean(xf, axis=1))
        else:
            pooled.append(jnp.max(xf, axis=1))
    return [jnp.concatenate(pooled, axis=-1).astype(xs[0].dtype)]


@register("reverse_sequence")
def reverse_sequence(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Reverse each sequence within its valid length
    (reference: `saber/funcs/reverse_sequence.h`)."""
    x = xs[0]
    lengths = xs[1] if len(xs) > 1 else None
    B, T = x.shape[0], x.shape[1]
    if lengths is None:
        return [jnp.flip(x, axis=1)]
    t = lax.broadcasted_iota(jnp.int32, (B, T), 1)
    L = lengths.astype(jnp.int32)[:, None]
    src = jnp.where(t < L, L - 1 - t, t)
    return [jnp.take_along_axis(x, src[..., None].repeat(x.shape[-1], -1), axis=1)
            if x.ndim == 3 else jnp.take_along_axis(x, src, axis=1)]


@register("crf_decoding")
def crf_decoding(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Viterbi decode (reference: `saber/funcs/crf_decoding.h`).

    inputs: emission [B, T, N], transition [(N+2), N] paddle layout
    (row 0 = start, row 1 = end, rows 2.. = transitions), [lengths].
    Output: best label path [B, T] (int32).
    """
    x = xs[0]
    w = xs[1]
    lengths = xs[2] if len(xs) > 2 else None
    B, T, N = x.shape
    start = w[0]
    end = w[1]
    trans = w[2:]  # [N, N]
    xf = x.astype(jnp.float32)
    alpha0 = xf[:, 0] + start[None, :]

    def step(carry, x_t):
        alpha, _ = carry
        # scores[b, i, j] = alpha[b, i] + trans[i, j]
        scores = alpha[:, :, None] + trans[None, :, :]
        best_prev = jnp.argmax(scores, axis=1)  # [B, N]
        alpha_new = jnp.max(scores, axis=1) + x_t
        return (alpha_new, None), best_prev

    xs_t = jnp.swapaxes(xf[:, 1:], 0, 1)  # [T-1, B, N]
    (alpha_T, _), backptrs = lax.scan(step, (alpha0, None), xs_t)
    alpha_T = alpha_T + end[None, :]
    last = jnp.argmax(alpha_T, axis=-1)  # [B] — label at t = T-1

    # backptrs[k][b, j] = best label at time k given label j at time k+1
    def backtrack(lab_next, bp_t):
        lab = jnp.take_along_axis(bp_t, lab_next[:, None], axis=1)[:, 0]
        return lab, lab

    _, labs_rev = lax.scan(backtrack, last, jnp.flip(backptrs, axis=0))
    labs = jnp.flip(labs_rev, axis=0)  # [T-1, B] — labels for t = 0..T-2
    path = jnp.concatenate([labs, last[None]], axis=0)  # [T, B]
    return [jnp.swapaxes(path, 0, 1).astype(jnp.int32)]


@register("attention_lstm", "attension_lstm")
def attention_lstm(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Attention-weighted LSTM (reference: `saber/funcs/attension_lstm.h`):
    per step, an MLP over [x_t, h] produces attention over the input
    sequence; the attended vector feeds an LSTM cell.

    inputs: x [B,T,D], att_w [D+H, A], att_v [A, 1], w_ih [D,4H],
    w_hh [H,4H], [bias], [lengths].
    """
    it = iter(xs)
    x, att_w, att_v, w_ih, w_hh = (next(it) for _ in range(5))
    b = next(it) if node.attr("has_bias", True) else None
    lengths = next(it) if node.attr("has_lengths", False) else None
    B, T, D = x.shape
    H = w_hh.shape[0]
    dt = jnp.float32
    xf = x.astype(dt)
    mask = _time_mask(lengths, T) if lengths is not None else jnp.ones((B, T), bool)

    def step(carry, t):
        h, c = carry
        # attention scores over all T positions given current h
        hh = jnp.broadcast_to(h[:, None, :], (B, T, H))
        feat = jnp.concatenate([xf, hh], axis=-1)  # [B, T, D+H]
        e = jnp.tanh(jnp.dot(feat, att_w.astype(dt)))
        e = jnp.dot(e, att_v.astype(dt))[..., 0]  # [B, T]
        e = jnp.where(mask, e, -jnp.inf)
        a = jax.nn.softmax(e, axis=-1)
        ctx = jnp.einsum("bt,btd->bd", a, xf)
        h_new, c_new = _lstm_cell(ctx, h, c, w_ih.astype(dt), w_hh.astype(dt),
                                  None if b is None else b.astype(dt))
        return (h_new, c_new), h_new

    init = (jnp.zeros((B, H), dt), jnp.zeros((B, H), dt))
    (_, _), hs = lax.scan(step, init, jnp.arange(T))
    return [jnp.swapaxes(hs, 0, 1).astype(x.dtype)]


@register("attention_padding_mask")
def attention_padding_mask(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Mask attention logits at padded positions (reference:
    `framework/operators/attention_padding_mask.cpp`).
    inputs: scores [B, Tq, Tk], lengths [B]."""
    x, lengths = xs[0], xs[1]
    B, Tq, Tk = x.shape
    m = _time_mask(lengths, Tk)[:, None, :]
    fill = float(node.attr("mask", -9e4))
    return [jnp.where(m, x, fill)]
