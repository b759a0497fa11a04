"""Flash attention (forward) Pallas kernel.

The long-context capability the reference predates (SURVEY.md section 5.7:
"long-context scaling is a NEW capability to design"): tiled online-softmax
attention that never materializes the [S, S] score matrix, with causal and
segment (multi-document) masking — the TPU-idiomatic pattern from JAX's
production kernels (grid over (batch*heads, q_tiles, kv_tiles); running
max/sum/accumulator in VMEM scratch carried across kv tiles).

Inference-focused: forward only (this is an inference engine); the decode
path uses `decode_attention` (single-query against a KV cache) where the
seq dim is the contraction and a plain jnp path is already MXU-bound.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "mha_reference"]

_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _largest_block(S: int, cap: int) -> int:
    """Largest block <= cap that divides S (halving; S itself if S < cap)."""
    b = min(cap, S)
    while S % b:
        b //= 2
    return max(b, 1)


def _kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref,
            m_ref, l_ref, acc_ref, *, sm_scale, causal, block_q, block_k,
            kv_len, use_segments):
    kv_idx = pl.program_id(2)
    q_idx = pl.program_id(1)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[:] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    # causal: skip kv tiles entirely above the diagonal
    run = True
    if causal:
        run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k

    @pl.when(run)
    def _run():
        q = q_ref[0].astype(jnp.float32)          # [block_q, d]
        k = k_ref[0].astype(jnp.float32)          # [block_k, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale

        if causal or use_segments:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
            mask = jnp.ones(s.shape, bool)
            if causal:
                mask = mask & (cols <= rows)
            if use_segments:
                qs = qseg_ref[0]                   # [block_q, 1]
                ks = kseg_ref[0]                   # [1, block_k]
                mask = mask & (qs == ks)
            s = jnp.where(mask, s, _MASK_VALUE)

        m_prev = m_ref[:]
        l_prev = l_ref[:]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_next
        l_ref[:] = l_next
        v = v_ref[0].astype(jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == kv_len // block_k - 1)
    def _store():
        l = l_ref[:]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_ref[:] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,           # [B, H, Sq, D]
    k: jnp.ndarray,           # [B, H, Sk, D]
    v: jnp.ndarray,           # [B, H, Sk, D]
    q_segment_ids: Optional[jnp.ndarray] = None,   # [B, Sq] int32
    kv_segment_ids: Optional[jnp.ndarray] = None,  # [B, Sk] int32
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    interpret = interpret or os.environ.get("ANAKIN_PALLAS_INTERPRET") == "1"
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(D))
    # Auto-shrink blocks to the largest divisor of S: v5e-measured (round-2
    # attention study, docs/BENCH_NOTES.md) block 1024 runs 2-5x faster
    # than 128 — the [bq, bk] score tile must be deep enough to amortize the
    # VMEM pipeline — so callers get the largest block their S allows.
    block_q = _largest_block(Sq, block_q)
    block_k = _largest_block(Sk, block_k)
    assert Sq % block_q == 0 and Sk % block_k == 0, (Sq, Sk, block_q, block_k)
    if not interpret and (block_q % 8 or block_k % 8):
        # Mosaic sublane alignment: the [1, block, D] tiles need the block
        # (second-to-last dim) 8-aligned on real TPU; an odd S (e.g. 300)
        # would otherwise relayout catastrophically or miscompile.  Callers
        # pad S to a multiple of 128 (see `ops.attention._pad_seq_to`).
        raise ValueError(
            f"flash_attention needs 8-aligned blocks; got Sq={Sq}, Sk={Sk} "
            f"-> blocks ({block_q}, {block_k}). Pad the sequence to a "
            "multiple of 128 (ops.attention pads automatically).")
    use_segments = q_segment_ids is not None

    BH = B * H
    qf = q.reshape(BH, Sq, D)
    kf = k.reshape(BH, Sk, D)
    vf = v.reshape(BH, Sk, D)
    inputs = [qf, kf, vf]
    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    if use_segments:
        qs = jnp.repeat(q_segment_ids.astype(jnp.int32), H, axis=0)  # [BH, Sq]
        ks = jnp.repeat(kv_segment_ids.astype(jnp.int32), H, axis=0)
        inputs.append(qs.reshape(BH, Sq, 1))
        inputs.append(ks.reshape(BH, 1, Sk))
        in_specs.append(pl.BlockSpec((1, block_q, 1),
                                     lambda b, i, j: (b, i, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, 1, block_k),
                                     lambda b, i, j: (b, 0, j),
                                     memory_space=pltpu.VMEM))
    else:
        # dummies keep the kernel arity static
        inputs.append(jnp.zeros((BH, 1, 1), jnp.int32))
        inputs.append(jnp.zeros((BH, 1, 1), jnp.int32))
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda b, i, j: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda b, i, j: (b, 0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _kernel, sm_scale=float(sm_scale), causal=causal, block_q=block_q,
        block_k=block_k, kv_len=Sk, use_segments=use_segments)
    out = pl.pallas_call(
        kernel,
        grid=(BH, Sq // block_q, Sk // block_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Sq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((block_q, D), jnp.float32),   # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Sq * Sk * D,
            bytes_accessed=2 * BH * (Sq + 2 * Sk) * D,
            transcendentals=BH * Sq * Sk,
        ),
        interpret=interpret,
    )(*inputs)
    return out.reshape(B, H, Sq, D)


def mha_reference(q, k, v, q_segment_ids=None, kv_segment_ids=None,
                  causal=False, sm_scale=None):
    """Dense reference attention (the golden model for kernel tests)."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(D))
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    mask = jnp.ones((B, 1, Sq, Sk), bool)
    if causal:
        rows = jnp.arange(Sq)[:, None]
        cols = jnp.arange(Sk)[None, :]
        mask = mask & (cols <= rows)[None, None]
    if q_segment_ids is not None:
        seg = q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]
        mask = mask & seg[:, None]
    s = jnp.where(mask, s, _MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)
