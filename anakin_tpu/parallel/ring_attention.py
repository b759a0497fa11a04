"""Ring attention: context-parallel attention over the device mesh.

Long-context capability (SURVEY.md section 5.7 "sharded attention over
ICI"): Q, K, V are sharded along the SEQUENCE dim across mesh devices;
each step every device computes attention of its local Q block against the
KV block it currently holds, merges the result into running online-softmax
statistics, and rotates the KV block to its ring neighbor with
`lax.ppermute` — after `n` steps every Q block has seen every KV block,
with communication overlapped against compute by XLA and the [S, S] score
matrix never materialized globally OR locally.

Causal masking uses global positions derived from the shard indices, so
entire cross-shard steps that lie above the diagonal contribute nothing
(their masked scores underflow to zero weight).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_attention"]

_NEG = -0.7 * float(np.finfo(np.float32).max)


def _local_ring_body(q, k, v, *, axis: str, causal: bool, sm_scale: float):
    """Per-shard body under shard_map.  q/k/v: [B, H, S_loc, D]."""
    n = lax.psum(1, axis)
    my = lax.axis_index(axis)
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    qf = q.astype(jnp.float32)

    m = jnp.full((B, H, Sq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, H, Sq, 1), jnp.float32)
    o = jnp.zeros((B, H, Sq, D), jnp.float32)
    perm = [(j, (j + 1) % n) for j in range(n)]

    k_cur, v_cur = k, v
    for step in range(n):
        src = (my - step) % n  # which shard's KV block we hold now
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32))
        s = s * sm_scale
        if causal:
            q_pos = my * Sq + jnp.arange(Sq)[:, None]          # [Sq, 1]
            k_pos = src * Sk + jnp.arange(Sk)[None, :]          # [1, Sk]
            mask = (k_pos <= q_pos)[None, None]
            s = jnp.where(mask, s, _NEG)
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        o = o * alpha + jnp.einsum("bhqk,bhkd->bhqd", p,
                                   v_cur.astype(jnp.float32))
        m = m_next
        if step != n - 1:
            k_cur = lax.ppermute(k_cur, axis, perm)
            v_cur = lax.ppermute(v_cur, axis, perm)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    return (o * l_inv).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,           # [B, H, S, D], S sharded over `axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Context-parallel attention; returns [B, H, S, D] sharded like q."""
    D = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(D))
    spec = P(None, None, axis, None)
    body = functools.partial(_local_ring_body, axis=axis, causal=causal,
                             sm_scale=float(sm_scale))
    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v)
