"""Mixture-of-Experts op with expert-parallel sharding support.

Completes the parallelism matrix (EP) beyond the reference.  TPU-first
design: static-shape top-k routing — every token computes its top_k expert
outputs via a dense gather of expert weights (no ragged dispatch), which
XLA turns into batched matmuls; expert weights shard over the `model` mesh
axis (expert dim) via `shard_graph_params`, making this expert-parallel
under GSPMD with an all-to-all-free formulation (each device computes the
routed contribution of ITS experts for ALL tokens and a psum combines —
the standard dense-MoE inference lowering for small expert counts).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .registry import register


@register("moe_ffn")
def moe_ffn(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Top-k routed expert FFN.

    inputs: x [B, S, E], w_gate [E, n_exp], w_up [n_exp, E, F],
    w_down [n_exp, F, E].
    attrs: top_k (default 2), activation ("gelu").
    """
    x, w_gate, w_up, w_down = xs
    B, S, E = x.shape
    n_exp = w_gate.shape[1]
    top_k = int(node.attr("top_k", 2))
    act = node.attr("activation", "gelu")
    xf = x.astype(jnp.float32)

    logits = jnp.einsum("bse,en->bsn", xf, w_gate.astype(jnp.float32))
    gate_vals, gate_idx = lax.top_k(logits, top_k)          # [B, S, k]
    gates = jax.nn.softmax(gate_vals, axis=-1)

    # dense formulation: per-expert mask-weighted combination.  tokens*k
    # one-hot over experts -> [B, S, n_exp] combine weights
    combine = jnp.zeros((B, S, n_exp), jnp.float32)
    for j in range(top_k):
        combine = combine + gates[..., j:j + 1] * jax.nn.one_hot(
            gate_idx[..., j], n_exp, dtype=jnp.float32)

    # every expert processes all tokens (dense); combine weights select.
    # expert dim shards over `model`: each device computes its experts'
    # contribution, psum-combined by GSPMD.
    h = jnp.einsum("bse,nef->bnsf", xf, w_up.astype(jnp.float32))
    if act == "gelu":
        h = jax.nn.gelu(h)
    elif act == "relu":
        h = jnp.maximum(h, 0)
    y = jnp.einsum("bnsf,nfe->bnse", h, w_down.astype(jnp.float32))
    out = jnp.einsum("bnse,bsn->bse", y, combine)
    return [out.astype(x.dtype)]
