"""Collective/compute overlap: XLA flag presets + manual ring kernels.

The reference has no distributed backend (SURVEY.md §2.10); overlap of
communication with compute is a new, TPU-first capability.  Two layers:

1. **Compiler-driven** (preferred): XLA's latency-hiding scheduler plus
   async collective fusion turn the GSPMD-inserted all-gathers /
   reduce-scatters into async pairs scheduled behind the surrounding
   convs/matmuls, and the windowed-einsum pass rewrites sharded matmuls
   into "collective matmul" loops.  `enable_collective_overlap()` sets the
   flags; it must run before the TPU backend initializes.

2. **Manual shard_map kernels** for the cases the scheduler misses:
   `allgather_matmul` (column-parallel TP: gather activations through a
   ppermute ring, one chunk multiplying while the next is in flight) and
   `matmul_reducescatter` (row-parallel TP: per-chunk partial products
   ride the ring while the next chunk computes).  Both produce results
   identical to the dense equivalents and are unit-tested on the 8-device
   CPU mesh.
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "overlap_xla_flags", "enable_collective_overlap",
    "allgather_matmul", "matmul_reducescatter",
]

# Flags (XLA:TPU) that enable async collectives + the latency-hiding
# scheduler.  `windowed_einsum` threshold 0 turns every sharded einsum into
# a collective matmul; leave it opt-in (level="aggressive") since small
# matmuls regress.
_FLAG_SETS = {
    "default": [
        "--xla_tpu_enable_async_collective_fusion=true",
        "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true",
        "--xla_tpu_enable_async_collective_fusion_multiple_steps=true",
        "--xla_tpu_overlap_compute_collective_tc=true",
        "--xla_enable_async_all_gather=true",
        "--xla_enable_async_collective_permute=true",
        "--xla_tpu_enable_latency_hiding_scheduler=true",
    ],
    "aggressive": [
        "--xla_jf_spmd_threshold_for_windowed_einsum_mib=0",
    ],
}


def overlap_xla_flags(level: str = "default") -> list:
    """The flag list for a level ('default' or 'aggressive' ⊃ default)."""
    flags = list(_FLAG_SETS["default"])
    if level == "aggressive":
        flags += _FLAG_SETS["aggressive"]
    return flags


def enable_collective_overlap(level: str = "default") -> bool:
    """Append overlap flags to XLA_FLAGS.  Returns False (and changes
    nothing) if the backend is already initialized — call this before the
    first jax device access (e.g. at server start, `serving/server.py`)."""
    try:
        initialized = jax._src.xla_bridge._backends != {}
    except Exception:  # pragma: no cover - private API moved
        initialized = False
    if initialized:
        return False
    flags = " ".join(overlap_xla_flags(level))
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + flags).strip()
    return True


def allgather_matmul(x_shard: jnp.ndarray, w: jnp.ndarray, axis: str,
                     reverse: bool = False) -> jnp.ndarray:
    """Column-parallel collective matmul inside shard_map.

    Computes `all_gather(x, axis) @ w` without materializing the gathered
    activations: each of P steps multiplies the currently-held x chunk
    into its slice of the output while ppermute ships the next chunk —
    XLA schedules the async permute behind the dot (the manual form of
    the windowed-einsum rewrite).

    x_shard: [m, K] local chunk of a globally [P*m, K] tensor.
    w:       [K, N] (replicated or local TP column shard).
    returns: [P*m, N] = all rows of the product, locally.
    """
    p = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    m = x_shard.shape[0]
    out = jnp.zeros((p * m, w.shape[1]), w.dtype if w.dtype != jnp.int8
                    else jnp.float32)
    shift = 1 if not reverse else -1
    perm = [(i, (i + shift) % p) for i in range(p)]

    x_cur = x_shard
    for i in range(p):  # p is static (mesh axis size): unrolled at trace
        src = (idx - shift * i) % p  # rank the held chunk originated from
        y = jnp.dot(x_cur, w, preferred_element_type=out.dtype)
        out = lax.dynamic_update_slice(out, y, (src * m, 0))
        if i != p - 1:
            x_cur = lax.ppermute(x_cur, axis, perm)
    return out


def matmul_reducescatter(x: jnp.ndarray, w_shard: jnp.ndarray, axis: str
                         ) -> jnp.ndarray:
    """Row-parallel collective matmul inside shard_map.

    Computes `reduce_scatter(x @ w_partial)` chunk-by-chunk: the partial
    product for the chunk about to leave is computed, added to the
    accumulator riding the ring, and ppermuted while the next chunk's dot
    runs.  Equivalent to `psum_scatter(x @ w_shard, axis)` over rows.

    x:       [M, k] local activations (k = K/P rows of the full K).
    w_shard: [k, N] this rank's K-shard of the weights.
    returns: [M/P, N] this rank's row shard of the summed product.
    """
    p = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    m = x.shape[0] // p
    perm = [(i, (i + 1) % p) for i in range(p)]

    acc = jnp.zeros((m, w_shard.shape[1]), jnp.float32)
    for i in range(p):  # p is static: unrolled at trace time
        # chunk c_j is visited by ranks j+1, j+2, ..., j (home) in order,
        # so at step i this rank contributes to chunk (idx - 1 - i); the
        # LAST chunk computed is our own and the traveling accumulator
        # arrives holding every other rank's partial for it
        dst = (idx - 1 - i) % p
        part = jnp.dot(
            lax.dynamic_slice(x, (dst * m, 0), (m, x.shape[1])), w_shard,
            preferred_element_type=jnp.float32)
        acc = acc + part
        if i != p - 1:
            acc = lax.ppermute(acc, axis, perm)
    return acc
