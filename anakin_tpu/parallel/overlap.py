"""Collective/compute overlap: XLA flag presets + manual ring kernels.

The reference has no distributed backend (SURVEY.md §2.10); overlap of
communication with compute is a new, TPU-first capability.  Two layers:

1. **Compiler-driven** (preferred): XLA's latency-hiding scheduler plus
   async collective fusion turn the GSPMD-inserted all-gathers /
   reduce-scatters into async pairs scheduled behind the surrounding
   convs/matmuls, and the windowed-einsum pass rewrites sharded matmuls
   into "collective matmul" loops.  Delivery is PER-COMPILE
   `compiler_options` (`overlap_compiler_options()` -> `Net(...,
   compiler_options=...)` / `jax.jit(f, compiler_options=...)`), NOT
   XLA_FLAGS: these are XLA:TPU flags, and the round-4 cross-check
   measured that the local flag parser of a CPU/relay-client process
   FATALLY aborts on env flags it doesn't know (parse_flags_from_env
   F-check), while compiler options travel to the real TPU compiler —
   all eight options verified accepted on hardware — and unknown names
   fail as a catchable JaxRuntimeError.  `enable_collective_overlap()`
   now installs the options as a process-wide default that every
   subsequently-built Net applies.

2. **Manual shard_map kernels** for the cases the scheduler misses:
   `allgather_matmul` (column-parallel TP: gather activations through a
   ppermute ring, one chunk multiplying while the next is in flight) and
   `matmul_reducescatter` (row-parallel TP: per-chunk partial products
   ride the ring while the next chunk computes).  Both produce results
   identical to the dense equivalents and are unit-tested on the 8-device
   CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "overlap_compiler_options", "overlap_xla_flags",
    "enable_collective_overlap", "default_compiler_options",
    "allgather_matmul", "matmul_reducescatter",
]

# XLA:TPU compiler options enabling async collectives + the latency-hiding
# scheduler (all verified accepted by the hardware compiler through the
# relay, round-4 cross-check).  `windowed_einsum` threshold 0 turns every
# sharded einsum into a collective matmul; opt-in (level="aggressive")
# since small matmuls regress.
_OPTION_SETS = {
    "default": {
        "xla_tpu_enable_async_collective_fusion": "true",
        "xla_tpu_enable_async_collective_fusion_fuse_all_gather": "true",
        "xla_tpu_enable_async_collective_fusion_multiple_steps": "true",
        "xla_tpu_overlap_compute_collective_tc": "true",
        "xla_enable_async_all_gather": "true",
        "xla_enable_async_collective_permute": "true",
        "xla_tpu_enable_latency_hiding_scheduler": "true",
    },
    "aggressive": {
        "xla_jf_spmd_threshold_for_windowed_einsum_mib": "0",
    },
}

# process-wide default applied by Net when built without explicit options
_active_default: dict = {}


def overlap_compiler_options(level: str = "default") -> dict:
    """Compiler-options dict for a level ('default' or 'aggressive' ⊃
    default) — pass to `Net(compiler_options=...)` or
    `jax.jit(f, compiler_options=...)`."""
    opts = dict(_OPTION_SETS["default"])
    if level == "aggressive":
        opts.update(_OPTION_SETS["aggressive"])
    return opts


def overlap_xla_flags(level: str = "default") -> list:
    """The same set rendered as --xla_... env-flag strings.  Kept for
    inspection/documentation; do NOT put these in XLA_FLAGS on a
    CPU/relay-client process — the local parser fatally aborts on flags
    only the TPU backend registers (measured, round-4 cross-check)."""
    return [f"--{k}={v}" for k, v in overlap_compiler_options(level).items()]


def enable_collective_overlap(level: str = "default") -> bool:
    """Install the overlap options as the process-wide default picked up
    by every subsequently-built `Net` (e.g. at server start,
    `serving/server.py`).  Safe at any time — options apply per-compile,
    so there is no backend-initialization deadline the way env flags had.
    Returns True."""
    _active_default.clear()
    _active_default.update(overlap_compiler_options(level))
    return True


def default_compiler_options() -> dict:
    """The options `enable_collective_overlap` installed ({} if none)."""
    return dict(_active_default)


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
