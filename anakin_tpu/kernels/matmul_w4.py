"""Pallas weight-only int4 matmul: unpack nibbles in VMEM, dot on the MXU.

Why a kernel at all: the XLA lowering of dense_w4 materializes the
dequantized bf16 [K, N] weights in HBM every step (measured: w4 LOSES to
w8, 4.22 vs 3.64 ms/step on the 1B-class decode ladder —
artifacts/w4_rows_r3.json), because XLA does not fuse a
shift/concat/reshape producer chain into a dot operand.  Here the packed
int8 bytes are DMA'd to VMEM (0.5 B/weight — the whole point), unpacked
and dequantized on the VPU while resident, and fed straight to the MXU.
Decode is weight-bandwidth-bound, so HBM bytes ~halve vs w8.

Packing contract (must match `quant.quantize._w4_group_quantize`):
within each scale group of G rows, packed row r holds original row r in
the low nibble and row r + G/2 in the high nibble; groups stack along
the packed row axis.  A K-block that is a multiple of G therefore
unpacks self-contained.

The reference's analogous move is its hand-scheduled SASS gemm family
(`third-party/sass/include/sass_funcs.h`); int4 weights have no
reference counterpart (2018 predates w4a16 serving).
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

__all__ = ["matmul_w4"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _make_kernel(group: int, n_k: int, x_dtype):
    """v1 unpack: int32 widening + shifts + concat — the SHIPPED default.

    ~6 int32 VPU ops per packed byte, measured VPU-bound at 1B-decode
    scale, yet it beats v2 end-to-end (3.56 vs 4.17 ms aligned ladder,
    artifacts/w4_pallas_rows_r3.json vs w4_pallasv2_rows_r3.json): v2's
    cheaper per-byte math is paid back by its duplicated x operand
    stream and the extra dot.  Measured verdict, round 3."""
    def kernel(x_ref, p_ref, s_ref, o_ref):
        k = pl.program_id(1)
        p = p_ref[:].astype(jnp.int32)               # [TK/2, TN]
        lo = ((p & 0xF) ^ 8) - 8                      # sign-extend low nibble
        hi = p >> 4                                   # arithmetic: signed high
        tk2, tn = p_ref.shape
        ng = (2 * tk2) // group
        lo = lo.reshape(ng, group // 2, tn)
        hi = hi.reshape(ng, group // 2, tn)
        w = jnp.concatenate([lo, hi], axis=1).astype(jnp.float32)
        w = w * s_ref[:][:, None, :]                  # group dequant
        w = w.reshape(2 * tk2, tn).astype(x_dtype)
        part = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

        @pl.when(k == 0)
        def _init():
            o_ref[:] = part

        @pl.when(k != 0)
        def _acc():
            o_ref[:] += part

    return kernel


def _make_kernel_v2(group: int, x_dtype):
    """v2 unpack: pure int8 + bf16 arithmetic, no widening, no shifts.
    MEASURED SLOWER than v1 end-to-end (4.17 vs 3.56 ms aligned ladder)
    despite fewer VPU ops per byte — kept as a selectable variant and
    numerics cross-check, NOT the default.

    Nibble math in bitwise-int8 + float — Mosaic legalizes andi/xori on
    i8 vectors but NOT subi (measured: `failed to legalize arith.subi`
    on vector<...xi8>), so both subtractions happen after the convert:
      lo_u = p & 0xF                    (int8 andi)
      lo   = float(lo_u ^ 8) - 8        (xori, then float sub: the xor
                                         maps nibble 0..15 -> biased
                                         8..15,0..7 whose float minus 8
                                         is the signed value)
      hi   = (float(p) - float(lo_u))   (exact: both <= 128 fit bf16's
               * (s/16)                  8 mantissa bits; the result is
                                         a multiple of 16; 2^-4 folds
                                         into the group scale)
    Group scales multiply the float half-arrays in place, and the dot
    splits into lo/hi halves against x columns PRE-SPLIT outside the
    kernel (x3[:, :, :G/2] / [:, G/2:] per group), so no concat and no
    int32 traffic anywhere.  ~3 cheap ops per weight vs v1's ~6 wide
    ones."""
    def kernel(xlo_ref, xhi_ref, p_ref, s_ref, o_ref):
        k = pl.program_id(1)
        p = p_ref[:]                                  # [TK/2, TN] int8
        lo_u = p & 0xF
        lo_x = (lo_u ^ 8).astype(x_dtype)
        tk2, tn = p_ref.shape
        ng = tk2 // (group // 2)
        s = s_ref[:].astype(x_dtype)[:, None, :]      # [ng, 1, TN]
        lo = lo_x - 8.0
        hi16 = p.astype(x_dtype) - lo_u.astype(x_dtype)
        w_lo = (lo.reshape(ng, group // 2, tn) * s).reshape(tk2, tn)
        w_hi = (hi16.reshape(ng, group // 2, tn)
                * (s * 0.0625)).reshape(tk2, tn)
        part = (jnp.dot(xlo_ref[:], w_lo, preferred_element_type=jnp.float32)
                + jnp.dot(xhi_ref[:], w_hi,
                          preferred_element_type=jnp.float32))

        @pl.when(k == 0)
        def _init():
            o_ref[:] = part

        @pl.when(k != 0)
        def _acc():
            o_ref[:] += part

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("group", "block_n", "block_k",
                                    "variant", "interpret"))
def matmul_w4(
    x: jnp.ndarray,        # [M, K] float (bf16/f32)
    packed: jnp.ndarray,   # [K/2, N] int8 (two nibbles per byte, per-group)
    scales: jnp.ndarray,   # [K/G, N] float32
    *,
    group: int,
    block_n: int = 256,
    block_k: int = 2048,
    variant: str = "v1",
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns x @ dequant(packed, scales) as [M, N] float32.

    Epilogue (bias/activation/residual) stays OUTSIDE: at decode shapes
    the output is [8, N] — the elementwise tail is noise next to the
    weight stream, and keeping it out keeps the kernel one-purpose."""
    interpret = interpret or os.environ.get("ANAKIN_PALLAS_INTERPRET") == "1"
    M, K = x.shape
    K2, N = packed.shape
    assert K == 2 * K2, (x.shape, packed.shape)
    assert K % group == 0 and scales.shape == (K // group, N), \
        (K, group, scales.shape)

    # K blocking must respect group boundaries; TK | K keeps index maps exact
    TK = min(block_k, K)
    TK = max(group, TK - TK % group)
    while K % TK:
        TK -= group
    n_k = K // TK
    TN = min(block_n, _round_up(N, 128))
    Np = _round_up(N, TN)
    Mp = _round_up(M, 8)
    if (Mp, Np) != (M, N):
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        packed = jnp.pad(packed, ((0, 0), (0, Np - N)))
        scales = jnp.pad(scales, ((0, 0), (0, Np - N)))

    cost = pl.CostEstimate(
        flops=2 * Mp * Np * K,
        bytes_accessed=Mp * K * x.dtype.itemsize + K2 * Np
        + (K // group) * Np * 4 + Mp * Np * 4,
        transcendentals=0,
    )
    if variant == "v2":
        # pre-split x columns into per-group lo/hi halves (matches the
        # packed row order); one tiny [M, K] shuffle outside the kernel
        ng_all = K // group
        x3 = x.reshape(Mp, ng_all, group)
        xlo = x3[:, :, :group // 2].reshape(Mp, K2)
        xhi = x3[:, :, group // 2:].reshape(Mp, K2)
        out = pl.pallas_call(
            _make_kernel_v2(group, x.dtype),
            grid=(Np // TN, n_k),
            in_specs=[
                pl.BlockSpec((Mp, TK // 2), lambda j, k: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Mp, TK // 2), lambda j, k: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TK // 2, TN), lambda j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TK // group, TN), lambda j, k: (k, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Mp, TN), lambda j, k: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(xlo, xhi, packed, scales)
    else:
        out = pl.pallas_call(
            _make_kernel(group, n_k, x.dtype),
            grid=(Np // TN, n_k),
            in_specs=[
                pl.BlockSpec((Mp, TK), lambda j, k: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TK // 2, TN), lambda j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TK // group, TN), lambda j, k: (k, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Mp, TN), lambda j, k: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(x, packed, scales)
    if (Mp, Np) != (M, N):
        out = out[:M, :N]
    return out
