"""Pallas int8 3x3 DEPTHWISE convolution (VPU path) with fused epilogue.

Why this kernel exists: depthwise conv has K-depth 9 per channel — no MXU
shape at all — so it is pure memory-bandwidth work, and the round-1
measurement showed XLA's int8 depthwise lowering LOSING to bf16
(docs/BENCH_NOTES.md: MobileNet v1/v2 int8 < bf16), i.e. XLA burns the
byte advantage on layout/requant overhead.  The reference faced the same
wall and answered with dedicated NEON depthwise assembly
(`saber/funcs/impl/arm/neon/impl/conv_dw_3x3s1_int8.cpp` family); this is
the TPU twin: int8 in, int8 (or fp) out, one pass, everything between in
VMEM/VPU registers.

Design (per CLAUDE.md Mosaic constraints — no int8 rotates, 8-aligned
reshapes only):

  * layout [N, H, W, C]: C on lanes, W on sublanes; grid over batch
    blocks, whole padded images per block (MobileNet maps fit VMEM).
  * stride 1: y[w] needs x[w + dx - 1] — compute t = x_i32 * k[dy,dx]
    full-plane and ROLL t along the sublane dim (`pltpu.roll` is 32-bit,
    wrapped columns land in zero padding, so wraparound is harmless).
  * stride 2: the wrapper pre-splits x into even/odd column planes (HBM
    strided slices, fused by XLA); then y[w'] = k0*odd[w'-1] +
    k1*even[w'] + k2*odd[w'] — the stride disappears and only the same
    ±1 rolls remain.  Row stride rides the untiled H dim (free slices).
  * epilogue in-register: acc_s32 * (in_scale * w_scale[c]) + bias ->
    act -> requant/cast, exactly the `_int8_epilogue` contract.

HBM traffic: x_int8 + y_int8 only — the 2x byte cut over bf16 that a
BW-bound op actually converts into time.
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

__all__ = ["depthwise3x3_int8"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_bn(N: int, rows: int, Wp: int, Cp: int, Ho: int) -> int:
    """Largest batch block with x-block + int32 acc within ~5 MB."""
    for bn in (32, 16, 8, 4, 2, 1):
        if N % bn:
            continue
        x_bytes = bn * rows * Wp * Cp
        acc_bytes = bn * Ho * Wp * Cp * 4
        if x_bytes + acc_bytes <= 5 * 1024 * 1024:
            return bn
    return 1


def _epilogue(acc, ws_ref, bias_ref, in_scale, activation, act_alpha,
              out_scale, out_dtype):
    y = acc.astype(jnp.float32) * (in_scale * ws_ref[0, 0])
    if bias_ref is not None:
        y = y + bias_ref[0, 0]
    if activation == "relu":
        y = jnp.maximum(y, 0.0)
    elif activation == "relu6":
        y = jnp.clip(y, 0.0, 6.0)
    elif activation == "leaky_relu":
        y = jnp.where(y >= 0, y, y * act_alpha)
    elif activation not in (None, "identity"):
        raise ValueError(f"unsupported epilogue act {activation!r}")
    if out_scale is not None:
        q = jnp.round(y * (1.0 / out_scale))
        return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
    return y.astype(out_dtype)


def _h_chunk(BN, Wp, C, budget=3 * 1024 * 1024):
    """Rows per inner chunk so the int32 temporaries (rows + t + acc)
    stay within ~budget bytes of VMEM."""
    per_row = BN * Wp * C * 4 * 3
    return max(1, budget // per_row)


def _make_kernel_s1(BN, H, W, Wp, C, in_scale, activation, act_alpha,
                    out_scale, out_dtype, has_bias):
    HC = _h_chunk(BN, Wp, C)

    def kernel(*refs):
        x_ref = refs[0]           # [BN, H+2, Wp, C] int8, data at cols 1..W
        w_ref = refs[1]           # [1, 9, 1, C] int8
        ws_ref = refs[2]          # [1, 1, 1, C] f32
        bias_ref = refs[3] if has_bias else None
        out_ref = refs[3 + int(has_bias)]   # [BN, H, Wp, C]

        k = w_ref[0].astype(jnp.int32)      # [9, 1, C]
        # static H chunks bound the int32 temporaries (whole-image int32
        # blew VMEM at 112^2: 3 live [BN,H,Wp,C] s32 planes > 10 MB)
        for h0 in range(0, H, HC):
            hc = min(HC, H - h0)
            acc = jnp.zeros((BN, hc, Wp, C), jnp.int32)
            for dy in range(3):
                rows = x_ref[:, h0 + dy:h0 + dy + hc].astype(jnp.int32)
                for dx in range(3):
                    t = rows * k[dy * 3 + dx][None]
                    if dx != 1:
                        # y[w] += t[w + dx - 1]: roll (1 - dx) sublanes;
                        # wrapped cols carry zero padding only
                        t = pltpu.roll(t, (1 - dx) % Wp, 2)
                    acc = acc + t
            out_ref[:, h0:h0 + hc] = _epilogue(
                acc, ws_ref, bias_ref, in_scale, activation, act_alpha,
                out_scale, out_dtype)

    return kernel


def _make_kernel_s2(BN, Ho, Wo, Wp, C, in_scale, activation, act_alpha,
                    out_scale, out_dtype, has_bias):
    """Four-plane formulation: int8 strided loads are not implemented in
    Mosaic, so the wrapper pre-splits the H-and-W-padded image by row/col
    parity.  In the padded frame output (h', w') reads padded rows/cols
    2h'+dy / 2w'+dx, whose parity plane and offset are:

        dy or dx : 0 -> even plane, offset 0
                   1 -> odd  plane, offset 0
                   2 -> even plane, offset +1

    Row offsets ride the untiled H dim; the +1 col offset is a 32-bit
    sublane roll (wrap lands in discarded padding)."""
    HC = _h_chunk(BN, Wp, C)
    sel = ((0, 0), (1, 0), (0, 1))          # (plane parity, offset) per d

    def kernel(*refs):
        planes = [[refs[0], refs[1]], [refs[2], refs[3]]]  # [rpar][cpar]
        w_ref = refs[4]           # [1, 9, 1, C]
        ws_ref = refs[5]          # [1, 1, 1, C]
        bias_ref = refs[6] if has_bias else None
        out_ref = refs[6 + int(has_bias)]   # [BN, Ho, Wp, C]

        k = w_ref[0].astype(jnp.int32)
        for h0 in range(0, Ho, HC):
            hc = min(HC, Ho - h0)
            acc = jnp.zeros((BN, hc, Wp, C), jnp.int32)
            for dy in range(3):
                rpar, ro = sel[dy]
                for dx in range(3):
                    cpar, co = sel[dx]
                    p = planes[rpar][cpar]
                    rows = p[:, h0 + ro:h0 + ro + hc].astype(jnp.int32)
                    t = rows * k[dy * 3 + dx][None]
                    if co:
                        t = pltpu.roll(t, Wp - 1, 2)     # shift left by 1
                    acc = acc + t
            out_ref[:, h0:h0 + hc] = _epilogue(
                acc, ws_ref, bias_ref, in_scale, activation, act_alpha,
                out_scale, out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("stride", "in_scale", "activation", "act_alpha",
                     "out_scale", "out_dtype", "interpret"),
)
def depthwise3x3_int8(
    x: jnp.ndarray,            # [N, H, W, C] int8 (UNpadded)
    w: jnp.ndarray,            # [3, 3, 1, C] int8 (HWIO, groups=C)
    w_scale: jnp.ndarray,      # [C] float32
    bias: Optional[jnp.ndarray] = None,       # [C] float32
    *,
    stride: int = 1,
    in_scale: float,
    activation: Optional[str] = None,
    act_alpha: float = 0.0,
    out_scale: Optional[float] = None,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """3x3 depthwise conv, pad 1, stride 1 or 2, channel multiplier 1."""
    interpret = interpret or os.environ.get("ANAKIN_PALLAS_INTERPRET") == "1"
    N, H, W, C = x.shape
    assert w.shape == (3, 3, 1, C), w.shape
    assert stride in (1, 2)
    Cp = _round_up(C, 128)
    Ho = (H + 2 * 1 - 3) // stride + 1
    Wo = (W + 2 * 1 - 3) // stride + 1

    wk = jnp.pad(w.reshape(1, 9, 1, C), ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
    ws = jnp.pad(w_scale.astype(jnp.float32), (0, Cp - C)).reshape(1, 1, 1, Cp)
    has_bias = bias is not None
    bias_in = ()
    if has_bias:
        bias_in = (jnp.pad(bias.astype(jnp.float32),
                           (0, Cp - C)).reshape(1, 1, 1, Cp),)

    vec_spec = pl.BlockSpec((1, 1, 1, Cp), lambda n: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 9, 1, Cp), lambda n: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)

    if stride == 1:
        # data at cols 1..W+1 of Wp (so rolls wrap through zero padding)
        Wp = _round_up(W + 2, 8)
        BN = _pick_bn(N, H + 2, Wp, Cp, H)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, Cp - C)))
        kernel = _make_kernel_s1(BN, H, W, Wp, Cp, in_scale, activation,
                                 act_alpha, out_scale, out_dtype, has_bias)
        out = pl.pallas_call(
            kernel,
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((BN, H + 2, Wp, Cp), lambda n: (n, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                w_spec, vec_spec,
            ] + ([vec_spec] if has_bias else []),
            out_specs=pl.BlockSpec((BN, H, Wp, Cp), lambda n: (n, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (N, H, Wp, Cp),
                jnp.int8 if out_scale is not None else out_dtype),
            interpret=interpret,
        )(xp, wk, ws, *bias_in)
        return out[:, :, 1:W + 1, :C]

    # stride 2: four parity planes (int8 strided loads unsupported in
    # Mosaic); see _make_kernel_s2 for the index algebra
    assert W % 2 == 0 and H % 2 == 0, "stride-2 depthwise expects even H/W"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, Cp - C)))   # halo pad
    Hp2 = H // 2 + 1
    Wp = _round_up(W // 2 + 1, 8)
    planes = []
    for rpar in (0, 1):
        for cpar in (0, 1):
            p = xp[:, rpar::2, cpar::2]                      # [N, Hp2*, W/2+1*, Cp]
            p = p[:, :Hp2]
            p = jnp.pad(p, ((0, 0), (0, Hp2 - p.shape[1]),
                            (0, Wp - p.shape[2]), (0, 0)))
            planes.append(p)
    BN = _pick_bn(N, 4 * Hp2, Wp, Cp, Ho)
    kernel = _make_kernel_s2(BN, Ho, Wo, Wp, Cp, in_scale, activation,
                             act_alpha, out_scale, out_dtype, has_bias)
    plane_spec = pl.BlockSpec((BN, Hp2, Wp, Cp), lambda n: (n, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(N // BN,),
        in_specs=[plane_spec] * 4 + [w_spec, vec_spec]
        + ([vec_spec] if has_bias else []),
        out_specs=pl.BlockSpec((BN, Ho, Wp, Cp), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (N, Ho, Wp, Cp),
            jnp.int8 if out_scale is not None else out_dtype),
        interpret=interpret,
    )(*planes, wk, ws, *bias_in)
    return out[:, :, :Wo, :C]
