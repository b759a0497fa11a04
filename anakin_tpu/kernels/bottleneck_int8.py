"""Pallas fused int8 ResNet bottleneck block (1x1 -> 3x3 -> 1x1 + add).

The round-2 measured reality (docs/BENCH_NOTES.md): each int8 conv of a
bottleneck block individually runs near the HBM roofline — the remaining
end-to-end lever is TRAFFIC, not per-op compute.  Unfused, a stage-1
block moves ~330 MB per b128 step (a, b activations round-trip HBM);
fused, only x in + y out (+ the residual read, which IS x for identity
blocks) touch HBM — a ~2.5x traffic cut on stages 1-2.

This kernel keeps the whole chain in VMEM per batch-block:

    a = requant_a( relu(x @ Wa + ba) )          1x1, C -> P
    b = requant_b( relu(conv3x3(a, Wb) + bb) )  3x3 s1 p1, P -> P
    y = requant_y( relu(b @ Wc + bc + x * res_scale) )   1x1, P -> C

(identity-shortcut blocks only: cin == cout == 4P, stride 1 — the
downsample blocks keep the unfused path).  The 3x3 reuses the
conv3x3_int8 formulation: dy taps concatenated along K (3 dots of K=3P),
dx taps as 32-bit rolls of the partial sums.  Epilogue scales are fused
exactly like the reference's chained SASS igemm epilogues
(`third-party/sass/include/sass_funcs.h` ker_igemm_s8s8_*_scale_*).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bottleneck_int8"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _requant(y, scale):
    return jnp.clip(jnp.round(y * (1.0 / scale)), -127.0, 127.0
                    ).astype(jnp.int8)


def _make_kernel(BN, H, W, Wp, C, P, scales, has_bias, out_dtype):
    (in_scale, a_scale, b_scale, res_scale, out_scale) = scales

    def kernel(*refs):
        x_ref = refs[0]            # [BN, H+2, Wp, C] int8, zero halo
        wa_ref = refs[1]           # [C, P]
        wsa_ref = refs[2]          # [1, P]
        wb_ref = refs[3]           # [3, 3, P, P]
        wsb_ref = refs[4]          # [1, P]
        wc_ref = refs[5]           # [P, C]
        wsc_ref = refs[6]          # [1, C]
        i = 7
        ba_ref = bb_ref = bc_ref = None
        if has_bias:
            ba_ref, bb_ref, bc_ref = refs[i], refs[i + 1], refs[i + 2]
            i += 3
        out_ref = refs[i]          # [BN, H, Wp, C]
        a_pad = refs[i + 1]        # scratch [BN, H+2, Wp, P] int8

        # ---- stage a: pointwise C -> P over the REAL rows only ----------
        Rh = BN * (H + 2) * Wp
        x2d = x_ref[:].reshape(Rh, C)
        ya = jnp.dot(x2d, wa_ref[:], preferred_element_type=jnp.int32)
        fa = ya.astype(jnp.float32) * (in_scale * wsa_ref[:])
        if ba_ref is not None:
            fa = fa + ba_ref[:]
        fa = jnp.maximum(fa, 0.0)
        qa = _requant(fa, a_scale).reshape(BN, H + 2, Wp, P)
        # conv padding semantics: halo rows/cols of `a` must be ZERO (the
        # bias+relu of a zero input row is not) — mask with the col index
        col = jax.lax.broadcasted_iota(jnp.int32, (BN, H + 2, Wp, P), 2)
        row = jax.lax.broadcasted_iota(jnp.int32, (BN, H + 2, Wp, P), 1)
        valid = (col >= 1) & (col <= W) & (row >= 1) & (row <= H)
        a_pad[:] = jnp.where(valid, qa, jnp.int8(0))

        # ---- stage b: 3x3 s1 p1 on a_pad (concat-K + roll taps) ---------
        R = BN * H * Wp
        a3 = jnp.concatenate(
            [a_pad[:, dy:dy + H].reshape(R, P) for dy in range(3)], axis=1)
        acc = jnp.zeros((R, P), jnp.int32)
        for dx in range(3):
            w3 = wb_ref[:, dx].reshape(3 * P, P)
            t = jnp.dot(a3, w3, preferred_element_type=jnp.int32)
            acc = acc + (t if dx == 0 else pltpu.roll(t, R - dx, 0))
        fb = acc.astype(jnp.float32) * (a_scale * wsb_ref[:])
        if bb_ref is not None:
            fb = fb + bb_ref[:]
        qb = _requant(jnp.maximum(fb, 0.0), b_scale)

        # ---- stage c: pointwise P -> C + residual + requant -------------
        yc = jnp.dot(qb, wc_ref[:], preferred_element_type=jnp.int32)
        fc = yc.astype(jnp.float32) * (b_scale * wsc_ref[:])
        if bc_ref is not None:
            fc = fc + bc_ref[:]
        # x_pad col j holds spatial col j-1 while the conv output col j is
        # spatial col j — roll the (32-bit, Mosaic-rollable) dequantized
        # residual one row so columns line up; wrap lands in discard cols
        res = x_ref[:, 1:H + 1].reshape(R, C).astype(jnp.float32) * res_scale
        res = pltpu.roll(res, R - 1, 0)
        fc = jnp.maximum(fc + res, 0.0)
        if out_scale is not None:
            out = _requant(fc, out_scale)
        else:
            out = fc.astype(out_dtype)
        out_ref[:] = out.reshape(BN, H, Wp, C)

    return kernel


def _pick_bn(N, H, Wp, C, P):
    """Largest batch block within a ~10 MB working-set budget."""
    for bn in (8, 4, 2, 1):
        if N % bn:
            continue
        x_b = bn * (H + 2) * Wp * C          # int8 in
        a_b = bn * (H + 2) * Wp * P * 2      # scratch + concat copy
        c_b = bn * H * Wp * C * 5            # int32/f32 stage-c intermediates
        if x_b + a_b + c_b <= 10 * 1024 * 1024:
            return bn
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("in_scale", "a_scale", "b_scale", "res_scale",
                     "out_scale", "out_dtype", "interpret"),
)
def bottleneck_int8(
    x: jnp.ndarray,                 # [N, H, W, C] int8
    wa: jnp.ndarray,                # [C, P] int8        (1x1 reduce)
    wsa: jnp.ndarray,               # [P] f32 per-channel
    wb: jnp.ndarray,                # [3, 3, P, P] int8
    wsb: jnp.ndarray,               # [P] f32
    wc: jnp.ndarray,                # [P, C] int8        (1x1 expand)
    wsc: jnp.ndarray,               # [C] f32
    ba: Optional[jnp.ndarray] = None,   # [P] f32
    bb: Optional[jnp.ndarray] = None,   # [P] f32
    bc: Optional[jnp.ndarray] = None,   # [C] f32
    *,
    in_scale: float,
    a_scale: float,
    b_scale: float,
    res_scale: float,
    out_scale: Optional[float] = None,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused identity-shortcut bottleneck; returns [N, H, W, C]."""
    interpret = interpret or os.environ.get("ANAKIN_PALLAS_INTERPRET") == "1"
    N, H, W, C = x.shape
    P = wa.shape[1]
    assert wc.shape == (P, C) and wb.shape == (3, 3, P, P)
    Wp = _round_up(W + 2, 8)
    BN = _pick_bn(N, H, Wp, C, P)
    # zero halo: 1 row top/bottom, col 0 left, cols W+1.. right
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, 0)))

    has_bias = ba is not None
    scales = (float(in_scale), float(a_scale), float(b_scale),
              float(res_scale),
              None if out_scale is None else float(out_scale))
    kernel = _make_kernel(BN, H, W, Wp, C, P, scales, has_bias, out_dtype)

    inputs = [xp, wa, wsa.astype(jnp.float32).reshape(1, P), wb,
              wsb.astype(jnp.float32).reshape(1, P), wc,
              wsc.astype(jnp.float32).reshape(1, C)]
    in_specs = [
        pl.BlockSpec((BN, H + 2, Wp, C), lambda n: (n, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, P), lambda n: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), lambda n: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, P, P), lambda n: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), lambda n: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((P, C), lambda n: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda n: (0, 0), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        for v, n_ in ((ba, P), (bb, P), (bc, C)):
            inputs.append(v.astype(jnp.float32).reshape(1, n_))
            in_specs.append(pl.BlockSpec((1, n_), lambda n: (0, 0),
                                         memory_space=pltpu.VMEM))

    odt = jnp.int8 if out_scale is not None else out_dtype
    out = pl.pallas_call(
        kernel,
        grid=(N // BN,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BN, H, Wp, C), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, Wp, C), odt),
        scratch_shapes=[pltpu.VMEM((BN, H + 2, Wp, P), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * (C * P + 9 * P * P + P * C),
            bytes_accessed=2 * N * H * W * C,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:, :, :W, :]
