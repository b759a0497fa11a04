"""Pallas int8 3x3 convolution with fully fused epilogue.

Why this kernel exists: XLA:TPU lowers int8 conv to an MXU convolution
whose s32 accumulator is WRITTEN TO HBM, with dequant/bias/act/requant as a
separate fusion (verified in HLO) — for a [32,28,28,128] layer that is an
extra 25.6 MB of s32 HBM traffic per conv, comparable to the compute time.
This kernel is the TPU twin of the reference's fused SASS igemm conv
kernels (`third-party/sass/include/sass_funcs.h` winograd_conv_relu /
ker_igemm_s8s8 epilogues): the 3x3 conv is computed as 9 shifted int8
GEMMs accumulating on-chip, and the entire epilogue

    y = act(acc * (in_scale * w_scale[o]) + bias[o] [+ residual])
    [requant to int8]

runs while the accumulator is still in VMEM.  Only s8 activations touch
HBM.

Design: CNN feature maps are small — a padded s8 image block of BN images
fits VMEM outright — so the grid is (N/BN, O/TO) with whole-image blocks
and NO halo exchange: the standard Pallas pipeline double-buffers the
blocks, and the 9 taps are static shifted slices of the in-VMEM block
feeding [BN*H*W, C] x [C, TO] MXU dots.

Scope: stride 1, pad 1, dilation 1, groups 1 (the dominant ResNet/VGG
shape class).  Other shapes keep the XLA lowering; the autotuner picks.
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

__all__ = ["conv3x3_int8"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_bn(N: int, H: int, Wp: int, Cp: int, TO: int) -> int:
    """Largest batch block keeping x-block + accumulator within ~6 MB."""
    for bn in (16, 8, 4, 2, 1):
        if N % bn:
            continue
        x_bytes = bn * (H + 2) * Wp * Cp
        acc_bytes = bn * H * (Wp - 2) * TO * 4
        if x_bytes + acc_bytes <= 6 * 1024 * 1024:
            return bn
    return 1


def _make_kernel(BN, H, W, Wp, C, TO, in_scale, activation, act_alpha,
                 out_scale, out_dtype, has_bias, has_residual):
    def kernel(*refs):
        x_ref = refs[0]           # [BN, H+2, Wp, C]
        w_ref = refs[1]           # [3, 3, C, TO]
        ws_ref = refs[2]          # [1, TO]
        i = 3
        bias_ref = refs[i] if has_bias else None
        i += int(has_bias)
        res_ref = refs[i] if has_residual else None
        i += int(has_residual)
        out_ref = refs[i]         # [BN, H, W, TO]

        # Alignment-clean formulation: slicing the untiled BN/H dims is
        # free, the reshape merges only 8-aligned dims (Wp % 8 == 0), and
        # the dx taps become sublane ROLLS of the int32 partial sums (roll
        # distributes over the dy sum; Mosaic only rotates 32-bit data) —
        # wrapped rows land only in the discarded padding columns (>= W).
        #
        # K-depth: the MXU is latency-bound at shallow K (measured 6 TOP/s
        # at K=128 vs 313 TOP/s at K=8192), so the three dy taps are
        # CONCATENATED along the contraction dim — 3 dots of K=3C instead
        # of 9 dots of K=C.  Lane-dim concat of row blocks is free.
        R = BN * H * Wp
        a3 = jnp.concatenate(
            [x_ref[:, dy:dy + H].reshape(R, C) for dy in range(3)], axis=1)
        acc = jnp.zeros((R, TO), jnp.int32)
        for dx in range(3):
            w3 = w_ref[:, dx].reshape(3 * C, TO)  # dy-major, matches a3
            t = jnp.dot(a3, w3, preferred_element_type=jnp.int32)
            acc = acc + (t if dx == 0 else pltpu.roll(t, R - dx, 0))
        y = acc.astype(jnp.float32) * (in_scale * ws_ref[:])
        if bias_ref is not None:
            y = y + bias_ref[:]
        if res_ref is not None:
            y = y + res_ref[:].astype(jnp.float32)
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
            out = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
        else:
            out = y.astype(out_dtype)
        out_ref[:] = out.reshape(BN, H, Wp, TO)[:, :, :W, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("in_scale", "activation", "act_alpha", "out_scale",
                     "out_dtype", "block_o", "interpret"),
)
def conv3x3_int8(
    x: jnp.ndarray,            # [N, H, W, C] int8 (UNpadded)
    w: jnp.ndarray,            # [3, 3, C, O] int8
    w_scale: jnp.ndarray,      # [O] float32
    bias: Optional[jnp.ndarray] = None,
    residual: Optional[jnp.ndarray] = None,   # [N, H, W, O]
    *,
    in_scale: float,
    activation: Optional[str] = None,
    act_alpha: float = 0.0,
    out_scale: Optional[float] = None,
    out_dtype=jnp.float32,
    block_o: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    # test hook: force interpreter mode process-wide (pallas on CPU)
    interpret = interpret or os.environ.get("ANAKIN_PALLAS_INTERPRET") == "1"

    N, H, W, C = x.shape
    O = w.shape[3]
    Cp = _round_up(C, 128)
    TO = min(block_o, _round_up(O, 128))
    Op = _round_up(O, TO)
    # halo pad + 8-aligned sublane width + lane-width channels
    Wp = _round_up(W + 2, 8)
    BN = _pick_bn(N, H, Wp, Cp, TO)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, Cp - C)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, Cp - C), (0, Op - O)))
    ws = jnp.pad(w_scale.astype(jnp.float32), (0, Op - O)).reshape(1, Op)

    has_bias = bias is not None
    has_residual = residual is not None
    inputs = [xp, wp, ws]
    in_specs = [
        pl.BlockSpec((BN, H + 2, Wp, Cp), lambda n, o: (n, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, Cp, TO), lambda n, o: (0, 0, 0, o),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TO), lambda n, o: (0, o), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        inputs.append(jnp.pad(bias.astype(jnp.float32), (0, Op - O)).reshape(1, Op))
        in_specs.append(pl.BlockSpec((1, TO), lambda n, o: (0, o),
                                     memory_space=pltpu.VMEM))
    if has_residual:
        rp = jnp.pad(residual,
                     ((0, 0), (0, 0), (0, Wp - W), (0, Op - O)))
        inputs.append(rp.reshape(N * H * Wp, Op))
        in_specs.append(pl.BlockSpec(
            (BN * H * Wp, TO),
            lambda n, o: (n, o), memory_space=pltpu.VMEM))

    odt = jnp.int8 if out_scale is not None else out_dtype
    kernel = _make_kernel(BN, H, W, Wp, Cp, TO, float(in_scale), activation,
                          float(act_alpha),
                          None if out_scale is None else float(out_scale),
                          out_dtype, has_bias, has_residual)
    out = pl.pallas_call(
        kernel,
        grid=(N // BN, Op // TO),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BN, H, W, TO), lambda n, o: (n, 0, 0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, Op), odt),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * 9 * Cp * Op,
            bytes_accessed=N * H * W * (Cp + Op) + 9 * Cp * Op,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    if Op != O:
        out = out[..., :O]
    return out
