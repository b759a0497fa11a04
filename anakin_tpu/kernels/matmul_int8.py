"""Pallas int8 MXU matmul with fused dequant/bias/activation/requant epilogue.

This is the TPU realization of the reference's fused int8 SASS gemm kernels
(`third-party/sass/include/sass_funcs.h:481-543`:
`ker_igemm_s8s8_32x32x32_NN_{bias, bias_relu, scale_bias, scale_vec_bias}`)
— one kernel computes the int8×int8→int32 product on the MXU and applies
the whole epilogue while the accumulator tile is still in VMEM:

    y = act( acc_i32 * (in_scale * w_scale[col]) + bias[col] [+ residual] )
    [ y_int8 = clip(round(y / out_scale)) ]          (requant, optional)

Used by the executor for dense_int8 and 1x1-stride-1 conv2d_int8 (which is
exactly a GEMM over [N*H*W, Cin] x [Cin, Cout]); other conv shapes lower
through XLA's int8 conv.  The autotuner (`autotune.py`) decides per shape.

Tiling: grid (M/TM, N/TN) with K resident per tile — int8 rows are cheap
(K bytes/row), so K up to ~16K fits VMEM comfortably.  dtype tile minima:
int8 needs (32, 128); accumulation in fp32 via int32.
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

__all__ = ["matmul_int8"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _epilogue_kernel(acc, scale_row, bias, residual, activation, act_alpha,
                     out_scale, out_dtype):
    y = acc.astype(jnp.float32) * scale_row
    if bias is not None:
        y = y + bias
    if residual is not None:
        y = y + residual
    if activation == "relu":
        y = jnp.maximum(y, 0.0)
    elif activation == "relu6":
        y = jnp.clip(y, 0.0, 6.0)
    elif activation == "leaky_relu":
        y = jnp.where(y >= 0, y, y * act_alpha)
    elif activation == "sigmoid":
        y = jax.nn.sigmoid(y)
    elif activation == "tanh":
        y = jnp.tanh(y)
    elif activation not in (None, "identity"):
        raise ValueError(f"epilogue activation {activation!r} not supported")
    if out_scale is not None:
        q = jnp.round(y * (1.0 / out_scale))
        return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)
    return y.astype(out_dtype)


def _make_kernel(in_scale, activation, act_alpha, out_scale, out_dtype,
                 has_bias, has_residual):
    def kernel(*refs):
        i = 0
        a_ref = refs[i]; i += 1
        b_ref = refs[i]; i += 1
        ws_ref = refs[i]; i += 1
        bias_ref = None
        res_ref = None
        if has_bias:
            bias_ref = refs[i]; i += 1
        if has_residual:
            res_ref = refs[i]; i += 1
        out_ref = refs[i]
        acc = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.int32)
        scale_row = in_scale * ws_ref[:]  # [1, TN] broadcast over rows
        bias = bias_ref[:] if bias_ref is not None else None
        residual = res_ref[:].astype(jnp.float32) if res_ref is not None else None
        out_ref[:] = _epilogue_kernel(
            acc, scale_row, bias, residual, activation, act_alpha,
            out_scale, out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("in_scale", "activation", "act_alpha", "out_scale",
                     "out_dtype", "block_m", "block_n", "interpret"),
)
def matmul_int8(
    a: jnp.ndarray,            # [M, K] int8
    b: jnp.ndarray,            # [K, N] int8
    w_scale: jnp.ndarray,      # [N] float32 per-column scale
    bias: Optional[jnp.ndarray] = None,      # [N] float32
    residual: Optional[jnp.ndarray] = None,  # [M, N] float
    *,
    in_scale: float,
    activation: Optional[str] = None,
    act_alpha: float = 0.0,
    out_scale: Optional[float] = None,
    out_dtype=jnp.float32,
    block_m: int = 256,
    block_n: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    # test hook: force interpreter mode process-wide (pallas on CPU)
    interpret = interpret or os.environ.get("ANAKIN_PALLAS_INTERPRET") == "1"

    """Fused int8 GEMM; returns [M, N] in out_dtype (int8 if out_scale)."""
    M, K = a.shape
    K2, N = b.shape
    assert K == K2, (a.shape, b.shape)
    # pad to tile multiples (int8 min tile 32x128)
    TM = min(block_m, _round_up(M, 32))
    TN = min(block_n, _round_up(N, 128))
    Mp = _round_up(M, TM)
    Np = _round_up(N, TN)
    Kp = _round_up(K, 128)
    if (Mp, Kp) != (M, K):
        a = jnp.pad(a, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        b = jnp.pad(b, ((0, Kp - K), (0, Np - N)))
    ws = jnp.pad(w_scale.astype(jnp.float32), (0, Np - N)).reshape(1, Np)
    has_bias = bias is not None
    has_residual = residual is not None
    inputs = [a, b, ws]
    in_specs = [
        pl.BlockSpec((TM, Kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        inputs.append(jnp.pad(bias.astype(jnp.float32), (0, Np - N)).reshape(1, Np))
        in_specs.append(
            pl.BlockSpec((1, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM))
    if has_residual:
        r = residual
        if (Mp, Np) != (M, N):
            r = jnp.pad(r, ((0, Mp - M), (0, Np - N)))
        inputs.append(r)
        in_specs.append(
            pl.BlockSpec((TM, TN), lambda i, j: (i, j), memory_space=pltpu.VMEM))

    odt = jnp.int8 if out_scale is not None else out_dtype
    kernel = _make_kernel(float(in_scale), activation, float(act_alpha),
                          None if out_scale is None else float(out_scale),
                          out_dtype, has_bias, has_residual)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // TM, Np // TN),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), odt),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp + Kp * Np + Mp * Np * np.dtype(odt).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    if (Mp, Np) != (M, N):
        out = out[:M, :N]
    return out
