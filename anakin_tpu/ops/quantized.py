"""INT8 quantized ops.

Parity target: the reference's INT8 inference design
(`docs/Manual/int8_design_ch.md`, conv int8 path
`saber/funcs/impl/cuda/saber_conv.cpp:191-420`, per-channel weight scales
`saber/funcs/type_trans.h:33-81`): activations carry a per-tensor scale
(amax/127), weights a per-output-channel scale, convs accumulate in int32
and fuse dequant+bias+activation(+requant) into the epilogue — the role of
the fused SASS igemm kernels (`third-party/sass/include/sass_funcs.h`).

TPU realization: int8×int8→int32 runs on the MXU natively.  These ops are
expressed with `lax.conv_general_dilated` / `jnp.dot` with
`preferred_element_type=int32` so XLA lowers them to int8 MXU ops and fuses
the scalar epilogue; `anakin_tpu.kernels` provides hand-written Pallas
variants the autotuner can substitute on the matmul-shaped cases.

Scale conventions (match the reference):
  int8 value  = clip(round(fp / scale), -127, 127)
  activation scale: per-tensor float (calibration table)
  weight scale: per-output-channel float vector
  dequant: acc_int32 * (in_scale * w_scale[oc])
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .registry import register
from .nn import apply_activation, _conv_padding, _pair

__all__ = ["quantize_array", "dequantize_array"]


def quantize_array(x: jnp.ndarray, scale) -> jnp.ndarray:
    """fp -> int8 with round-to-nearest-even and symmetric clip to ±127."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def dequantize_array(q: jnp.ndarray, scale) -> jnp.ndarray:
    return q.astype(jnp.float32) * scale


@register("quantize")
def quantize(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """fp -> int8 edge with per-tensor scale attr (reference:
    `saber/funcs/calibrate.h` conv_calibrate_fp32_int8 path)."""
    return [quantize_array(xs[0], float(node.attr("scale")))]


@register("dequantize")
def dequantize(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    dtype = node.attr("dtype", "float32")
    return [dequantize_array(xs[0], float(node.attr("scale"))).astype(jnp.dtype(dtype))]


def _int8_epilogue(node, acc_i32, in_scale, w_scale, bias, residual):
    """Fused dequant + bias + residual + activation [+ requant]."""
    y = acc_i32.astype(jnp.float32) * (in_scale * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if residual is not None:
        res = residual
        res_scale = node.attr("residual_scale")
        if res.dtype == jnp.int8:
            res = res.astype(jnp.float32) * float(res_scale)
        y = y + res.astype(jnp.float32)
    y = apply_activation(y, node.attr("activation"), node.attr("act_alpha", 0.0))
    out_scale = node.attr("out_scale")
    if out_scale is not None:
        return quantize_array(y, float(out_scale))
    return y.astype(jnp.dtype(node.attr("out_dtype", "float32")))


def _split_q_inputs(node, xs):
    """inputs = [x, w, w_scale] + [bias]? + [residual]?"""
    it = iter(xs)
    x, w, w_scale = next(it), next(it), next(it)
    bias = next(it) if node.attr("has_bias") else None
    residual = next(it) if node.attr("has_residual") else None
    return x, w, w_scale, bias, residual


def _use_1x1_dot() -> bool:
    """Round-2 experiment gate: lower 1x1 int8 convs as reshaped matmuls
    (set ANAKIN_INT8_1X1_DOT=1; default stays on the conv lowering until
    the measured verdict lands — see docs/BENCH_NOTES.md)."""
    import os

    return os.environ.get("ANAKIN_INT8_1X1_DOT", "0") == "1"


def _conv_kind(node) -> str:
    """"gemm" (1x1 s1 p0), "conv3x3" (3x3 s1 p1), "dw3x3" (grouped 3x3
    p1, stride 1/2 — the depthwise VPU kernel's class), or "other"."""
    sh, sw = _pair(node.attr("strides", (1, 1)))
    dh, dw = _pair(node.attr("dilation", (1, 1)))
    pad = node.attr("padding", (0, 0))
    if isinstance(pad, str) or (isinstance(pad, (tuple, list)) and len(pad)
                                and isinstance(pad[0], (tuple, list))):
        return "other"  # SAME/VALID or asymmetric: not a Pallas shape class
    ph, pw = _pair(pad)
    groups = int(node.attr("groups", 1))
    if (dh, dw) != (1, 1):
        return "other"
    if groups > 1:
        if (ph, pw) == (1, 1) and sh == sw and sh in (1, 2):
            return "dw3x3"
        return "other"
    if (sh, sw) != (1, 1):
        return "other"
    if (ph, pw) == (0, 0):
        return "gemm"
    if (ph, pw) == (1, 1):
        return "conv3x3"
    return "other"


def _pallas_eligible(node, graph=None) -> bool:
    """dense_int8/dense_w4 always; conv2d_int8 when it is a pure GEMM
    (1x1/s1/p0) or a 3x3/s1/p1 conv (the fused Pallas conv kernel's
    shape class).  Weight-kernel-size check happens at emit time (needs
    shapes)."""
    if node.op in ("dense_int8", "dense_w4"):
        return True
    return node.op == "conv2d_int8" and _conv_kind(node) != "other"


def _emit_pallas_gemm(node, x, w2d, w_scale, bias, residual, in_scale,
                      lead_shape, out_ch):
    """Shared Pallas fused-GEMM emission for dense/1x1-conv int8."""
    from ..kernels.matmul_int8 import matmul_int8

    res2d = None
    if residual is not None:
        res2d = residual.reshape(-1, out_ch)
        if res2d.dtype == jnp.int8:
            res2d = res2d.astype(jnp.float32) * float(node.attr("residual_scale"))
    out_scale = node.attr("out_scale")
    y = matmul_int8(
        x, w2d, w_scale,
        bias.astype(jnp.float32) if bias is not None else None,
        res2d,
        in_scale=float(in_scale),
        activation=node.attr("activation"),
        act_alpha=float(node.attr("act_alpha", 0.0)),
        out_scale=None if out_scale is None else float(out_scale),
        out_dtype=jnp.dtype(node.attr("out_dtype", "float32")),
    )
    return y.reshape(lead_shape + (out_ch,))


@register("conv2d_int8")
def conv2d_int8(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """INT8 conv with fused dequant/bias/act/requant epilogue.

    x: NHWC int8 (or fp, quantized inline when attr `quantize_input`),
    w: HWIO int8, w_scale: [O] float32 per-out-channel.
    attrs: in_scale (per-tensor), out_scale (None -> fp32 output),
    impl: "xla" (default) or "pallas" (1x1 GEMM path, set by the autotuner
    — the reference's pick_best choosing SABER vs VENDER impls).
    """
    x, w, w_scale, bias, residual = _split_q_inputs(node, xs)
    in_scale = float(node.attr("in_scale"))
    if x.dtype != jnp.int8:
        x = quantize_array(x, in_scale)
    if node.attr("impl") == "pallas":
        kind = _conv_kind(node)
        kh, kw = int(w.shape[0]), int(w.shape[1])
        if kind == "gemm" and (kh, kw) == (1, 1):
            n, h, w_sp, cin = x.shape
            cout = w.shape[3]
            y = _emit_pallas_gemm(
                node, x.reshape(n * h * w_sp, cin), w.reshape(cin, cout),
                w_scale, bias, residual, in_scale, (n, h, w_sp), cout)
            return [y]
        if (kind == "dw3x3" and (kh, kw) == (3, 3) and w.shape[2] == 1
                and w.shape[3] == x.shape[3] and residual is None):
            from ..kernels.depthwise_int8 import depthwise3x3_int8

            out_scale = node.attr("out_scale")
            sh, _ = _pair(node.attr("strides", (1, 1)))
            y = depthwise3x3_int8(
                x, w, w_scale,
                bias.astype(jnp.float32) if bias is not None else None,
                stride=int(sh),
                in_scale=in_scale,
                activation=node.attr("activation"),
                act_alpha=float(node.attr("act_alpha", 0.0)),
                out_scale=None if out_scale is None else float(out_scale),
                out_dtype=jnp.dtype(node.attr("out_dtype", "float32")),
            )
            return [y]
        if kind == "conv3x3" and (kh, kw) == (3, 3):
            from ..kernels.conv_int8 import conv3x3_int8

            out_scale = node.attr("out_scale")
            if residual is not None and residual.dtype == jnp.int8:
                residual = residual.astype(jnp.float32) * float(
                    node.attr("residual_scale"))
            y = conv3x3_int8(
                x, w, w_scale,
                bias.astype(jnp.float32) if bias is not None else None,
                residual,
                in_scale=in_scale,
                activation=node.attr("activation"),
                act_alpha=float(node.attr("act_alpha", 0.0)),
                out_scale=None if out_scale is None else float(out_scale),
                out_dtype=jnp.dtype(node.attr("out_dtype", "float32")),
            )
            return [y]
    sh, sw = _pair(node.attr("strides", (1, 1)))
    dh, dw = _pair(node.attr("dilation", (1, 1)))
    padding = _conv_padding(node)
    groups = int(node.attr("groups", 1))
    if (_conv_kind(node) == "gemm" and w.shape[0] == w.shape[1] == 1
            and _use_1x1_dot()):
        # lower pointwise conv to an explicit int8 matmul: XLA:TPU's dot
        # path keeps the s32 accumulator in registers and fuses the
        # epilogue, where the conv lowering spills it to HBM (measured —
        # see docs/BENCH_NOTES.md round-2 notes)
        n, h, w_sp, cin = x.shape
        acc = jnp.dot(x.reshape(n * h * w_sp, cin),
                      w.reshape(cin, w.shape[3]),
                      preferred_element_type=jnp.int32)
        y = _int8_epilogue(node, acc, in_scale, w_scale, bias,
                           None if residual is None
                           else residual.reshape(n * h * w_sp, -1))
        return [y.reshape(n, h, w_sp, -1)]
    acc = lax.conv_general_dilated(
        x,
        w,
        window_strides=(sh, sw),
        padding=padding,
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    return [_int8_epilogue(node, acc, in_scale, w_scale, bias, residual)]


@register("dense_int8")
def dense_int8(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """INT8 fully-connected (reference: int8 fc test
    `test/saber/test_saber_fc_int8.cpp`; xbyak/SASS igemm epilogues)."""
    x, w, w_scale, bias, residual = _split_q_inputs(node, xs)
    in_scale = float(node.attr("in_scale"))
    if x.dtype != jnp.int8:
        x = quantize_array(x, in_scale)
    axis = int(node.attr("axis", 1))
    lead = x.shape[:axis]
    xf = x.reshape((int(np.prod(lead)) if lead else 1, -1))
    if node.attr("impl") == "pallas":
        return [_emit_pallas_gemm(node, xf, w, w_scale, bias, residual,
                                  in_scale, tuple(lead), w.shape[-1])]
    acc = jnp.dot(xf, w, preferred_element_type=jnp.int32)
    y = _int8_epilogue(node, acc, in_scale, w_scale, bias, residual)
    return [y.reshape(lead + (w.shape[-1],))]


@register("dense_w8", "conv2d_w8")
def weight_only_int8(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Weight-only int8: activations stay fp, weights live in HBM as int8
    and dequantize on the fly (the LLM-serving memory-bandwidth play —
    decode is weight-bound, so halving weight bytes halves step time; no
    activation calibration needed).  Per-output-channel scales apply AFTER
    the dot, so the int8->fp convert fuses into the MXU operand load.

    inputs: [x, w_q, w_scale] (+bias); attrs like dense/conv2d.
    """
    from .nn import MATMUL_PRECISION, _conv_padding, _epilogue

    it = iter(xs)
    x, w_q, w_scale = next(it), next(it), next(it)
    bias = next(it) if node.attr("has_bias") else None
    residual = next(it) if node.attr("has_residual") else None
    scale = w_scale.astype(jnp.float32)
    if node.op == "dense_w8":
        axis = int(node.attr("axis", 1))
        lead = x.shape[:axis]
        xf = x.reshape((int(np.prod(lead)) if lead else 1, -1))
        y = jnp.dot(xf, w_q.astype(x.dtype),
                    preferred_element_type=jnp.float32,
                    precision=MATMUL_PRECISION) * scale
        y = _epilogue(node, y, bias, residual)
        return [y.reshape(lead + (w_q.shape[-1],)).astype(x.dtype)]
    sh, sw = _pair(node.attr("strides", (1, 1)))
    dh, dw = _pair(node.attr("dilation", (1, 1)))
    y = lax.conv_general_dilated(
        x, w_q.astype(x.dtype), window_strides=(sh, sw),
        padding=_conv_padding(node), rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=int(node.attr("groups", 1)),
        preferred_element_type=jnp.float32) * scale
    y = _epilogue(node, y, bias, residual)
    return [y.astype(x.dtype)]


@register("dense_w4")
def weight_only_int4(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Weight-only int4 with group-wise scales (w4a16).

    Weights live in HBM packed two-nibbles-per-int8-byte in PER-GROUP
    split-half layout (`_w4_group_quantize`): within each scale group of
    G rows, packed row r holds original row r (low nibble) and r + G/2
    (high).  Scales vary along the REDUCTION dim (one per G input rows
    per output column), so dequant cannot move past the dot like w8's
    per-out-channel scale.

    impl "xla" (default): shift/concat unpack + dot.  XLA materializes
    the dequantized weights in HBM each step, so this path is CORRECT
    but does not beat w8 (measured, artifacts/w4_rows_r3.json) — it is
    the portable fallback and the numerics reference.
    impl "pallas" (autotuner-selected on TPU): `kernels.matmul_w4`
    unpacks in VMEM and feeds the MXU directly — HBM reads stay at
    0.5 B/weight.

    inputs: [x, w_packed int8 [K/2,N], w_scale f32 [K/G,N]] (+bias,
    +residual); attrs like dense plus w4_group=G.
    """
    from .nn import MATMUL_PRECISION, _epilogue

    it = iter(xs)
    x, w_q, w_scale = next(it), next(it), next(it)
    bias = next(it) if node.attr("has_bias") else None
    residual = next(it) if node.attr("has_residual") else None
    G = int(node.attr("w4_group"))
    K, N = 2 * w_q.shape[0], w_q.shape[1]
    axis = int(node.attr("axis", 1))
    lead = x.shape[:axis]
    xf = x.reshape((int(np.prod(lead)) if lead else 1, -1))
    if node.attr("impl") == "pallas":
        from ..kernels.matmul_w4 import matmul_w4

        # decode-shaped calls (tiny M) want wide N blocks: fewer grid
        # steps per weight pass (block sweep, artifacts/w4_blocksweep_r3)
        bn = 1024 if xf.shape[0] <= 16 else 256
        y = matmul_w4(xf, w_q, w_scale.astype(jnp.float32), group=G,
                      block_n=bn,
                      variant=str(node.attr("variant", "v1")))
    else:
        ng = K // G
        lo = ((w_q.astype(jnp.int32) & 0xF) ^ 8) - 8    # sign-extend low
        hi = w_q.astype(jnp.int32) >> 4                  # arithmetic: high
        w_int = jnp.concatenate([lo.reshape(ng, G // 2, N),
                                 hi.reshape(ng, G // 2, N)], axis=1)
        wf = (w_int.astype(x.dtype)
              * w_scale[:, None, :].astype(x.dtype)).reshape(K, N)
        y = jnp.dot(xf, wf, preferred_element_type=jnp.float32,
                    precision=MATMUL_PRECISION)
    y = _epilogue(node, y, bias, residual)
    return [y.reshape(lead + (N,)).astype(x.dtype)]


@register("pool2d_int8")
def pool2d_int8(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Max pooling directly on int8 edges (scale-preserving; reference keeps
    int8 through pooling in NCHW_C4 regions, jit_avx512_core_8bit_pooling)."""
    from .nn import pool2d  # same sizing logic

    return pool2d(node, xs)


@register("concat_int8")
def concat_int8(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Concat of int8 edges with differing scales: requantize each operand
    to the common output scale (reference: `test_saber_concat_int8.cpp`)."""
    out_scale = float(node.attr("out_scale"))
    in_scales = node.attr("in_scales")
    parts = []
    for x, s in zip(xs, in_scales):
        if abs(s - out_scale) < 1e-12:
            parts.append(x)
        else:
            parts.append(quantize_array(x.astype(jnp.float32) * float(s), out_scale))
    return [jnp.concatenate(parts, axis=int(node.attr("axis", -1)))]
