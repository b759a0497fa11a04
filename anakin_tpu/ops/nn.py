"""Neural-net ops: conv / pooling / dense / norms / activations.

Covers the compute core of the reference's saber funcs (`saber/funcs/*.h`,
SURVEY.md section 2.2) as pure jnp/lax functions over NHWC activations and
HWIO weights — the layouts XLA tiles best onto the MXU (lane=128 on the
channel axis), replacing the reference's NCHW + blocked NCHW_C4/C8/C16
layout zoo (`saber/saber_types.h:69-87`).

Fused epilogues: the graph rewriter folds bias/activation/residual-add into
the conv or dense node itself (attrs `activation`, flags `has_bias`,
`has_residual`), mirroring the reference's fusion ops (conv_act,
conv_batchnorm_scale_relu, conv_eltwise — `framework/operators/fusion_ops/`)
and its fused SASS epilogue kernels (`third-party/sass/include/
sass_funcs.h:55-543`).  XLA fuses these epilogues into the conv; the int8
path uses explicit Pallas kernels (`anakin_tpu.kernels`).

All matmul-class ops accumulate in float32 (`preferred_element_type`) and
cast back to the activation dtype, which is the MXU-native discipline.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .registry import register

__all__ = ["apply_activation", "MATMUL_PRECISION"]

# Matmul/conv precision for float32 inputs.  "highest" makes fp32 mode a true
# fp32 mode on TPU (6-pass bf16 emulation on the MXU); bf16 activations are
# unaffected (already MXU-native).  The fast path of this engine is bf16/int8.
MATMUL_PRECISION = "highest"


# --------------------------------------------------------------------------
# activation epilogue
# --------------------------------------------------------------------------

def apply_activation(y: jnp.ndarray, act: Optional[str], alpha: float = 0.0) -> jnp.ndarray:
    """Shared activation epilogue (reference: `ActivationParam`,
    `saber/saber_funcs_param.h:48`; fused into conv/fc as in conv_act)."""
    if act is None or act == "identity":
        return y
    if act == "relu":
        return jnp.maximum(y, 0)
    if act == "relu6":
        return jnp.clip(y, 0, 6)
    if act == "clipped_relu":
        return jnp.clip(y, 0, alpha)
    if act == "leaky_relu":
        return jnp.where(y >= 0, y, y * alpha)
    if act == "elu":
        a = alpha if alpha else 1.0
        return jnp.where(y >= 0, y, a * (jnp.exp(y) - 1))
    if act == "sigmoid":
        return jax.nn.sigmoid(y)
    if act == "tanh":
        return jnp.tanh(y)
    if act == "swish":
        return y * jax.nn.sigmoid((alpha if alpha else 1.0) * y)
    if act == "gelu":
        return jax.nn.gelu(y)
    if act == "soft_sign":
        return y / (1.0 + jnp.abs(y))
    if act == "softplus":
        return jax.nn.softplus(y)
    if act == "abs":
        return jnp.abs(y)
    raise ValueError(f"unknown activation: {act!r}")


def _epilogue(node, y, bias, residual):
    """bias -> residual-add -> activation, all in accumulator dtype."""
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if residual is not None:
        y = y + residual.astype(y.dtype)
    return apply_activation(y, node.attr("activation"), node.attr("act_alpha", 0.0))


def _conv_padding(node):
    """Resolve the conv `padding` attr: "SAME"/"VALID" string, symmetric
    (ph, pw), or explicit ((pt, pb), (pl, pr)) asymmetric pairs."""
    pad = node.attr("padding", (0, 0))
    if isinstance(pad, str):
        return pad
    if (isinstance(pad, (tuple, list)) and len(pad) == 2
            and isinstance(pad[0], (tuple, list))):
        return [tuple(int(v) for v in pad[0]), tuple(int(v) for v in pad[1])]
    ph, pw = _pair(pad)
    return [(ph, ph), (pw, pw)]


def _split_conv_inputs(node, xs):
    """inputs = [x, w] + [bias]? + [residual]? according to node flags."""
    it = iter(xs)
    x, w = next(it), next(it)
    bias = next(it) if node.attr("has_bias") else None
    residual = next(it) if node.attr("has_residual") else None
    return x, w, bias, residual


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return int(v[0]), int(v[1])
    return int(v), int(v)


# --------------------------------------------------------------------------
# convolution family
# --------------------------------------------------------------------------

@register("conv2d", "convolution", "conv_act", "conv_relu", "conv_eltwise",
          "conv_batchnorm_scale_relu", "conv_fusion", "depwise_sep_convolution")
def conv2d(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """2D convolution with fused bias/residual/activation epilogue.

    x: NHWC, w: HWIO (I = in_channels / groups).  Parity target:
    `saber/funcs/conv.h` + the fused conv_* ops; algorithm selection
    (direct/winograd/gemm, `saber/funcs/impl/cuda/saber_conv.cpp:17-67`) is
    delegated to XLA:TPU, which lowers conv to MXU-tiled implicit GEMM.
    """
    x, w, bias, residual = _split_conv_inputs(node, xs)
    sh, sw = _pair(node.attr("strides", (1, 1)))
    dh, dw = _pair(node.attr("dilation", (1, 1)))
    groups = int(node.attr("groups", 1))
    padding = _conv_padding(node)
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(sh, sw),
        padding=padding,
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
        precision=MATMUL_PRECISION,
    )
    y = _epilogue(node, y, bias, residual)
    qs = node.attr("quant_out_scale")
    if qs is not None:
        # fused requant epilogue: this float conv feeds an all-int8 region
        # (quantize_graph float-producer rule) — emit int8 directly so the
        # boundary tensor is written once at 1/4 the fp32 bytes
        return [jnp.clip(jnp.round(y / float(qs)), -127, 127)
                .astype(jnp.int8)]
    return [y.astype(x.dtype)]


@register("deconv2d", "deconvolution", "deconv_relu", "deconv_batchnorm_scale",
          "deconv_batchnorm_scale_relu")
def deconv2d(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Transposed convolution (reference: `saber/funcs/deconv.h`).

    w: HWIO with O = out_channels/groups, caffe-style output size
    `(in-1)*stride + kernel - 2*pad`.
    """
    x, w, bias, residual = _split_conv_inputs(node, xs)
    sh, sw = _pair(node.attr("strides", (1, 1)))
    dh, dw = _pair(node.attr("dilation", (1, 1)))
    ph, pw = _pair(node.attr("padding", (0, 0)))
    groups = int(node.attr("groups", 1))
    kh, kw = int(w.shape[0]), int(w.shape[1])
    # conv_transpose padding that realizes the caffe output size:
    pads = [(kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)]
    if groups != 1:
        # grouped transposed conv: regroup the weight from
        # (kh, kw, in_total, out_per_group) to the grouped-conv layout
        # (kh, kw, in_per_group, groups * out_per_group), out group-major
        in_total, opg = int(w.shape[2]), int(w.shape[3])
        ipg = in_total // groups
        wg = w.reshape(kh, kw, groups, ipg, opg)
        wg = jnp.transpose(wg, (0, 1, 3, 2, 4)).reshape(kh, kw, ipg,
                                                        groups * opg)
        y = lax.conv_general_dilated(
            x,
            jnp.flip(wg, (0, 1)).astype(x.dtype),
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=(sh, sw),
            rhs_dilation=(dh, dw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
            precision=MATMUL_PRECISION,
        )
    else:
        y = lax.conv_general_dilated(
            x,
            jnp.flip(w, (0, 1)).astype(x.dtype),
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=(sh, sw),
            rhs_dilation=(dh, dw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            precision=MATMUL_PRECISION,
        )
    y = _epilogue(node, y, bias, residual)
    return [y.astype(x.dtype)]


# --------------------------------------------------------------------------
# pooling
# --------------------------------------------------------------------------

def _pool_out_dim(in_dim: int, k: int, s: int, p: int, ceil_mode: bool) -> int:
    if ceil_mode:
        return int(math.ceil((in_dim + 2 * p - k) / s)) + 1
    return int(math.floor((in_dim + 2 * p - k) / s)) + 1


@register("pool2d", "pooling", "conv_relu_pool", "conv_batchnorm_scale_relu_pool")
def pool2d(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Max/avg pooling, caffe-compatible ceil-mode output sizing
    (reference: `saber/funcs/pooling.h`; JIT int8 variants
    `saber/funcs/impl/x86/kernel/jit_avx512_core_8bit_pooling.cpp`).

    attrs: mode, window, strides, padding, global_pooling, ceil_mode,
    exclusive (avg divisor excludes padding when True — caffe excludes).
    """
    x = xs[0]
    mode = node.attr("mode", "max")
    if node.attr("global_pooling", False):
        axis = (1, 2)
        y = jnp.max(x, axis=axis, keepdims=True) if mode == "max" else jnp.mean(
            x.astype(jnp.float32), axis=axis, keepdims=True
        ).astype(x.dtype)
        return [y]
    kh, kw = _pair(node.attr("window", (2, 2)))
    sh, sw = _pair(node.attr("strides", (2, 2)))
    pad = node.attr("padding", (0, 0))
    n, h, w_, c = x.shape
    if (isinstance(pad, (tuple, list)) and len(pad) == 2
            and isinstance(pad[0], (tuple, list))):
        # explicit asymmetric ((top, bottom), (left, right)) pads — the TF
        # SAME convention (extra on bottom/right); floor output sizing
        (pt, pb), (pl, pr) = pad
        pad_cfg = [(0, 0), (int(pt), int(pb)), (int(pl), int(pr)), (0, 0)]
    else:
        ph, pw = _pair(pad)
        ceil_mode = bool(node.attr("ceil_mode", True))
        oh = _pool_out_dim(h, kh, sh, ph, ceil_mode)
        ow = _pool_out_dim(w_, kw, sw, pw, ceil_mode)
        # extra bottom/right padding so reduce_window emits ceil-mode size
        eh = max(0, (oh - 1) * sh + kh - h - 2 * ph)
        ew = max(0, (ow - 1) * sw + kw - w_ - 2 * pw)
        pad_cfg = [(0, 0), (ph, ph + eh), (pw, pw + ew), (0, 0)]
    if mode == "max":
        # float identity must be the PYTHON scalar -inf so jax recognizes
        # the max monoid and routes to the differentiable
        # reduce_window_max primitive (an array-wrapped init falls back to
        # the generic primitive, which has no transpose rule — surfaced by
        # the round-5 detector training through build_forward)
        if jnp.issubdtype(x.dtype, jnp.floating):
            init = -jnp.inf
        else:
            init = jnp.array(jnp.iinfo(x.dtype).min, x.dtype)
        y = lax.reduce_window(
            x, init, lax.max,
            (1, kh, kw, 1), (1, sh, sw, 1), pad_cfg,
        )
    else:
        xf = x.astype(jnp.float32)
        ysum = lax.reduce_window(
            xf, jnp.float32(0), lax.add, (1, kh, kw, 1), (1, sh, sw, 1), pad_cfg
        )
        if node.attr("exclusive", True):
            ones = jnp.ones((1, h, w_, 1), jnp.float32)
            cnt = lax.reduce_window(
                ones, jnp.float32(0), lax.add, (1, kh, kw, 1), (1, sh, sw, 1), pad_cfg
            )
            y = (ysum / cnt).astype(x.dtype)
        else:
            y = (ysum / float(kh * kw)).astype(x.dtype)
    return [y]


@register("pool2d_with_index", "pooling_with_index")
def pool2d_with_index(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Max pooling returning argmax indices (reference:
    `saber/funcs/pooling_with_index.h`), used by unpool."""
    x = xs[0]
    kh, kw = _pair(node.attr("window", (2, 2)))
    sh, sw = _pair(node.attr("strides", (2, 2)))
    ph, pw = _pair(node.attr("padding", (0, 0)))
    n, h, w_, c = x.shape
    # flat spatial index per element
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (1, h, w_, 1), 1) * w_
        + jax.lax.broadcasted_iota(jnp.int32, (1, h, w_, 1), 2)
    )
    idx = jnp.broadcast_to(idx, x.shape)
    pad_cfg = [(0, 0), (ph, ph), (pw, pw), (0, 0)]

    def sel(a, b):
        av, ai = a
        bv, bi = b
        take_b = bv > av
        return jnp.where(take_b, bv, av), jnp.where(take_b, bi, ai)

    init = (jnp.array(-jnp.inf, x.dtype), jnp.int32(-1))
    yv, yi = lax.reduce_window(
        (x, idx), init, sel, (1, kh, kw, 1), (1, sh, sw, 1), pad_cfg
    )
    return [yv, yi]


@register("unpool2d", "unpool")
def unpool2d(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Max unpooling by saved indices (reference: `saber/funcs/unpool.h`)."""
    y, idx = xs[0], xs[1]
    oh, ow = _pair(node.attr("out_hw"))
    n, h, w_, c = y.shape
    flat = jnp.zeros((n, oh * ow, c), y.dtype)
    yf = y.reshape(n, h * w_, c)
    idxf = idx.reshape(n, h * w_, c)
    def scatter_one(f, yv, iv):
        # scatter along flattened spatial dim per channel
        return f.at[iv, jnp.arange(c)[None, :].repeat(h * w_, 0)].add(yv)
    out = jax.vmap(
        lambda f, yv, iv: f.at[iv, jnp.broadcast_to(jnp.arange(c), iv.shape)].add(yv)
    )(flat, yf, idxf)
    return [out.reshape(n, oh, ow, c)]


@register("spp")
def spp(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Spatial pyramid pooling (reference: `saber/funcs/spp.h`): pools at
    pyramid levels 1..L and concatenates flattened results."""
    x = xs[0]
    levels = int(node.attr("pyramid_height", 3))
    mode = node.attr("mode", "max")
    n, h, w_, c = x.shape
    outs = []
    for lvl in range(levels):
        bins = 2 ** lvl
        kh, kw = math.ceil(h / bins), math.ceil(w_ / bins)
        sh, sw = kh, kw
        # pad so bins divide evenly
        pad_cfg = [(0, 0), (0, bins * kh - h), (0, bins * kw - w_), (0, 0)]
        if mode == "max":
            y = lax.reduce_window(
                x, jnp.array(-jnp.inf, x.dtype), lax.max,
                (1, kh, kw, 1), (1, sh, sw, 1), pad_cfg,
            )
        else:
            y = lax.reduce_window(
                x.astype(jnp.float32), jnp.float32(0), lax.add,
                (1, kh, kw, 1), (1, sh, sw, 1), pad_cfg,
            ) / float(kh * kw)
            y = y.astype(x.dtype)
        outs.append(y.reshape(n, -1))
    return [jnp.concatenate(outs, axis=1)]


# --------------------------------------------------------------------------
# dense / matmul family
# --------------------------------------------------------------------------

@register("dense", "fc", "dense_dense")
def dense(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Fully-connected with fused epilogue.

    x flattened from `axis` (default 1), w: (in, out).  Parity:
    `saber/funcs/fc.h`; fused dense_dense maps to two dense nodes.
    """
    x, w, bias, residual = _split_conv_inputs(node, xs)
    axis = int(node.attr("axis", 1))
    lead = x.shape[:axis]
    xf = x.reshape((int(np.prod(lead)) if lead else 1, -1))
    y = jnp.dot(xf, w.astype(x.dtype), preferred_element_type=jnp.float32,
                precision=MATMUL_PRECISION)
    y = _epilogue(node, y, bias, residual)
    y = y.reshape(lead + (w.shape[-1],))
    qs = node.attr("quant_out_scale")
    if qs is not None:  # float producer feeding an all-int8 region
        return [jnp.clip(jnp.round(y / float(qs)), -127, 127)
                .astype(jnp.int8)]
    return [y.astype(x.dtype)]


@register("matmul", "mat_mul", "aligned_mat_mul", "batch_gemm", "gemm")
def matmul(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """(Batched) matmul with optional transposes and scale
    (reference: `saber/funcs/mat_mul.h`, `batch_gemm.h`)."""
    a, b = xs[0], xs[1]
    if node.attr("transpose_a", False):
        a = jnp.swapaxes(a, -1, -2)
    if node.attr("transpose_b", False):
        b = jnp.swapaxes(b, -1, -2)
    y = jnp.matmul(a, b.astype(a.dtype), preferred_element_type=jnp.float32,
                   precision=MATMUL_PRECISION)
    coeff = node.attr("coeff", 1.0)
    if coeff != 1.0:
        y = y * coeff
    return [apply_activation(y, node.attr("activation"), node.attr("act_alpha", 0.0)).astype(a.dtype)]


@register("embedding")
def embedding(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Token embedding lookup (reference: `saber/funcs/embedding.h`).
    padding_idx rows yield zeros."""
    ids, table = xs[0], xs[1]
    ids_i = ids.astype(jnp.int32)
    y = jnp.take(table, jnp.maximum(ids_i, 0), axis=0)
    pad_idx = node.attr("padding_idx", -1)
    if pad_idx is not None and pad_idx >= 0:
        y = jnp.where((ids_i == pad_idx)[..., None], 0.0, y)
    return [y]


# --------------------------------------------------------------------------
# normalization
# --------------------------------------------------------------------------

@register("batch_norm", "batchnorm")
def batch_norm(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Inference BN: (x - mean) / sqrt(var + eps). inputs: x, mean, var.
    Caffe-style `scale` factor folded by the importer.  Usually folded into
    conv by the rewriter (reference folds at init:
    `framework/utils/parameter_fusion.h:25-231`)."""
    x, mean, var = xs[0], xs[1], xs[2]
    eps = float(node.attr("eps", 1e-5))
    inv = lax.rsqrt(var.astype(jnp.float32) + eps)
    y = (x.astype(jnp.float32) - mean) * inv
    return [y.astype(x.dtype)]


@register("scale", "batchnorm_scale")
def scale_op(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Per-channel scale (+shift): y = x * gamma + beta
    (reference: `saber/funcs/scale.h`).  Channel axis is last (NHWC)."""
    x = xs[0]
    gamma = xs[1]
    beta = xs[2] if len(xs) > 2 and node.attr("bias_term", True) else None
    y = x * gamma.astype(x.dtype)
    if beta is not None:
        y = y + beta.astype(x.dtype)
    return [y]


@register("layer_norm")
def layer_norm(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """LayerNorm over trailing axes from `begin_norm_axis`
    (reference: `saber/funcs/layer_norm.h`). inputs: x, gamma, beta."""
    x, gamma, beta = xs[0], xs[1], xs[2]
    axis_from = int(node.attr("begin_norm_axis", -1))
    axes = tuple(range(axis_from if axis_from >= 0 else x.ndim + axis_from, x.ndim))
    eps = float(node.attr("eps", 1e-5))
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=axes, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    y = y * gamma.reshape((1,) * (x.ndim - gamma.ndim) + gamma.shape)
    y = y + beta.reshape((1,) * (x.ndim - beta.ndim) + beta.shape)
    return [y.astype(x.dtype)]


@register("rms_norm")
def rms_norm(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """RMSNorm over the trailing axis: x * g / rms(x) (no mean
    subtraction, no bias) — the llama-class norm.  No reference analog
    (2018 predates it); included for the modern transformer family
    (`models/transformer.py TransformerConfig(norm="rms")`).
    inputs: x, gamma."""
    x, gamma = xs[0], xs[1]
    eps = float(node.attr("eps", 1e-6))
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * lax.rsqrt(ms + eps)
    y = y * gamma.reshape((1,) * (x.ndim - gamma.ndim) + gamma.shape)
    return [y.astype(x.dtype)]


@register("group_norm")
def group_norm(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """GroupNorm over channel groups, NHWC (reference:
    `framework/operators/group_norm.cpp`)."""
    x = xs[0]
    gamma = xs[1] if len(xs) > 1 else None
    beta = xs[2] if len(xs) > 2 else None
    groups = int(node.attr("groups", 32))
    eps = float(node.attr("eps", 1e-5))
    n, h, w_, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h, w_, groups, c // groups)
    mu = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 2, 4), keepdims=True)
    y = ((xf - mu) * lax.rsqrt(var + eps)).reshape(n, h, w_, c)
    if gamma is not None:
        y = y * gamma
    if beta is not None:
        y = y + beta
    return [y.astype(x.dtype)]


@register("lrn")
def lrn(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Local response norm across channels (reference: `saber/funcs/lrn.h`;
    AlexNet/GoogLeNet-era)."""
    x = xs[0]
    size = int(node.attr("local_size", 5))
    alpha = float(node.attr("alpha", 1e-4))
    beta = float(node.attr("beta", 0.75))
    k = float(node.attr("k", 1.0))
    xf = x.astype(jnp.float32)
    sq = jnp.square(xf)
    half = size // 2
    acc = lax.reduce_window(
        sq, jnp.float32(0), lax.add, (1, 1, 1, size), (1, 1, 1, 1),
        [(0, 0), (0, 0), (0, 0), (half, size - 1 - half)],
    )
    y = xf / jnp.power(k + (alpha / size) * acc, beta)
    return [y.astype(x.dtype)]


@register("l2_normalize", "normalize")
def l2_normalize(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """L2 normalization across channels, optional learned per-channel scale
    (reference: `saber/funcs/normalize.h`, SSD's Norm layer)."""
    x = xs[0]
    scale_w = xs[1] if len(xs) > 1 else None
    eps = float(node.attr("eps", 1e-6))
    across_spatial = bool(node.attr("across_spatial", False))
    p = int(node.attr("p", 2))
    xf = x.astype(jnp.float32)
    axes = (1, 2, 3) if across_spatial else (3,)
    if p == 1:
        norm = jnp.sum(jnp.abs(xf), axis=axes, keepdims=True)
        y = xf / (norm + eps)
    else:
        norm = jnp.sum(jnp.square(xf), axis=axes, keepdims=True)
        y = xf * lax.rsqrt(norm + eps)
    if scale_w is not None:
        y = y * scale_w
    return [y.astype(x.dtype)]


@register("mvn")
def mvn(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Mean-variance normalization (reference: `saber/funcs/mvn.h`)."""
    x = xs[0]
    across_channels = bool(node.attr("across_channels", False))
    normalize_variance = bool(node.attr("normalize_variance", True))
    eps = float(node.attr("eps", 1e-9))
    axes = (1, 2, 3) if across_channels else (1, 2)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=axes, keepdims=True)
    y = xf - mu
    if normalize_variance:
        var = jnp.mean(jnp.square(y), axis=axes, keepdims=True)
        y = y * lax.rsqrt(var + eps)
    return [y.astype(x.dtype)]


# --------------------------------------------------------------------------
# standalone activations / elementwise math
# --------------------------------------------------------------------------

@register("activation", "relu", "elu", "prelu_op")
def activation(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Standalone activation node (reference: `saber/funcs/activation.h`).
    Usually fused away by the rewriter."""
    return [apply_activation(xs[0], node.attr("activation", "relu"), node.attr("act_alpha", 0.0))]


@register("prelu")
def prelu(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """PReLU with learned per-channel (or shared) slopes."""
    x, slope = xs[0], xs[1]
    if node.attr("channel_shared", False):
        a = slope.reshape(())
    else:
        a = slope.reshape((1,) * (x.ndim - 1) + (-1,))
    return [jnp.where(x >= 0, x, x * a.astype(x.dtype))]


@register("softmax")
def softmax(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Numerically-stable softmax (reference: `saber/funcs/softmax.h`)."""
    axis = int(node.attr("axis", -1))
    x = xs[0]
    return [jax.nn.softmax(x.astype(jnp.float32), axis=axis).astype(x.dtype)]


@register("eltwise", "eltwise_op", "eltwise_relu", "eltwise_prelu", "eltwise_act")
def eltwise(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """N-ary elementwise combine: sum (with coeffs) / prod / max / sub / div
    (reference: `saber/funcs/eltwise.h`, `eltwise_act.h`)."""
    mode = node.attr("mode", "sum")
    coeffs = node.attr("coeffs")
    ys = list(xs)
    if mode in ("sum", "add"):
        if coeffs:
            y = sum(c * v for c, v in zip(coeffs, ys))
        else:
            y = ys[0]
            for v in ys[1:]:
                y = y + v
    elif mode in ("prod", "mul"):
        y = ys[0]
        for v in ys[1:]:
            y = y * v
    elif mode == "max":
        y = ys[0]
        for v in ys[1:]:
            y = jnp.maximum(y, v)
    elif mode == "min":
        y = ys[0]
        for v in ys[1:]:
            y = jnp.minimum(y, v)
    elif mode == "sub":
        y = ys[0] - ys[1]
    elif mode == "div":
        y = ys[0] / ys[1]
    else:
        raise ValueError(f"unknown eltwise mode {mode!r}")
    return [apply_activation(y, node.attr("activation"), node.attr("act_alpha", 0.0))]


@register("axpy")
def axpy(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """y = a * x + b with a broadcast per-channel (reference:
    `saber/funcs/axpy.h`; SENet-style channel re-weighting)."""
    a, x, b = xs[0], xs[1], xs[2]
    return [a * x + b]


@register("power")
def power(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """(shift + scale * x) ** power (reference: `saber/funcs/power.h`)."""
    x = xs[0]
    p = float(node.attr("power", 1.0))
    s = float(node.attr("scale", 1.0))
    sh = float(node.attr("shift", 0.0))
    y = sh + s * x
    if p != 1.0:
        y = jnp.power(y, p)
    return [y]


@register("exp")
def exp_op(node, xs):
    return [jnp.exp(xs[0])]


@register("log")
def log_op(node, xs):
    return [jnp.log(xs[0])]


@register("erf")
def erf_op(node, xs):
    """Gauss error function (needed by ONNX GELU decompositions)."""
    return [lax.erf(xs[0])]


@register("cos_sim")
def cos_sim(node, xs):
    """Cosine similarity along last axis (reference:
    `framework/operators/cos_sim.cpp`)."""
    a, b = xs[0].astype(jnp.float32), xs[1].astype(jnp.float32)
    num = jnp.sum(a * b, axis=-1)
    den = jnp.sqrt(jnp.sum(a * a, axis=-1) * jnp.sum(b * b, axis=-1)) + 1e-12
    return [(num / den).astype(xs[0].dtype)]


@register("dot")
def dot_op(node, xs):
    """Row-wise dot product (reference: `framework/operators/dot.cpp`)."""
    return [jnp.sum(xs[0] * xs[1], axis=-1, keepdims=True)]


@register("dropout")
def dropout(node, xs):
    """Inference dropout = scale by keep ratio if trained without inverted
    dropout; caffe test-phase applies identity (reference:
    `framework/operators/dropout.cpp` uses scale ratio)."""
    ratio = float(node.attr("ratio", 0.0))
    scale = float(node.attr("scale", 1.0))
    y = xs[0]
    if scale != 1.0:
        y = y * scale
    return [y]


@register("maxout")
def maxout(node, xs):
    """Channel maxout: max over groups of channels (reference:
    `saber/funcs/maxout.h`)."""
    x = xs[0]
    groups = int(node.attr("groups", 2))
    n, h, w_, c = x.shape
    return [jnp.max(x.reshape(n, h, w_, c // groups, groups), axis=-1)]
