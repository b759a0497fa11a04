"""Tensor-manipulation ops: reshape / concat / slice / permute / pad / resize …

Parity targets are the data-movement functors of the reference
(`saber/funcs/{reshape,concat,slice,permute,crop,pad,resize,...}.h`,
SURVEY.md section 2.2).  On TPU these are pure layout/select ops that XLA
folds into neighbors, so each is a one-liner over jnp/lax.

Layout note: the engine is NHWC end-to-end.  Reference models (caffe-era)
are NCHW; the importer rewrites axis attrs via `nchw_axis_to_nhwc`, so axes
stored in the IR are ALREADY in NHWC terms.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .registry import register

__all__ = ["nchw_axis_to_nhwc"]

_NCHW_TO_NHWC = {0: 0, 1: 3, 2: 1, 3: 2}


def nchw_axis_to_nhwc(axis: int) -> int:
    """Translate an axis index expressed for NCHW to the NHWC equivalent."""
    return _NCHW_TO_NHWC[axis]


@register("reshape")
def reshape(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    shape = list(node.attr("shape"))
    x = xs[0]
    out = [x.shape[i] if s == 0 else s for i, s in enumerate(shape)]
    return [x.reshape(out)]


@register("flatten")
def flatten(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    axis = int(node.attr("axis", 1))
    x = xs[0]
    lead = x.shape[:axis]
    return [x.reshape(lead + (-1,))]


@register("permute")
def permute(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    return [jnp.transpose(xs[0], node.attr("order"))]


@register("transpose")
def transpose(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """2D/last-two-axes transpose (reference: `saber/funcs/transpose.h`)."""
    return [jnp.swapaxes(xs[0], -1, -2)]


@register("permute_power")
def permute_power(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Fused permute+power (reference fusion op
    `framework/operators/fusion_ops/permute_power.cpp`)."""
    y = jnp.transpose(xs[0], node.attr("order"))
    p = float(node.attr("power", 1.0))
    s = float(node.attr("scale", 1.0))
    sh = float(node.attr("shift", 0.0))
    y = sh + s * y
    if p != 1.0:
        y = jnp.power(y, p)
    return [y]


@register("concat")
def concat(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    return [jnp.concatenate(xs, axis=int(node.attr("axis", -1)))]


@register("split")
def split(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Fan-out split: reference `split` just aliases the tensor to N
    consumers (`framework/operators/split.cpp`); we return N views."""
    n = int(node.attr("num", len(node.outputs)))
    return [xs[0] for _ in range(n)]


@register("slice")
def slice_op(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Caffe-style slice along one axis into sections
    (reference: `saber/funcs/slice.h`)."""
    x = xs[0]
    axis = int(node.attr("axis", -1))
    points = node.attr("slice_points")
    n_out = len(node.outputs)
    if not points:
        size = x.shape[axis] // n_out
        points = [size * (i + 1) for i in range(n_out - 1)]
    return list(jnp.split(x, points, axis=axis))


@register("slice_v2")
def slice_v2(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Start/end-per-axis slicing (reference: `saber/funcs/slice_v2.h`)."""
    x = xs[0]
    axes = node.attr("axes")
    starts = node.attr("starts")
    ends = node.attr("ends")
    idx = [slice(None)] * x.ndim
    for a, s, e in zip(axes, starts, ends):
        dim = x.shape[a]
        s = s + dim if s < 0 else s
        e = e + dim if e < 0 else min(e, dim)
        idx[a] = slice(s, e)
    return [x[tuple(idx)]]


@register("crop")
def crop(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Crop x to the shape of a reference tensor from `axis` with offsets
    (reference: `saber/funcs/crop.h`)."""
    x = xs[0]
    ref = xs[1] if len(xs) > 1 else None
    axis = int(node.attr("axis", 1))
    offsets = node.attr("offset", [0])
    target = node.attr("shape") or (ref.shape if ref is not None else None)
    idx = [slice(None)] * x.ndim
    offs = list(offsets)
    n_axes = x.ndim - axis
    if len(offs) == 1:
        offs = offs * n_axes
    offs = offs + [0] * (n_axes - len(offs))  # caffe: missing offsets = 0
    for i, a in enumerate(range(axis, x.ndim)):
        o = offs[i]
        idx[a] = slice(o, o + target[a])
    return [x[tuple(idx)]]


@register("pad", "pad2d")
def pad(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Explicit padding (reference: `saber/funcs/pad.h`, `pad2d.h`).
    attrs: pad_h=(top,bottom), pad_w=(left,right), mode, value."""
    x = xs[0]
    ph = node.attr("pad_h", (0, 0))
    pw = node.attr("pad_w", (0, 0))
    pc = node.attr("pad_c", (0, 0))
    mode = node.attr("mode", "constant")
    value = node.attr("value", 0.0)
    widths = [(0, 0), tuple(ph), tuple(pw), tuple(pc)]
    if mode == "constant":
        return [jnp.pad(x, widths, constant_values=value)]
    jmode = {"reflect": "reflect", "edge": "edge"}[mode]
    return [jnp.pad(x, widths, mode=jmode)]


@register("resize", "interp")
def resize(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Spatial resize, bilinear (align-corners caffe "interp" style or
    half-pixel) or nearest (reference: `saber/funcs/resize.h`)."""
    x = xs[0]
    n, h, w_, c = x.shape
    if node.attr("out_hw"):
        oh, ow = node.attr("out_hw")
    else:
        oh = int(round(h * float(node.attr("scale_h", node.attr("scale", 1.0)))))
        ow = int(round(w_ * float(node.attr("scale_w", node.attr("scale", 1.0)))))
    method = node.attr("method", "bilinear")
    if method == "nearest":
        ih = jnp.minimum((jnp.arange(oh) * h // oh), h - 1)
        iw = jnp.minimum((jnp.arange(ow) * w_ // ow), w_ - 1)
        return [x[:, ih][:, :, iw]]
    align = bool(node.attr("align_corners", True))
    xf = x.astype(jnp.float32)
    if align and oh > 1 and ow > 1:
        fh = jnp.linspace(0.0, h - 1.0, oh)
        fw = jnp.linspace(0.0, w_ - 1.0, ow)
    else:
        fh = (jnp.arange(oh) + 0.5) * (h / oh) - 0.5
        fw = (jnp.arange(ow) + 0.5) * (w_ / ow) - 0.5
    fh = jnp.clip(fh, 0, h - 1)
    fw = jnp.clip(fw, 0, w_ - 1)
    h0 = jnp.floor(fh).astype(jnp.int32)
    w0 = jnp.floor(fw).astype(jnp.int32)
    h1 = jnp.minimum(h0 + 1, h - 1)
    w1 = jnp.minimum(w0 + 1, w_ - 1)
    ah = (fh - h0)[None, :, None, None]
    aw = (fw - w0)[None, None, :, None]
    top = xf[:, h0][:, :, w0] * (1 - aw) + xf[:, h0][:, :, w1] * aw
    bot = xf[:, h1][:, :, w0] * (1 - aw) + xf[:, h1][:, :, w1] * aw
    return [(top * (1 - ah) + bot * ah).astype(x.dtype)]


@register("pixel_shuffle")
def pixel_shuffle(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Depth-to-space (reference: `saber/funcs/pixel_shuffle.h`)."""
    x = xs[0]
    r = int(node.attr("upscale_factor", 2))
    n, h, w_, c = x.shape
    oc = c // (r * r)
    # channel split order (oc, r, r) matches the caffe/NCHW semantics
    y = x.reshape(n, h, w_, oc, r, r)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))
    return [y.reshape(n, h * r, w_ * r, oc)]


@register("space_to_depth")
def space_to_depth(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """NHWC space-to-depth: [n,h,w,c] -> [n,h/b,w/b,b*b*c], channel order
    (dr, dc, c).  Used by the stem rewrite (`passes/stem.py`) to turn the
    MXU-hostile 7x7s2 RGB conv into a dense 4x4s1 conv."""
    x = xs[0]
    b = int(node.attr("block", 2))
    n, h, w_, c = x.shape
    y = x.reshape(n, h // b, b, w_ // b, b, c).transpose(0, 1, 3, 2, 4, 5)
    return [y.reshape(n, h // b, w_ // b, b * b * c)]


@register("shuffle_channel")
def shuffle_channel(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """ShuffleNet channel shuffle (reference: `saber/funcs/shuffle_channel.h`)."""
    x = xs[0]
    g = int(node.attr("group", 2))
    n, h, w_, c = x.shape
    y = x.reshape(n, h, w_, g, c // g)
    return [jnp.swapaxes(y, 3, 4).reshape(n, h, w_, c)]


@register("expand")
def expand(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Tile by per-axis factors (reference: `saber/funcs/expand.h`)."""
    return [jnp.tile(xs[0], node.attr("expand_times"))]


@register("gather")
def gather(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    x, idx = xs[0], xs[1]
    return [jnp.take(x, idx.astype(jnp.int32), axis=int(node.attr("axis", 0)))]


@register("cast")
def cast(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    return [xs[0].astype(jnp.dtype(node.attr("dtype", "float32")))]


@register("one_hot")
def one_hot(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    depth = int(node.attr("depth"))
    return [jax.nn.one_hot(xs[0].astype(jnp.int32), depth, dtype=jnp.float32)]


@register("argmax", "arg_max")
def argmax(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """top-k along an axis, values and/or indices
    (reference: `saber/funcs/argmax.h`)."""
    x = xs[0]
    top_k = int(node.attr("top_k", 1))
    axis = node.attr("axis")
    out_max_val = bool(node.attr("out_max_val", False))
    if axis is None:
        flat = x.reshape(x.shape[0], -1)
        vals, idxs = lax.top_k(flat, top_k)
    else:
        moved = jnp.moveaxis(x, axis, -1)
        vals, idxs = lax.top_k(moved, top_k)
        vals = jnp.moveaxis(vals, -1, axis)
        idxs = jnp.moveaxis(idxs, -1, axis)
    if out_max_val:
        return [idxs.astype(x.dtype), vals]
    return [idxs.astype(x.dtype)]


@register("topk")
def topk(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    vals, idxs = lax.top_k(xs[0], int(node.attr("k", 1)))
    return [vals, idxs]


@register("reduce", "reduce_min")
def reduce(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Generic reduction (reference: `saber/funcs/reduce.h`, `reduce_min.h`)."""
    x = xs[0]
    mode = node.attr("mode", "mean" if node.op == "reduce" else "min")
    axes = node.attr("axes")
    keep = bool(node.attr("keep_dims", False))
    axes = tuple(axes) if axes else None
    fn = {"mean": jnp.mean, "sum": jnp.sum, "min": jnp.min, "max": jnp.max,
          "prod": jnp.prod}[mode]
    return [fn(x, axis=axes, keepdims=keep)]


@register("mean")
def mean(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    return [jnp.mean(xs[0].astype(jnp.float32)).reshape(1).astype(xs[0].dtype)]


@register("cumsum")
def cumsum(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    x = xs[0]
    axis = int(node.attr("axis", -1))
    y = jnp.cumsum(x, axis=axis)
    if node.attr("exclusive", False):
        pad_w = [(0, 0)] * x.ndim
        pad_w[axis] = (1, 0)
        y = jnp.pad(y, pad_w)[
            tuple(slice(0, x.shape[i]) if i == (axis % x.ndim) else slice(None)
                  for i in range(x.ndim))
        ]
    if node.attr("reverse", False):
        y = jnp.flip(jnp.cumsum(jnp.flip(x, axis), axis=axis), axis)
    return [y]


@register("arithmetic")
def arithmetic(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """SUM=1/SUB=2/MUL=3 over two (ragged) operands
    (reference: `saber/funcs/arithmetic.h`)."""
    mode = node.attr("mode", "sum")
    a, b = xs[0], xs[1]
    if mode in ("sum", 1):
        return [a + b]
    if mode in ("sub", 2):
        return [a - b]
    return [a * b]


@register("reverse_input")
def reverse_input(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    return [jnp.flip(x, axis=0) for x in xs]


@register("im2sequence")
def im2sequence(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Extract conv-style patches into a sequence (reference:
    `saber/funcs/im2sequence.h`): out rows = N*OH*OW, cols = KH*KW*C."""
    x = xs[0]
    kh, kw = node.attr("window", (1, 1))
    sh, sw = node.attr("strides", (1, 1))
    ph, pw = node.attr("padding", (0, 0))
    n, h, w_, c = x.shape
    patches = lax.conv_general_dilated_patches(
        jnp.transpose(x, (0, 3, 1, 2)),
        filter_shape=(kh, kw),
        window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)],
    )  # (N, C*KH*KW, OH, OW)
    _, ckk, oh, ow = patches.shape
    y = jnp.transpose(patches, (0, 2, 3, 1)).reshape(n * oh * ow, ckk)
    return [y]


@register("coord2patch")
def coord2patch(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Stub parity op (reference: `framework/operators/coord2patch.cpp`,
    Baidu-internal OCR helper): passes through coords."""
    return [xs[0]]
