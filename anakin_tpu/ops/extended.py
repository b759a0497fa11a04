"""Long-tail ops: deformable conv, CTC align, topk pooling family, and the
remaining detection-adjacent reference ops.

These complete the SURVEY.md section 2.2 functor inventory; each docstring
cites its reference counterpart.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .registry import register
from .nn import _pair


@register("deformable_conv", "deformconvolution")
def deformable_conv(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Deformable convolution v1 (reference: `saber/funcs/deformable_conv.h`,
    CUDA kernel `deformable_im2col`): each kernel tap samples the input at a
    learned offset with bilinear interpolation, then a standard GEMM.

    inputs: x [N,H,W,C], offsets [N,OH,OW,2*KH*KW] (dy,dx per tap),
    w [KH,KW,C,O], [bias].  attrs: strides, padding, dilation.
    """
    it = iter(xs)
    x, offsets, w = next(it), next(it), next(it)
    bias = next(it) if node.attr("has_bias") else None
    sh, sw = _pair(node.attr("strides", (1, 1)))
    ph, pw = _pair(node.attr("padding", (0, 0)))
    dh, dw = _pair(node.attr("dilation", (1, 1)))
    N, H, W, C = x.shape
    KH, KW, _, O = w.shape
    _, OH, OW, _ = offsets.shape
    xf = x.astype(jnp.float32)
    off = offsets.astype(jnp.float32).reshape(N, OH, OW, KH * KW, 2)

    # base sampling grid per output position and tap
    oy = lax.broadcasted_iota(jnp.float32, (OH, OW), 0) * sh - ph
    ox = lax.broadcasted_iota(jnp.float32, (OH, OW), 1) * sw - pw
    taps = [(ky, kx) for ky in range(KH) for kx in range(KW)]

    def bilinear(img, y, x_):
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x_).astype(jnp.int32)
        wy = y - y0
        wx = x_ - x0

        def at(yy, xx):
            valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            v = img[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
            return jnp.where(valid[..., None], v, 0.0)

        return (at(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
                + at(y0, x0 + 1) * ((1 - wy) * wx)[..., None]
                + at(y0 + 1, x0) * (wy * (1 - wx))[..., None]
                + at(y0 + 1, x0 + 1) * (wy * wx)[..., None])

    def per_image(img, o):
        cols = []
        for t, (ky, kx) in enumerate(taps):
            y = oy + ky * dh + o[:, :, t, 0]
            x_ = ox + kx * dw + o[:, :, t, 1]
            cols.append(bilinear(img, y, x_))  # [OH, OW, C]
        col = jnp.stack(cols, axis=2)  # [OH, OW, KH*KW, C]
        col = col.reshape(OH * OW, KH * KW * C)
        wf = w.astype(jnp.float32).reshape(KH * KW * C, O)
        return jnp.dot(col, wf, preferred_element_type=jnp.float32).reshape(OH, OW, O)

    y = jax.vmap(per_image)(xf, off)
    if bias is not None:
        y = y + bias
    return [y.astype(x.dtype)]


@register("ctc_align")
def ctc_align(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """CTC greedy decode alignment (reference: `saber/funcs/ctc_align.h`):
    merge repeated labels, drop blanks; output padded with `blank` and a
    lengths vector.

    inputs: labels [B, T] int32, [lengths].  attrs: blank, merge_repeated.
    """
    x = xs[0].astype(jnp.int32)
    lengths = xs[1].astype(jnp.int32) if len(xs) > 1 else None
    blank = int(node.attr("blank", 0))
    merge = bool(node.attr("merge_repeated", True))
    B, T = x.shape
    t_idx = lax.broadcasted_iota(jnp.int32, (B, T), 1)
    valid = jnp.ones((B, T), bool) if lengths is None else t_idx < lengths[:, None]
    prev = jnp.pad(x, ((0, 0), (1, 0)), constant_values=-1)[:, :T]
    keep = valid & (x != blank)
    if merge:
        keep = keep & (x != prev)
    # stable left-compaction: position = cumsum(keep) - 1
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    out = jnp.full((B, T), blank, jnp.int32)
    b_idx = lax.broadcasted_iota(jnp.int32, (B, T), 0)
    out = out.at[b_idx, jnp.where(keep, pos, T - 1)].set(
        jnp.where(keep, x, blank), mode="drop")
    # rows where keep is False wrote to T-1 with blank — restore any real
    # value written there by a kept element
    last_keep_val = jnp.max(jnp.where(keep & (pos == T - 1), x, -1), axis=1)
    out = out.at[:, T - 1].set(jnp.where(last_keep_val >= 0, last_keep_val,
                                         out[:, T - 1]))
    out_len = jnp.sum(keep.astype(jnp.int32), axis=1)
    return [out, out_len]


@register("topk_pooling")
def topk_pooling(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Top-k pooling over the spatial dims per channel
    (reference: `saber/funcs/topk_pooling.h`): output [N, C*k]."""
    x = xs[0]
    k = int(node.attr("top_k", 1))
    N, H, W, C = x.shape
    flat = jnp.swapaxes(x.reshape(N, H * W, C), 1, 2)  # [N, C, HW]
    vals, _ = lax.top_k(flat, k)
    return [vals.reshape(N, C * k)]


@register("topk_avg_pooling")
def topk_avg_pooling(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Average of top-k values per channel for multiple k's (reference:
    `saber/funcs/topk_avg_pooling.h`, used by text-matching nets).
    attrs: top_ks (list), feat_map_num."""
    x = xs[0]
    top_ks = [int(k) for k in node.attr("top_ks", [1])]
    kmax = max(top_ks)
    N, H, W, C = x.shape
    flat = jnp.swapaxes(x.reshape(N, H * W, C), 1, 2).astype(jnp.float32)
    vals, _ = lax.top_k(flat, kmax)  # [N, C, kmax]
    outs = []
    for k in top_ks:
        outs.append(jnp.mean(vals[:, :, :k], axis=-1))
    return [jnp.concatenate(outs, axis=-1).astype(x.dtype)]


@register("dfmb_psroi_align", "dfm_ps_roi_align")
def dfmb_psroi_align(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Position-sensitive ROI align (reference:
    `saber/funcs/dfmb_psroi_align.h`, DFMB-PSROI from R-FCN): the input's
    channels are grouped per output cell; each pooled cell (i, j) reads its
    own channel group with bilinear sampling.

    inputs: feat [N, H, W, ph*pw*C_out], rois [R, 5].
    attrs: pooled_hw (ph, pw), spatial_scale.  Output [R, ph, pw, C_out].
    """
    feat, rois = xs[0], xs[1]
    ph, pw = node.attr("pooled_hw", (7, 7))
    spatial_scale = float(node.attr("spatial_scale", 1.0 / 16))
    N, H, W, Ctot = feat.shape
    C = Ctot // (ph * pw)
    featf = feat.astype(jnp.float32).reshape(N, H, W, ph, pw, C)

    def per_roi(roi):
        b = roi[0].astype(jnp.int32)
        x1, y1, x2, y2 = (roi[i] * spatial_scale for i in range(1, 5))
        rw = jnp.maximum(x2 - x1, 0.1)
        rh = jnp.maximum(y2 - y1, 0.1)
        cy = y1 + (jnp.arange(ph, dtype=jnp.float32) + 0.5) * rh / ph
        cx = x1 + (jnp.arange(pw, dtype=jnp.float32) + 0.5) * rw / pw
        y0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, H - 1)
        x0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, W - 1)
        y1i = jnp.minimum(y0 + 1, H - 1)
        x1i = jnp.minimum(x0 + 1, W - 1)
        wy = jnp.clip(cy, 0, H - 1) - y0
        wx = jnp.clip(cx, 0, W - 1) - x0
        img = featf[b]  # [H, W, ph, pw, C]

        def cell(i, j):
            g = img[:, :, i, j]  # [H, W, C]
            return (g[y0[i], x0[j]] * (1 - wy[i]) * (1 - wx[j])
                    + g[y0[i], x1i[j]] * (1 - wy[i]) * wx[j]
                    + g[y1i[i], x0[j]] * wy[i] * (1 - wx[j])
                    + g[y1i[i], x1i[j]] * wy[i] * wx[j])

        return jnp.stack([jnp.stack([cell(i, j) for j in range(pw)])
                          for i in range(ph)])

    return [jax.vmap(per_roi)(rois.astype(jnp.float32)).astype(feat.dtype)]


@register("rois_anchor_feature")
def rois_anchor_feature(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Encode ROIs relative to anchor statistics (reference:
    `framework/operators/rois_anchor_feature.cpp`, Baidu AD perception):
    emits normalized (cx, cy, w, h) features per ROI."""
    rois = xs[0].astype(jnp.float32)
    img_w = float(node.attr("img_w", 1.0))
    img_h = float(node.attr("img_h", 1.0))
    x1, y1, x2, y2 = rois[:, 1], rois[:, 2], rois[:, 3], rois[:, 4]
    w = (x2 - x1) / img_w
    h = (y2 - y1) / img_h
    cx = (x1 + x2) / 2 / img_w
    cy = (y1 + y2) / 2 / img_h
    return [jnp.stack([cx, cy, w, h], axis=-1).astype(xs[0].dtype)]


@register("proposal_img_scale_to_cam_coords")
def proposal_img_scale_to_cam_coords(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Image-to-camera coordinate lift (reference:
    `framework/operators/proposal_img_scale_to_cam_coords.cpp`): projects
    box bottom-centers into camera space with a pinhole model.
    inputs: boxes [R, 4+], cam_info [6] (fx, fy, cx, cy, cam_h, scale)."""
    boxes = xs[0].astype(jnp.float32)
    cam = xs[1].astype(jnp.float32)
    fx, fy, cx, cy, cam_h = cam[0], cam[1], cam[2], cam[3], cam[4]
    u = (boxes[:, 0] + boxes[:, 2]) / 2
    v = boxes[:, 3]
    z = fy * cam_h / jnp.maximum(v - cy, 1e-3)
    x3 = (u - cx) * z / fx
    return [jnp.stack([x3, jnp.full_like(x3, 0.0), z], axis=-1)]


@register("rcnn_det_output_with_attr")
def rcnn_det_output_with_attr(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """R-CNN final output assembly with attribute scores (reference:
    `framework/operators/rcnn_det_output_with_attr.cpp`): concatenates
    rois + class scores + attribute scores into detection rows."""
    rois, scores = xs[0].astype(jnp.float32), xs[1].astype(jnp.float32)
    attrs = xs[2].astype(jnp.float32) if len(xs) > 2 else None
    cls = jnp.argmax(scores, axis=-1).astype(jnp.float32)[:, None]
    conf = jnp.max(scores, axis=-1)[:, None]
    parts = [rois, cls, conf]
    if attrs is not None:
        parts.append(attrs)
    return [jnp.concatenate(parts, axis=-1)]


@register("affine_channel")
def affine_channel(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Per-channel affine with const weights (reference:
    `framework/operators/affine_channel.cpp`; folded by the rewriter when
    it follows a conv)."""
    x, scale_w, bias_w = xs[0], xs[1], xs[2]
    return [x * scale_w.astype(x.dtype) + bias_w.astype(x.dtype)]


@register("conv_unpadding_padding")
def conv_unpadding_padding(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Strip and re-apply sequence padding around a conv (reference:
    `framework/operators/conv_unpadding_padding.cpp`, OCR pipelines): with
    dense masked batches this is a masking no-op; zeros padded region."""
    x = xs[0]
    lengths = xs[1] if len(xs) > 1 else None
    if lengths is None:
        return [x]
    T = x.shape[1]
    t = lax.broadcasted_iota(jnp.int32, (1, T), 1)
    mask = t < lengths.astype(jnp.int32)[:, None]
    return [jnp.where(mask[..., None] if x.ndim == 3 else mask, x, 0)]
