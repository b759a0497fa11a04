"""Detection-model ops: priorbox / box decode / NMS / roi pooling / yolo.

Parity targets: the reference's SSD/YOLO/R-CNN op set
(`saber/funcs/{priorbox,detection_output,yolo_box,roi_align,roi_pool}.h`,
`framework/operators/{anchor_generator,box_coder,box_clip,...}.cpp`).

TPU discipline (SURVEY.md section 7 "hard parts"): every dynamic-size
construct is **staticized** — NMS returns a fixed `keep_top_k` box slab with
a validity column instead of a variable-length list, proposals are padded
top-k — mirroring how the reference kept detection dense on GPU.

Box convention: (x1, y1, x2, y2) normalized unless stated.
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .registry import register

__all__ = ["iou_matrix", "nms_padded"]


def iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] -> [N, N] pairwise IoU."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-10)


def nms_padded(boxes: jnp.ndarray, scores: jnp.ndarray, max_out: int,
               iou_threshold: float, score_threshold: float = -jnp.inf):
    """Greedy NMS with static output size.

    Returns (indices [max_out] int32, valid [max_out] bool).  The reference's
    CPU/GPU NMS produced variable-length keeps; TPU requires a fixed slab.
    """
    n = boxes.shape[0]
    iou = iou_matrix(boxes)
    alive = scores > score_threshold

    def body(carry, _):
        alive, = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        valid = masked[best] > -jnp.inf
        # suppress boxes overlapping the chosen one (and the chosen one)
        suppress = iou[best] > iou_threshold
        alive_new = alive & ~suppress & (jnp.arange(n) != best)
        alive_new = jnp.where(valid, alive_new, alive)
        return (alive_new,), (jnp.where(valid, best, -1).astype(jnp.int32), valid)

    (_,), (idx, valid) = lax.scan(body, (alive,), None, length=max_out)
    return idx, valid


@register("priorbox")
def priorbox(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """SSD prior (anchor) box generation (reference:
    `saber/funcs/priorbox.h`).  Output [1, 2, H*W*P*4]:
    plane 0 = box coords, plane 1 = variances — caffe layout.

    attrs: min_sizes, max_sizes, aspect_ratios, flip, clip, variances,
    img_hw (input image size), step, offset.
    """
    feat = xs[0]
    _, fh, fw, _ = feat.shape
    img_h, img_w = node.attr("img_hw")
    min_sizes = [float(s) for s in node.attr("min_sizes")]
    max_sizes = [float(s) for s in node.attr("max_sizes", [])]
    ars_in = [float(a) for a in node.attr("aspect_ratios", [])]
    flip = bool(node.attr("flip", True))
    clip = bool(node.attr("clip", False))
    variances = [float(v) for v in node.attr("variances", [0.1, 0.1, 0.2, 0.2])]
    step = node.attr("step", 0)
    offset = float(node.attr("offset", 0.5))
    step_h = float(step) if step else img_h / fh
    step_w = float(step) if step else img_w / fw

    # box sizes per location (caffe order: min, max, then aspect ratios per min)
    whs = []
    for ms in min_sizes:
        whs.append((ms, ms))
        if max_sizes:
            mx = max_sizes[min_sizes.index(ms)] if len(max_sizes) == len(min_sizes) else max_sizes[0]
            whs.append((math.sqrt(ms * mx), math.sqrt(ms * mx)))
        ars = [1.0]
        for a in ars_in:
            if abs(a - 1.0) < 1e-6 or a in ars:
                continue
            ars.append(a)
            if flip:
                ars.append(1.0 / a)
        for a in ars:
            if abs(a - 1.0) < 1e-6:
                continue
            whs.append((ms * math.sqrt(a), ms / math.sqrt(a)))
    whs_np = np.asarray(whs, np.float32)  # [P, 2]
    P = whs_np.shape[0]

    cy = (np.arange(fh, dtype=np.float32) + offset) * step_h
    cx = (np.arange(fw, dtype=np.float32) + offset) * step_w
    cxg, cyg = np.meshgrid(cx, cy)  # [fh, fw]
    cxg = cxg[..., None]
    cyg = cyg[..., None]
    w = whs_np[None, None, :, 0]
    h = whs_np[None, None, :, 1]
    x1 = (cxg - w / 2) / img_w
    y1 = (cyg - h / 2) / img_h
    x2 = (cxg + w / 2) / img_w
    y2 = (cyg + h / 2) / img_h
    boxes = np.stack([x1, y1, x2, y2], axis=-1).reshape(-1)  # H*W*P*4
    if clip:
        boxes = np.clip(boxes, 0.0, 1.0)
    var = np.tile(np.asarray(variances, np.float32), fh * fw * P)
    out = np.stack([boxes, var], axis=0)[None]  # [1, 2, H*W*P*4]
    return [jnp.asarray(out)]


@register("detection_output")
def detection_output(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """SSD post-processing: decode priors + per-class padded NMS
    (reference: `saber/funcs/detection_output.h`).

    inputs: loc [N, num_priors*4], conf [N, num_priors*C], priors
    [1, 2, num_priors*4].  Output: [N, keep_top_k, 7] slabs of
    (image_id, label, score, x1, y1, x2, y2), score==-1 rows invalid —
    the reference emitted a variable-row tensor with the same 7 columns.
    """
    loc, conf, priors = xs[0], xs[1], xs[2]
    num_classes = int(node.attr("num_classes"))
    background_id = int(node.attr("background_id", 0))
    keep_top_k = int(node.attr("keep_top_k", 200))
    class_top_k = int(node.attr("top_k", 100))
    nms_thresh = float(node.attr("nms_thresh", 0.45))
    conf_thresh = float(node.attr("conf_thresh", 0.01))
    variance_encoded = bool(node.attr("variance_encoded_in_target", False))
    share_location = bool(node.attr("share_location", True))

    N = loc.shape[0]
    prior_boxes = priors[0, 0].reshape(-1, 4)
    prior_var = priors[0, 1].reshape(-1, 4)
    num_priors = prior_boxes.shape[0]
    loc = loc.reshape(N, num_priors, 4).astype(jnp.float32)
    conf = conf.reshape(N, num_priors, num_classes).astype(jnp.float32)

    # decode (CENTER_SIZE code type, the SSD default)
    pw = prior_boxes[:, 2] - prior_boxes[:, 0]
    ph = prior_boxes[:, 3] - prior_boxes[:, 1]
    pcx = (prior_boxes[:, 0] + prior_boxes[:, 2]) / 2
    pcy = (prior_boxes[:, 1] + prior_boxes[:, 3]) / 2
    var = jnp.ones_like(prior_var) if variance_encoded else prior_var
    dcx = var[:, 0] * loc[..., 0] * pw + pcx
    dcy = var[:, 1] * loc[..., 1] * ph + pcy
    dw = jnp.exp(var[:, 2] * loc[..., 2]) * pw
    dh = jnp.exp(var[:, 3] * loc[..., 3]) * ph
    boxes = jnp.stack(
        [dcx - dw / 2, dcy - dh / 2, dcx + dw / 2, dcy + dh / 2], axis=-1
    )  # [N, num_priors, 4]

    def per_image(b_boxes, b_conf):
        rows = []
        for cls in range(num_classes):
            if cls == background_id:
                continue
            scores = b_conf[:, cls]
            idx, valid = nms_padded(b_boxes, scores, class_top_k, nms_thresh, conf_thresh)
            sel_boxes = b_boxes[jnp.maximum(idx, 0)]
            sel_scores = jnp.where(valid, scores[jnp.maximum(idx, 0)], -1.0)
            label = jnp.full((class_top_k,), float(cls), jnp.float32)
            rows.append(jnp.concatenate(
                [label[:, None], sel_scores[:, None], sel_boxes], axis=1))
        all_rows = jnp.concatenate(rows, axis=0)  # [(C-1)*top_k, 6]
        order = jnp.argsort(-all_rows[:, 1])[:keep_top_k]
        kept = all_rows[order]
        kept = jnp.where(kept[:, 1:2] > 0, kept, -1.0)
        return kept  # [keep_top_k, 6]

    kept = jax.vmap(per_image)(boxes, conf)  # [N, keep_top_k, 6]
    img_id = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.float32)[:, None, None], (N, keep_top_k, 1)
    )
    return [jnp.concatenate([img_id, kept], axis=-1)]


@register("yolo_box")
def yolo_box(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """YOLOv3 box decoding (reference: `framework/operators/yolo_box.cpp`).

    inputs: feature map x [N, H, W, A*(5+C)], img_size [N, 2] (h, w).
    Outputs: boxes [N, H*W*A, 4] (x1y1x2y2 in image pixels), scores
    [N, H*W*A, C].
    """
    x, img_size = xs[0], xs[1]
    anchors = node.attr("anchors")  # flat [a0w, a0h, a1w, ...]
    class_num = int(node.attr("class_num"))
    conf_thresh = float(node.attr("conf_thresh", 0.005))
    downsample = int(node.attr("downsample_ratio", 32))
    N, H, W, _ = x.shape
    A = len(anchors) // 2
    feat = x.reshape(N, H, W, A, 5 + class_num).astype(jnp.float32)
    gx = lax.broadcasted_iota(jnp.float32, (1, H, W, 1), 2)
    gy = lax.broadcasted_iota(jnp.float32, (1, H, W, 1), 1)
    bx = (jax.nn.sigmoid(feat[..., 0]) + gx) / W
    by = (jax.nn.sigmoid(feat[..., 1]) + gy) / H
    aw = jnp.asarray(anchors[0::2], jnp.float32)[None, None, None, :]
    ah = jnp.asarray(anchors[1::2], jnp.float32)[None, None, None, :]
    input_h = H * downsample
    input_w = W * downsample
    bw = jnp.exp(feat[..., 2]) * aw / input_w
    bh = jnp.exp(feat[..., 3]) * ah / input_h
    obj = jax.nn.sigmoid(feat[..., 4])
    cls_prob = jax.nn.sigmoid(feat[..., 5:]) * obj[..., None]
    cls_prob = jnp.where(cls_prob > conf_thresh, cls_prob, 0.0)
    img_h = img_size[:, 0].astype(jnp.float32)[:, None, None, None]
    img_w = img_size[:, 1].astype(jnp.float32)[:, None, None, None]
    x1 = (bx - bw / 2) * img_w
    y1 = (by - bh / 2) * img_h
    x2 = (bx + bw / 2) * img_w
    y2 = (by + bh / 2) * img_h
    x1 = jnp.clip(x1, 0, img_w - 1)
    y1 = jnp.clip(y1, 0, img_h - 1)
    x2 = jnp.clip(x2, 0, img_w - 1)
    y2 = jnp.clip(y2, 0, img_h - 1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(N, H * W * A, 4)
    scores = cls_prob.reshape(N, H * W * A, class_num)
    return [boxes.astype(x.dtype), scores.astype(x.dtype)]


@register("roi_align")
def roi_align(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """ROI Align with bilinear sampling (reference:
    `saber/funcs/roi_align.h`).

    inputs: feat [N, H, W, C], rois [R, 5] (batch_idx, x1, y1, x2, y2 in
    input-image coords).  attrs: pooled_hw, spatial_scale, sampling_ratio.
    Output: [R, ph, pw, C].
    """
    feat, rois = xs[0], xs[1]
    ph, pw = node.attr("pooled_hw", (7, 7))
    spatial_scale = float(node.attr("spatial_scale", 1.0))
    sampling = int(node.attr("sampling_ratio", 2))
    sampling = max(sampling, 1)
    N, H, W, C = feat.shape
    featf = feat.astype(jnp.float32)

    def bilinear(img, y, x):
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
        y1 = jnp.clip(y0 + 1, 0, H - 1)
        x1 = jnp.clip(x0 + 1, 0, W - 1)
        wy = jnp.clip(y, 0, H - 1) - y0
        wx = jnp.clip(x, 0, W - 1) - x0
        v = (
            img[y0, x0] * (1 - wy)[..., None] * (1 - wx)[..., None]
            + img[y0, x1] * (1 - wy)[..., None] * wx[..., None]
            + img[y1, x0] * wy[..., None] * (1 - wx)[..., None]
            + img[y1, x1] * wy[..., None] * wx[..., None]
        )
        return v

    def per_roi(roi):
        b = roi[0].astype(jnp.int32)
        img = featf[b]
        x1, y1, x2, y2 = (roi[i] * spatial_scale for i in range(1, 5))
        rw = jnp.maximum(x2 - x1, 1.0)
        rh = jnp.maximum(y2 - y1, 1.0)
        bin_h = rh / ph
        bin_w = rw / pw
        iy = jnp.arange(ph, dtype=jnp.float32)
        ix = jnp.arange(pw, dtype=jnp.float32)
        sy = jnp.arange(sampling, dtype=jnp.float32)
        ys = y1 + (iy[:, None] + (sy[None, :] + 0.5) / sampling) * bin_h  # [ph, s]
        xs_ = x1 + (ix[:, None] + (sy[None, :] + 0.5) / sampling) * bin_w  # [pw, s]
        yy = ys.reshape(-1)[:, None]  # [ph*s, 1]
        xx = xs_.reshape(-1)[None, :]  # [1, pw*s]
        grid_y = jnp.broadcast_to(yy, (ph * sampling, pw * sampling))
        grid_x = jnp.broadcast_to(xx, (ph * sampling, pw * sampling))
        vals = bilinear(img, grid_y, grid_x)  # [ph*s, pw*s, C]
        vals = vals.reshape(ph, sampling, pw, sampling, C)
        return jnp.mean(vals, axis=(1, 3))

    return [jax.vmap(per_roi)(rois.astype(jnp.float32)).astype(feat.dtype)]


@register("roi_pool", "ps_roi_pooling", "sroi_align")
def roi_pool(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """ROI max pooling (reference: `saber/funcs/roi_pooling.h`).
    Same IO as roi_align; quantized-grid max pooling."""
    feat, rois = xs[0], xs[1]
    ph, pw = node.attr("pooled_hw", (7, 7))
    spatial_scale = float(node.attr("spatial_scale", 1.0))
    N, H, W, C = feat.shape
    featf = feat.astype(jnp.float32)

    def per_roi(roi):
        b = roi[0].astype(jnp.int32)
        img = featf[b]
        x1 = jnp.round(roi[1] * spatial_scale)
        y1 = jnp.round(roi[2] * spatial_scale)
        x2 = jnp.round(roi[3] * spatial_scale)
        y2 = jnp.round(roi[4] * spatial_scale)
        rh = jnp.maximum(y2 - y1 + 1, 1.0)
        rw = jnp.maximum(x2 - x1 + 1, 1.0)
        # Each output cell max-pools its sub-window; staticize by sampling a
        # dense grid and masking (TPU-friendly replacement for the ragged
        # per-cell loops of the CUDA kernel).
        gy = lax.broadcasted_iota(jnp.float32, (H, 1), 0)
        gx = lax.broadcasted_iota(jnp.float32, (1, W), 1)

        def cell(i, j):
            ys = y1 + rh * i / ph
            ye = y1 + rh * (i + 1) / ph
            xs_ = x1 + rw * j / pw
            xe = x1 + rw * (j + 1) / pw
            m = (gy >= jnp.floor(ys)) & (gy < jnp.ceil(ye)) & \
                (gx >= jnp.floor(xs_)) & (gx < jnp.ceil(xe))
            return jnp.max(jnp.where(m[..., None], img, -jnp.inf), axis=(0, 1))

        rows = jnp.stack([
            jnp.stack([cell(i, j) for j in range(pw)]) for i in range(ph)
        ])
        return jnp.where(jnp.isfinite(rows), rows, 0.0)

    return [jax.vmap(per_roi)(rois.astype(jnp.float32)).astype(feat.dtype)]


@register("anchor_generator")
def anchor_generator(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Faster-RCNN anchor generation (reference:
    `framework/operators/anchor_generator.cpp`).
    Output: anchors [H, W, A, 4], variances [H, W, A, 4]."""
    feat = xs[0]
    _, H, W, _ = feat.shape
    sizes = [float(s) for s in node.attr("anchor_sizes", [64, 128, 256, 512])]
    ratios = [float(r) for r in node.attr("aspect_ratios", [0.5, 1.0, 2.0])]
    variances = [float(v) for v in node.attr("variances", [0.1, 0.1, 0.2, 0.2])]
    stride = node.attr("stride", [16.0, 16.0])
    offset = float(node.attr("offset", 0.5))
    whs = []
    for r in ratios:
        for s in sizes:
            w = s * math.sqrt(1.0 / r)
            h = s * math.sqrt(r)
            whs.append((w, h))
    whs_np = np.asarray(whs, np.float32)
    A = whs_np.shape[0]
    cx = (np.arange(W, dtype=np.float32) + offset) * stride[0]
    cy = (np.arange(H, dtype=np.float32) + offset) * stride[1]
    cxg, cyg = np.meshgrid(cx, cy)
    anchors = np.stack([
        cxg[..., None] - whs_np[None, None, :, 0] / 2,
        cyg[..., None] - whs_np[None, None, :, 1] / 2,
        cxg[..., None] + whs_np[None, None, :, 0] / 2,
        cyg[..., None] + whs_np[None, None, :, 1] / 2,
    ], axis=-1)
    var = np.broadcast_to(np.asarray(variances, np.float32), anchors.shape).copy()
    return [jnp.asarray(anchors), jnp.asarray(var)]


@register("box_coder")
def box_coder(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Decode target offsets against priors (reference:
    `framework/operators/box_coder.cpp`, decode_center_size path).
    inputs: priors [M, 4], prior_var [M, 4] or None, targets [N, M, 4]."""
    priors = xs[0].astype(jnp.float32)
    if len(xs) == 3:
        prior_var, targets = xs[1].astype(jnp.float32), xs[2].astype(jnp.float32)
    else:
        prior_var, targets = None, xs[1].astype(jnp.float32)
    axis = int(node.attr("axis", 0))
    norm = bool(node.attr("box_normalized", True))
    add = 0.0 if norm else 1.0
    pw = priors[:, 2] - priors[:, 0] + add
    ph = priors[:, 3] - priors[:, 1] + add
    pcx = priors[:, 0] + pw / 2
    pcy = priors[:, 1] + ph / 2
    v = prior_var if prior_var is not None else jnp.ones_like(priors)
    t = targets
    dcx = v[:, 0] * t[..., 0] * pw + pcx
    dcy = v[:, 1] * t[..., 1] * ph + pcy
    dw = jnp.exp(v[:, 2] * t[..., 2]) * pw
    dh = jnp.exp(v[:, 3] * t[..., 3]) * ph
    out = jnp.stack([dcx - dw / 2, dcy - dh / 2,
                     dcx + dw / 2 - add, dcy + dh / 2 - add], axis=-1)
    return [out.astype(xs[-1].dtype)]


@register("box_clip")
def box_clip(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Clip boxes to image bounds (reference:
    `framework/operators/box_clip.cpp`). inputs: boxes [.., 4], im_info
    [N, 3] (h, w, scale)."""
    boxes, im_info = xs[0].astype(jnp.float32), xs[1].astype(jnp.float32)
    h = im_info[:, 0] / im_info[:, 2] - 1.0
    w = im_info[:, 1] / im_info[:, 2] - 1.0
    shape = [1] * boxes.ndim
    shape[0] = -1
    h = h.reshape(shape)
    w = w.reshape(shape)
    x1 = jnp.clip(boxes[..., 0:1], 0, None)
    y1 = jnp.clip(boxes[..., 1:2], 0, None)
    x2 = jnp.minimum(boxes[..., 2:3], w)
    y2 = jnp.minimum(boxes[..., 3:4], h)
    return [jnp.concatenate([x1, y1, x2, y2], axis=-1).astype(xs[0].dtype)]


@register("rcnn_detection_output")
def rcnn_detection_output(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Faster-RCNN second-stage post-processing (reference: the
    `rcnn_det_output_with_attr` stage of `faster_rcnn_test.cpp` /
    `framework/operators/rcnn_det_output_with_attr.cpp`): per-class box
    refinement of the RPN rois + per-class padded NMS + global top-k.

    inputs: rois [B, R, 5] (batch_idx, x1, y1, x2, y2; invalid rows -1),
    cls_prob [B*R, C], bbox_pred [B*R, C*4] (or [B*R, 4] class-agnostic),
    im_info [B, 3] (h, w, scale).
    attrs: num_classes, background_id (0), keep_top_k (100), top_k
    (per-class, default keep_top_k), nms_thresh (0.3), conf_thresh (0.05),
    bbox_stds ([0.1, 0.1, 0.2, 0.2] — the py-faster-rcnn training-time
    target normalization, undone at decode).
    Output: [B, keep_top_k, 7] slabs of (image_id, label, score,
    x1, y1, x2, y2); score == -1 rows invalid.
    """
    rois, cls_prob, bbox_pred, im_info = xs
    B, R, _ = rois.shape
    C = int(node.attr("num_classes"))
    background_id = int(node.attr("background_id", 0))
    keep_top_k = int(node.attr("keep_top_k", 100))
    class_top_k = int(node.attr("top_k", keep_top_k))
    nms_thresh = float(node.attr("nms_thresh", 0.3))
    conf_thresh = float(node.attr("conf_thresh", 0.05))
    stds = jnp.asarray(
        [float(v) for v in node.attr("bbox_stds", (0.1, 0.1, 0.2, 0.2))],
        jnp.float32)
    agnostic = bbox_pred.shape[-1] == 4

    rois = rois.astype(jnp.float32)
    prob = cls_prob.reshape(B, R, C).astype(jnp.float32)
    deltas = bbox_pred.reshape(B, R, -1, 4).astype(jnp.float32) * stds

    def per_image(b_rois, b_prob, b_deltas, info):
        base = b_rois[:, 1:5]                                 # [R, 4]
        invalid_roi = (base[:, 2] < base[:, 0]) | (b_rois[:, 0] < 0)
        w = base[:, 2] - base[:, 0] + 1.0
        h = base[:, 3] - base[:, 1] + 1.0
        cx = base[:, 0] + w / 2
        cy = base[:, 1] + h / 2
        dcx = b_deltas[..., 0] * w[:, None] + cx[:, None]     # [R, C|1]
        dcy = b_deltas[..., 1] * h[:, None] + cy[:, None]
        dw = jnp.exp(jnp.minimum(b_deltas[..., 2], 10.0)) * w[:, None]
        dh = jnp.exp(jnp.minimum(b_deltas[..., 3], 10.0)) * h[:, None]
        boxes = jnp.stack([dcx - dw / 2, dcy - dh / 2,
                           dcx + dw / 2 - 1, dcy + dh / 2 - 1], axis=-1)
        im_h = info[0] / info[2]
        im_w = info[1] / info[2]
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, im_w - 1),
            jnp.clip(boxes[..., 1], 0, im_h - 1),
            jnp.clip(boxes[..., 2], 0, im_w - 1),
            jnp.clip(boxes[..., 3], 0, im_h - 1)], axis=-1)   # [R, C|1, 4]
        rows = []
        for cls in range(C):
            if cls == background_id:
                continue
            cboxes = boxes[:, 0 if agnostic else cls]
            scores = jnp.where(invalid_roi, -jnp.inf, b_prob[:, cls])
            idx, valid = nms_padded(cboxes, scores, class_top_k,
                                    nms_thresh, conf_thresh)
            sel_boxes = cboxes[jnp.maximum(idx, 0)]
            sel_scores = jnp.where(valid, scores[jnp.maximum(idx, 0)], -1.0)
            label = jnp.full((class_top_k,), float(cls), jnp.float32)
            rows.append(jnp.concatenate(
                [label[:, None], sel_scores[:, None], sel_boxes], axis=1))
        all_rows = jnp.concatenate(rows, axis=0)
        order = jnp.argsort(-all_rows[:, 1])[:keep_top_k]
        kept = all_rows[order]
        return jnp.where(kept[:, 1:2] > 0, kept, -1.0)

    kept = jax.vmap(per_image)(rois, prob, deltas,
                               im_info.astype(jnp.float32))
    img_id = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.float32)[:, None, None], (B, keep_top_k, 1))
    return [jnp.concatenate([img_id, kept], axis=-1)]


@register("generate_proposals", "rcnn_proposal", "rpn_proposal_ssd", "sproposal")
def generate_proposals(node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """RPN proposal generation, staticized (reference:
    `saber/funcs/generate_proposals.h`).

    inputs: scores [N, H, W, A], deltas [N, H, W, A*4], im_info [N, 3],
    anchors [H, W, A, 4], variances [H, W, A, 4].
    Output: rois [N, post_nms_top_n, 5] (batch_idx, x1, y1, x2, y2); invalid
    rows have all -1.
    """
    scores, deltas, im_info, anchors, variances = xs
    pre_n = int(node.attr("pre_nms_top_n", 6000))
    post_n = int(node.attr("post_nms_top_n", 300))
    nms_thresh = float(node.attr("nms_thresh", 0.7))
    min_size = float(node.attr("min_size", 0.0))
    N = scores.shape[0]
    A4 = anchors.reshape(-1, 4).astype(jnp.float32)
    V4 = variances.reshape(-1, 4).astype(jnp.float32)
    M = A4.shape[0]
    pre_n = min(pre_n, M)
    sc = scores.reshape(N, M).astype(jnp.float32)
    dl = deltas.reshape(N, M, 4).astype(jnp.float32)

    aw = A4[:, 2] - A4[:, 0] + 1.0
    ah = A4[:, 3] - A4[:, 1] + 1.0
    acx = A4[:, 0] + aw / 2
    acy = A4[:, 1] + ah / 2

    def per_image(s, d, info):
        dcx = V4[:, 0] * d[:, 0] * aw + acx
        dcy = V4[:, 1] * d[:, 1] * ah + acy
        dw = jnp.exp(jnp.minimum(V4[:, 2] * d[:, 2], 10.0)) * aw
        dh = jnp.exp(jnp.minimum(V4[:, 3] * d[:, 3], 10.0)) * ah
        boxes = jnp.stack([dcx - dw / 2, dcy - dh / 2,
                           dcx + dw / 2 - 1, dcy + dh / 2 - 1], axis=-1)
        h_im, w_im = info[0], info[1]
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, w_im - 1),
            jnp.clip(boxes[:, 1], 0, h_im - 1),
            jnp.clip(boxes[:, 2], 0, w_im - 1),
            jnp.clip(boxes[:, 3], 0, h_im - 1),
        ], axis=-1)
        ws = boxes[:, 2] - boxes[:, 0] + 1
        hs = boxes[:, 3] - boxes[:, 1] + 1
        keep = (ws >= min_size) & (hs >= min_size)
        s_m = jnp.where(keep, s, -jnp.inf)
        top_s, top_i = lax.top_k(s_m, pre_n)
        top_boxes = boxes[top_i]
        idx, valid = nms_padded(top_boxes, top_s, post_n, nms_thresh)
        sel = top_boxes[jnp.maximum(idx, 0)]
        sel = jnp.where(valid[:, None], sel, -1.0)
        return sel

    rois = jax.vmap(per_image)(sc, dl, im_info.astype(jnp.float32))
    bidx = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.float32)[:, None, None], (N, post_n, 1))
    return [jnp.concatenate([bidx, rois], axis=-1).astype(xs[0].dtype)]
