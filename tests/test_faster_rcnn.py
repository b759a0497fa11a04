"""Full two-stage Faster-RCNN (VERDICT round-1 item 7): real topology
composed from rpn_proposal / roi_align / rcnn ops, checked end-to-end
against an independent numpy oracle of the second stage, plus the
int8-quantized-backbone variant.

Reference: `test/framework/net/faster_rcnn_test.cpp`.
"""

import numpy as np
import pytest

import anakin_tpu as ak
from anakin_tpu.models import build_faster_rcnn

CFG = dict(batch=2, image_size=64, num_classes=4, post_nms_top_n=16,
           pre_nms_top_n=64, keep_top_k=10, blocks=(1, 1, 1, 1),
           base_width=8, roi_resolution=7)


@pytest.fixture(scope="module")
def frcnn():
    g = build_faster_rcnn(**CFG)
    net = ak.Net(g, tap_edges=["proposals:out", "cls_prob:out",
                               "bbox_pred:out"])
    rng = np.random.default_rng(3)
    feed = {
        "input": rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32),
        "im_info": np.asarray([[64, 64, 1.0], [64, 64, 1.0]], np.float32),
    }
    out = net.prediction(feed)
    return g, feed, {k: np.asarray(v) for k, v in out.items()}


def test_faster_rcnn_shapes_and_validity(frcnn):
    g, feed, out = frcnn
    det = out[g.outputs[0]]
    assert det.shape == (2, 10, 7)          # (img, label, score, x1y1x2y2)
    rois = out["proposals:out"]
    assert rois.shape == (2, 16, 5)
    # at least some proposals and detections are valid
    assert (rois[..., 1] >= 0).any()
    valid = det[..., 2] > 0
    assert valid.any()
    v = det[valid]
    assert ((v[:, 1] >= 1) & (v[:, 1] < CFG["num_classes"])).all()  # labels
    assert (v[:, 2] <= 1.0).all()
    assert (v[:, 3] <= v[:, 5]).all() and (v[:, 4] <= v[:, 6]).all()
    assert (v[:, 3:] >= 0).all() and (v[:, 5] <= 63).all() \
        and (v[:, 6] <= 63).all()
    # invalid rows are all -1
    assert (det[~valid] == -1).all() or (det[~valid][:, 2:] == -1).all()


def _numpy_second_stage(rois, prob, deltas, im_info, num_classes,
                        keep_top_k, nms_thresh=0.3, conf_thresh=0.05,
                        stds=(0.1, 0.1, 0.2, 0.2)):
    """Independent literal-loop oracle for rcnn_detection_output."""
    B, R, _ = rois.shape
    prob = prob.reshape(B, R, num_classes)
    deltas = deltas.reshape(B, R, num_classes, 4) * np.asarray(stds)
    out = np.full((B, keep_top_k, 7), -1.0, np.float32)
    for b in range(B):
        base = rois[b, :, 1:5]
        invalid = (base[:, 2] < base[:, 0]) | (rois[b, :, 0] < 0)
        w = base[:, 2] - base[:, 0] + 1.0
        h = base[:, 3] - base[:, 1] + 1.0
        cx, cy = base[:, 0] + w / 2, base[:, 1] + h / 2
        rows = []
        for cls in range(1, num_classes):
            d = deltas[b, :, cls]
            dcx = d[:, 0] * w + cx
            dcy = d[:, 1] * h + cy
            dw = np.exp(np.minimum(d[:, 2], 10.0)) * w
            dh = np.exp(np.minimum(d[:, 3], 10.0)) * h
            boxes = np.stack([dcx - dw / 2, dcy - dh / 2,
                              dcx + dw / 2 - 1, dcy + dh / 2 - 1], -1)
            im_h = im_info[b, 0] / im_info[b, 2]
            im_w = im_info[b, 1] / im_info[b, 2]
            boxes[:, 0] = boxes[:, 0].clip(0, im_w - 1)
            boxes[:, 1] = boxes[:, 1].clip(0, im_h - 1)
            boxes[:, 2] = boxes[:, 2].clip(0, im_w - 1)
            boxes[:, 3] = boxes[:, 3].clip(0, im_h - 1)
            scores = np.where(invalid, -np.inf, prob[b, :, cls])
            # greedy padded NMS (same discipline as ops.detection.nms_padded)
            alive = scores > conf_thresh
            for _ in range(keep_top_k):
                masked = np.where(alive, scores, -np.inf)
                best = int(np.argmax(masked))
                if not np.isfinite(masked[best]):
                    break
                bb = boxes[best]
                area_b = max(bb[2] - bb[0], 0) * max(bb[3] - bb[1], 0)
                x1 = np.maximum(boxes[:, 0], bb[0])
                y1 = np.maximum(boxes[:, 1], bb[1])
                x2 = np.minimum(boxes[:, 2], bb[2])
                y2 = np.minimum(boxes[:, 3], bb[3])
                inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
                area = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
                    np.maximum(boxes[:, 3] - boxes[:, 1], 0)
                iou = inter / np.maximum(area + area_b - inter, 1e-10)
                rows.append((cls, scores[best], *boxes[best]))
                alive &= ~(iou > nms_thresh)
                alive[best] = False
        rows.sort(key=lambda r: -r[1])
        for i, r in enumerate(rows[:keep_top_k]):
            out[b, i] = (b, *r)
    return out


def test_faster_rcnn_second_stage_matches_numpy_oracle(frcnn):
    g, feed, out = frcnn
    det = out[g.outputs[0]]
    want = _numpy_second_stage(
        out["proposals:out"], out["cls_prob:out"], out["bbox_pred:out"],
        feed["im_info"], CFG["num_classes"], CFG["keep_top_k"])
    got_valid = det[det[..., 2] > 0]
    want_valid = want[want[..., 2] > 0]
    assert got_valid.shape == want_valid.shape
    np.testing.assert_allclose(got_valid, want_valid, rtol=1e-4, atol=1e-3)


def test_faster_rcnn_optimize_preserves_numerics(frcnn):
    g, feed, out = frcnn
    go = ak.optimize(build_faster_rcnn(**CFG))
    assert len(go.nodes) < len(g.nodes)     # BN/scale folded, relu fused
    det2 = np.asarray(ak.Net(go).prediction(feed)[go.outputs[0]])
    np.testing.assert_allclose(det2, out[g.outputs[0]], rtol=1e-3, atol=1e-3)


def test_faster_rcnn_int8_backbone(frcnn):
    """int8-quantized backbone (VERDICT item 7): detection heads stay fp32,
    backbone convs run int8; detections agree with fp32 on label/score."""
    g, feed, out = frcnn
    from anakin_tpu.quant import calibrate, quantize_graph

    go = ak.optimize(build_faster_rcnn(**CFG))
    scales = calibrate(go, [feed], method="max")
    gq = quantize_graph(go, scales)
    n_int8 = sum(1 for n in gq.nodes.values() if n.op.endswith("_int8"))
    assert n_int8 >= 10, n_int8             # backbone went int8

    det_fp = out[g.outputs[0]]
    det_q = np.asarray(ak.Net(gq).prediction(feed)[gq.outputs[0]])
    assert det_q.shape == det_fp.shape
    # top detection per image: same class, close score
    for b in range(det_fp.shape[0]):
        if det_fp[b, 0, 2] <= 0:
            continue
        assert det_q[b, 0, 1] == det_fp[b, 0, 1]
        assert abs(det_q[b, 0, 2] - det_fp[b, 0, 2]) < 0.1
