"""Detection int8 quality metric (round-4, VERDICT item 4c).

The classification int8 studies measure top-1 deltas; detection needed
its own geometry-aware metric.  This tool compares fp32 vs int8-backbone
detections on the synthetic scenes the numpy oracles already use
(random inputs through the REAL graphs — no labeled boxes exist offline,
so the metric is fp32-as-reference agreement, the same contract as the
round-2 logit-proxy tier):

  * YOLOv3-tiny: for each image, take the top-N boxes by best class
    score from the fp32 net; match each to the int8 net's boxes and
    record the best IoU plus the score delta.  Reported: mean/min
    matched IoU, fraction matched at IoU>=0.5 (the PASCAL criterion),
    and rank agreement of the top-1 box.
  * SSD / detection_output (already end-to-end NMS'd rows of
    [label, score, box]): match valid fp32 rows to int8 rows by IoU.

Writes the `detection_int8` section of artifacts/accuracy_report.json.
Reference analog: `faster_rcnn_test.cpp` / `yolo_v3_test.cpp` ran real
models through the full detection path; their accuracy harness was
`model_int8_accuracy.cpp` (classification only — this extends the
discipline to boxes).

Usage: python tools/detection_accuracy.py   (CPU-forced)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _iou(a, b):
    """a [4], b [M,4] xyxy -> [M]"""
    x1 = np.maximum(a[0], b[:, 0])
    y1 = np.maximum(a[1], b[:, 1])
    x2 = np.minimum(a[2], b[:, 2])
    y2 = np.minimum(a[3], b[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = max(0.0, (a[2] - a[0])) * max(0.0, (a[3] - a[1]))
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * \
        np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / np.maximum(area_a + area_b - inter, 1e-9)


def yolo_agreement(n_scenes=16, top_n=10, image_size=160, num_classes=5,
                   seed=0):
    import anakin_tpu as ak
    from anakin_tpu.models.detection import build_yolo_v3_tiny
    from anakin_tpu.quant import calibrate, quantize_graph

    rng = np.random.default_rng(seed)
    g = ak.optimize(build_yolo_v3_tiny(batch=1, image_size=image_size,
                                       num_classes=num_classes))
    feed0 = {"input": rng.normal(size=(1, image_size, image_size, 3))
             .astype(np.float32),
             "img_size": np.array([[image_size, image_size]], np.int32)}
    cal = [dict(feed0, input=rng.normal(
        size=feed0["input"].shape).astype(np.float32)) for _ in range(4)]
    gq = quantize_graph(g, calibrate(g, cal, method="max"))
    net32, net8 = ak.Net(g), ak.Net(gq)

    ious, score_deltas, top1_agree = [], [], 0
    for s in range(n_scenes):
        feed = dict(feed0, input=rng.normal(
            size=feed0["input"].shape).astype(np.float32))
        o32 = net32.prediction(feed)
        o8 = net8.prediction(feed)
        b32 = np.asarray(o32[g.outputs[0]], np.float32)[0]   # [M, 4]
        s32 = np.asarray(o32[g.outputs[1]], np.float32)[0]   # [M, C]
        b8 = np.asarray(o8[gq.outputs[0]], np.float32)[0]
        s8 = np.asarray(o8[gq.outputs[1]], np.float32)[0]
        best32 = s32.max(-1)
        order = np.argsort(-best32)[:top_n]
        for rank, i in enumerate(order):
            m = _iou(b32[i], b8)
            j = int(np.argmax(m))
            ious.append(float(m[j]))
            score_deltas.append(float(abs(best32[i] - s8[j].max())))
            if rank == 0 and j == int(np.argmax(s8.max(-1))):
                top1_agree += 1
    ious = np.array(ious)
    return {"scenes": n_scenes, "boxes_matched": len(ious),
            "mean_iou": round(float(ious.mean()), 4),
            "min_iou": round(float(ious.min()), 4),
            "frac_iou_ge_0.5": round(float((ious >= 0.5).mean()), 4),
            "mean_abs_score_delta": round(float(np.mean(score_deltas)), 5),
            "top1_box_agreement": round(top1_agree / n_scenes, 4)}


def ssd_agreement(n_scenes=8, image_size=300, seed=0):
    import anakin_tpu as ak
    from anakin_tpu.models.detection import build_ssd_vgg16
    from anakin_tpu.quant import calibrate, quantize_graph

    rng = np.random.default_rng(seed)
    g = ak.optimize(build_ssd_vgg16(batch=1, image_size=image_size))
    feed0 = {"input": rng.normal(size=(1, image_size, image_size, 3))
             .astype(np.float32)}
    cal = [dict(input=rng.normal(
        size=feed0["input"].shape).astype(np.float32)) for _ in range(4)]
    gq = quantize_graph(g, calibrate(g, cal, method="max"))
    net32, net8 = ak.Net(g), ak.Net(gq)

    ious, label_agree, n_valid = [], 0, 0
    for s in range(n_scenes):
        feed = dict(feed0, input=rng.normal(
            size=feed0["input"].shape).astype(np.float32))
        d32 = np.asarray(net32.prediction(feed)[g.outputs[0]],
                         np.float32)[0]   # [K, 7] label,?,score,x1,y1,x2,y2
        d8 = np.asarray(net8.prediction(feed)[gq.outputs[0]],
                        np.float32)[0]
        v32 = d32[d32[:, 2] > 0]
        v8 = d8[d8[:, 2] > 0]
        if not len(v32) or not len(v8):
            continue
        for row in v32[:10]:
            m = _iou(row[3:7], v8[:, 3:7])
            j = int(np.argmax(m))
            ious.append(float(m[j]))
            label_agree += int(row[0] == v8[j, 0])
            n_valid += 1
    ious = np.array(ious) if ious else np.zeros(1)
    return {"scenes": n_scenes, "boxes_matched": n_valid,
            "mean_iou": round(float(ious.mean()), 4),
            "frac_iou_ge_0.5": round(float((ious >= 0.5).mean()), 4),
            "label_agreement": round(label_agree / max(1, n_valid), 4)}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "accuracy_report.json")
    section = {
        "metric": "fp32-as-reference box agreement on synthetic scenes "
                  "(IoU matching; PASCAL 0.5 criterion)",
        "caveat": "random weights/inputs (no trained detection zoo "
                  "offline): box GEOMETRY agreement is the meaningful "
                  "signal (decode + NMS numerics under int8 backbones); "
                  "yolo top1-rank agreement is a near-tie shuffle because "
                  "random-weight scores cluster at sigmoid(~0) — see the "
                  "trained-model discipline in the classification tiers",
        "yolo_v3_tiny": yolo_agreement(),
        "ssd_vgg16": ssd_agreement(),
    }
    report = json.load(open(out_path)) if os.path.exists(out_path) else {}
    report["detection_int8"] = section
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(section, indent=1))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
