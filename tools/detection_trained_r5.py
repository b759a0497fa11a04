"""Trained-detector int8 quality (round-5, VERDICT task 6).

Round 4 measured int8 detection on RANDOM weights — honest about box
GEOMETRY surviving quantized backbones, but unable to catch
calibration-induced score collapse (yolo score-rank agreement was
acknowledged near-noise).  This closes it with the charlm recipe applied
to detection:

  1. SYNTHETIC LABELED SCENES: 1-3 geometric objects (filled rectangle /
     disk / cross = 3 classes) on structured noise, with exact boxes.
  2. TRAIN a narrow yolo-v3-tiny (the real two-head topology,
     `build_yolo_v3_tiny(width_mult=0.25)`, anchors sized to the scene
     objects) by jax.grad THROUGH the engine's own `build_forward`
     program with the raw head convs tapped (`tap_edges`) — the deployed
     graph and the trained function are one and the same; the decode/NMS
     ops are DCE'd out of the training jit because the loss doesn't read
     them.
  3. EVAL fp32 vs int8 (entropy-free max calibration on train scenes,
     `quantize_graph` — the suite's path) through the FULL graph
     (yolo_box decode) + host NMS, against GROUND TRUTH:
     detection rate @ IoU>=0.5 with correct class, mean matched IoU,
     mean confidence on matched detections, false positives/scene.
  4. Write `detection_int8_trained` into artifacts/accuracy_report.json.

Reference bar: `test/framework/net/model_int8_accuracy.cpp` (accuracy
deltas on a TRAINED model) extended to detection.

Usage: python tools/detection_trained_r5.py [--steps 500]   (CPU-forced)
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import anakin_tpu as ak  # noqa: E402
from anakin_tpu.models.detection import build_yolo_v3_tiny  # noqa: E402
from anakin_tpu.runtime.net import build_forward  # noqa: E402

S = 96                    # image size
C = 3                     # classes: rect / disk / cross
ANCH1 = [40, 40, 56, 56, 72, 72]      # head 1 (/32 -> 3x3 grid)
ANCH2 = [16, 16, 24, 24, 32, 32]      # head 2 (/16 -> 6x6 grid)


# --------------------------------------------------------------- scenes
def make_scene(rng):
    """One [S, S, 3] image + list of (x1, y1, x2, y2, cls)."""
    img = rng.normal(0.0, 0.15, (S, S, 3)).astype(np.float32)
    # low-frequency background structure
    gx = np.linspace(0, 2 * np.pi * rng.uniform(0.5, 2), S)
    img += 0.2 * np.sin(gx)[None, :, None] * rng.normal(size=(1, 1, 3))
    boxes = []
    yy, xx = np.mgrid[0:S, 0:S]
    for _ in range(rng.integers(1, 4)):
        size = int(rng.integers(14, 44))
        cx = int(rng.integers(size // 2 + 2, S - size // 2 - 2))
        cy = int(rng.integers(size // 2 + 2, S - size // 2 - 2))
        cls = int(rng.integers(0, C))
        color = np.eye(3, dtype=np.float32)[cls] * rng.uniform(0.8, 1.2) \
            + rng.normal(0, 0.05, 3)
        x1, y1 = cx - size // 2, cy - size // 2
        x2, y2 = x1 + size, y1 + size
        if cls == 0:                                    # rectangle
            mask = (xx >= x1) & (xx < x2) & (yy >= y1) & (yy < y2)
        elif cls == 1:                                  # disk
            mask = (xx - cx) ** 2 + (yy - cy) ** 2 <= (size / 2) ** 2
        else:                                           # cross
            t = max(2, size // 5)
            mask = (((np.abs(xx - cx) <= t) & (yy >= y1) & (yy < y2)) |
                    ((np.abs(yy - cy) <= t) & (xx >= x1) & (xx < x2)))
        img[mask] = img[mask] * 0.2 + color[None, :]
        boxes.append((float(x1), float(y1), float(x2), float(y2), cls))
    return img, boxes


def make_batch(rng, n):
    imgs, labels = [], []
    for _ in range(n):
        im, bx = make_scene(rng)
        imgs.append(im)
        labels.append(bx)
    return np.stack(imgs), labels


# --------------------------------------------------------------- targets
def _anchor_iou(w, h, aw, ah):
    inter = min(w, aw) * min(h, ah)
    return inter / (w * h + aw * ah - inter)


def build_targets(labels, grids=(3, 6)):
    """Per-head target tensors [B, G, G, 3, 5+C] + positive masks.
    Anchor assignment: best (w,h)-IoU across all 6 priors picks the head
    and anchor; target at the center cell (the standard yolo-v3 rule)."""
    B = len(labels)
    anchors = [np.array(ANCH1, np.float32).reshape(3, 2),
               np.array(ANCH2, np.float32).reshape(3, 2)]
    ds = [S // g for g in grids]
    tgt = [np.zeros((B, g, g, 3, 5 + C), np.float32) for g in grids]
    pos = [np.zeros((B, g, g, 3), np.float32) for g in grids]
    for b, bxs in enumerate(labels):
        for (x1, y1, x2, y2, cls) in bxs:
            w, h = x2 - x1, y2 - y1
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            best, bh, ba = -1.0, 0, 0
            for hi in range(2):
                for ai in range(3):
                    iou = _anchor_iou(w, h, *anchors[hi][ai])
                    if iou > best:
                        best, bh, ba = iou, hi, ai
            g, d = grids[bh], ds[bh]
            gx, gy = min(int(cx / d), g - 1), min(int(cy / d), g - 1)
            t = tgt[bh][b, gy, gx, ba]
            t[0] = cx / d - gx                       # sigmoid(tx) target
            t[1] = cy / d - gy
            t[2] = np.log(max(w, 1e-3) / anchors[bh][ba, 0])  # tw target
            t[3] = np.log(max(h, 1e-3) / anchors[bh][ba, 1])
            t[4] = 1.0
            t[5 + cls] = 1.0
            pos[bh][b, gy, gx, ba] = 1.0
    return tgt, pos


# --------------------------------------------------------------- training
def yolo_loss(head, tgt, pos):
    """head [B, G, G, 3*(5+C)] raw conv output; same transform family as
    ops.detection.yolo_box (sigmoid xy/obj/cls, raw exp-space wh)."""
    B, G, _, _ = head.shape
    f = head.reshape(B, G, G, 3, 5 + C).astype(jnp.float32)
    xy = jax.nn.sigmoid(f[..., 0:2])
    wh = f[..., 2:4]
    obj = f[..., 4]
    cls = f[..., 5:]
    p = pos[..., None]
    n_pos = jnp.maximum(pos.sum(), 1.0)
    l_xy = (p * (xy - tgt[..., 0:2]) ** 2).sum() / n_pos
    l_wh = (p * (wh - tgt[..., 2:4]) ** 2).sum() / n_pos
    bce = lambda z, t: jnp.maximum(z, 0) - z * t + jnp.log1p(
        jnp.exp(-jnp.abs(z)))
    l_obj = (pos * bce(obj, 1.0)).sum() / n_pos \
        + 0.5 * ((1 - pos) * bce(obj, 0.0)).sum() / (pos.size - n_pos)
    l_cls = (p * bce(cls, tgt[..., 5:])).sum() / n_pos
    return 5.0 * (l_xy + l_wh) + l_obj + l_cls


def train(steps=500, batch=8, seed=0):
    import optax

    g = build_yolo_v3_tiny(batch=batch, image_size=S, num_classes=C,
                           width_mult=0.25, anchors1=ANCH1, anchors2=ANCH2,
                           conf_thresh=0.01, seed=seed)
    # the raw head convs feed the yolo_box nodes — tap them for the loss
    head_edges = [n.inputs[0] for n in g.nodes.values() if n.op == "yolo_box"]
    assert len(head_edges) == 2
    fwd, _ = build_forward(g, "fp32", tap_edges=head_edges)

    def loss_fn(p, x, t1, p1, t2, p2):
        out = fwd(p, {"input": x,
                      "img_size": jnp.full((x.shape[0], 2), S, jnp.int32)})
        return (yolo_loss(out[head_edges[0]], t1, p1)
                + yolo_loss(out[head_edges[1]], t2, p2))

    opt = optax.adam(2e-3)
    p = {k: jnp.asarray(v) for k, v in g.params.items()}
    state = opt.init(p)

    @jax.jit
    def step(p, state, x, t1, p1, t2, p2):
        l, grads = jax.value_and_grad(loss_fn)(p, x, t1, p1, t2, p2)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(p, upd), state, l

    rng = np.random.default_rng(seed)
    t0 = time.time()
    for i in range(steps):
        x, labels = make_batch(rng, batch)
        (t1, t2), (p1, p2) = build_targets(labels)
        p, state, l = step(p, state, jnp.asarray(x), t1, p1, t2, p2)
        if i % 50 == 0:
            print(f"step {i:4d} loss {float(l):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    print(f"final loss {float(l):.4f}")
    g.params = {k: np.asarray(v) for k, v in p.items()}
    return g


# ----------------------------------------------------------------- eval
def _iou(a, b):
    x1 = np.maximum(a[0], b[:, 0]); y1 = np.maximum(a[1], b[:, 1])
    x2 = np.minimum(a[2], b[:, 2]); y2 = np.minimum(a[3], b[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    aa = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    ab = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0,
                                                       None)
    return inter / np.maximum(aa + ab - inter, 1e-9)


def nms(boxes, scores, iou_th=0.45, conf_th=0.4, top=20):
    """Host-side per-class NMS over the graph's raw yolo_box outputs."""
    dets = []
    for c in range(scores.shape[1]):
        s = scores[:, c]
        order = np.argsort(-s)
        keep = []
        for i in order:
            if s[i] < conf_th or len(keep) >= top:
                break
            if keep and float(_iou(boxes[i],
                                   boxes[np.array(keep)]).max()) > iou_th:
                continue
            keep.append(i)
        dets += [(float(s[i]), c, boxes[i]) for i in keep]
    return sorted(dets, key=lambda d: -d[0])


def evaluate(net, g, scenes, name):
    det_match, ious, confs, fps, n_gt = 0, [], [], 0, 0
    for img, labels in scenes:
        out = net.prediction({
            "input": img[None],
            "img_size": np.full((1, 2), S, np.int32)})
        boxes = np.asarray(out[g.outputs[0]], np.float32)[0]
        scores = np.asarray(out[g.outputs[1]], np.float32)[0]
        dets = nms(boxes, scores)
        used = set()
        n_gt += len(labels)
        for (x1, y1, x2, y2, cls) in labels:
            best_iou, best_j = 0.0, None
            for j, (s, c, bx) in enumerate(dets):
                if j in used or c != cls:
                    continue
                iou = float(_iou(np.array([x1, y1, x2, y2]), bx[None])[0])
                if iou > best_iou:
                    best_iou, best_j = iou, j
            if best_j is not None and best_iou >= 0.5:
                det_match += 1
                used.add(best_j)
                ious.append(best_iou)
                confs.append(dets[best_j][0])
        fps += len(dets) - len(used)
    return {"name": name, "n_gt": n_gt,
            "detection_rate": round(det_match / max(1, n_gt), 4),
            "mean_matched_iou": round(float(np.mean(ious)) if ious else 0.0,
                                      4),
            "mean_matched_conf": round(float(np.mean(confs)) if confs
                                       else 0.0, 4),
            "false_pos_per_scene": round(fps / len(scenes), 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "accuracy_report.json"))
    args = ap.parse_args()

    from anakin_tpu.quant import calibrate, quantize_graph

    g = train(args.steps)
    # rebuild at batch 1 for eval, injecting trained params
    g1 = build_yolo_v3_tiny(batch=1, image_size=S, num_classes=C,
                            width_mult=0.25, anchors1=ANCH1,
                            anchors2=ANCH2, conf_thresh=0.01, seed=0)
    g1.params = dict(g.params)
    g1 = ak.optimize(g1)

    rng = np.random.default_rng(1234)
    cal_scenes = [make_scene(rng) for _ in range(16)]
    eval_scenes = [make_scene(rng) for _ in range(96)]

    cal = [{"input": im[None], "img_size": np.full((1, 2), S, np.int32)}
           for im, _ in cal_scenes]
    r32 = evaluate(ak.Net(g1), g1, eval_scenes, "fp32")
    rows = {"fp32": r32}
    # both calibrators: max (the suite's quick path) and the KL entropy
    # calibrator (the reference's core algorithm, entropy_calibrator.cpp)
    for method in ("max", "entropy"):
        gq = quantize_graph(g1, calibrate(g1, cal, method=method))
        r8 = evaluate(ak.Net(gq), gq, eval_scenes, f"int8_{method}")
        r8["deltas"] = {
            "detection_rate_pp": round(100 * (r8["detection_rate"]
                                              - r32["detection_rate"]), 3),
            "mean_iou": round(r8["mean_matched_iou"]
                              - r32["mean_matched_iou"], 4),
            "mean_conf": round(r8["mean_matched_conf"]
                               - r32["mean_matched_conf"], 4),
        }
        rows[f"int8_{method}"] = r8
    section = {
        "model": f"yolo-v3-tiny width_mult=0.25 @ {S}px, {C} shape "
                 f"classes, trained {args.steps} steps on synthetic "
                 "labeled scenes via jax.grad through build_forward "
                 "(head convs tapped); eval vs GROUND TRUTH through the "
                 "full yolo_box decode + host NMS",
        **rows,
        "bar": "int8 detection-rate delta within 0.5pp-class discipline; "
               "matched-confidence delta is the score-collapse signal "
               "random weights could not measure (VERDICT r4 missing #3)",
    }
    report = json.load(open(args.out)) if os.path.exists(args.out) else {}
    report["detection_int8_trained"] = section
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(section, indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
