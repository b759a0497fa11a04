"""INT8 accuracy evidence (VERDICT round-1 item 8).

Three tiers, strongest available offline:

  A. REAL labeled data + trained model: a CNN is trained with torch on
     sklearn's digits set (1797 real labeled 8x8 images, shipped in the
     image), exported through torch's own ONNX serializer, imported with
     `from_onnx`, calibrated (both `max` and `entropy` methods) and
     int8-quantized.  Reported: absolute fp32/int8 top-1 on a held-out
     test split and the top-1 delta — the BASELINE.json metric
     ("INT8 top-1 within 0.5% of FP32"), measured for real.
  B. Logit-space proxy on the ResNet-50-class graph (random weights, no
     trained zoo offline): relative RMS logit error and top-1/top-5
     agreement across calibration methods.
  C. External set hook: ANAKIN_ACCURACY_DATA=/path/to/set.npz
     (arrays `images` [N,H,W,C] float32, `labels` [N]) runs the same
     fp32-vs-int8 comparison on user data (graceful skip when unset).

Writes artifacts/accuracy_report.json.  Methodology: docs/ACCURACY.md.
Reference analogs: `test/framework/net/model_int8_accuracy.cpp`,
`classification_accuracy.cpp`.
"""

import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_digits_cnn(epochs: int = 30, seed: int = 0):
    """Train a small CNN on sklearn digits with torch (CPU, seconds).
    Returns (torch model, (x_train, y_train, x_test, y_test)) with
    x as [N, 1, 8, 8] float32 in [0, 1]."""
    import torch
    from sklearn.datasets import load_digits
    from sklearn.model_selection import train_test_split

    torch.manual_seed(seed)
    d = load_digits()
    X = (d.images / 16.0).astype(np.float32)[:, None]          # [N,1,8,8]
    xtr, xte, ytr, yte = train_test_split(
        X, d.target.astype(np.int64), test_size=0.25, random_state=seed,
        stratify=d.target)

    model = torch.nn.Sequential(
        torch.nn.Conv2d(1, 16, 3, padding=1), torch.nn.ReLU(),
        torch.nn.MaxPool2d(2),
        torch.nn.Conv2d(16, 32, 3, padding=1), torch.nn.ReLU(),
        torch.nn.MaxPool2d(2),
        torch.nn.Flatten(),
        torch.nn.Linear(32 * 2 * 2, 64), torch.nn.ReLU(),
        torch.nn.Linear(64, 10),
    )
    opt = torch.optim.Adam(model.parameters(), lr=2e-3)
    xt = torch.from_numpy(xtr)
    yt = torch.from_numpy(ytr)
    for _ in range(epochs):
        perm = torch.randperm(len(xt))
        for i in range(0, len(xt), 128):
            idx = perm[i:i + 128]
            opt.zero_grad()
            loss = torch.nn.functional.cross_entropy(model(xt[idx]), yt[idx])
            loss.backward()
            opt.step()
    model.eval()
    return model, (xtr, ytr, xte, yte)


def import_torch_model(model, example_nchw):
    """torch -> ONNX bytes (torch's serializer) -> from_onnx Graph."""
    import torch

    from anakin_tpu.tools.converter.onnx_frontend import from_onnx
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = \
        lambda model_bytes, custom_opsets: model_bytes
    try:
        buf = io.BytesIO()
        torch.onnx.export(model, torch.from_numpy(example_nchw), buf,
                          opset_version=13, dynamo=False)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig
    return from_onnx(buf.getvalue())


def digits_accuracy(epochs: int = 30, methods=("max", "entropy"),
                    calib_batches: int = 4, seed: int = 0):
    """Tier A: absolute fp32/int8 top-1 on real held-out labeled digits."""
    import anakin_tpu as ak
    from anakin_tpu.quant import calibrate, quantize_graph

    model, (xtr, ytr, xte, yte) = train_digits_cnn(epochs, seed)
    g = ak.optimize(import_torch_model(model, xte[:16]))
    inp = g.inputs[0]

    def top1(graph, x):
        net = ak.Net(graph)
        xs = x.transpose(0, 2, 3, 1)                           # NCHW->NHWC
        y = np.asarray(net.prediction({inp: xs})[graph.outputs[0]])
        return y.argmax(-1)

    # torch-vs-imported parity sanity
    import torch

    with torch.no_grad():
        torch_top1 = model(torch.from_numpy(xte)).numpy().argmax(-1)
    fp_pred = top1(g, xte)
    parity = float((fp_pred == torch_top1).mean())

    fp32_top1 = float((fp_pred == yte).mean())
    rng = np.random.default_rng(seed)
    cal_idx = rng.permutation(len(xtr))[: calib_batches * 64]
    cal = [{inp: xtr[cal_idx[i:i + 64]].transpose(0, 2, 3, 1)}
           for i in range(0, len(cal_idx), 64)]
    rows = {"dataset": "sklearn digits (real labels, held-out 25%)",
            "test_samples": int(len(yte)),
            "import_parity_vs_torch": parity,
            "fp32_top1": fp32_top1, "methods": {}}
    for method in methods:
        scales = calibrate(g, cal, method=method)
        gq = quantize_graph(g, scales)
        q_pred = top1(gq, xte)
        rows["methods"][method] = {
            "int8_top1": float((q_pred == yte).mean()),
            "top1_delta": fp32_top1 - float((q_pred == yte).mean()),
            "top1_agreement_with_fp32": float((q_pred == fp_pred).mean()),
        }
    return rows


def composite_resnet_accuracy(methods=("max", "entropy"), n_test: int = 2500,
                              n_cal: int = 1024, seed: int = 0,
                              epochs: int = 14, n_train: int = 12000,
                              weights_path: str = None):
    """Tier A+ (round-3): REAL-weights 15-conv ResNet at genuine accuracy.

    Multi-digit composites (tools/composite_digits.py): four real glyphs
    on a noisy 32x32 canvas; top-1 = exact match of all four digits;
    test composites use glyphs the training set never saw.  The model is
    trained with torch, exported via torch's own ONNX serializer,
    imported with `from_onnx`, calibrated on held-out composites and
    int8-quantized — the reference's converted-model accuracy loop
    (`test/framework/net/model_int8_accuracy.cpp`) end to end.

    Also reports PER-LAYER error growth: relative RMS between the fp32
    and int8 activations at every conv output, in depth order — the
    50-layer error-accumulation question the round-2 verdict said the
    digits toy could not answer.
    """
    import anakin_tpu as ak
    from anakin_tpu.quant import calibrate, quantize_graph

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from composite_digits import (exact_match, make_composites,
                                  per_digit_acc, train_or_load)

    weights = weights_path or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        os.pardir, "artifacts", "composite_resnet15.pt")
    model, (pool_tr, pool_te) = train_or_load(
        weights, n_train=n_train, epochs=epochs, seed=seed, verbose=True)
    # fresh generator stream: calib/test composites are combinations the
    # training stream (default_rng(seed)) never produced, and test glyphs
    # come from the held-out pool regardless
    rng = np.random.default_rng(seed + 1)
    xte, yte = make_composites(pool_te, n_test, rng)
    xcal, _ = make_composites(pool_tr, n_cal, rng)

    g = ak.optimize(import_torch_model(model, xte[:16]))
    inp = g.inputs[0]
    out_edge = g.outputs[0]

    def logits(graph, x, bs=250):
        net = ak.Net(graph)
        ys = [np.asarray(net.prediction(
            {inp: x[i:i + bs].transpose(0, 2, 3, 1)})[graph.outputs[0]],
            np.float32) for i in range(0, len(x), bs)]
        return np.concatenate(ys)

    import torch

    with torch.no_grad():
        lt = model(torch.from_numpy(xte)).numpy()
    lf = logits(g, xte)
    parity_pred = float((exact_match(lf, yte) == exact_match(lt, yte)).mean())
    parity_rms = float(np.linalg.norm(lf - lt) / np.linalg.norm(lt))
    fp_em = float(exact_match(lf, yte).mean())

    cal = [{inp: xcal[i:i + 64].transpose(0, 2, 3, 1)}
           for i in range(0, len(xcal), 64)]
    conv_nodes = [n for n in g.nodes.values()
                  if n.op in ("conv2d", "dense")]
    rows = {
        "task": "4-digit composites, 32x32, held-out glyphs; top-1 = "
                "exact match of all 4 digits",
        "model": "ResNet-topology, 15 convs + dense head, BN-folded, "
                 "residual blocks (tools/composite_digits.py)",
        "conv_layers": len(conv_nodes),
        "train": {"n_train": n_train, "epochs": epochs,
                  "glyph_pools": "disjoint 75/25 split of 1797 real glyphs"},
        "test_samples": int(len(yte)),
        "import_parity_vs_torch": {"exact_match_agreement": parity_pred,
                                   "logit_rel_rms": parity_rms},
        "fp32_exact_match": fp_em,
        "fp32_per_digit": per_digit_acc(lf, yte),
        "methods": {},
        "per_layer_error_growth": {},
    }

    tap_edges = [n.outputs[0] for n in conv_nodes]
    xprobe = xte[:256].transpose(0, 2, 3, 1)
    net_fp_tap = ak.Net(g, tap_edges=tap_edges)
    taps_fp = net_fp_tap.prediction({inp: xprobe})

    for method in methods:
        scales = calibrate(g, cal, method=method)
        gq = quantize_graph(g, scales)
        lq = logits(gq, xte)
        q_em = float(exact_match(lq, yte).mean())
        rows["methods"][method] = {
            "int8_exact_match": q_em,
            "top1_delta": fp_em - q_em,
            "int8_per_digit": per_digit_acc(lq, yte),
            "exact_match_agreement_with_fp32": float(
                (exact_match(lq, yte) == exact_match(lf, yte)).mean()),
            "n_int8_nodes": sum(1 for n in gq.nodes.values()
                                if n.op.endswith("_int8")),
        }
        # per-layer error growth in depth order
        net_q_tap = ak.Net(gq, tap_edges=tap_edges)
        taps_q = net_q_tap.prediction({inp: xprobe})
        growth = []
        for node, edge in zip(conv_nodes, tap_edges):
            f = np.asarray(taps_fp[edge], np.float32)
            qv = np.asarray(taps_q[edge])
            if qv.dtype == np.int8:
                qv = qv.astype(np.float32) * float(gq.scales[edge])
            else:
                qv = qv.astype(np.float32)
            rel = float(np.linalg.norm(qv - f) /
                        max(np.linalg.norm(f), 1e-9))
            growth.append({"layer": node.name,
                           "op": gq.nodes[node.name].op,
                           "rel_rms": rel})
        rows["per_layer_error_growth"][method] = growth
    return rows


def logit_proxy(methods=("max", "entropy"), image_size: int = 64,
                n_batches: int = 4, batch: int = 8, seed: int = 0):
    """Tier B: logit-space error distribution on ResNet-50-class graphs."""
    import anakin_tpu as ak
    from anakin_tpu.models import build_resnet50
    from anakin_tpu.quant import calibrate, quantize_graph

    rng = np.random.default_rng(seed)
    g = ak.optimize(build_resnet50(batch=batch, image_size=image_size))
    xs = [rng.normal(size=(batch, image_size, image_size, 3)).astype(np.float32)
          for _ in range(n_batches)]
    cal = [{"input": x} for x in xs[:2]]

    def logits_edge(graph):
        # PRE-softmax logits: random-weight nets saturate the softmax to
        # exact one-hots, which would hide all quantization error
        out_node = [n for n in graph.nodes.values()
                    if graph.outputs[0] in n.outputs][0]
        assert out_node.op == "softmax"
        return out_node.inputs[0]

    fp_edge = logits_edge(g)
    net_fp = ak.Net(g, tap_edges=[fp_edge])
    rows = {"model": f"resnet50 random weights @ {image_size}",
            "compared": "pre-softmax logits",
            "methods": {}}
    for method in methods:
        gq = quantize_graph(g, calibrate(g, cal, method=method))
        q_edge = logits_edge(gq)
        net_q = ak.Net(gq, tap_edges=[q_edge])
        rel_errs, agree1, agree5 = [], [], []
        for x in xs:
            yf = np.asarray(net_fp.prediction({"input": x})[fp_edge],
                            np.float32)
            yq = np.asarray(net_q.prediction({"input": x})[q_edge],
                            np.float32)
            rel_errs.append(np.linalg.norm(yq - yf, axis=-1)
                            / np.maximum(np.linalg.norm(yf, axis=-1), 1e-9))
            agree1.append(yf.argmax(-1) == yq.argmax(-1))
            for r in range(yf.shape[0]):
                t5f = set(np.argsort(-yf[r])[:5])
                t5q = set(np.argsort(-yq[r])[:5])
                agree5.append(len(t5f & t5q) / 5.0)
        re = np.concatenate(rel_errs)
        rows["methods"][method] = {
            "logit_rel_rms_p50": float(np.percentile(re, 50)),
            "logit_rel_rms_p95": float(np.percentile(re, 95)),
            "logit_rel_rms_max": float(re.max()),
            "top1_agreement": float(np.concatenate(agree1).mean()),
            "top5_overlap": float(np.mean(agree5)),
        }
    return rows


def env_dataset(methods=("max",)):
    """Tier C: ANAKIN_ACCURACY_DATA=.npz with images/labels."""
    path = os.environ.get("ANAKIN_ACCURACY_DATA")
    if not path or not os.path.exists(path):
        return {"skipped": "set ANAKIN_ACCURACY_DATA=/path/set.npz "
                           "(images [N,H,W,C] float32, labels [N])"}
    import anakin_tpu as ak
    from anakin_tpu.models import build_resnet50
    from anakin_tpu.quant import calibrate, quantize_graph
    from anakin_tpu.tools.accuracy import compare_accuracy

    d = np.load(path)
    images, labels = d["images"], d["labels"]
    size = images.shape[1]
    b = 8
    g = ak.optimize(build_resnet50(batch=b, image_size=size,
                                   num_classes=int(labels.max()) + 1))
    batches = [{"input": images[i:i + b]}
               for i in range(0, len(images) - b + 1, b)]
    labs = [labels[i:i + b] for i in range(0, len(images) - b + 1, b)]
    gq = quantize_graph(g, calibrate(g, batches[:4], method=methods[0]))
    return compare_accuracy(g, gq, batches, labs)


def main(out_path):
    report = {
        "composite_resnet15": composite_resnet_accuracy(),
        "real_labeled_digits": digits_accuracy(),
        "logit_proxy_resnet50": logit_proxy(),
        "env_dataset": env_dataset(),
    }
    c = report["composite_resnet15"]
    print(f"composite fp32 exact-match: {c['fp32_exact_match']:.4f}")
    for m, r in c["methods"].items():
        print(f"  int8[{m}]: exact-match {r['int8_exact_match']:.4f} "
              f"(delta {r['top1_delta']:+.4f})")
    a = report["real_labeled_digits"]
    print(f"digits fp32 top-1: {a['fp32_top1']:.4f}")
    for m, r in a["methods"].items():
        print(f"  int8[{m}]: top-1 {r['int8_top1']:.4f} "
              f"(delta {r['top1_delta']:+.4f})")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:]]
    if "--cpu" in argv:
        # accuracy is platform-independent; CPU keeps the TPU free (env-var
        # JAX_PLATFORMS is overridden by the axon plugin — CLAUDE.md)
        argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    main(argv[0] if argv else
         os.path.join(os.path.dirname(__file__), os.pardir, "artifacts",
                      "accuracy_report.json"))
