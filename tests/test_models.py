"""Model zoo end-to-end tests (reference analogs: `net_exec_test*.cpp`,
`yolo_v3_test`, RNN workload tests)."""

import numpy as np
import pytest

import anakin_tpu as ak
from anakin_tpu.models import build_vgg16
from anakin_tpu.models.detection import build_ssd_vgg16, build_yolo_v3_tiny
from anakin_tpu.models.lstm_lm import (
    build_lstm_lm,
    build_ner_tagger,
    build_text_classifier,
)


def test_vgg16_forward(rng):
    g = ak.optimize(build_vgg16(batch=1, image_size=32))
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    y = np.asarray(ak.Net(g).prediction({"input": x})[g.outputs[0]])
    assert y.shape == (1, 1000)
    np.testing.assert_allclose(y.sum(), 1.0, rtol=1e-4)


def test_lstm_lm_forward(rng):
    g = build_lstm_lm(batch=2, seq_len=8, vocab=100, embed=16, hidden=32,
                      layers=2)
    ids = rng.integers(0, 100, size=(2, 8)).astype(np.int32)
    lengths = np.array([8, 5], np.int32)
    y = np.asarray(ak.Net(g).prediction({"input": ids, "lengths": lengths})[g.outputs[0]])
    assert y.shape == (2, 8, 100)
    np.testing.assert_allclose(y.sum(-1), np.ones((2, 8)), rtol=1e-4)


def test_text_classifier_forward(rng):
    g = build_text_classifier(batch=3, seq_len=10, vocab=50, embed=8,
                              hidden=16, num_classes=4)
    ids = rng.integers(0, 50, size=(3, 10)).astype(np.int32)
    lengths = np.array([10, 4, 7], np.int32)
    y = np.asarray(ak.Net(g).prediction({"input": ids, "lengths": lengths})[g.outputs[0]])
    assert y.shape == (3, 4)
    np.testing.assert_allclose(y.sum(-1), np.ones(3), rtol=1e-4)


def test_ner_tagger_forward(rng):
    g = build_ner_tagger(batch=2, seq_len=6, vocab=30, embed=8, hidden=8,
                         num_tags=5)
    ids = rng.integers(0, 30, size=(2, 6)).astype(np.int32)
    lengths = np.array([6, 3], np.int32)
    tags = np.asarray(ak.Net(g).prediction({"input": ids, "lengths": lengths})[g.outputs[0]])
    assert tags.shape == (2, 6)
    assert tags.dtype == np.int32
    assert ((tags >= 0) & (tags < 5)).all()


def test_ssd_vgg16_forward(rng):
    # 300px is the real SSD geometry: the extra layers need the ceil-mode
    # 75->38 pooling to keep spatial dims alive through conv10/conv11
    g = build_ssd_vgg16(batch=1, image_size=300, num_classes=4)
    go = ak.optimize(g)
    x = rng.normal(size=(1, 300, 300, 3)).astype(np.float32)
    det = np.asarray(ak.Net(go).prediction({"input": x})[go.outputs[0]])
    assert det.shape == (1, 200, 7)
    # valid rows have score in (0, 1], invalid rows are -1
    scores = det[0, :, 2]
    valid = scores > 0
    assert valid.any()
    assert (scores[valid] <= 1.0).all()
    assert (det[0, ~valid, 2] == -1).all()


def test_yolo_v3_tiny_forward(rng):
    g = build_yolo_v3_tiny(batch=1, image_size=160, num_classes=5)
    go = ak.optimize(g)
    x = rng.normal(size=(1, 160, 160, 3)).astype(np.float32)
    img = np.array([[160, 160]], np.int32)
    out = ak.Net(go).prediction({"input": x, "img_size": img})
    boxes = np.asarray(out[go.outputs[0]])
    scores = np.asarray(out[go.outputs[1]])
    assert boxes.shape[0] == 1 and boxes.shape[2] == 4
    assert scores.shape[2] == 5
    assert boxes.shape[1] == scores.shape[1]
    assert (boxes >= 0).all() and (boxes <= 160).all()


def test_nms_padded_basics():
    from anakin_tpu.ops.detection import nms_padded
    import jax.numpy as jnp

    boxes = jnp.asarray([
        [0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30], [50, 50, 60, 60],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.1], jnp.float32)
    idx, valid = nms_padded(boxes, scores, max_out=3, iou_threshold=0.5,
                            score_threshold=0.2)
    idx = np.asarray(idx)
    valid = np.asarray(valid)
    assert idx[0] == 0          # best box kept
    assert 1 not in idx[valid]  # suppressed by overlap with 0
    assert 2 in idx[valid]      # disjoint box kept
    assert 3 not in idx[valid]  # below score threshold


def test_googlenet_forward(rng):
    from anakin_tpu.models import build_googlenet

    g = ak.optimize(build_googlenet(batch=1, image_size=128, num_classes=50))
    x = rng.normal(size=(1, 128, 128, 3)).astype(np.float32)
    y = np.asarray(ak.Net(g, precision="bf16").prediction({"input": x})[g.outputs[0]])
    assert y.shape == (1, 50)
    np.testing.assert_allclose(float(y.astype(np.float32).sum()), 1.0, rtol=2e-2)


def test_shufflenet_forward(rng):
    from anakin_tpu.models import build_shufflenet_v1

    g0 = build_shufflenet_v1(batch=1, image_size=64, num_classes=20)
    g = ak.optimize(g0)
    # shuffle units fused: BN/scale folded into the grouped convs
    assert "batch_norm" not in [n.op for n in g.nodes.values()]
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    y0 = np.asarray(ak.Net(g0).prediction({"input": x})[g0.outputs[0]])
    y1 = np.asarray(ak.Net(g).prediction({"input": x})[g.outputs[0]])
    np.testing.assert_allclose(y0, y1, rtol=5e-3, atol=1e-4)


def test_faster_rcnn_lite_forward(rng):
    from anakin_tpu.models import build_faster_rcnn_lite

    g = ak.optimize(build_faster_rcnn_lite(batch=1, image_size=128,
                                           num_classes=4, post_nms_top_n=16))
    x = rng.normal(size=(1, 128, 128, 3)).astype(np.float32)
    info = np.array([[128, 128, 1.0]], np.float32)
    out = ak.Net(g).prediction({"input": x, "im_info": info})
    det = np.asarray(out[g.outputs[0]])
    assert det.shape == (16, 7)  # rois(5) + cls(1) + conf(1)
    assert np.isfinite(det).all()


def test_detection_model_sharded(rng):
    """Detection graph under GSPMD weight sharding on the virtual mesh
    (BASELINE config: detection graph sharded across a pod slice)."""
    from anakin_tpu.models import build_yolo_v3_tiny
    from anakin_tpu.parallel import make_mesh, shard_graph_params

    g = ak.optimize(build_yolo_v3_tiny(batch=2, image_size=160, num_classes=5))
    x = rng.normal(size=(2, 160, 160, 3)).astype(np.float32)
    img = np.array([[160, 160], [160, 160]], np.int32)
    want = np.asarray(ak.Net(g).prediction(
        {"input": x, "img_size": img})[g.outputs[0]])
    mesh = make_mesh(model=2)
    net = ak.Net(g, param_sharding=shard_graph_params(g, mesh), mesh=mesh)
    got = np.asarray(net.prediction(
        {"input": x, "img_size": img})[g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rms_norm_matches_torch(rng):
    """rms_norm op vs torch.nn.functional.rms_norm (independent functor)."""
    import numpy as np
    import torch

    from anakin_tpu.graph.ir import Node
    from anakin_tpu.ops import get_op

    x = rng.normal(size=(2, 5, 32)).astype(np.float32)
    g = rng.normal(size=(32,)).astype(np.float32) + 1.0
    node = Node("n", "rms_norm", [], [], {"eps": 1e-6})
    import jax.numpy as jnp

    y = np.asarray(get_op("rms_norm")(node, [jnp.asarray(x),
                                             jnp.asarray(g)])[0])
    want = torch.nn.functional.rms_norm(
        torch.from_numpy(x), (32,), torch.from_numpy(g), eps=1e-6).numpy()
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-6)


def test_llama_class_transformer_family(rng):
    """Round-5: the llama-class recipe (RMSNorm + SwiGLU) flows through
    every surface the GPT-class one does — prefill/decode/verify graph
    consistency via the DecodeScheduler-vs-GenerationSession token
    parity, plus the w4 weight-only rewrite hitting the gate/up/down
    denses."""
    import numpy as np

    from anakin_tpu.models.transformer import (TransformerConfig,
                                               build_transformer_decode_step,
                                               make_transformer_params)
    from anakin_tpu.quant import weight_only_quantize
    from anakin_tpu.runtime.decode_scheduler import DecodeScheduler
    from anakin_tpu.runtime.generate import GenerationSession

    cfg = TransformerConfig(vocab=48, embed=64, heads=4, kv_heads=2,
                            layers=2, max_seq=48, norm="rms", mlp="swiglu")
    params = make_transformer_params(cfg, 5)
    assert "l0.mlp_gate" in params and "l0.ln1_b" not in params

    prompts = [rng.integers(0, 48, (p,)).astype(np.int32) for p in (4, 7)]
    sched = DecodeScheduler(cfg, batch=2, params=params, fuse_window=4)
    try:
        futs = [sched.submit(p, max_new_tokens=6) for p in prompts]
        outs = [f.result(timeout=300) for f in futs]
        assert sched.fused_windows_run > 0
    finally:
        sched.close()
    solo = GenerationSession(cfg, batch=1, params=params)
    for p, got in zip(prompts, outs):
        want = solo.generate(p[None], max_new_tokens=6)[0]
        np.testing.assert_array_equal(got, want)

    g = build_transformer_decode_step(cfg, 1, params)
    gq = weight_only_quantize(g, bits=4, min_elems=1024)
    w4_edges = [n for n in gq.nodes.values() if n.op == "dense_w4"]
    assert len(w4_edges) >= 3 * cfg.layers   # up + gate + down per layer
