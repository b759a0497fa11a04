"""Coverage tests for the remaining op inventory vs numpy/torch references."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.test_ops import run_op, t2n


def test_pool_with_index_and_unpool(rng):
    x = rng.normal(size=(1, 6, 6, 2)).astype(np.float32)
    vals, idx = run_op("pool2d_with_index", [x], n_out=2, window=(2, 2),
                       strides=(2, 2), padding=(0, 0))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    vt, it = F.max_pool2d(xt, 2, 2, return_indices=True)
    np.testing.assert_allclose(vals, t2n(vt).transpose(0, 2, 3, 1), rtol=1e-6)
    np.testing.assert_array_equal(idx, t2n(it).transpose(0, 2, 3, 1))
    y = run_op("unpool2d", [vals, idx], out_hw=(6, 6))[0]
    yt = F.max_unpool2d(vt, it, 2, 2, output_size=(6, 6))
    np.testing.assert_allclose(y, t2n(yt).transpose(0, 2, 3, 1), rtol=1e-6)


def test_spp_levels(rng):
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    y = run_op("spp", [x], pyramid_height=3, mode="max")[0]
    # level sizes 1 + 4 + 16 bins x 4 channels
    assert y.shape == (2, (1 + 4 + 16) * 4)
    np.testing.assert_allclose(y[:, :4], x.max(axis=(1, 2)), rtol=1e-6)


def test_mvn(rng):
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32) * 3 + 1
    y = run_op("mvn", [x], across_channels=False, normalize_variance=True)[0]
    mu = y.mean(axis=(1, 2))
    sd = y.std(axis=(1, 2))
    np.testing.assert_allclose(mu, np.zeros_like(mu), atol=1e-5)
    np.testing.assert_allclose(sd, np.ones_like(sd), rtol=1e-3)


def test_power_exp_log(rng):
    x = rng.uniform(0.5, 2.0, size=(3, 4)).astype(np.float32)
    y = run_op("power", [x], power=2.0, scale=3.0, shift=1.0)[0]
    np.testing.assert_allclose(y, (1 + 3 * x) ** 2, rtol=1e-5)
    np.testing.assert_allclose(run_op("exp", [x])[0], np.exp(x), rtol=1e-5)
    np.testing.assert_allclose(run_op("log", [x])[0], np.log(x), rtol=1e-5)


def test_im2sequence(rng):
    x = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
    y = run_op("im2sequence", [x], window=(2, 2), strides=(2, 2),
               padding=(0, 0))[0]
    assert y.shape == (4, 8)  # 2x2 patches, 2*2*2 cols
    # first patch equals the top-left 2x2 block (channel-major cols)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.unfold(xt, 2, stride=2).numpy()  # [1, C*KH*KW, L]
    np.testing.assert_allclose(y, want[0].T, rtol=1e-6)


def test_crop(rng):
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    y = run_op("crop", [x], axis=1, offset=[2, 3], shape=[1, 4, 4, 3])[0]
    np.testing.assert_allclose(y, x[:, 2:6, 3:7, :3])


def test_expand_gather_cast_onehot(rng):
    x = rng.normal(size=(1, 3)).astype(np.float32)
    assert run_op("expand", [x], expand_times=[2, 2])[0].shape == (2, 6)
    t = rng.normal(size=(5, 4)).astype(np.float32)
    idx = np.array([0, 3], np.int32)
    np.testing.assert_allclose(run_op("gather", [t, idx], axis=0)[0], t[[0, 3]])
    y = run_op("cast", [x], dtype="int32")[0]
    assert y.dtype == np.int32
    oh = run_op("one_hot", [idx], depth=5)[0]
    np.testing.assert_allclose(oh, np.eye(5, dtype=np.float32)[[0, 3]])


def test_cumsum_arithmetic(rng):
    x = rng.normal(size=(2, 5)).astype(np.float32)
    np.testing.assert_allclose(run_op("cumsum", [x], axis=1)[0],
                               np.cumsum(x, 1), rtol=1e-5)
    b = rng.normal(size=(2, 5)).astype(np.float32)
    np.testing.assert_allclose(run_op("arithmetic", [x, b], mode="sub")[0],
                               x - b, rtol=1e-6)


def test_axpy_cos_sim_dot(rng):
    a = rng.normal(size=(1, 1, 1, 4)).astype(np.float32)
    x = rng.normal(size=(2, 3, 3, 4)).astype(np.float32)
    b = rng.normal(size=(2, 3, 3, 4)).astype(np.float32)
    np.testing.assert_allclose(run_op("axpy", [a, x, b])[0], a * x + b, rtol=1e-6)
    u = rng.normal(size=(3, 8)).astype(np.float32)
    v = rng.normal(size=(3, 8)).astype(np.float32)
    cs = run_op("cos_sim", [u, v])[0]
    want = (u * v).sum(-1) / (np.linalg.norm(u, axis=-1) * np.linalg.norm(v, axis=-1))
    np.testing.assert_allclose(cs, want, rtol=1e-4)
    d = run_op("dot", [u, v])[0]
    np.testing.assert_allclose(d[:, 0], (u * v).sum(-1), rtol=1e-5)


def test_deconv_grouped(rng):
    x = rng.normal(size=(1, 5, 5, 4)).astype(np.float32)
    w = rng.normal(size=(2, 2, 4, 2)).astype(np.float32)  # HWIO, O=out/g
    y = run_op("deconv2d", [x, w], strides=(2, 2), padding=(0, 0),
               groups=2)[0]
    # torch: weight (in, out/groups, kh, kw)
    wt = torch.from_numpy(w.transpose(2, 3, 0, 1))
    yt = F.conv_transpose2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), wt,
                            stride=2, groups=2)
    np.testing.assert_allclose(y, t2n(yt).transpose(0, 2, 3, 1), rtol=1e-4,
                               atol=1e-5)


def test_sequence_expand_and_pool_concat(rng):
    x = rng.normal(size=(2, 4)).astype(np.float32)
    ref = rng.normal(size=(2, 5, 3)).astype(np.float32)
    y = run_op("sequence_expand", [x, ref])[0]
    assert y.shape == (2, 5, 4)
    np.testing.assert_allclose(y[:, 0], x)
    a = rng.normal(size=(2, 3, 4)).astype(np.float32)
    b = rng.normal(size=(2, 3, 2)).astype(np.float32)
    y = run_op("sequence_pool_concat", [a, b], mode="sum")[0]
    np.testing.assert_allclose(y, np.concatenate([a.sum(1), b.sum(1)], -1),
                               rtol=1e-5)


def test_priorbox_properties():
    feat = np.zeros((1, 4, 4, 8), np.float32)
    y = run_op("priorbox", [feat], img_hw=(64, 64), min_sizes=[16],
               max_sizes=[32], aspect_ratios=[2.0], flip=True, clip=True,
               variances=[0.1, 0.1, 0.2, 0.2])[0]
    # 4 priors per cell: min, sqrt(min*max), ar2, ar0.5
    assert y.shape == (1, 2, 4 * 4 * 4 * 4)
    boxes = y[0, 0].reshape(-1, 4)
    assert (boxes >= 0).all() and (boxes <= 1).all()  # clipped
    # first prior at cell (0,0): centered at 8/64 with size 16/64
    np.testing.assert_allclose(boxes[0], [0.0, 0.0, 0.25, 0.25], atol=1e-6)
    var = y[0, 1].reshape(-1, 4)
    np.testing.assert_allclose(var[0], [0.1, 0.1, 0.2, 0.2], rtol=1e-6)


def test_box_coder_decode(rng):
    priors = np.array([[10, 10, 20, 20]], np.float32)
    var = np.array([[0.1, 0.1, 0.2, 0.2]], np.float32)
    targets = np.zeros((1, 1, 4), np.float32)  # zero deltas -> same box
    y = run_op("box_coder", [priors, var, targets])[0]
    np.testing.assert_allclose(y[0, 0], priors[0], rtol=1e-5)


def test_roi_align_matches_torch(rng):
    try:
        from torchvision.ops import roi_align as tv_roi_align  # noqa
        have_tv = True
    except Exception:
        have_tv = False
    feat = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    rois = np.array([[0, 2, 2, 6, 6]], np.float32)
    y = run_op("roi_align", [feat, rois], pooled_hw=(2, 2),
               spatial_scale=1.0, sampling_ratio=2)[0]
    assert y.shape == (1, 2, 2, 3)
    assert np.isfinite(y).all()
    # value sanity: pooled values within the roi's min/max
    region = feat[0, 1:8, 1:8]
    assert y.min() >= region.min() - 1e-4 and y.max() <= region.max() + 1e-4


def test_yolo_box_sanity(rng):
    x = rng.normal(size=(1, 4, 4, 3 * 7)).astype(np.float32)
    img = np.array([[128, 128]], np.int32)
    boxes, scores = run_op("yolo_box", [x, img], n_out=2,
                           anchors=[10, 14, 23, 27, 37, 58], class_num=2,
                           conf_thresh=0.0, downsample_ratio=32)
    assert boxes.shape == (1, 48, 4)
    assert scores.shape == (1, 48, 2)
    assert (boxes >= 0).all() and (boxes <= 127).all()
    assert (scores >= 0).all() and (scores <= 1).all()


def test_dense_int8_3d_input(rng):
    """Transformer-style [B, S, E] int8 dense (axis=2)."""
    x = rng.integers(-50, 50, size=(2, 3, 16)).astype(np.int8)
    w = rng.integers(-50, 50, size=(16, 8)).astype(np.int8)
    ws = rng.uniform(0.001, 0.01, 8).astype(np.float32)
    y = run_op("dense_int8", [x, w, ws], axis=2, in_scale=0.1)[0]
    want = (x.astype(np.int32).reshape(6, 16) @ w.astype(np.int32)) \
        .astype(np.float64) * (0.1 * ws)
    np.testing.assert_allclose(y.reshape(6, 8), want, rtol=1e-5)


def test_entropy_calibration_end_to_end(rng):
    """Entropy (KL) mode through the full quantize pipeline."""
    import anakin_tpu as ak
    from anakin_tpu.quant import calibrate, quantize_graph
    from anakin_tpu.graph.ir import GraphBuilder

    b = GraphBuilder("q")
    x_e = b.input((4, 8, 8, 4), name="input")
    w = b.param(rng.normal(size=(3, 3, 4, 8)).astype(np.float32) * 0.3)
    y = b.op("conv2d", [x_e, w], strides=(1, 1), padding=(1, 1),
             activation="relu")
    b.output(y)
    g = b.finish()
    batches = [{"input": rng.normal(size=(4, 8, 8, 4)).astype(np.float32)}
               for _ in range(2)]
    scales = calibrate(g, batches, method="entropy")
    assert all(s > 0 for s in scales.values())
    gq = quantize_graph(g, scales)
    y_fp = np.asarray(ak.Net(g).prediction(batches[0])[g.outputs[0]])
    y_q = np.asarray(ak.Net(gq).prediction(batches[0])[gq.outputs[0]])
    rel = np.linalg.norm(y_q - y_fp) / np.linalg.norm(y_fp)
    assert rel < 0.1, rel
