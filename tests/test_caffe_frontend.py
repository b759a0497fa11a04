"""Caffe importer golden tests.

Prototxt fixtures exercise the text-format path; weights travel through a
binary NetParameter exactly like a real .caffemodel.  Torch functional
ops are the independent numeric reference (mirrors the reference
converter's Caffe frontend, `tools/external_converter_v2/parser/caffe/`).
"""

import numpy as np
import torch
import torch.nn.functional as F

import anakin_tpu as ak
from anakin_tpu.tools.converter.caffe_frontend import from_caffe
from anakin_tpu.tools.converter.caffe_proto import caffe_pb2 as cp2


def write_model(tmp_path, prototxt: str, weights: dict):
    """weights: layer name -> list of numpy blobs."""
    pt = tmp_path / "deploy.prototxt"
    pt.write_text(prototxt)
    net = cp2.NetParameter()
    for name, blobs in weights.items():
        l = net.layer.add()
        l.name = name
        l.type = "_weights_"
        for arr in blobs:
            b = l.blobs.add()
            b.shape.dim.extend(arr.shape)
            b.data.extend(np.asarray(arr, np.float32).reshape(-1).tolist())
    cm = tmp_path / "model.caffemodel"
    cm.write_bytes(net.SerializeToString())
    return str(pt), str(cm)


def run_net(g, x_nchw):
    feeds = {}
    for e in g.inputs:
        v = x_nchw[e] if isinstance(x_nchw, dict) else x_nchw
        feeds[e] = v.transpose(0, 2, 3, 1) if v.ndim == 4 else v
    return ak.Net(g).prediction(feeds)


def test_classic_cnn(rng, tmp_path):
    """Conv + BatchNorm + Scale + in-place ReLU + Pool + IP + Softmax."""
    x = rng.standard_normal((2, 3, 12, 12), dtype=np.float32)
    w1 = rng.standard_normal((8, 3, 3, 3), dtype=np.float32) * 0.3
    b1 = rng.standard_normal(8, dtype=np.float32) * 0.1
    mean = rng.standard_normal(8).astype(np.float32) * 0.3
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    sf = np.array([0.999], np.float32)            # caffe scale factor blob
    g_ = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32) * 0.1
    wf = rng.standard_normal((5, 8 * 6 * 6), dtype=np.float32) * 0.1
    bf = rng.standard_normal(5, dtype=np.float32) * 0.1

    prototxt = """
name: "cnn"
layer { name: "data" type: "Input" top: "data"
  input_param { shape { dim: 2 dim: 3 dim: 12 dim: 12 } } }
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1 stride: 1 } }
layer { name: "bn1" type: "BatchNorm" bottom: "conv1" top: "conv1"
  batch_norm_param { eps: 1e-5 } }
layer { name: "scale1" type: "Scale" bottom: "conv1" top: "conv1"
  scale_param { bias_term: true } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "fc" type: "InnerProduct" bottom: "pool1" top: "fc"
  inner_product_param { num_output: 5 } }
layer { name: "prob" type: "Softmax" bottom: "fc" top: "prob" }
"""
    pt, cm = write_model(tmp_path, prototxt, {
        "conv1": [w1, b1], "bn1": [mean, var, sf],
        "scale1": [g_, beta], "fc": [wf, bf],
    })
    g = from_caffe(pt, cm)

    with torch.no_grad():
        t = torch.from_numpy
        y = F.conv2d(t(x), t(w1), t(b1), padding=1)
        y = F.batch_norm(y, t(mean / sf[0]), t(var / sf[0]), t(g_), t(beta),
                         eps=1e-5)
        y = F.max_pool2d(F.relu(y), 2)
        want = F.softmax(F.linear(y.flatten(1), t(wf), t(bf)), 1).numpy()

    got = np.asarray(run_net(g, x)[g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_eltwise_resnet_block(rng, tmp_path):
    x = rng.standard_normal((1, 4, 8, 8), dtype=np.float32)
    w = rng.standard_normal((4, 4, 3, 3), dtype=np.float32) * 0.2
    prototxt = """
name: "res"
input: "data"
input_shape { dim: 1 dim: 4 dim: 8 dim: 8 }
layer { name: "conv" type: "Convolution" bottom: "data" top: "conv"
  convolution_param { num_output: 4 kernel_size: 3 pad: 1 bias_term: false } }
layer { name: "sum" type: "Eltwise" bottom: "conv" bottom: "data" top: "sum"
  eltwise_param { operation: SUM coeff: 1.0 coeff: 0.5 } }
layer { name: "relu" type: "ReLU" bottom: "sum" top: "sum"
  relu_param { negative_slope: 0.1 } }
"""
    pt, cm = write_model(tmp_path, prototxt, {"conv": [w]})
    g = from_caffe(pt, cm)
    with torch.no_grad():
        t = torch.from_numpy
        y = F.conv2d(t(x), t(w), padding=1) + 0.5 * t(x)
        want = F.leaky_relu(y, 0.1).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(run_net(g, x)[g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_slice_concat_power_lrn(rng, tmp_path):
    x = rng.standard_normal((1, 6, 5, 5), dtype=np.float32)
    prototxt = """
name: "misc"
input: "data"
input_shape { dim: 1 dim: 6 dim: 5 dim: 5 }
layer { name: "sl" type: "Slice" bottom: "data" top: "a" top: "b"
  slice_param { axis: 1 slice_point: 2 } }
layer { name: "pw" type: "Power" bottom: "a" top: "pa"
  power_param { power: 2.0 scale: 0.5 shift: 1.0 } }
layer { name: "cc" type: "Concat" bottom: "pa" bottom: "b" top: "cc"
  concat_param { axis: 1 } }
layer { name: "lrn" type: "LRN" bottom: "cc" top: "out"
  lrn_param { local_size: 3 alpha: 0.001 beta: 0.5 } }
"""
    pt, _ = write_model(tmp_path, prototxt, {})
    g = from_caffe(pt)
    with torch.no_grad():
        t = torch.from_numpy(x)
        a, b = t[:, :2], t[:, 2:]
        pa = (1.0 + 0.5 * a) ** 2
        cc = torch.cat([pa, b], dim=1)
        want = F.local_response_norm(cc, 3, alpha=0.001, beta=0.5,
                                     k=1.0).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(run_net(g, x)[g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_deconv_crop(rng, tmp_path):
    """FCN-style Deconvolution upsample + Crop against a skip tensor."""
    x = rng.standard_normal((1, 3, 6, 6), dtype=np.float32)
    w = rng.standard_normal((3, 2, 4, 4), dtype=np.float32) * 0.2
    prototxt = """
name: "fcn"
input: "data"
input_shape { dim: 1 dim: 3 dim: 6 dim: 6 }
layer { name: "pool" type: "Pooling" bottom: "data" top: "pool"
  pooling_param { pool: AVE kernel_size: 2 stride: 2 } }
layer { name: "up" type: "Deconvolution" bottom: "pool" top: "up"
  convolution_param { num_output: 2 kernel_size: 4 stride: 2
                      bias_term: false } }
layer { name: "crop" type: "Crop" bottom: "up" bottom: "data" top: "out"
  crop_param { axis: 2 offset: 1 } }
"""
    pt, cm = write_model(tmp_path, prototxt, {"up": [w]})
    g = from_caffe(pt, cm)
    with torch.no_grad():
        t = torch.from_numpy
        y = F.avg_pool2d(t(x), 2)
        y = F.conv_transpose2d(y, t(w), stride=2)     # (1, 2, 8, 8)
        want = y[:, :, 1:7, 1:7].numpy().transpose(0, 2, 3, 1)
    got = np.asarray(run_net(g, x)[g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ssd_head(rng, tmp_path):
    """SSD-fork layers: Normalize, Permute, Flatten, PriorBox,
    DetectionOutput — the flagship Anakin deployment graph shape."""
    x = rng.standard_normal((1, 8, 4, 4), dtype=np.float32)
    norm_scale = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    w_loc = rng.standard_normal((12, 8, 3, 3), dtype=np.float32) * 0.05   # 3 boxes x 4
    w_conf = rng.standard_normal((9, 8, 3, 3), dtype=np.float32) * 0.05   # 3 boxes x 3 cls
    prototxt = """
name: "ssd_head"
input: "data"
input_shape { dim: 1 dim: 8 dim: 4 dim: 4 }
layer { name: "norm" type: "Normalize" bottom: "data" top: "norm"
  norm_param { across_spatial: false channel_shared: false } }
layer { name: "loc" type: "Convolution" bottom: "norm" top: "loc"
  convolution_param { num_output: 12 kernel_size: 3 pad: 1
                      bias_term: false } }
layer { name: "conf" type: "Convolution" bottom: "norm" top: "conf"
  convolution_param { num_output: 9 kernel_size: 3 pad: 1
                      bias_term: false } }
layer { name: "loc_perm" type: "Permute" bottom: "loc" top: "loc_perm"
  permute_param { order: 0 order: 2 order: 3 order: 1 } }
layer { name: "loc_flat" type: "Flatten" bottom: "loc_perm" top: "loc_flat"
  flatten_param { axis: 1 } }
layer { name: "conf_perm" type: "Permute" bottom: "conf" top: "conf_perm"
  permute_param { order: 0 order: 2 order: 3 order: 1 } }
layer { name: "conf_flat" type: "Flatten" bottom: "conf_perm"
  top: "conf_flat" flatten_param { axis: 1 } }
layer { name: "conf_soft" type: "Softmax" bottom: "conf_flat"
  top: "conf_soft" softmax_param { axis: 1 } }
layer { name: "prior" type: "PriorBox" bottom: "data" top: "prior"
  prior_box_param { min_size: 30.0 max_size: 60.0 aspect_ratio: 2.0
    flip: false clip: false variance: 0.1 variance: 0.1 variance: 0.2
    variance: 0.2 img_size: 64 step: 16.0 offset: 0.5 } }
layer { name: "det" type: "DetectionOutput" bottom: "loc_flat"
  bottom: "conf_soft" bottom: "prior" top: "det"
  detection_output_param { num_classes: 3 share_location: true
    background_label_id: 0 code_type: CENTER_SIZE keep_top_k: 10
    confidence_threshold: 0.01
    nms_param { nms_threshold: 0.45 top_k: 20 } } }
"""
    pt, cm = write_model(tmp_path, prototxt, {
        "norm": [norm_scale], "loc": [w_loc], "conf": [w_conf]})
    g = from_caffe(pt, cm)
    # num_priors = 4*4 locations x 3 boxes (min, sqrt(min*max), ar=2)
    res = run_net(g, x)
    det = np.asarray(res[g.outputs[0]])
    assert det.shape == (1, 10, 7)
    # scores are sorted desc and valid rows have label in {1, 2}
    scores = det[0, :, 2]
    valid = scores > 0
    assert valid.any()
    assert np.all(np.diff(scores[valid]) <= 1e-6)
    labels = det[0, valid, 1]
    assert set(labels.astype(int).tolist()) <= {1, 2}
    # priorbox numerics: first box centered at (8, 8) with size 30
    prior_edge = [e for e in res if "priorbox" in e or "prior" in e]
    # (priorbox output is interior; recompute via a direct import instead)
    boxes = None
    for node in g.nodes.values():
        if node.op == "priorbox":
            from anakin_tpu.ops import get_op
            import jax.numpy as jnp
            feat = jnp.zeros((1, 4, 4, 8), jnp.float32)
            boxes = np.asarray(get_op("priorbox")(node, [feat])[0])
    assert boxes is not None and boxes.shape == (1, 2, 4 * 4 * 3 * 4)
    first = boxes[0, 0, :4] * 64.0
    np.testing.assert_allclose(first, [8 - 15, 8 - 15, 8 + 15, 8 + 15],
                               atol=1e-4)


def test_converter_cli_caffe(rng, tmp_path):
    import yaml

    from anakin_tpu.model_io import load_model
    from anakin_tpu.tools.converter.converter import convert

    x = rng.standard_normal((1, 3, 8, 8), dtype=np.float32)
    w = rng.standard_normal((4, 3, 3, 3), dtype=np.float32) * 0.3
    prototxt = """
name: "tiny"
input: "data"
input_shape { dim: 1 dim: 3 dim: 8 dim: 8 }
layer { name: "conv" type: "Convolution" bottom: "data" top: "conv"
  convolution_param { num_output: 4 kernel_size: 3 pad: 1
                      bias_term: false } }
layer { name: "relu" type: "ReLU" bottom: "conv" top: "conv" }
"""
    pt, cm = write_model(tmp_path, prototxt, {"conv": [w]})
    cfg = {"TargetFramework": "CAFFE", "PrototxtPath": pt, "ModelPath": cm,
           "Output": str(tmp_path / "out"), "Optimize": True}
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = convert(str(cfg_path))
    g = load_model(out)
    with torch.no_grad():
        want = F.relu(F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                               padding=1)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(run_net(g, x)[g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
