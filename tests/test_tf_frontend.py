"""TF importer golden tests.

Fixtures are frozen GraphDef .pb files written with the self-contained
schema (Const-folded weights, Identity read nodes, SAME/VALID padding).
Torch functional ops are the independent numeric reference (mirrors the
reference converter's TF frontend,
`tools/external_converter_v2/parser/tensorflow/`).
"""

import numpy as np
import torch
import torch.nn.functional as F

import anakin_tpu as ak
from anakin_tpu.tools.converter.tf_frontend import from_tf
from anakin_tpu.tools.converter.tf_proto import graph_pb2 as gp


class GraphWriter:
    def __init__(self):
        self.gd = gp.GraphDef()

    def placeholder(self, name, dims):
        n = self.gd.node.add()
        n.name, n.op = name, "Placeholder"
        n.attr["dtype"].type = gp.DT_FLOAT
        for d in dims:
            n.attr["shape"].shape.dim.add().size = d
        return name

    def const(self, name, arr, via_identity=True):
        arr = np.asarray(arr)
        n = self.gd.node.add()
        n.name, n.op = name, "Const"
        t = n.attr["value"].tensor
        t.dtype = gp.DT_INT32 if arr.dtype == np.int32 else gp.DT_FLOAT
        for d in arr.shape:
            t.tensor_shape.dim.add().size = d
        t.tensor_content = np.ascontiguousarray(arr).tobytes()
        if via_identity:       # frozen graphs read weights through Identity
            i = self.gd.node.add()
            i.name, i.op = name + "/read", "Identity"
            i.input.append(name)
            return name + "/read"
        return name

    def op(self, op, name, inputs, **attrs):
        n = self.gd.node.add()
        n.name, n.op = name, op
        n.input.extend(inputs)
        for k, v in attrs.items():
            if isinstance(v, bytes):
                n.attr[k].s = v
            elif isinstance(v, bool):
                n.attr[k].b = v
            elif isinstance(v, float):
                n.attr[k].f = v
            elif isinstance(v, (list, tuple)):
                n.attr[k].list.i.extend(v)
            else:
                n.attr[k].i = v
        return name

    def save(self, tmp_path, fname="frozen.pb"):
        p = tmp_path / fname
        p.write_bytes(self.gd.SerializeToString())
        return str(p)


def test_tf_cnn_same_padding(rng, tmp_path):
    """Conv2D(SAME) + BiasAdd + FusedBatchNormV3 + Relu6 + MaxPool(SAME,
    odd size -> asymmetric pads) + Mean(global) + MatMul + Softmax."""
    x = rng.standard_normal((2, 9, 9, 3), dtype=np.float32)
    w = rng.standard_normal((3, 3, 3, 8), dtype=np.float32) * 0.3   # HWIO
    b = rng.standard_normal(8, dtype=np.float32) * 0.1
    gamma = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32) * 0.1
    mean = rng.standard_normal(8).astype(np.float32) * 0.2
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    wf = rng.standard_normal((8, 5), dtype=np.float32) * 0.3

    g = GraphWriter()
    g.placeholder("img", [-1, 9, 9, 3])
    wr = g.const("w", w)
    br = g.const("b", b)
    g.op("Conv2D", "conv", ["img", wr], strides=[1, 2, 2, 1],
         padding=b"SAME", data_format=b"NHWC")
    g.op("BiasAdd", "biased", ["conv", br], data_format=b"NHWC")
    g.op("FusedBatchNormV3", "bn",
         ["biased", g.const("g", gamma), g.const("be", beta),
          g.const("m", mean), g.const("v", var)], epsilon=1e-3)
    g.op("Relu6", "act", ["bn"])
    g.op("MaxPool", "pool", ["act"], ksize=[1, 2, 2, 1],
         strides=[1, 2, 2, 1], padding=b"SAME")
    g.op("Mean", "gap", ["pool", g.const("axes", np.array([1, 2], np.int32),
                                         via_identity=False)],
         keep_dims=False)
    g.op("MatMul", "fc", ["gap", g.const("wf", wf)],
         transpose_a=False, transpose_b=False)
    g.op("Softmax", "prob", ["fc"])

    graph = from_tf(g.save(tmp_path), batch_size=2)
    got = np.asarray(ak.Net(graph).prediction({"img": x})[graph.outputs[0]])

    with torch.no_grad():
        t = torch.from_numpy
        xt = t(x.transpose(0, 3, 1, 2))
        wt = t(w.transpose(3, 2, 0, 1))
        # TF SAME for 9x9, k3 s2: out 5, total pad 2 -> (0,1)x2... actually
        # (5-1)*2+3-9 = 2 -> pad (1,1)
        y = F.conv2d(F.pad(xt, (1, 1, 1, 1)), wt, t(b), stride=2)
        y = F.batch_norm(y, t(mean), t(var), t(gamma), t(beta), eps=1e-3)
        y = torch.clamp(y, 0, 6)
        # pool SAME on 5x5 k2 s2: out 3, total pad 1 -> (0, 1)
        y = F.max_pool2d(F.pad(y, (0, 1, 0, 1), value=-torch.inf), 2)
        y = y.mean(dim=(2, 3))
        want = F.softmax(y @ t(wf), 1).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tf_depthwise_residual_avgpool(rng, tmp_path):
    """DepthwiseConv2dNative + channel-const Mul + residual AddV2 +
    AvgPool(SAME: divisor counts valid elements only) + Reshape."""
    x = rng.standard_normal((1, 5, 5, 4), dtype=np.float32)
    wd = rng.standard_normal((3, 3, 4, 1), dtype=np.float32) * 0.4
    sc = rng.uniform(0.5, 1.5, 4).astype(np.float32)

    g = GraphWriter()
    g.placeholder("img", [-1, 5, 5, 4])
    g.op("DepthwiseConv2dNative", "dw", ["img", g.const("wd", wd)],
         strides=[1, 1, 1, 1], padding=b"SAME", data_format=b"NHWC")
    g.op("Mul", "scaled", ["dw", g.const("sc", sc, via_identity=False)])
    g.op("AddV2", "res", ["scaled", "img"])
    g.op("AvgPool", "pool", ["res"], ksize=[1, 2, 2, 1],
         strides=[1, 2, 2, 1], padding=b"SAME")
    g.op("Reshape", "flat",
         ["pool", g.const("shp", np.array([1, -1], np.int32),
                          via_identity=False)])

    graph = from_tf(g.save(tmp_path))
    got = np.asarray(ak.Net(graph).prediction({"img": x})[graph.outputs[0]])

    with torch.no_grad():
        t = torch.from_numpy
        xt = t(x.transpose(0, 3, 1, 2))
        wt = t(wd.transpose(2, 3, 0, 1))      # (4,1,3,3)
        y = F.conv2d(F.pad(xt, (1, 1, 1, 1)), wt, groups=4)
        y = y * t(sc)[None, :, None, None] + xt
        # TF SAME avg pool on 5x5 k2 s2: pads (0,1), divisor = valid count
        # == torch ceil_mode with boundary-clipped windows
        y = F.avg_pool2d(y, 2, ceil_mode=True, count_include_pad=False)
        want = y.permute(0, 2, 3, 1).reshape(1, -1).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tf_concat_pad_leakyrelu_explicit_outputs(rng, tmp_path):
    x = rng.standard_normal((1, 4, 4, 2), dtype=np.float32)
    g = GraphWriter()
    g.placeholder("img", [-1, 4, 4, 2])
    g.op("Pad", "padded",
         ["img", g.const("pads", np.array([[0, 0], [1, 2], [1, 2], [0, 0]],
                                          np.int32), via_identity=False)])
    g.op("LeakyRelu", "lr", ["img"], alpha=0.1)
    g.op("Sub", "delta", ["img", "lr"])
    g.op("ConcatV2", "cat",
         ["img", "lr", "delta",
          g.const("ax", np.array(3, np.int32), via_identity=False)])

    graph = from_tf(g.save(tmp_path), outputs=["padded", "cat"])
    res = ak.Net(graph).prediction({"img": x})
    pad_out = np.asarray(res[graph.outputs[0]])
    cat_out = np.asarray(res[graph.outputs[1]])

    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want_pad = F.pad(t, (1, 2, 1, 2)).permute(0, 2, 3, 1).numpy()
        lr = F.leaky_relu(t, 0.1)
        want_cat = torch.cat([t, lr, t - lr], 1).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(pad_out, want_pad, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(cat_out, want_cat, rtol=1e-5, atol=1e-5)


def test_converter_cli_tf(rng, tmp_path):
    import yaml

    from anakin_tpu.model_io import load_model
    from anakin_tpu.tools.converter.converter import convert

    x = rng.standard_normal((1, 6, 6, 3), dtype=np.float32)
    w = rng.standard_normal((3, 3, 3, 4), dtype=np.float32) * 0.3

    g = GraphWriter()
    g.placeholder("img", [-1, 6, 6, 3])
    g.op("Conv2D", "conv", ["img", g.const("w", w)], strides=[1, 1, 1, 1],
         padding=b"VALID", data_format=b"NHWC")
    g.op("Relu", "act", ["conv"])
    pb = g.save(tmp_path)

    cfg = {"TargetFramework": "TF", "ModelPath": pb,
           "Output": str(tmp_path / "out"), "Optimize": True}
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = convert(str(cfg_path))
    graph = load_model(out)

    with torch.no_grad():
        t = torch.from_numpy
        want = F.relu(F.conv2d(t(x.transpose(0, 3, 1, 2)),
                               t(w.transpose(3, 2, 0, 1)))
                      ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(ak.Net(graph).prediction({"img": x})[graph.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
