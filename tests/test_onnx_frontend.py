"""ONNX importer golden tests.

Fixtures are built directly as ONNX protos (via our self-contained
onnx_pb2 bindings) and the expected numerics come from torch functional
ops — an independent reference, mirroring the reference converter's
per-frontend golden strategy (`tools/external_converter_v2/parser/onnx/`).
"""

import numpy as np
import torch
import torch.nn.functional as F

import anakin_tpu as ak
from anakin_tpu.tools.converter.onnx_frontend import from_onnx
from anakin_tpu.tools.converter.onnx_proto import onnx_pb2 as op2

_DT = {np.dtype("float32"): 1, np.dtype("int64"): 7, np.dtype("int32"): 6,
       np.dtype("float64"): 11, np.dtype("int8"): 3, np.dtype("bool"): 9}


class B:
    """Tiny ONNX model builder."""

    def __init__(self, opset=13):
        self.m = op2.ModelProto(ir_version=8)
        o = self.m.opset_import.add()
        o.domain, o.version = "", opset
        self.g = self.m.graph
        self.g.name = "test"

    def _vi(self, coll, name, shape, elem=1):
        vi = coll.add()
        vi.name = name
        vi.type.tensor_type.elem_type = elem
        for d in shape:
            vi.type.tensor_type.shape.dim.add().dim_value = d

    def input(self, name, shape, elem=1):
        self._vi(self.g.input, name, shape, elem)

    def output(self, name, shape=(1,)):
        self._vi(self.g.output, name, shape)

    def init(self, name, arr):
        # NB: np.ascontiguousarray would promote 0-d scalars to 1-d and
        # corrupt ONNX Gather semantics — keep the rank.
        arr = np.asarray(arr, order="C")
        t = self.g.initializer.add()
        t.name = name
        t.dims.extend(arr.shape)
        t.data_type = _DT[arr.dtype]
        t.raw_data = arr.tobytes()
        return name

    def node(self, op_type, inputs, outputs, **attrs):
        n = self.g.node.add()
        n.op_type = op_type
        n.input.extend(inputs)
        n.output.extend(outputs if isinstance(outputs, (list, tuple))
                        else [outputs])
        for k, v in attrs.items():
            a = n.attribute.add()
            a.name = k
            if isinstance(v, np.ndarray):
                a.type = op2.AttributeProto.TENSOR
                a.t.dims.extend(v.shape)
                a.t.data_type = _DT[v.dtype]
                a.t.raw_data = np.ascontiguousarray(v).tobytes()
            elif isinstance(v, float):
                a.type, a.f = op2.AttributeProto.FLOAT, v
            elif isinstance(v, int):
                a.type, a.i = op2.AttributeProto.INT, v
            elif isinstance(v, str):
                a.type, a.s = op2.AttributeProto.STRING, v.encode()
            elif isinstance(v, (list, tuple)) and all(
                    isinstance(x, int) for x in v):
                a.type = op2.AttributeProto.INTS
                a.ints.extend(v)
            elif isinstance(v, (list, tuple)):
                a.type = op2.AttributeProto.FLOATS
                a.floats.extend(v)
            else:
                raise TypeError(f"attr {k}={v!r}")
        return outputs

    def bytes(self):
        return self.m.SerializeToString()


def run(model_bytes, feeds_nchw, out_name=None):
    g = from_onnx(model_bytes)
    feeds = {}
    for k, v in feeds_nchw.items():
        feeds[k] = v.transpose(0, 2, 3, 1) if v.ndim == 4 else v
    res = ak.Net(g).prediction(feeds)
    return g, np.asarray(res[out_name or g.outputs[0]])


def check(model_bytes, feeds_nchw, want_nchw, rtol=2e-4, atol=2e-4):
    g, got = run(model_bytes, feeds_nchw)
    want = want_nchw
    if want.ndim == 4:
        want = want.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    return g


def test_cnn_end_to_end(rng):
    """Conv+BN+Relu+MaxPool+Conv+GAP+Flatten+Gemm+Softmax vs torch."""
    x = rng.standard_normal((2, 3, 16, 16), dtype=np.float32)
    w1 = rng.standard_normal((8, 3, 3, 3), dtype=np.float32) * 0.3
    b1 = rng.standard_normal(8, dtype=np.float32) * 0.1
    g_, beta = (rng.uniform(0.5, 1.5, 8).astype(np.float32),
                rng.standard_normal(8).astype(np.float32) * 0.1)
    mean = rng.standard_normal(8).astype(np.float32) * 0.3
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    w2 = rng.standard_normal((16, 8, 3, 3), dtype=np.float32) * 0.2
    wf = rng.standard_normal((10, 16), dtype=np.float32) * 0.3
    bf = rng.standard_normal(10, dtype=np.float32) * 0.1

    b = B()
    b.input("x", (2, 3, 16, 16))
    b.init("w1", w1), b.init("b1", b1)
    b.init("g", g_), b.init("beta", beta)
    b.init("mean", mean), b.init("var", var)
    b.init("w2", w2), b.init("wf", wf), b.init("bf", bf)
    b.node("Conv", ["x", "w1", "b1"], "c1", kernel_shape=[3, 3],
           pads=[1, 1, 1, 1], strides=[1, 1])
    b.node("BatchNormalization", ["c1", "g", "beta", "mean", "var"], "bn1",
           epsilon=1e-5)
    b.node("Relu", ["bn1"], "r1")
    b.node("MaxPool", ["r1"], "p1", kernel_shape=[2, 2], strides=[2, 2])
    b.node("Conv", ["p1", "w2"], "c2", kernel_shape=[3, 3],
           pads=[1, 1, 1, 1], strides=[2, 2])
    b.node("GlobalAveragePool", ["c2"], "gap")
    b.node("Flatten", ["gap"], "flat", axis=1)
    b.node("Gemm", ["flat", "wf", "bf"], "fc", transB=1)
    b.node("Softmax", ["fc"], "y", axis=1)
    b.output("y")

    with torch.no_grad():
        t = torch.from_numpy
        y = F.conv2d(t(x), t(w1), t(b1), padding=1)
        y = F.batch_norm(y, t(mean), t(var), t(g_), t(beta), eps=1e-5)
        y = F.max_pool2d(F.relu(y), 2)
        y = F.conv2d(y, t(w2), stride=2, padding=1)
        y = F.adaptive_avg_pool2d(y, 1).flatten(1)
        want = F.softmax(F.linear(y, t(wf), t(bf)), dim=1).numpy()

    check(b.bytes(), {"x": x}, want)


def test_shape_chain_flatten_matmul(rng):
    """torch-style dynamic flatten (Shape->Gather->Unsqueeze->Concat->
    Reshape) constant-folds; MatMul weight rows get the HWC fixup."""
    x = rng.standard_normal((2, 4, 5, 5), dtype=np.float32)
    w = rng.standard_normal((4 * 5 * 5, 7), dtype=np.float32) * 0.2
    bias = rng.standard_normal(7, dtype=np.float32)

    b = B()
    b.input("x", (2, 4, 5, 5))
    b.init("w", w)
    b.init("bias", bias)
    b.init("idx0", np.array(0, dtype=np.int64))
    b.init("neg1", np.array([-1], dtype=np.int64))
    b.node("Shape", ["x"], "shp")
    b.node("Gather", ["shp", "idx0"], "n", axis=0)
    b.node("Unsqueeze", ["n"], "n1", axes=[0])
    b.node("Concat", ["n1", "neg1"], "newshape", axis=0)
    b.node("Reshape", ["x", "newshape"], "flat")
    b.node("MatMul", ["flat", "w"], "mm")
    b.node("Add", ["mm", "bias"], "y")
    b.output("y")

    want = x.reshape(2, -1) @ w + bias
    check(b.bytes(), {"x": x}, want)


def test_residual_and_activations(rng):
    x = rng.standard_normal((1, 6, 8, 8), dtype=np.float32)
    w = rng.standard_normal((6, 6, 3, 3), dtype=np.float32) * 0.2
    slope = rng.uniform(0.1, 0.3, 6).astype(np.float32)

    b = B()
    b.input("x", (1, 6, 8, 8))
    b.init("w", w)
    b.init("slope", slope.reshape(6, 1, 1))
    b.node("Conv", ["x", "w"], "c", kernel_shape=[3, 3], pads=[1, 1, 1, 1])
    b.node("Add", ["c", "x"], "res")
    b.node("PRelu", ["res", "slope"], "pr")
    b.node("LeakyRelu", ["pr"], "lr", alpha=0.1)
    b.node("Clip", ["lr", "lo", "hi"], "y")
    b.init("lo", np.float32(0.0).reshape(()))
    b.init("hi", np.float32(6.0).reshape(()))
    b.output("y")

    with torch.no_grad():
        t = torch.from_numpy
        y = F.conv2d(t(x), t(w), padding=1) + t(x)
        y = F.prelu(y, t(slope))
        y = F.leaky_relu(y, 0.1)
        want = torch.clamp(y, 0, 6).numpy()
    check(b.bytes(), {"x": x}, want)


def test_pool_pad_resize_reduce(rng):
    x = rng.standard_normal((1, 4, 6, 6), dtype=np.float32)
    b = B()
    b.input("x", (1, 4, 6, 6))
    b.node("AveragePool", ["x"], "ap", kernel_shape=[2, 2], strides=[2, 2])
    b.node("Pad", ["ap", "pads"], "pd", mode="constant")
    b.init("pads", np.array([0, 0, 1, 1, 0, 0, 1, 1], dtype=np.int64))
    b.node("Resize", ["pd", "", "", "sizes"], "rs", mode="nearest",
           coordinate_transformation_mode="asymmetric")
    b.init("sizes", np.array([1, 4, 10, 10], dtype=np.int64))
    b.node("ReduceMean", ["rs"], "y", axes=[2, 3], keepdims=0)
    b.output("y")

    with torch.no_grad():
        t = torch.from_numpy
        y = F.avg_pool2d(t(x), 2)
        y = F.pad(y, (1, 1, 1, 1))
        y = F.interpolate(y, size=(10, 10), mode="nearest")
        want = y.mean(dim=(2, 3)).numpy()
    check(b.bytes(), {"x": x}, want)


def test_deconv_transpose_slice_split_concat(rng):
    x = rng.standard_normal((1, 4, 5, 5), dtype=np.float32)
    w = rng.standard_normal((4, 3, 2, 2), dtype=np.float32) * 0.3

    b = B()
    b.input("x", (1, 4, 5, 5))
    b.init("w", w)
    b.node("ConvTranspose", ["x", "w"], "dc", kernel_shape=[2, 2],
           strides=[2, 2])
    b.node("Split", ["dc"], ["s0", "s1"], axis=2)
    b.node("Concat", ["s1", "s0"], "cc", axis=2)
    b.node("Slice", ["cc", "st", "en", "ax"], "sl")
    b.init("st", np.array([1], dtype=np.int64))
    b.init("en", np.array([3], dtype=np.int64))
    b.init("ax", np.array([1], dtype=np.int64))
    b.node("Transpose", ["sl"], "y", perm=[0, 1, 3, 2])
    b.output("y")

    with torch.no_grad():
        t = torch.from_numpy
        y = F.conv_transpose2d(t(x), t(w), stride=2)
        s0, s1 = torch.split(y, 5, dim=2)
        y = torch.cat([s1, s0], dim=2)[:, 1:3]
        want = y.permute(0, 1, 3, 2).numpy()
    check(b.bytes(), {"x": x}, want)


def test_math_ops_and_lrn(rng):
    x = np.abs(rng.standard_normal((1, 8, 4, 4), dtype=np.float32)) + 0.5
    b = B()
    b.input("x", (1, 8, 4, 4))
    b.node("LRN", ["x"], "l", size=5, alpha=1e-3, beta=0.75, bias=1.0)
    b.node("Sqrt", ["l"], "sq")
    b.node("Mul", ["sq", "two"], "m")
    b.init("two", np.float32(2.0).reshape(()))
    b.node("Pow", ["m", "p"], "pw")
    b.init("p", np.float32(2.0).reshape(()))
    b.node("Div", ["pw", "four"], "y")
    b.init("four", np.float32(4.0).reshape(()))
    b.output("y")

    with torch.no_grad():
        y = F.local_response_norm(torch.from_numpy(x), 5, alpha=1e-3,
                                  beta=0.75, k=1.0)
        want = ((2 * torch.sqrt(y)) ** 2 / 4).numpy()
    check(b.bytes(), {"x": x}, want, rtol=1e-3, atol=1e-3)


def test_embedding_gather_reshape(rng):
    ids = rng.integers(0, 20, (2, 6)).astype(np.int32)
    table = rng.standard_normal((20, 8), dtype=np.float32)
    b = B()
    b.input("ids", (2, 6), elem=6)
    b.init("tbl", table)
    b.node("Gather", ["tbl", "ids"], "emb", axis=0)
    b.node("ReduceMean", ["emb"], "y", axes=[1], keepdims=0)
    b.output("y")
    want = table[ids].mean(axis=1)
    g, got = run(b.bytes(), {"ids": ids})
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_optimize_and_save_roundtrip(rng, tmp_path):
    """Imported graph survives optimize + model_io round-trip."""
    x = rng.standard_normal((1, 3, 8, 8), dtype=np.float32)
    w = rng.standard_normal((4, 3, 3, 3), dtype=np.float32) * 0.3
    g_ = rng.uniform(0.5, 1.5, 4).astype(np.float32)
    beta = rng.standard_normal(4).astype(np.float32) * 0.1
    mean = rng.standard_normal(4).astype(np.float32) * 0.2
    var = rng.uniform(0.5, 2.0, 4).astype(np.float32)

    b = B()
    b.input("x", (1, 3, 8, 8))
    b.init("w", w), b.init("g", g_), b.init("bb", beta)
    b.init("mean", mean), b.init("var", var)
    b.node("Conv", ["x", "w"], "c", kernel_shape=[3, 3], pads=[1, 1, 1, 1])
    b.node("BatchNormalization", ["c", "g", "bb", "mean", "var"], "bn")
    b.node("Relu", ["bn"], "y")
    b.output("y")

    g = from_onnx(b.bytes())
    og = ak.optimize(g)
    assert any("fold" in p for p in og.applied_passes)
    from anakin_tpu.model_io import load_model, save_model
    save_model(og, str(tmp_path / "m"))
    og2 = load_model(str(tmp_path / "m"))

    with torch.no_grad():
        t = torch.from_numpy
        y = F.conv2d(t(x), t(w), padding=1)
        want = F.relu(F.batch_norm(y, t(mean), t(var), t(g_), t(beta)))
        want = want.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(ak.Net(og2).prediction(
        {"x": x.transpose(0, 2, 3, 1)})[og2.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
