"""Frontend validation against REAL artifacts (VERDICT round-1 item 3).

Round 1's frontend tests parsed protos the repo built itself, so schema
transcription bugs could cancel out.  Here every input's bytes come from
an independent producer:

  * ONNX: `torch.onnx.export` — torch's own C++ ModelProto serializer —
    of multi-block CNNs (ResNet-style residuals, MobileNet-style
    depthwise separables), checked for fp32 parity against torch.
  * TensorFlow: a frozen GraphDef produced by TF's own
    `convert_variables_to_constants_v2` + `SerializeToString`.
  * Caffe: a hand-rolled protobuf WIRE encoder (varint/tag writer written
    from the public BVLC field numbers, independent of our generated pb2)
    emits the .caffemodel bytes; the prototxt is literal text — the
    source format itself.

Reference bar: the reference converters parsed real deployed models
(`tools/external_converter_v2/parser/caffe/parser_caffe.py`).
"""

import io
import struct

import numpy as np
import pytest

import anakin_tpu as ak

torch = pytest.importorskip("torch")


# --------------------------------------------------------------- helpers

def _export_onnx_bytes(model, example, opset=13):
    """Serialize via torch's own exporter.  The image lacks the `onnx`
    package, which torch only needs inside `_add_onnxscript_fn` (a
    passthrough unless custom onnxscript functions are present) — patch
    that single hook; every byte still comes from torch's serializer."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    try:
        buf = io.BytesIO()
        torch.onnx.export(model, example, buf, opset_version=opset,
                          dynamo=False, do_constant_folding=True)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig
    return buf.getvalue()


def _run_graph(g, x_nchw):
    """Run an imported graph on an NCHW source tensor (frontends translate
    the graph to NHWC and keep a 4D input in NHWC)."""
    net = ak.Net(g)
    inp = g.inputs[0]
    x = np.asarray(x_nchw, np.float32)
    if x.ndim == 4:
        x = x.transpose(0, 2, 3, 1)
    return np.asarray(net.prediction({inp: x})[g.outputs[0]])


# ------------------------------------------------------------ torch ONNX

class _ResBlock(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.c1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.b1 = torch.nn.BatchNorm2d(cout)
        self.c2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.b2 = torch.nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        y = torch.relu(self.b1(self.c1(x)))
        y = self.b2(self.c2(y))
        return torch.relu(y + idt)


class _TinyResNet(torch.nn.Module):
    """Multi-block residual CNN in the ResNet idiom (stem + 3 residual
    blocks incl. strided downsamples + GAP + fc)."""

    def __init__(self):
        super().__init__()
        self.stem = torch.nn.Conv2d(3, 16, 7, 2, 3, bias=False)
        self.bn = torch.nn.BatchNorm2d(16)
        self.pool = torch.nn.MaxPool2d(3, 2, 1)
        self.l1 = _ResBlock(16, 16, 1)
        self.l2 = _ResBlock(16, 32, 2)
        self.l3 = _ResBlock(32, 64, 2)
        self.gap = torch.nn.AdaptiveAvgPool2d(1)
        self.fc = torch.nn.Linear(64, 10)

    def forward(self, x):
        x = self.pool(torch.relu(self.bn(self.stem(x))))
        x = self.l3(self.l2(self.l1(x)))
        return self.fc(torch.flatten(self.gap(x), 1))


class _DwBlock(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.dw = torch.nn.Conv2d(cin, cin, 3, stride, 1, groups=cin,
                                  bias=False)
        self.b1 = torch.nn.BatchNorm2d(cin)
        self.pw = torch.nn.Conv2d(cin, cout, 1, bias=False)
        self.b2 = torch.nn.BatchNorm2d(cout)
        self.act = torch.nn.ReLU6()

    def forward(self, x):
        return self.act(self.b2(self.pw(self.act(self.b1(self.dw(x))))))


class _TinyMobileNet(torch.nn.Module):
    """Depthwise-separable CNN in the MobileNet idiom (ReLU6 exports as
    ONNX Clip with min/max inputs — the opset>=11 form)."""

    def __init__(self):
        super().__init__()
        self.stem = torch.nn.Conv2d(3, 8, 3, 2, 1, bias=False)
        self.bn = torch.nn.BatchNorm2d(8)
        self.act = torch.nn.ReLU6()
        self.b1 = _DwBlock(8, 16, 1)
        self.b2 = _DwBlock(16, 32, 2)
        self.gap = torch.nn.AdaptiveAvgPool2d(1)
        self.fc = torch.nn.Linear(32, 10)

    def forward(self, x):
        x = self.act(self.bn(self.stem(x)))
        x = self.b2(self.b1(x))
        return self.fc(torch.flatten(self.gap(x), 1))


@pytest.mark.parametrize("model_cls", [_TinyResNet, _TinyMobileNet])
def test_onnx_bytes_from_torch_exporter(model_cls):
    """from_onnx on bytes produced by torch.onnx.export (the source
    framework's own serializer), fp32 parity vs torch eager."""
    from anakin_tpu.tools.converter.onnx_frontend import from_onnx

    torch.manual_seed(0)
    m = model_cls().eval()
    # realistic BN statistics (not the fresh mean=0/var=1)
    with torch.no_grad():
        m.train()
        for _ in range(3):
            m(torch.randn(4, 3, 32, 32))
        m.eval()
    x = torch.randn(2, 3, 32, 32)
    blob = _export_onnx_bytes(m, x)
    assert len(blob) > 1000

    g = from_onnx(blob)
    got = _run_graph(g, x.numpy())
    want = m(x).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# --------------------------------------------------------- TF GraphDef

def test_tf_frozen_graphdef_from_tensorflow():
    """from_tf on a frozen GraphDef serialized by TensorFlow itself
    (convert_variables_to_constants_v2 → SerializeToString), covering
    Conv2D / FusedBatchNormV3 / DepthwiseConv2dNative / MaxPool / Mean /
    MatMul / BiasAdd / Relu6 / Softmax."""
    tf = pytest.importorskip("tensorflow")
    from tensorflow.python.framework.convert_to_constants import (
        convert_variables_to_constants_v2)

    from anakin_tpu.tools.converter.tf_frontend import from_tf

    rng = np.random.default_rng(0)

    class M(tf.Module):
        def __init__(self):
            super().__init__()
            self.w1 = tf.Variable(rng.normal(0, 0.2, (3, 3, 3, 8)).astype(np.float32))
            self.bn_g = tf.Variable(rng.normal(1, 0.1, (8,)).astype(np.float32))
            self.bn_b = tf.Variable(rng.normal(0, 0.1, (8,)).astype(np.float32))
            self.bn_m = tf.Variable(rng.normal(0, 0.3, (8,)).astype(np.float32))
            self.bn_v = tf.Variable((rng.uniform(0.5, 2, (8,))).astype(np.float32))
            self.wdw = tf.Variable(rng.normal(0, 0.2, (3, 3, 8, 1)).astype(np.float32))
            self.w2 = tf.Variable(rng.normal(0, 0.2, (1, 1, 8, 16)).astype(np.float32))
            self.wfc = tf.Variable(rng.normal(0, 0.2, (16, 10)).astype(np.float32))
            self.bfc = tf.Variable(rng.normal(0, 0.1, (10,)).astype(np.float32))

        @tf.function(input_signature=[tf.TensorSpec((1, 16, 16, 3), tf.float32)])
        def __call__(self, x):
            y = tf.nn.conv2d(x, self.w1, strides=2, padding="SAME")
            y, _, _ = tf.compat.v1.nn.fused_batch_norm(
                y, self.bn_g, self.bn_b, self.bn_m, self.bn_v,
                epsilon=1e-3, is_training=False)
            y = tf.nn.relu(y)
            y = tf.nn.depthwise_conv2d(y, self.wdw, (1, 1, 1, 1), "SAME")
            y = tf.nn.relu6(y)
            y = tf.nn.max_pool2d(y, 2, 2, "VALID")
            y = tf.nn.conv2d(y, self.w2, strides=1, padding="VALID")
            y = tf.reduce_mean(y, axis=[1, 2])          # GAP
            y = tf.nn.bias_add(tf.matmul(y, self.wfc), self.bfc)
            return tf.nn.softmax(y)

    m = M()
    frozen = convert_variables_to_constants_v2(
        m.__call__.get_concrete_function())
    blob = frozen.graph.as_graph_def().SerializeToString()   # TF serializer
    assert len(blob) > 500

    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".pb") as f:
        f.write(blob)
        f.flush()
        g = from_tf(f.name, batch_size=1)

    x = rng.normal(0, 1, (1, 16, 16, 3)).astype(np.float32)
    want = m(tf.constant(x)).numpy()
    got = np.asarray(ak.Net(g).prediction({g.inputs[0]: x})[g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------- Caffe wire-format bytes

def _vint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _key(field: int, wire: int) -> bytes:
    return _vint(field << 3 | wire)


def _ld(field: int, payload: bytes) -> bytes:       # length-delimited
    return _key(field, 2) + _vint(len(payload)) + payload


def _s(field: int, text: str) -> bytes:
    return _ld(field, text.encode())


def _u(field: int, n: int) -> bytes:                # varint scalar
    return _key(field, 0) + _vint(n)


def _f(field: int, v: float) -> bytes:              # fixed32 float
    return _key(field, 5) + struct.pack("<f", v)


def _blob(arr: np.ndarray) -> bytes:
    """BlobProto: shape(field 7: BlobShape{dim=1 packed int64}),
    data(field 5, packed float) — BVLC field numbers."""
    shape = _ld(1, b"".join(_vint(int(d)) for d in arr.shape))
    data = b"".join(struct.pack("<f", float(v)) for v in arr.reshape(-1))
    return _ld(7, shape) + _ld(5, data)


def _layer(name: str, ltype: str, blobs=(), extra=b"") -> bytes:
    body = _s(1, name) + _s(2, ltype) + extra
    for b in blobs:
        body += _ld(7, _blob(b))
    return _ld(100, body)           # NetParameter.layer = 100


def test_caffe_wire_bytes_independent_encoder(tmp_path):
    """from_caffe on a .caffemodel whose bytes come from a hand-rolled
    protobuf wire encoder (BVLC field numbers, zero shared code with our
    generated pb2) + a literal-text prototxt; parity vs a torch oracle."""
    from anakin_tpu.tools.converter.caffe_frontend import from_caffe

    rng = np.random.default_rng(0)
    W = rng.normal(0, 0.2, (8, 3, 3, 3)).astype(np.float32)   # OIHW
    Bb = rng.normal(0, 0.1, (8,)).astype(np.float32)
    Mean = rng.normal(0, 0.3, (8,)).astype(np.float32)
    Var = rng.uniform(0.5, 2.0, (8,)).astype(np.float32)
    Gamma = rng.normal(1, 0.1, (8,)).astype(np.float32)
    Beta = rng.normal(0, 0.1, (8,)).astype(np.float32)
    Wfc = rng.normal(0, 0.1, (10, 8 * 8 * 8)).astype(np.float32)
    Bfc = rng.normal(0, 0.1, (10,)).astype(np.float32)

    prototxt = tmp_path / "deploy.prototxt"
    prototxt.write_text("""
name: "wirecheck"
layer { name: "input" type: "Input" top: "data"
  input_param { shape { dim: 1 dim: 3 dim: 16 dim: 16 } } }
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1 stride: 1 } }
layer { name: "bn1" type: "BatchNorm" bottom: "conv1" top: "conv1"
  batch_norm_param { use_global_stats: true eps: 0.001 } }
layer { name: "scale1" type: "Scale" bottom: "conv1" top: "conv1"
  scale_param { bias_term: true } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "fc" type: "InnerProduct" bottom: "pool1" top: "fc"
  inner_product_param { num_output: 10 } }
""")

    # ConvolutionParameter: num_output=1, kernel_size=4(rep), pad=3, stride=6
    conv_p = _u(1, 8) + _u(4, 3) + _u(3, 1) + _u(6, 1)
    bn_p = _key(1, 0) + b"\x01" + _f(3, 1e-3)        # use_global_stats, eps
    scale_p = _key(4, 0) + b"\x01"                   # bias_term=true
    ip_p = _u(1, 10)                                 # num_output
    pool_p = _u(1, 0) + _u(2, 2) + _u(3, 2)          # MAX, kernel 2, stride 2
    net = _s(1, "wirecheck")
    net += _layer("conv1", "Convolution", [W, Bb], _ld(106, conv_p))
    net += _layer("bn1", "BatchNorm",
                  [Mean, Var, np.ones((1,), np.float32)], _ld(139, bn_p))
    net += _layer("scale1", "Scale", [Gamma, Beta], _ld(142, scale_p))
    net += _layer("pool1", "Pooling", [], _ld(121, pool_p))
    net += _layer("fc", "InnerProduct", [Wfc, Bfc], _ld(117, ip_p))
    caffemodel = tmp_path / "net.caffemodel"
    caffemodel.write_bytes(net)

    g = from_caffe(str(prototxt), str(caffemodel))

    x = rng.normal(0, 1, (1, 3, 16, 16)).astype(np.float32)
    # independent oracle via torch functional ops
    tx = torch.from_numpy(x)
    y = torch.nn.functional.conv2d(tx, torch.from_numpy(W),
                                   torch.from_numpy(Bb), padding=1)
    y = (y - torch.from_numpy(Mean)[None, :, None, None]) / torch.sqrt(
        torch.from_numpy(Var)[None, :, None, None] + 1e-3)
    y = y * torch.from_numpy(Gamma)[None, :, None, None] \
        + torch.from_numpy(Beta)[None, :, None, None]
    y = torch.relu(y)
    y = torch.nn.functional.max_pool2d(y, 2, 2)
    want = (y.reshape(1, -1) @ torch.from_numpy(Wfc).T
            + torch.from_numpy(Bfc)).numpy()

    got = _run_graph(g, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
