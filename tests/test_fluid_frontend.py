"""Fluid importer golden tests.

Fixtures are written in Paddle's real on-disk formats: `__model__` is a
ProgramDesc protobuf and weights use the LoDTensor SerializeToStream
framing (version + LoD + TensorDesc + raw data), both per-var files and
the combined params file.  Torch functional ops are the independent
numeric reference (mirrors the reference converter's Fluid frontend,
`tools/external_converter_v2/parser/fluid/`).
"""

import struct

import numpy as np
import torch
import torch.nn.functional as F

import anakin_tpu as ak
from anakin_tpu.tools.converter.fluid_frontend import from_fluid
from anakin_tpu.tools.converter.fluid_proto import framework_pb2 as fp


def lod_tensor_bytes(arr: np.ndarray) -> bytes:
    """Paddle's LoDTensor save framing."""
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    desc = fp.VarType.TensorDesc()
    desc.data_type = fp.VarType.FP32
    desc.dims.extend(arr.shape)
    d = desc.SerializeToString()
    return (struct.pack("<I", 0)          # LoDTensor version
            + struct.pack("<Q", 0)        # lod_level
            + struct.pack("<I", 0)        # tensor version
            + struct.pack("<i", len(d)) + d
            + arr.tobytes())


class ProgramWriter:
    def __init__(self):
        self.prog = fp.ProgramDesc()
        self.block = self.prog.blocks.add()
        self.block.idx, self.block.parent_idx = 0, -1
        self.weights = {}
        self._feed_i = 0
        self._fetch_i = 0

    def var(self, name, dims, persistable=False):
        v = self.block.vars.add()
        v.name = name
        v.type.type = fp.VarType.LOD_TENSOR
        v.type.lod_tensor.tensor.data_type = fp.VarType.FP32
        v.type.lod_tensor.tensor.dims.extend(dims)
        v.persistable = persistable
        return name

    def weight(self, name, arr):
        self.var(name, list(arr.shape), persistable=True)
        self.weights[name] = np.asarray(arr, np.float32)
        return name

    def op(self, type_, inputs, outputs, **attrs):
        o = self.block.ops.add()
        o.type = type_
        for slot, args in inputs.items():
            v = o.inputs.add()
            v.parameter = slot
            v.arguments.extend([args] if isinstance(args, str) else args)
        for slot, args in outputs.items():
            v = o.outputs.add()
            v.parameter = slot
            v.arguments.extend([args] if isinstance(args, str) else args)
        for k, val in attrs.items():
            a = o.attrs.add()
            a.name = k
            if isinstance(val, bool):
                a.type, a.b = fp.BOOLEAN, val
            elif isinstance(val, int):
                a.type, a.i = fp.INT, val
            elif isinstance(val, float):
                a.type, a.f = fp.FLOAT, val
            elif isinstance(val, str):
                a.type, a.s = fp.STRING, val
            elif isinstance(val, (list, tuple)) and val \
                    and isinstance(val[0], float):
                a.type = fp.FLOATS
                a.floats.extend(val)
            else:
                a.type = fp.INTS
                a.ints.extend(int(x) for x in val)

    def feed(self, name, dims):
        self.var(name, dims)
        self.op("feed", {"X": "feed"}, {"Out": name}, col=self._feed_i)
        self._feed_i += 1
        return name

    def fetch(self, name):
        self.op("fetch", {"X": name}, {"Out": "fetch"}, col=self._fetch_i)
        self._fetch_i += 1

    def save(self, tmp_path, combined=False):
        d = tmp_path / "fluid_model"
        d.mkdir(exist_ok=True)
        (d / "__model__").write_bytes(self.prog.SerializeToString())
        if combined:
            blob = b"".join(lod_tensor_bytes(self.weights[n])
                            for n in sorted(self.weights))
            (d / "__params__").write_bytes(blob)
            return str(d), str(d / "__params__")
        for n, arr in self.weights.items():
            (d / n).write_bytes(lod_tensor_bytes(arr))
        return str(d), None


def run_net(g, feeds_nchw):
    feeds = {}
    for e in g.inputs:
        v = feeds_nchw[e]
        feeds[e] = v.transpose(0, 2, 3, 1) if v.ndim == 4 else v
    return ak.Net(g).prediction(feeds)


def test_cnn_conv_bn_pool_fc(rng, tmp_path):
    """conv2d + bias(elementwise_add) + batch_norm + relu + pool2d + mul +
    bias + softmax — the standard fluid image-classifier block."""
    x = rng.standard_normal((2, 3, 12, 12), dtype=np.float32)
    w = rng.standard_normal((8, 3, 3, 3), dtype=np.float32) * 0.3
    b = rng.standard_normal(8, dtype=np.float32) * 0.1
    mean = rng.standard_normal(8).astype(np.float32) * 0.3
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32) * 0.1
    wf = rng.standard_normal((8 * 6 * 6, 5), dtype=np.float32) * 0.1
    bf = rng.standard_normal(5, dtype=np.float32) * 0.1

    p = ProgramWriter()
    p.feed("img", [-1, 3, 12, 12])
    p.weight("conv_w", w)
    p.weight("conv_b", b)
    p.weight("bn_m", mean)
    p.weight("bn_v", var)
    p.weight("bn_g", gamma)
    p.weight("bn_b", beta)
    p.weight("fc_w", wf)
    p.weight("fc_b", bf)
    p.var("c0", [-1, 8, 12, 12])
    p.op("conv2d", {"Input": "img", "Filter": "conv_w"}, {"Output": "c0"},
         strides=[1, 1], paddings=[1, 1], dilations=[1, 1], groups=1)
    p.var("c1", [-1, 8, 12, 12])
    p.op("elementwise_add", {"X": "c0", "Y": "conv_b"}, {"Out": "c1"}, axis=1)
    p.var("c2", [-1, 8, 12, 12])
    p.op("batch_norm", {"X": "c1", "Scale": "bn_g", "Bias": "bn_b",
                        "Mean": "bn_m", "Variance": "bn_v"},
         {"Y": "c2"}, epsilon=1e-5)
    p.var("c3", [-1, 8, 12, 12])
    p.op("relu", {"X": "c2"}, {"Out": "c3"})
    p.var("c4", [-1, 8, 6, 6])
    p.op("pool2d", {"X": "c3"}, {"Out": "c4"}, pooling_type="max",
         ksize=[2, 2], strides=[2, 2], paddings=[0, 0])
    p.var("f0", [-1, 5])
    p.op("mul", {"X": "c4", "Y": "fc_w"}, {"Out": "f0"}, x_num_col_dims=1)
    p.var("f1", [-1, 5])
    p.op("elementwise_add", {"X": "f0", "Y": "fc_b"}, {"Out": "f1"}, axis=1)
    p.var("prob", [-1, 5])
    p.op("softmax", {"X": "f1"}, {"Out": "prob"}, axis=-1)
    p.fetch("prob")

    model_dir, _ = p.save(tmp_path)
    g = from_fluid(model_dir, batch_size=2)

    with torch.no_grad():
        t = torch.from_numpy
        y = F.conv2d(t(x), t(w), t(b), padding=1)
        y = F.batch_norm(y, t(mean), t(var), t(gamma), t(beta), eps=1e-5)
        y = F.max_pool2d(F.relu(y), 2)
        want = F.softmax(t(y.numpy().reshape(2, -1)) @ t(wf) + t(bf),
                         1).numpy()

    got = np.asarray(run_net(g, {"img": x})[g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_combined_params_depthwise_hard_swish(rng, tmp_path):
    """MobileNet-flavored: depthwise_conv2d + hard_swish + global pool,
    weights in a single combined params file (sorted-name order)."""
    x = rng.standard_normal((1, 6, 8, 8), dtype=np.float32)
    wd = rng.standard_normal((6, 1, 3, 3), dtype=np.float32) * 0.4

    p = ProgramWriter()
    p.feed("img", [-1, 6, 8, 8])
    p.weight("dw_w", wd)
    p.var("d0", [-1, 6, 8, 8])
    p.op("depthwise_conv2d", {"Input": "img", "Filter": "dw_w"},
         {"Output": "d0"}, strides=[1, 1], paddings=[1, 1],
         dilations=[1, 1], groups=6)
    p.var("d1", [-1, 6, 8, 8])
    p.op("hard_swish", {"X": "d0"}, {"Out": "d1"},
         threshold=6.0, scale=6.0, offset=3.0)
    p.var("d2", [-1, 6, 1, 1])
    p.op("pool2d", {"X": "d1"}, {"Out": "d2"}, pooling_type="avg",
         ksize=[1, 1], global_pooling=True)
    p.fetch("d2")

    model_dir, params = p.save(tmp_path, combined=True)
    g = from_fluid(model_dir, params_path=params)

    with torch.no_grad():
        t = torch.from_numpy
        y = F.conv2d(t(x), t(wd), groups=6, padding=1)
        y = F.hardswish(y)
        want = y.mean(dim=(2, 3), keepdim=True).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(run_net(g, {"img": x})[g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_residual_scale_dropout_transpose(rng, tmp_path):
    """elementwise_add of two activations, fluid scale op, inference
    dropout (downgrade_in_infer), transpose2, matmul."""
    x = rng.standard_normal((2, 4, 6, 6), dtype=np.float32)
    w = rng.standard_normal((4, 4, 3, 3), dtype=np.float32) * 0.2

    p = ProgramWriter()
    p.feed("img", [-1, 4, 6, 6])
    p.weight("w", w)
    p.var("c", [-1, 4, 6, 6])
    p.op("conv2d", {"Input": "img", "Filter": "w"}, {"Output": "c"},
         strides=[1, 1], paddings=[1, 1], dilations=[1, 1], groups=1)
    p.var("r", [-1, 4, 6, 6])
    p.op("elementwise_add", {"X": "c", "Y": "img"}, {"Out": "r"}, axis=-1)
    p.var("s", [-1, 4, 6, 6])
    p.op("scale", {"X": "r"}, {"Out": "s"}, scale=0.5, bias=1.0,
         bias_after_scale=True)
    p.var("dr", [-1, 4, 6, 6])
    p.op("dropout", {"X": "s"}, {"Out": "dr"}, dropout_prob=0.25,
         dropout_implementation="downgrade_in_infer")
    p.var("tr", [-1, 4, 6, 6])
    p.op("transpose2", {"X": "dr"}, {"Out": "tr", "XShape": "tr_xs"},
         axis=[0, 1, 3, 2])
    p.var("tr_xs", [-1, 4, 6, 6])
    p.fetch("tr")

    model_dir, _ = p.save(tmp_path)
    g = from_fluid(model_dir, batch_size=2)

    with torch.no_grad():
        t = torch.from_numpy
        y = F.conv2d(t(x), t(w), padding=1) + t(x)
        y = (0.5 * y + 1.0) * 0.75
        want = y.permute(0, 1, 3, 2).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(run_net(g, {"img": x})[g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_nlp_embedding_layernorm_matmul(rng, tmp_path):
    """lookup_table_v2 + layer_norm + matmul against a weight — the
    transformer-era fluid op set."""
    ids = rng.integers(0, 11, (2, 7)).astype(np.int64)
    table = rng.standard_normal((11, 16), dtype=np.float32)
    gamma = rng.uniform(0.5, 1.5, 16).astype(np.float32)
    beta = rng.standard_normal(16).astype(np.float32) * 0.1
    wq = rng.standard_normal((16, 8), dtype=np.float32) * 0.2

    p = ProgramWriter()
    p.feed("ids", [-1, 7])
    p.weight("table", table)
    p.weight("ln_g", gamma)
    p.weight("ln_b", beta)
    p.weight("wq", wq)
    p.var("emb", [-1, 7, 16])
    p.op("lookup_table_v2", {"Ids": "ids", "W": "table"}, {"Out": "emb"},
         padding_idx=-1)
    p.var("ln", [-1, 7, 16])
    p.op("layer_norm", {"X": "emb", "Scale": "ln_g", "Bias": "ln_b"},
         {"Y": "ln"}, epsilon=1e-5, begin_norm_axis=2)
    p.var("q", [-1, 7, 8])
    p.op("matmul_v2", {"X": "ln", "Y": "wq"}, {"Out": "q"},
         trans_x=False, trans_y=False)
    p.fetch("q")

    model_dir, _ = p.save(tmp_path)
    g = from_fluid(model_dir, batch_size=2)

    with torch.no_grad():
        t = torch.from_numpy
        emb = t(table)[t(ids)]
        ln = F.layer_norm(emb, (16,), t(gamma), t(beta), eps=1e-5)
        want = (ln @ t(wq)).numpy()

    got = np.asarray(run_net(g, {"ids": ids.astype(np.float32)})
                     [g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_converter_cli_fluid(rng, tmp_path):
    import yaml

    from anakin_tpu.model_io import load_model
    from anakin_tpu.tools.converter.converter import convert

    x = rng.standard_normal((1, 3, 8, 8), dtype=np.float32)
    w = rng.standard_normal((4, 3, 3, 3), dtype=np.float32) * 0.3

    p = ProgramWriter()
    p.feed("img", [-1, 3, 8, 8])
    p.weight("w", w)
    p.var("c", [-1, 4, 8, 8])
    p.op("conv2d", {"Input": "img", "Filter": "w"}, {"Output": "c"},
         strides=[1, 1], paddings=[1, 1], dilations=[1, 1], groups=1)
    p.var("r", [-1, 4, 8, 8])
    p.op("relu", {"X": "c"}, {"Out": "r"})
    p.fetch("r")
    model_dir, _ = p.save(tmp_path)

    cfg = {"TargetFramework": "FLUID", "ModelPath": model_dir,
           "Output": str(tmp_path / "out"), "Optimize": True}
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = convert(str(cfg_path))
    g = load_model(out)

    with torch.no_grad():
        want = F.relu(F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                               padding=1)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(run_net(g, {"img": x})[g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
