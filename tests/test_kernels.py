"""Pallas kernel tests (interpret mode on CPU) vs jnp references —
the TestSaberBase pattern applied to our kernels."""

import numpy as np
import pytest

import jax.numpy as jnp

from anakin_tpu.kernels import matmul_int8


def ref_matmul_int8(a, b, ws, bias, residual, in_scale, activation,
                    out_scale=None):
    acc = a.astype(np.int32) @ b.astype(np.int32)
    y = acc.astype(np.float64) * (in_scale * ws[None, :])
    if bias is not None:
        y = y + bias[None, :]
    if residual is not None:
        y = y + residual
    if activation == "relu":
        y = np.maximum(y, 0)
    if out_scale is not None:
        return np.clip(np.round(y / out_scale), -127, 127).astype(np.int8)
    return y.astype(np.float32)


@pytest.mark.parametrize("M,K,N", [(32, 128, 128), (100, 200, 300), (256, 512, 256)])
def test_matmul_int8_fp32_out(rng, M, K, N):
    a = rng.integers(-127, 128, size=(M, K)).astype(np.int8)
    b = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
    ws = rng.uniform(0.001, 0.01, size=(N,)).astype(np.float32)
    bias = rng.normal(size=(N,)).astype(np.float32)
    got = np.asarray(matmul_int8(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(ws), jnp.asarray(bias),
        in_scale=0.05, activation="relu", interpret=True))
    want = ref_matmul_int8(a, b, ws, bias, None, 0.05, "relu")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matmul_int8_requant_out(rng):
    M, K, N = 64, 256, 128
    a = rng.integers(-127, 128, size=(M, K)).astype(np.int8)
    b = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
    ws = rng.uniform(0.001, 0.01, size=(N,)).astype(np.float32)
    got = np.asarray(matmul_int8(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(ws),
        in_scale=0.05, activation="relu", out_scale=0.7, interpret=True))
    assert got.dtype == np.int8
    want = ref_matmul_int8(a, b, ws, None, None, 0.05, "relu", out_scale=0.7)
    # round-to-nearest ties may differ by 1 LSB on exact .5 boundaries
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1
    assert (got == want).mean() > 0.99


def test_matmul_int8_residual(rng):
    M, K, N = 32, 128, 128
    a = rng.integers(-20, 20, size=(M, K)).astype(np.int8)
    b = rng.integers(-20, 20, size=(K, N)).astype(np.int8)
    ws = np.full((N,), 0.01, np.float32)
    res = rng.normal(size=(M, N)).astype(np.float32)
    got = np.asarray(matmul_int8(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(ws), None, jnp.asarray(res),
        in_scale=0.1, activation="relu", interpret=True))
    want = ref_matmul_int8(a, b, ws, None, res, 0.1, "relu")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_matmul_int8_bf16_out(rng):
    M, K, N = 32, 128, 128
    a = rng.integers(-127, 128, size=(M, K)).astype(np.int8)
    b = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
    ws = rng.uniform(0.001, 0.01, size=(N,)).astype(np.float32)
    got = matmul_int8(jnp.asarray(a), jnp.asarray(b), jnp.asarray(ws),
                      in_scale=0.05, out_dtype=jnp.bfloat16, interpret=True)
    assert got.dtype == jnp.bfloat16


# ---------------------------------------------------------- conv3x3 kernel

def ref_conv3x3(x, w, ws, bias, res, in_scale, act, out_scale=None):
    import torch
    import torch.nn.functional as F

    xt = torch.from_numpy(x.astype(np.float32).transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.astype(np.float32).transpose(3, 2, 0, 1))
    acc = F.conv2d(xt, wt, padding=1).numpy().transpose(0, 2, 3, 1)
    y = acc * (in_scale * ws)
    if bias is not None:
        y = y + bias
    if res is not None:
        y = y + res
    if act == "relu":
        y = np.maximum(y, 0)
    if out_scale is not None:
        return np.clip(np.round(y / out_scale), -127, 127).astype(np.int8)
    return y.astype(np.float32)


@pytest.mark.parametrize("shape", [(2, 8, 12, 64, 128), (1, 7, 9, 33, 64)])
def test_conv3x3_int8_kernel(rng, shape):
    from anakin_tpu.kernels.conv_int8 import conv3x3_int8

    N, H, W, C, O = shape
    x = rng.integers(-50, 50, (N, H, W, C)).astype(np.int8)
    w = rng.integers(-50, 50, (3, 3, C, O)).astype(np.int8)
    ws = rng.uniform(0.001, 0.01, O).astype(np.float32)
    b = rng.normal(size=O).astype(np.float32)
    res = rng.normal(size=(N, H, W, O)).astype(np.float32)
    got = np.asarray(conv3x3_int8(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(ws), jnp.asarray(b),
        jnp.asarray(res), in_scale=0.05, activation="relu", interpret=True))
    want = ref_conv3x3(x, w, ws, b, res, 0.05, "relu")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv3x3_int8_requant(rng):
    from anakin_tpu.kernels.conv_int8 import conv3x3_int8

    N, H, W, C, O = 1, 8, 8, 32, 64
    x = rng.integers(-50, 50, (N, H, W, C)).astype(np.int8)
    w = rng.integers(-50, 50, (3, 3, C, O)).astype(np.int8)
    ws = rng.uniform(0.001, 0.01, O).astype(np.float32)
    got = np.asarray(conv3x3_int8(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(ws),
        in_scale=0.05, activation="relu", out_scale=0.9, interpret=True))
    want = ref_conv3x3(x, w, ws, None, None, 0.05, "relu", out_scale=0.9)
    assert got.dtype == np.int8
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1
    assert (got == want).mean() > 0.99


def test_quantized_net_pallas_impl_matches_xla(rng):
    """Force impl=pallas on every eligible int8 node of a small net and
    compare against the XLA impl end-to-end."""
    import anakin_tpu as ak
    from anakin_tpu.models import build_resnet50
    from anakin_tpu.quant import calibrate, quantize_graph

    g = ak.optimize(build_resnet50(batch=1, image_size=32))
    batches = [{"input": rng.normal(size=(1, 32, 32, 3)).astype(np.float32)}]
    gq = quantize_graph(g, calibrate(g, batches, method="max"))
    from anakin_tpu.ops.quantized import _pallas_eligible

    gp = gq.clone()
    n_forced = 0
    for node in gp.nodes.values():
        if node.op.endswith("_int8") and _pallas_eligible(node):
            node.attrs["impl"] = "pallas"
            n_forced += 1
    assert n_forced > 10
    import os
    os.environ["ANAKIN_PALLAS_INTERPRET"] = "1"
    try:
        x = batches[0]["input"]
        y_xla = np.asarray(ak.Net(gq).prediction({"input": x})[gq.outputs[0]])
        y_pal = np.asarray(ak.Net(gp).prediction({"input": x})[gp.outputs[0]])
        np.testing.assert_allclose(y_pal, y_xla, rtol=5e-3, atol=1e-4)
    finally:
        del os.environ["ANAKIN_PALLAS_INTERPRET"]


# ------------------------------------------------- depthwise int8 kernel

def _dw_xla_ref(x, w, w_scale, bias, stride, in_scale, activation,
                out_scale, out_dtype):
    """Oracle: the XLA grouped-conv int8 lowering (already torch-verified
    through conv2d_int8 tests)."""
    import jax.numpy as jnp
    from jax import lax

    C = x.shape[-1]
    acc = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (in_scale * w_scale)
    if bias is not None:
        y = y + bias
    if activation == "relu6":
        y = jnp.clip(y, 0.0, 6.0)
    elif activation == "relu":
        y = jnp.maximum(y, 0.0)
    if out_scale is not None:
        return jnp.clip(jnp.round(y / out_scale), -127, 127).astype(jnp.int8)
    return y.astype(out_dtype)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("spec", [
    dict(shape=(2, 16, 16, 128), act="relu6", out_scale=0.07, bias=True),
    dict(shape=(1, 14, 14, 256), act=None, out_scale=None, bias=False),
    dict(shape=(2, 12, 20, 64), act="relu", out_scale=0.11, bias=True),
])
def test_depthwise3x3_int8_matches_xla(rng, stride, spec):
    """Pallas VPU depthwise == the XLA grouped-conv int8 lowering, both
    strides, with/without bias/act/requant (interpret mode on CPU)."""
    import jax.numpy as jnp

    from anakin_tpu.kernels.depthwise_int8 import depthwise3x3_int8

    N, H, W, C = spec["shape"]
    x = jnp.asarray(rng.integers(-127, 128, (N, H, W, C)).astype(np.int8))
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 1, C)).astype(np.int8))
    ws = jnp.asarray(rng.uniform(0.001, 0.01, (C,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.5, (C,)).astype(np.float32)) \
        if spec["bias"] else None

    got = depthwise3x3_int8(
        x, w, ws, bias, stride=stride, in_scale=0.05,
        activation=spec["act"], out_scale=spec["out_scale"],
        out_dtype=jnp.float32, interpret=True)
    want = _dw_xla_ref(x, w, ws, bias, stride, 0.05, spec["act"],
                       spec["out_scale"], jnp.float32)
    assert got.shape == want.shape, (got.shape, want.shape)
    if spec["out_scale"] is not None:
        # int8 results: allow off-by-one rounding on ties
        diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
        assert (diff <= 1).all() and (diff == 0).mean() > 0.999
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_conv2d_int8_dispatches_depthwise_pallas(rng):
    """conv2d_int8 with impl='pallas' routes dw3x3 to the Pallas kernel
    and matches the XLA impl."""
    import os

    from anakin_tpu.graph.ir import Node
    from anakin_tpu.ops import get_op

    os.environ["ANAKIN_PALLAS_INTERPRET"] = "1"
    try:
        C = 64
        x = rng.integers(-127, 128, (2, 8, 8, C)).astype(np.int8)
        w = rng.integers(-127, 128, (3, 3, 1, C)).astype(np.int8)
        ws = rng.uniform(0.001, 0.01, (C,)).astype(np.float32)
        import jax.numpy as jnp

        args = [jnp.asarray(x), jnp.asarray(w), jnp.asarray(ws)]
        mk = lambda impl, s: Node("n", "conv2d_int8", [], [], dict(
            strides=(s, s), padding=(1, 1), groups=C, in_scale=0.05,
            out_scale=0.09, activation="relu6", impl=impl))
        for s in (1, 2):
            y_p = get_op("conv2d_int8")(mk("pallas", s), args)[0]
            y_x = get_op("conv2d_int8")(mk("xla", s), args)[0]
            assert y_p.dtype == jnp.int8
            diff = np.abs(np.asarray(y_p, np.int32) - np.asarray(y_x, np.int32))
            assert (diff <= 1).all()
    finally:
        del os.environ["ANAKIN_PALLAS_INTERPRET"]


@pytest.mark.parametrize("variant", ["v1", "v2"])
@pytest.mark.parametrize("M,K,N,G,bn,bk", [
    (8, 256, 384, 128, 256, 256),      # single k block
    (8, 512, 256, 128, 128, 256),      # k accumulation (2 blocks)
    (3, 256, 200, 256, 256, 256),      # M/N padding, G = K fallback shape
])
def test_matmul_w4_matches_dequant_reference(rng, M, K, N, G, bn, bk,
                                             variant):
    """Pallas w4 kernel == numpy dequant matmul, bit-level unpack parity
    — both the shipped v1 path and the selectable v2 variant."""
    from anakin_tpu.kernels.matmul_w4 import matmul_w4
    from anakin_tpu.quant.quantize import _w4_group_quantize

    w = rng.normal(size=(K, N)).astype(np.float32)
    packed, scale, g = _w4_group_quantize(w, group=G)
    assert g == G
    x = rng.normal(size=(M, K)).astype(np.float32)
    y = np.asarray(matmul_w4(jnp.asarray(x), jnp.asarray(packed),
                             jnp.asarray(scale), group=G, block_n=bn,
                             block_k=bk, variant=variant, interpret=True))
    # numpy reference through the same packed representation
    p32 = packed.astype(np.int32)
    lo = ((p32 & 0xF) ^ 8) - 8
    hi = p32 >> 4
    q = np.concatenate([lo.reshape(K // G, G // 2, N),
                        hi.reshape(K // G, G // 2, N)], axis=1)
    deq = (q.astype(np.float32) * scale[:, None, :]).reshape(K, N)
    np.testing.assert_allclose(y, x @ deq, rtol=1e-5, atol=1e-4)


def test_dense_w4_pallas_impl_matches_xla(rng):
    """dense_w4 impl='pallas' (interpret) == impl='xla' numerics."""
    import anakin_tpu as ak
    from anakin_tpu.graph.ir import Graph
    from anakin_tpu.quant import weight_only_quantize

    K, N, B = 256, 192, 4
    g = Graph("t")
    g.add_input("x", (B, K), "float32")
    g.params["w"] = rng.normal(size=(K, N)).astype(np.float32)
    g.params["b"] = rng.normal(size=(N,)).astype(np.float32)
    g.add_node("d", "dense", ["x", "w", "b"], ["y"], axis=1, has_bias=True,
               activation="relu")
    g.outputs = ["y"]
    g.validate()
    gq = weight_only_quantize(g, min_elems=1, bits=4, group=128)
    x = rng.normal(size=(B, K)).astype(np.float32)
    ya = np.asarray(ak.Net(gq).prediction({"x": x})["y"])
    gp = gq.clone()
    gp.nodes["d"].attrs["impl"] = "pallas"
    import os
    os.environ["ANAKIN_PALLAS_INTERPRET"] = "1"
    try:
        yb = np.asarray(ak.Net(gp).prediction({"x": x})["y"])
    finally:
        del os.environ["ANAKIN_PALLAS_INTERPRET"]
    np.testing.assert_allclose(ya, yb, rtol=1e-4, atol=1e-4)
