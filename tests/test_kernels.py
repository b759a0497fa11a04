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
