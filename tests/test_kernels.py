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
