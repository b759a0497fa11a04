"""Op unit tests vs an independent CPU reference (torch).

Mirrors the reference's saber test strategy (`test/saber/test_saber_base.h`):
every device op is compared against a hand-written/independent CPU functor.
Here the role of the CPU functor is played by torch (CPU) — independent of
the jnp implementations under test.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from anakin_tpu.graph.ir import Node
from anakin_tpu.ops import get_op


def run_op(op, inputs, n_out=1, **attrs):
    node = Node("n", op, [f"i{k}" for k in range(len(inputs))],
                [f"o{k}" for k in range(n_out)], attrs)
    import jax.numpy as jnp
    ys = get_op(op)(node, [jnp.asarray(x) for x in inputs])
    return [np.asarray(y) for y in ys]


def t2n(t):
    return t.detach().numpy()


@pytest.mark.parametrize("stride,pad,dilation,groups", [
    (1, 1, 1, 1), (2, 3, 1, 1), (1, 0, 2, 1), (1, 1, 1, 4), (2, 1, 1, 8),
])
def test_conv2d_vs_torch(rng, stride, pad, dilation, groups):
    n, h, w_, cin, cout, k = 2, 13, 11, 8, 16, 3
    x = rng.normal(size=(n, h, w_, cin)).astype(np.float32)
    w = rng.normal(size=(k, k, cin // groups, cout)).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)
    y = run_op("conv2d", [x, w, b], strides=(stride, stride),
               padding=(pad, pad), dilation=(dilation, dilation),
               groups=groups, has_bias=True, activation="relu")[0]
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    yt = F.conv2d(xt, wt, torch.from_numpy(b), stride=stride, padding=pad,
                  dilation=dilation, groups=groups)
    yt = F.relu(yt)
    np.testing.assert_allclose(y, t2n(yt).transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-4)


def test_conv2d_residual_epilogue(rng):
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    w = rng.normal(size=(1, 1, 4, 4)).astype(np.float32)
    res = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    y = run_op("conv2d", [x, w, res], strides=(1, 1), padding=(0, 0),
               has_residual=True, activation="relu")[0]
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    yt = F.relu(F.conv2d(xt, wt) + torch.from_numpy(res.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(y, t2n(yt).transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("stride,pad", [(2, 0), (2, 1), (3, 1)])
def test_deconv2d_vs_torch(rng, stride, pad):
    n, h, w_, cin, cout, k = 1, 7, 9, 6, 4, 4
    x = rng.normal(size=(n, h, w_, cin)).astype(np.float32)
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    y = run_op("deconv2d", [x, w], strides=(stride, stride), padding=(pad, pad))[0]
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    # torch convtranspose weight layout: (in, out, kh, kw)
    wt = torch.from_numpy(w.transpose(2, 3, 0, 1))
    yt = F.conv_transpose2d(xt, wt, stride=stride, padding=pad)
    np.testing.assert_allclose(y, t2n(yt).transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["max", "avg"])
@pytest.mark.parametrize("k,s,pad,ceil", [(2, 2, 0, False), (3, 2, 1, True), (3, 3, 0, True)])
def test_pool2d_vs_torch(rng, mode, k, s, pad, ceil):
    x = rng.normal(size=(2, 13, 13, 5)).astype(np.float32)
    y = run_op("pool2d", [x], mode=mode, window=(k, k), strides=(s, s),
               padding=(pad, pad), ceil_mode=ceil)[0]
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    if mode == "max":
        yt = F.max_pool2d(xt, k, s, pad, ceil_mode=ceil)
    else:
        yt = F.avg_pool2d(xt, k, s, pad, ceil_mode=ceil, count_include_pad=False)
    np.testing.assert_allclose(y, t2n(yt).transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-5)


def test_global_pool(rng):
    x = rng.normal(size=(2, 7, 5, 3)).astype(np.float32)
    y = run_op("pool2d", [x], mode="avg", global_pooling=True)[0]
    np.testing.assert_allclose(y, x.mean(axis=(1, 2), keepdims=True), rtol=1e-5, atol=1e-6)


def test_dense_vs_torch(rng):
    x = rng.normal(size=(3, 64)).astype(np.float32)
    w = rng.normal(size=(64, 10)).astype(np.float32)
    b = rng.normal(size=(10,)).astype(np.float32)
    y = run_op("dense", [x, w, b], has_bias=True)[0]
    yt = torch.from_numpy(x) @ torch.from_numpy(w) + torch.from_numpy(b)
    np.testing.assert_allclose(y, t2n(yt), rtol=1e-4, atol=1e-5)


def test_batch_norm_scale(rng):
    x = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    mean = rng.normal(size=(6,)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=(6,)).astype(np.float32)
    y = run_op("batch_norm", [x, mean, var], eps=1e-5)[0]
    expect = (x - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-5)
    gamma = rng.normal(size=(6,)).astype(np.float32)
    beta = rng.normal(size=(6,)).astype(np.float32)
    y2 = run_op("scale", [x, gamma, beta])[0]
    np.testing.assert_allclose(y2, x * gamma + beta, rtol=1e-5, atol=1e-5)


def test_softmax_layer_norm_vs_torch(rng):
    x = rng.normal(size=(4, 17)).astype(np.float32) * 5
    y = run_op("softmax", [x], axis=-1)[0]
    np.testing.assert_allclose(y, t2n(F.softmax(torch.from_numpy(x), -1)),
                               rtol=1e-5, atol=1e-6)
    g = rng.normal(size=(17,)).astype(np.float32)
    b = rng.normal(size=(17,)).astype(np.float32)
    y2 = run_op("layer_norm", [x, g, b], begin_norm_axis=1, eps=1e-5)[0]
    yt = F.layer_norm(torch.from_numpy(x), (17,), torch.from_numpy(g),
                      torch.from_numpy(b), eps=1e-5)
    np.testing.assert_allclose(y2, t2n(yt), rtol=1e-4, atol=1e-5)


def test_lrn_vs_torch(rng):
    x = rng.normal(size=(2, 6, 6, 8)).astype(np.float32)
    y = run_op("lrn", [x], local_size=5, alpha=1e-3, beta=0.75, k=1.0)[0]
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = F.local_response_norm(xt, 5, alpha=1e-3, beta=0.75, k=1.0)
    np.testing.assert_allclose(y, t2n(yt).transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_eltwise_modes(rng):
    a = rng.normal(size=(3, 4)).astype(np.float32)
    b = rng.normal(size=(3, 4)).astype(np.float32)
    assert np.allclose(run_op("eltwise", [a, b], mode="sum")[0], a + b)
    assert np.allclose(run_op("eltwise", [a, b], mode="prod")[0], a * b)
    assert np.allclose(run_op("eltwise", [a, b], mode="max")[0], np.maximum(a, b))
    got = run_op("eltwise", [a, b], mode="sum", coeffs=[2.0, -1.0])[0]
    np.testing.assert_allclose(got, 2 * a - b, rtol=1e-6)


def test_activation_variants(rng):
    x = rng.normal(size=(5, 7)).astype(np.float32)
    xt = torch.from_numpy(x)
    cases = {
        "relu": F.relu(xt), "relu6": F.relu6(xt), "sigmoid": torch.sigmoid(xt),
        "tanh": torch.tanh(xt), "elu": F.elu(xt),
    }
    for act, expect in cases.items():
        got = run_op("activation", [x], activation=act,
                     act_alpha=1.0 if act == "elu" else 0.0)[0]
        np.testing.assert_allclose(got, t2n(expect), rtol=1e-5, atol=1e-6)
    got = run_op("activation", [x], activation="leaky_relu", act_alpha=0.1)[0]
    np.testing.assert_allclose(got, t2n(F.leaky_relu(xt, 0.1)), rtol=1e-5, atol=1e-6)


def test_prelu_vs_torch(rng):
    x = rng.normal(size=(2, 3, 3, 4)).astype(np.float32)
    slope = rng.uniform(0.1, 0.3, size=(4,)).astype(np.float32)
    y = run_op("prelu", [x, slope])[0]
    yt = F.prelu(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(slope))
    np.testing.assert_allclose(y, t2n(yt).transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-6)


def test_tensor_ops(rng):
    x = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    assert run_op("reshape", [x], shape=[2, 4, 48])[0].shape == (2, 4, 48)
    assert run_op("reshape", [x], shape=[0, -1])[0].shape == (2, 192)
    assert run_op("flatten", [x], axis=1)[0].shape == (2, 192)
    assert run_op("permute", [x], order=(0, 3, 1, 2))[0].shape == (2, 8, 4, 6)
    y = run_op("concat", [x, x], axis=3)[0]
    assert y.shape == (2, 4, 6, 16)
    parts = run_op("slice", [x], axis=3, slice_points=[2, 5], n_out=3)
    assert [p.shape[3] for p in parts] == [2, 3, 3]
    y = run_op("slice_v2", [x], axes=[1, 2], starts=[1, 0], ends=[3, 4])[0]
    np.testing.assert_allclose(y, x[:, 1:3, :4])
    y = run_op("pad", [x], pad_h=(1, 2), pad_w=(0, 1))[0]
    assert y.shape == (2, 7, 7, 8)


def test_pixel_shuffle_vs_torch(rng):
    x = rng.normal(size=(1, 4, 4, 16)).astype(np.float32)
    y = run_op("pixel_shuffle", [x], upscale_factor=2)[0]
    yt = F.pixel_shuffle(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2)
    np.testing.assert_allclose(y, t2n(yt).transpose(0, 2, 3, 1), rtol=1e-6)


def test_shuffle_channel(rng):
    x = rng.normal(size=(1, 2, 2, 6)).astype(np.float32)
    y = run_op("shuffle_channel", [x], group=2)[0]
    expect = x.reshape(1, 2, 2, 2, 3).transpose(0, 1, 2, 4, 3).reshape(1, 2, 2, 6)
    np.testing.assert_allclose(y, expect)


def test_resize_bilinear_vs_torch(rng):
    x = rng.normal(size=(1, 5, 7, 3)).astype(np.float32)
    y = run_op("resize", [x], out_hw=(10, 14), method="bilinear",
               align_corners=True)[0]
    yt = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(10, 14),
                       mode="bilinear", align_corners=True)
    np.testing.assert_allclose(y, t2n(yt).transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_argmax_topk(rng):
    x = rng.normal(size=(3, 20)).astype(np.float32)
    idx = run_op("argmax", [x], top_k=1, axis=1)[0]
    np.testing.assert_array_equal(idx[:, 0].astype(int), x.argmax(1))


def test_normalize_vs_torch(rng):
    x = rng.normal(size=(2, 3, 3, 8)).astype(np.float32)
    y = run_op("l2_normalize", [x], eps=1e-12)[0]
    yt = F.normalize(torch.from_numpy(x), dim=-1)
    np.testing.assert_allclose(y, t2n(yt), rtol=1e-4, atol=1e-5)


def test_maxout(rng):
    x = rng.normal(size=(1, 2, 2, 8)).astype(np.float32)
    y = run_op("maxout", [x], groups=2)[0]
    expect = x.reshape(1, 2, 2, 4, 2).max(-1)
    np.testing.assert_allclose(y, expect)


def test_embedding(rng):
    table = rng.normal(size=(10, 4)).astype(np.float32)
    ids = np.array([[1, 3, 0], [2, 0, 9]], np.int32)
    y = run_op("embedding", [ids, table], padding_idx=0)[0]
    assert y.shape == (2, 3, 4)
    np.testing.assert_allclose(y[0, 0], table[1])
    np.testing.assert_allclose(y[0, 2], np.zeros(4))
