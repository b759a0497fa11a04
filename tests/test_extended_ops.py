"""Long-tail op tests (deformable conv, ctc_align, topk pooling, psroi)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.test_ops import run_op


def test_deformable_conv_zero_offsets_equals_conv(rng):
    """With zero offsets, deformable conv must equal a standard conv."""
    N, H, W, C, O, K = 1, 6, 7, 4, 8, 3
    x = rng.normal(size=(N, H, W, C)).astype(np.float32)
    w = rng.normal(size=(K, K, C, O)).astype(np.float32)
    OH, OW = H, W
    offsets = np.zeros((N, OH, OW, 2 * K * K), np.float32)
    got = run_op("deformable_conv", [x, offsets, w], strides=(1, 1),
                 padding=(1, 1))[0]
    want = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    torch.from_numpy(w.transpose(3, 2, 0, 1)), padding=1)
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_deformable_conv_half_pixel_offsets(rng):
    """Half-pixel x-offset = average of neighboring columns."""
    N, H, W, C, O = 1, 4, 5, 2, 3
    x = rng.normal(size=(N, H, W, C)).astype(np.float32)
    w = rng.normal(size=(1, 1, C, O)).astype(np.float32)
    offsets = np.zeros((N, H, W, 2), np.float32)
    offsets[..., 1] = 0.5  # dx = +0.5
    got = run_op("deformable_conv", [x, offsets, w], strides=(1, 1),
                 padding=(0, 0))[0]
    x_shift = 0.5 * (x + np.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:])
    want = x_shift @ w[0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ctc_align():
    labels = np.array([[1, 1, 0, 2, 2, 3],
                       [0, 0, 4, 4, 0, 4]], np.int32)
    out, out_len = run_op("ctc_align", [labels], n_out=2, blank=0,
                          merge_repeated=True)
    np.testing.assert_array_equal(out[0][:3], [1, 2, 3])
    np.testing.assert_array_equal(out_len, [3, 2])
    np.testing.assert_array_equal(out[1][:2], [4, 4])


def test_ctc_align_with_lengths():
    labels = np.array([[1, 2, 3, 9, 9, 9]], np.int32)
    lengths = np.array([3], np.int32)
    out, out_len = run_op("ctc_align", [labels, lengths], n_out=2, blank=0)
    assert out_len[0] == 3
    np.testing.assert_array_equal(out[0][:3], [1, 2, 3])


def test_topk_pooling(rng):
    x = rng.normal(size=(2, 4, 5, 3)).astype(np.float32)
    y = run_op("topk_pooling", [x], top_k=2)[0]
    assert y.shape == (2, 6)
    flat = x.reshape(2, 20, 3)
    want = np.sort(flat, axis=1)[:, ::-1][:, :2]  # [2, 2, 3] top2 per ch
    np.testing.assert_allclose(y.reshape(2, 3, 2),
                               want.transpose(0, 2, 1), rtol=1e-6)


def test_topk_avg_pooling(rng):
    x = rng.normal(size=(1, 3, 3, 2)).astype(np.float32)
    y = run_op("topk_avg_pooling", [x], top_ks=[1, 3])[0]
    assert y.shape == (1, 4)
    flat = np.sort(x.reshape(1, 9, 2), axis=1)[:, ::-1]
    np.testing.assert_allclose(y[0, :2], flat[0, 0], rtol=1e-5)
    np.testing.assert_allclose(y[0, 2:], flat[0, :3].mean(0), rtol=1e-5)


def test_affine_channel(rng):
    x = rng.normal(size=(1, 2, 2, 3)).astype(np.float32)
    s = rng.normal(size=(3,)).astype(np.float32)
    b = rng.normal(size=(3,)).astype(np.float32)
    y = run_op("affine_channel", [x, s, b])[0]
    np.testing.assert_allclose(y, x * s + b, rtol=1e-6)


def test_dfmb_psroi_align_shapes(rng):
    ph = pw = 3
    C = 2
    feat = rng.normal(size=(1, 8, 8, ph * pw * C)).astype(np.float32)
    rois = np.array([[0, 0, 0, 32, 32]], np.float32)
    y = run_op("dfmb_psroi_align", [feat, rois], pooled_hw=(ph, pw),
               spatial_scale=0.25)[0]
    assert y.shape == (1, ph, pw, C)
    assert np.isfinite(y).all()
