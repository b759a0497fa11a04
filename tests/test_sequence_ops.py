"""Sequence/RNN op tests vs torch references (reference analog: the RNN
saber tests + `test/framework/net/net_exec_test_language` workloads)."""

import numpy as np
import pytest
import torch

from tests.test_ops import run_op, t2n


def test_lstm_vs_torch(rng):
    B, T, D, H = 3, 7, 5, 6
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    w_ih = rng.normal(size=(D, 4 * H)).astype(np.float32) * 0.3
    w_hh = rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.3
    b = rng.normal(size=(4 * H,)).astype(np.float32) * 0.1
    y = run_op("lstm", [x, w_ih, w_hh, b], has_bias=True)[0]

    cell = torch.nn.LSTM(D, H, batch_first=True)
    # torch gate order (i, f, g, o) matches ours
    with torch.no_grad():
        cell.weight_ih_l0.copy_(torch.from_numpy(w_ih.T))
        cell.weight_hh_l0.copy_(torch.from_numpy(w_hh.T))
        cell.bias_ih_l0.copy_(torch.from_numpy(b))
        cell.bias_hh_l0.zero_()
    yt, _ = cell(torch.from_numpy(x))
    np.testing.assert_allclose(y, t2n(yt), rtol=1e-4, atol=1e-5)


def test_lstm_masked_lengths(rng):
    B, T, D, H = 2, 6, 4, 5
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    w_ih = rng.normal(size=(D, 4 * H)).astype(np.float32) * 0.3
    w_hh = rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.3
    lengths = np.array([6, 3], np.int32)
    y = run_op("lstm", [x, w_ih, w_hh, lengths], has_bias=False,
               has_lengths=True)[0]
    # row 1 beyond t=3 must be zeros; prefix must equal unmasked run on prefix
    assert np.abs(y[1, 3:]).max() == 0.0
    y_prefix = run_op("lstm", [x[1:2, :3], w_ih, w_hh], has_bias=False)[0]
    np.testing.assert_allclose(y[1, :3], y_prefix[0], rtol=1e-5, atol=1e-6)


def test_gru_vs_torch(rng):
    B, T, D, H = 2, 5, 4, 3
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    w_ih = rng.normal(size=(D, 3 * H)).astype(np.float32) * 0.3
    w_hh = rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.3
    b = rng.normal(size=(3 * H,)).astype(np.float32) * 0.1
    y = run_op("gru", [x, w_ih, w_hh, b], has_bias=True)[0]
    cell = torch.nn.GRU(D, H, batch_first=True)
    with torch.no_grad():
        cell.weight_ih_l0.copy_(torch.from_numpy(w_ih.T))
        cell.weight_hh_l0.copy_(torch.from_numpy(w_hh.T))
        cell.bias_ih_l0.copy_(torch.from_numpy(b))
        cell.bias_hh_l0.zero_()
    yt, _ = cell(torch.from_numpy(x))
    np.testing.assert_allclose(y, t2n(yt), rtol=1e-4, atol=1e-5)


def test_lstmp_shapes(rng):
    B, T, D, H, P = 2, 4, 3, 8, 5
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    w_ih = rng.normal(size=(D, 4 * H)).astype(np.float32) * 0.3
    w_hh = rng.normal(size=(P, 4 * H)).astype(np.float32) * 0.3
    w_proj = rng.normal(size=(H, P)).astype(np.float32) * 0.3
    y = run_op("lstmp", [x, w_ih, w_hh, w_proj], has_bias=False)[0]
    assert y.shape == (B, T, P)
    assert np.isfinite(y).all()


def test_sequence_pool_modes(rng):
    B, T, D = 3, 5, 4
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    lengths = np.array([5, 2, 4], np.int32)
    avg = run_op("sequence_pool", [x, lengths], mode="average")[0]
    np.testing.assert_allclose(avg[1], x[1, :2].mean(0), rtol=1e-5)
    mx = run_op("sequence_pool", [x, lengths], mode="max")[0]
    np.testing.assert_allclose(mx[1], x[1, :2].max(0), rtol=1e-5)
    last = run_op("sequence_pool", [x, lengths], mode="last")[0]
    np.testing.assert_allclose(last[1], x[1, 1], rtol=1e-5)
    sm = run_op("sequence_pool", [x, lengths], mode="sqrt")[0]
    np.testing.assert_allclose(sm[2], x[2, :4].sum(0) / 2.0, rtol=1e-5)


def test_sequence_conv_matches_dense_window(rng):
    B, T, D, O, CL = 2, 6, 3, 5, 3
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    w = rng.normal(size=(CL * D, O)).astype(np.float32)
    y = run_op("sequence_conv", [x, w], context_length=CL, context_start=-1)[0]
    # manual: row t sees [t-1, t, t+1] with zero padding
    xp = np.pad(x, ((0, 0), (1, 1), (0, 0)))
    cols = np.concatenate([xp[:, 0:T], xp[:, 1:T + 1], xp[:, 2:T + 2]], axis=-1)
    np.testing.assert_allclose(y, cols @ w, rtol=1e-4, atol=1e-5)


def test_reverse_sequence(rng):
    x = rng.normal(size=(2, 4, 3)).astype(np.float32)
    lengths = np.array([4, 2], np.int32)
    y = run_op("reverse_sequence", [x, lengths])[0]
    np.testing.assert_allclose(y[0], x[0, ::-1])
    np.testing.assert_allclose(y[1, :2], x[1, 1::-1])
    np.testing.assert_allclose(y[1, 2:], x[1, 2:])


def test_crf_decoding_vs_brute_force(rng):
    B, T, N = 2, 4, 3
    emission = rng.normal(size=(B, T, N)).astype(np.float32)
    w = rng.normal(size=(N + 2, N)).astype(np.float32)
    path = run_op("crf_decoding", [emission, w])[0]
    # brute force over all label sequences
    import itertools
    start, end, trans = w[0], w[1], w[2:]
    for b in range(B):
        best, best_score = None, -np.inf
        for labs in itertools.product(range(N), repeat=T):
            s = start[labs[0]] + emission[b, 0, labs[0]]
            for t in range(1, T):
                s += trans[labs[t - 1], labs[t]] + emission[b, t, labs[t]]
            s += end[labs[-1]]
            if s > best_score:
                best_score, best = s, labs
        np.testing.assert_array_equal(path[b], np.array(best))


def test_attention_padding_mask(rng):
    x = rng.normal(size=(2, 3, 5)).astype(np.float32)
    lengths = np.array([5, 2], np.int32)
    y = run_op("attention_padding_mask", [x, lengths], mask=-1e4)[0]
    assert (y[1, :, 2:] == -1e4).all()
    np.testing.assert_allclose(y[0], x[0])
