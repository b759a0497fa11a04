"""Torch importer golden tests: converted graphs must match torch outputs
(the converter-parity analog of the reference's per-frontend converters)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import anakin_tpu as ak
from anakin_tpu.tools.converter import from_torch


def run_both(model, x_nchw, rtol=2e-4, atol=2e-4, optimize=False):
    model = model.eval()
    with torch.no_grad():
        want = model(torch.from_numpy(x_nchw)).numpy()
    g = from_torch(model, torch.from_numpy(x_nchw))
    if optimize:
        g = ak.optimize(g)
    x_nhwc = x_nchw.transpose(0, 2, 3, 1) if x_nchw.ndim == 4 else x_nchw
    got = np.asarray(ak.Net(g).prediction({"x": x_nhwc})[g.outputs[0]])
    if want.ndim == 4:
        want = want.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    return g


class SmallCNN(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 16, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(16)
        self.relu = nn.ReLU()
        self.pool = nn.MaxPool2d(2, 2)
        self.conv2 = nn.Conv2d(16, 32, 3, stride=2, padding=1)
        self.bn2 = nn.BatchNorm2d(32)
        self.gap = nn.AdaptiveAvgPool2d(1)
        self.flat = nn.Flatten()
        self.fc = nn.Linear(32, 10)
        self.softmax = nn.Softmax(dim=1)

    def forward(self, x):
        x = self.pool(self.relu(self.bn1(self.conv1(x))))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.flat(self.gap(x))
        return self.softmax(self.fc(x))


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.normal_(0, 0.2)


def test_small_cnn(rng):
    torch.manual_seed(0)
    m = SmallCNN()
    _randomize_bn(m)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    run_both(m, x)


def test_small_cnn_optimized_matches_torch(rng):
    torch.manual_seed(1)
    m = SmallCNN()
    _randomize_bn(m)
    x = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    g = run_both(m, x, optimize=True, rtol=5e-4, atol=5e-4)
    assert "batch_norm" not in [n.op for n in g.nodes.values()]


class ResidualBlockNet(nn.Module):
    """Residual add via operator.+ (tests call_function path)."""

    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(8, 8, 3, padding=1)
        self.c2 = nn.Conv2d(8, 8, 3, padding=1)
        self.relu = nn.ReLU()

    def forward(self, x):
        y = self.relu(self.c1(x))
        y = self.c2(y)
        return self.relu(y + x)


def test_residual_add(rng):
    torch.manual_seed(2)
    x = rng.normal(size=(1, 8, 10, 10)).astype(np.float32)
    run_both(ResidualBlockNet(), x)


class FlattenLinearNet(nn.Module):
    """Flatten(NCHW)->Linear: exercises the weight-row permutation."""

    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(3, 6, 3, padding=1)
        self.fc = nn.Linear(6 * 8 * 8, 5)

    def forward(self, x):
        x = self.conv(x)
        x = torch.flatten(x, 1)
        return self.fc(x)


def test_flatten_linear_weight_permutation(rng):
    torch.manual_seed(3)
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    run_both(FlattenLinearNet(), x)


class CatNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.a = nn.Conv2d(4, 6, 1)
        self.b = nn.Conv2d(4, 10, 1)

    def forward(self, x):
        return torch.cat([self.a(x), self.b(x)], dim=1)


def test_cat_channel_axis_mapped(rng):
    torch.manual_seed(4)
    x = rng.normal(size=(1, 4, 5, 5)).astype(np.float32)
    run_both(CatNet(), x)


class UpsamplePixelShuffleNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(3, 16, 3, padding=1)
        self.ps = nn.PixelShuffle(2)
        self.up = nn.Upsample(scale_factor=2, mode="nearest")

    def forward(self, x):
        return self.up(self.ps(self.conv(x)))


def test_upsample_pixel_shuffle(rng):
    torch.manual_seed(5)
    x = rng.normal(size=(1, 3, 6, 6)).astype(np.float32)
    run_both(UpsamplePixelShuffleNet(), x)


class GroupedDepthwiseNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.dw = nn.Conv2d(8, 8, 3, padding=1, groups=8)
        self.pw = nn.Conv2d(8, 16, 1)
        self.act = nn.ReLU6()

    def forward(self, x):
        return self.act(self.pw(self.dw(x)))


def test_depthwise_groups(rng):
    torch.manual_seed(6)
    x = rng.normal(size=(1, 8, 9, 9)).astype(np.float32)
    run_both(GroupedDepthwiseNet(), x)


class LstmNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.lstm = nn.LSTM(6, 8, num_layers=2, batch_first=True)
        self.fc = nn.Linear(8, 4)

    def forward(self, x):
        y, _ = self.lstm(x)
        return self.fc(y)


def test_lstm_import(rng):
    torch.manual_seed(7)
    m = LstmNet().eval()
    x = rng.normal(size=(2, 5, 6)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    # fx can't trace the (out, (h,c)) tuple indexing generically, so wrap
    class Wrap(nn.Module):
        def __init__(self, m):
            super().__init__()
            self.lstm = m.lstm
            self.fc = m.fc

        def forward(self, x):
            y, _ = self.lstm(x)
            return self.fc(y)

    g = from_torch(Wrap(m), torch.from_numpy(x))
    got = np.asarray(ak.Net(g).prediction({"x": x})[g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_unsupported_module_raises(rng):
    class Weird(nn.Module):
        def __init__(self):
            super().__init__()
            self.t = nn.Transformer(d_model=8, nhead=2, num_encoder_layers=1,
                                    num_decoder_layers=1, dim_feedforward=16,
                                    batch_first=True)

        def forward(self, x):
            return self.t(x, x)

    with pytest.raises(Exception):
        from_torch(Weird(), torch.zeros(1, 4, 8))
