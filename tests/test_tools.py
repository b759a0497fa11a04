"""Converter CLI + profiler tests."""

import os

import numpy as np
import pytest
import torch
import torch.nn as nn
import yaml

import anakin_tpu as ak
from anakin_tpu.runtime.profiler import flops_estimate, roofline_report


class TinyNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(3, 8, 3, padding=1)
        self.bn = nn.BatchNorm2d(8)
        self.relu = nn.ReLU()
        self.gap = nn.AdaptiveAvgPool2d(1)
        self.fl = nn.Flatten()
        self.fc = nn.Linear(8, 4)

    def forward(self, x):
        return self.fc(self.fl(self.gap(self.relu(self.bn(self.conv(x))))))


def test_converter_cli_roundtrip(tmp_path):
    torch.manual_seed(0)
    model_path = str(tmp_path / "model.pt")
    torch.save(TinyNet().eval(), model_path)
    cfg = {
        "TargetFramework": "TORCH",
        "ModelPath": model_path,
        "ExampleInputShape": [1, 3, 16, 16],
        "Output": str(tmp_path / "out"),
        "Optimize": True,
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    from anakin_tpu.tools.converter.converter import main

    assert main([cfg_path]) == 0
    from anakin_tpu.model_io import load_model

    g = load_model(str(tmp_path / "out"))
    # optimized at conversion: BN folded away
    assert "batch_norm" not in [n.op for n in g.nodes.values()]
    y = ak.Net(g).prediction({"x": np.zeros((1, 16, 16, 3), np.float32)})
    assert list(y.values())[0].shape == (1, 4)


def test_converter_cli_bad_framework(tmp_path):
    cfg_path = str(tmp_path / "c.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"TargetFramework": "CNTK", "Output": "x"}, f)
    from anakin_tpu.tools.converter.converter import convert

    with pytest.raises(ValueError):
        convert(cfg_path)


def test_flops_estimate_resnet():
    from anakin_tpu.models import build_resnet50

    g = ak.optimize(build_resnet50(batch=1, image_size=224))
    table = flops_estimate(g)
    total = sum(v["flops"] for v in table.values())
    # ResNet-50 at 224x224 is ~4.1 GFLOP (2*MACs) within 20%
    assert 7.0e9 < total < 9.5e9, total  # 2*MACs convention: ~3.9 GMACs
    report = roofline_report(g, step_seconds=1e-3)
    assert "bound" in report and "GFLOP" in report
