"""Importing models from torch / ONNX / Caffe.

The converter layer (reference: `tools/external_converter_v2/`) in three
forms.  All frontends translate NCHW sources to the engine's NHWC layout
and produce the same Graph IR, so optimize/quantize/Net apply uniformly.

Run: python examples/convert_model.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch
import torch.nn as nn

import anakin_tpu as ak
from anakin_tpu.tools.converter import from_torch


def main():
    # --- torch: trace any eval-mode nn.Module ---------------------------
    model = nn.Sequential(
        nn.Conv2d(3, 16, 3, padding=1), nn.BatchNorm2d(16), nn.ReLU(),
        nn.MaxPool2d(2), nn.Flatten(), nn.Linear(16 * 16 * 16, 10))
    model.eval()
    example = torch.zeros(1, 3, 32, 32)
    graph = ak.optimize(from_torch(model, example))
    net = ak.Net(graph)
    x = np.random.default_rng(0).normal(size=(1, 32, 32, 3)).astype("float32")
    y = net.prediction({graph.inputs[0]: x})[graph.outputs[0]]
    print("torch   ->", graph.name, np.asarray(y).shape)

    # --- ONNX: parse a .onnx file (no onnx pip package needed) ----------
    #   graph = ak.optimize(from_onnx("model.onnx"))
    # The self-contained schema lives in tools/converter/onnx_proto/.

    # --- Caffe: deploy.prototxt + .caffemodel ---------------------------
    #   graph = ak.optimize(from_caffe("deploy.prototxt", "w.caffemodel"))
    # BVLC layers plus the SSD fork's Normalize/Permute/PriorBox/
    # DetectionOutput are supported (tools/converter/caffe_proto/).

    # --- or drive everything from a yaml config (CLI) -------------------
    #   python -m anakin_tpu.tools.converter.converter config.yaml
    # with TargetFramework: TORCH | ONNX | CAFFE, optional Optimize /
    # ScaleTable (int8) steps — the output directory round-trips through
    # model_io.load_model.


if __name__ == "__main__":
    main()
