"""Real-weights conv-net accuracy pipeline (VERDICT round-2 item 2).

Fast version of tools/accuracy_report.py::composite_resnet_accuracy —
a 15-conv ResNet briefly trained on multi-digit composites, exported
through torch's ONNX serializer, imported, calibrated and quantized.
The full-scale run (14 epochs, 12k composites, >=93% exact-match) is
artifacts/accuracy_report.json; this test proves the same pipeline
end to end in seconds.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def report(tmp_path_factory):
    from accuracy_report import composite_resnet_accuracy

    weights = str(tmp_path_factory.mktemp("acc") / "tiny.pt")
    return composite_resnet_accuracy(
        methods=("max",), n_test=300, n_cal=128, epochs=2, n_train=800,
        weights_path=weights)


def test_import_parity(report):
    # the imported graph IS the torch model: logits match to fp32 noise
    assert report["import_parity_vs_torch"]["logit_rel_rms"] < 1e-4
    assert report["import_parity_vs_torch"]["exact_match_agreement"] == 1.0


def test_topology_is_real(report):
    # 15 convs + the dense head went through the frontend + optimizer
    assert report["conv_layers"] == 16
    assert report["methods"]["max"]["n_int8_nodes"] >= 10


def test_int8_tracks_fp32(report):
    # 2-epoch weights are weak, but int8 must still TRACK fp32 decisions
    m = report["methods"]["max"]
    assert m["exact_match_agreement_with_fp32"] >= 0.9
    assert abs(m["top1_delta"]) <= 0.05


def test_per_layer_growth_shape(report):
    growth = report["per_layer_error_growth"]["max"]
    assert len(growth) == 16
    # error stays bounded through the depth (no divergence)
    assert growth[-1]["rel_rms"] < 0.5
    assert all(g["rel_rms"] >= 0 for g in growth)
