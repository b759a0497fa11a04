"""Segmentation model family (parity: the reference's seg accuracy
harness, `test/framework/net/seg_precision_test.cpp`)."""

import numpy as np

import anakin_tpu as ak
from anakin_tpu.models import build_fcn8s_lite, build_icnet_lite


def _run(g, x):
    net = ak.Net(g)
    return net.prediction({"input": x})


def test_fcn8s_shapes_and_optimize(rng):
    g = build_fcn8s_lite(batch=2, image_size=32, n_classes=5)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    res = _run(g, x)
    logits = np.asarray(res[g.outputs[0]])
    labels = np.asarray(res[g.outputs[1]]).squeeze(-1)
    assert logits.shape == (2, 32, 32, 5)
    assert labels.shape == (2, 32, 32)
    assert labels.min() >= 0 and labels.max() < 5
    # argmax(labels) consistent with logits
    np.testing.assert_array_equal(labels, logits.argmax(-1))
    # optimizer preserves numerics
    og = ak.optimize(g)
    res2 = _run(og, x)
    np.testing.assert_allclose(np.asarray(res2[og.outputs[0]]), logits,
                               rtol=1e-4, atol=1e-4)


def test_icnet_cascade(rng):
    g = build_icnet_lite(batch=1, image_size=32, n_classes=4)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    res = _run(g, x)
    logits = np.asarray(res[g.outputs[0]])
    assert logits.shape == (1, 32, 32, 4)
    assert np.isfinite(logits).all()
