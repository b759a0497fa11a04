"""Graph rewriter tests: folding/fusion must preserve numerics
(reference analog: `test/framework/graph/vgraph_fusion_test.cpp` + the
golden-model pattern of SURVEY.md section 7 build step 3)."""

import numpy as np
import pytest

import anakin_tpu as ak
from anakin_tpu.graph.passes import (
    eliminate_dead_nodes,
    fold_batch_norms,
    fuse_activations,
    fuse_conv_eltwise,
    optimize,
)
from anakin_tpu.models import build_mobilenet_v2, build_resnet50


def _run(graph, x):
    net = ak.Net(graph)
    return np.asarray(net.prediction({"input": x})[graph.outputs[0]])


def conv_bn_relu_graph(rng):
    from anakin_tpu.graph.ir import GraphBuilder

    b = GraphBuilder("t")
    x = b.input((2, 8, 8, 4), name="input")
    w = b.param(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
    bias = b.param(rng.normal(size=(8,)).astype(np.float32))
    y = b.op("conv2d", [x, w, bias], strides=(1, 1), padding=(1, 1), has_bias=True)
    mean = b.param(rng.normal(size=(8,)).astype(np.float32) * 0.1)
    var = b.param(rng.uniform(0.5, 1.5, size=(8,)).astype(np.float32))
    y = b.op("batch_norm", [y, mean, var])
    gamma = b.param(rng.uniform(0.5, 1.5, size=(8,)).astype(np.float32))
    beta = b.param(rng.normal(size=(8,)).astype(np.float32) * 0.1)
    y = b.op("scale", [y, gamma, beta])
    y = b.op("activation", [y], activation="relu")
    b.output(y)
    return b.finish()


def test_fold_bn_scale_into_conv(rng):
    g = conv_bn_relu_graph(rng)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    y0 = _run(g, x)
    g2 = fold_batch_norms(g)
    ops = [n.op for n in g2.nodes.values()]
    assert "batch_norm" not in ops and "scale" not in ops
    y1 = _run(g2, x)
    np.testing.assert_allclose(y0, y1, rtol=1e-4, atol=1e-5)


def test_fuse_activation_into_conv(rng):
    g = fold_batch_norms(conv_bn_relu_graph(rng))
    g2 = fuse_activations(g)
    assert [n.op for n in g2.nodes.values()] == ["conv2d"]
    conv = next(iter(g2.nodes.values()))
    assert conv.attrs["activation"] == "relu"
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    np.testing.assert_allclose(_run(g, x), _run(g2, x), rtol=1e-5, atol=1e-6)


def test_fold_skipped_when_conv_output_is_shared(rng):
    """If the conv output feeds another consumer, folding would corrupt it."""
    g = conv_bn_relu_graph(rng)
    conv_out = [n for n in g.nodes.values() if n.op == "conv2d"][0].outputs[0]
    g.add_node("taper", "activation", [conv_out], ["tap:out"], activation="tanh")
    g.mark_output("tap:out")
    g2 = fold_batch_norms(g)
    assert "batch_norm" in [n.op for n in g2.nodes.values()]


def test_fuse_conv_eltwise_residual(rng):
    from anakin_tpu.graph.ir import GraphBuilder

    b = GraphBuilder("t")
    x = b.input((1, 6, 6, 4), name="input")
    w1 = b.param(rng.normal(size=(1, 1, 4, 4)).astype(np.float32))
    w2 = b.param(rng.normal(size=(3, 3, 4, 4)).astype(np.float32))
    branch = b.op("conv2d", [x, w2], strides=(1, 1), padding=(1, 1))
    trunk = b.op("conv2d", [x, w1], strides=(1, 1), padding=(0, 0))
    y = b.op("eltwise", [trunk, branch], mode="sum")
    y = b.op("activation", [y], activation="relu")
    b.output(y)
    g = b.finish()
    x_val = rng.normal(size=(1, 6, 6, 4)).astype(np.float32)
    y0 = _run(g, x_val)
    g2 = fuse_conv_eltwise(fuse_activations(g))
    ops = [n.op for n in g2.nodes.values()]
    assert "eltwise" not in ops
    assert any(n.attr("has_residual") for n in g2.nodes.values())
    np.testing.assert_allclose(y0, _run(g2, x_val), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("builder", [build_resnet50, build_mobilenet_v2])
def test_full_optimize_preserves_numerics(rng, builder):
    g = builder(batch=1, image_size=32)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    y0 = _run(g, x)
    go = optimize(g)
    assert len(go.nodes) < len(g.nodes) * 0.5
    for op in ("batch_norm", "scale", "activation"):
        assert op not in [n.op for n in go.nodes.values()]
    y1 = _run(go, x)
    np.testing.assert_allclose(y0, y1, rtol=5e-3, atol=1e-4)
    # classification agreement
    assert y0.argmax() == y1.argmax()


def test_dead_node_elimination(rng):
    from anakin_tpu.graph.ir import GraphBuilder

    b = GraphBuilder("t")
    x = b.input((1, 4), name="input")
    y = b.op("activation", [x], activation="relu")
    dead = b.op("activation", [x], activation="tanh")
    b.output(y)
    g = b.finish()
    g2 = eliminate_dead_nodes(g)
    assert len(g2.nodes) == 1


def test_horizontal_combine_googlenet_branches(rng):
    from anakin_tpu.graph.passes import horizontal_combine
    from anakin_tpu.models import build_googlenet

    g = optimize(build_googlenet(batch=1, image_size=64, num_classes=10))
    n_before = sum(1 for n in g.nodes.values() if n.op == "conv2d")
    gh = horizontal_combine(g)
    n_after = sum(1 for n in gh.nodes.values() if n.op == "conv2d")
    assert n_after < n_before
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    y0 = _run(g, x)
    y1 = _run(gh, x)
    np.testing.assert_allclose(y0, y1, rtol=1e-4, atol=1e-5)


def test_stem_space_to_depth_exact(rng):
    """Stem rewrite is bit-exact: 7x7s2p3 RGB conv == s2d + 4x4s1 conv
    (weight regroup verified through the real op pipeline)."""
    import anakin_tpu as ak
    from anakin_tpu.graph.passes import stem_space_to_depth
    from anakin_tpu.models import build_resnet50

    g = build_resnet50(batch=1, image_size=32)
    sg = stem_space_to_depth(g)
    assert "stem_space_to_depth" in sg.applied_passes
    assert any(n.op == "space_to_depth" for n in sg.nodes.values())
    # the rewritten conv is pinned out of the int8 region
    stem = [n for n in sg.nodes.values()
            if n.op == "conv2d" and n.attr("padding") == ((2, 1), (2, 1))]
    assert len(stem) == 1 and sg.precisions[stem[0].name] == "fp32"
    x = rng.standard_normal((1, 32, 32, 3)).astype("float32")
    a = ak.Net(g).prediction({"input": x})[g.outputs[0]]
    b = ak.Net(sg).prediction({"input": x})[sg.outputs[0]]
    import numpy as np

    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stride_up_exact(rng):
    """1x1/s2 conv stride hoists through a pointwise chain into the
    producer conv, numerics unchanged (reference apply_stride_up)."""
    import numpy as np

    import anakin_tpu as ak
    from anakin_tpu.graph.ir import GraphBuilder
    from anakin_tpu.graph.passes import stride_up

    b = GraphBuilder("su")
    x = b.input((1, 16, 16, 8), name="input")
    w1 = b.param(rng.normal(0, 0.2, (3, 3, 8, 8)).astype("float32"), "w1")
    y = b.op("conv2d", [x, w1], strides=(1, 1), padding=(1, 1))
    mean = b.param(rng.normal(0, 0.1, 8).astype("float32"), "m")
    var = b.param(rng.uniform(0.5, 1.5, 8).astype("float32"), "v")
    y = b.op("batch_norm", [y, mean, var])
    y = b.op("activation", [y], activation="relu")
    w2 = b.param(rng.normal(0, 0.2, (1, 1, 8, 16)).astype("float32"), "w2")
    y = b.op("conv2d", [y, w2], strides=(2, 2), padding=(0, 0))
    b.output(y)
    g = b.finish()

    sg = stride_up(g)
    assert "stride_up" in sg.applied_passes
    strides = sorted(tuple(n.attr("strides")) for n in sg.nodes.values()
                     if n.op == "conv2d")
    assert strides == [(1, 1), (2, 2)]
    first = [n for n in sg.nodes.values() if n.op == "conv2d"][0]
    assert tuple(first.attr("strides")) == (2, 2)  # hoisted to producer

    xv = rng.normal(size=(1, 16, 16, 8)).astype("float32")
    a = np.asarray(ak.Net(g).prediction({"input": xv})[g.outputs[0]])
    c = np.asarray(ak.Net(sg).prediction({"input": xv})[sg.outputs[0]])
    np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)


def test_stride_up_blocked_by_fanout(rng):
    """A second consumer of the chain keeps the stride where it is."""
    import anakin_tpu as ak
    from anakin_tpu.graph.ir import GraphBuilder
    from anakin_tpu.graph.passes import stride_up

    b = GraphBuilder("su2")
    x = b.input((1, 8, 8, 4), name="input")
    w1 = b.param(rng.normal(0, 0.2, (3, 3, 4, 4)).astype("float32"), "w1")
    y = b.op("conv2d", [x, w1], strides=(1, 1), padding=(1, 1))
    r = b.op("activation", [y], activation="relu")
    w2 = b.param(rng.normal(0, 0.2, (1, 1, 4, 8)).astype("float32"), "w2")
    z = b.op("conv2d", [r, w2], strides=(2, 2), padding=(0, 0))
    b.output(z, r)  # r has a second consumer (graph output)
    g = b.finish()
    sg = stride_up(g)
    assert "stride_up" not in sg.applied_passes
