"""Graph IR construction / validation / topo-order tests
(reference analog: `test/framework/graph/graph_base_test.cpp`)."""

import numpy as np
import pytest

from anakin_tpu.graph.ir import Graph, GraphBuilder, topological_order
from anakin_tpu.graph.shape_infer import infer_shapes


def small_graph():
    b = GraphBuilder("t")
    x = b.input((2, 8, 8, 4), name="input")
    w = b.param(np.zeros((3, 3, 4, 8), np.float32))
    y = b.op("conv2d", [x, w], strides=(1, 1), padding=(1, 1))
    z = b.op("activation", [y], activation="relu")
    b.output(z)
    return b.finish()


def test_build_and_validate():
    g = small_graph()
    assert len(g.nodes) == 2
    assert g.inputs == ["input"]
    g.validate()


def test_topological_order_dataflow():
    g = small_graph()
    order = topological_order(g)
    assert [n.op for n in order] == ["conv2d", "activation"]


def test_duplicate_node_rejected():
    g = Graph()
    g.add_node("a", "relu", ["x"], ["y"])
    with pytest.raises(ValueError):
        g.add_node("a", "relu", ["y"], ["z"])


def test_undefined_edge_rejected():
    g = Graph()
    g.add_input("x", (1, 4))
    g.add_node("a", "activation", ["nope"], ["y"])
    g.mark_output("y")
    with pytest.raises(ValueError):
        g.validate()


def test_cycle_detected():
    g = Graph()
    g.add_input("x", (1, 4))
    g.add_node("a", "eltwise", ["x", "c"], ["b"])
    g.add_node("b2", "activation", ["b"], ["c"])
    g.mark_output("c")
    with pytest.raises(ValueError):
        topological_order(g)


def test_shape_inference():
    g = small_graph()
    shapes = infer_shapes(g)
    out = g.outputs[0]
    assert shapes[out].shape == (2, 8, 8, 8)
    assert str(shapes[out].dtype) == "float32"


def test_clone_independent():
    g = small_graph()
    g2 = g.clone()
    g2.nodes["conv2d_2"].attrs["strides"] = (2, 2)
    assert g.nodes["conv2d_2"].attrs["strides"] == (1, 1)
