"""Autotuner plumbing tests (CPU: the conservative baseline must win).

Reference parity: `saber/funcs/base.h:85-190` pick_best — time candidate
impls per (op, shape), cache the winner.  On CPU the Pallas candidates
either fail (no interpret) or lose, so the tuned graph must keep the
XLA/dense lowering AND still execute correctly; the winner must persist
to the JSON cache and be reused without re-timing.
"""

import json

import numpy as np
import pytest

import anakin_tpu as ak
from anakin_tpu.graph.ir import GraphBuilder
from anakin_tpu.kernels.autotune import AutoTuner, autotune_graph


def _attn_graph(S=512, E=16, H=2):
    rng = np.random.default_rng(0)
    b = GraphBuilder("attn")
    x = b.input((1, S, E), "float32", name="x")
    y = b.op("multi_head_attention", [
        x,
        b.param(rng.normal(size=(E, E)).astype(np.float32) * 0.1, "wq"),
        b.param(rng.normal(size=(E, E)).astype(np.float32) * 0.1, "wk"),
        b.param(rng.normal(size=(E, E)).astype(np.float32) * 0.1, "wv"),
        b.param(rng.normal(size=(E, E)).astype(np.float32) * 0.1, "wo"),
    ], num_heads=H, causal=True, rope=False)
    b.output(y)
    return b.graph


def test_attention_autotune_cpu_picks_dense(tmp_path):
    g = _attn_graph()
    cache = tmp_path / "tune.json"
    tuner = AutoTuner(str(cache))
    gt = autotune_graph(g, tuner)
    (node,) = [n for n in gt.nodes.values()
               if n.op == "multi_head_attention"]
    assert node.attrs["impl"] == "dense"   # flash can't win on CPU
    assert "autotune" in gt.applied_passes

    # tuned graph still runs and matches the untuned one
    x = np.random.default_rng(1).normal(size=(1, 512, 16)).astype(np.float32)
    y0 = ak.Net(g).prediction({"x": x})
    y1 = ak.Net(gt).prediction({"x": x})
    np.testing.assert_allclose(
        np.asarray(list(y0.values())[0]), np.asarray(list(y1.values())[0]),
        rtol=1e-5, atol=1e-5)

    # cache persisted with a real decision (versioned envelope)
    data = json.loads(cache.read_text())["entries"]
    assert list(data.values()) == ["dense"]

    # second tuner run must hit the cache (no timing: nonexistent impls
    # would throw if re-timed)
    tuner2 = AutoTuner(str(cache))
    key = next(iter(data))
    assert tuner2.pick(key, {"dense": None, "flash": None},
                       baseline="dense") == "dense"


def test_attention_autotune_skips_short_seq(tmp_path):
    g = _attn_graph(S=128)
    gt = autotune_graph(g, AutoTuner(str(tmp_path / "t.json")))
    (node,) = [n for n in gt.nodes.values()
               if n.op == "multi_head_attention"]
    assert "impl" not in node.attrs   # below the S>=512 crossover: untouched


def test_int8_dense_autotune_cpu_picks_xla(tmp_path):
    rng = np.random.default_rng(0)
    b = GraphBuilder("d8")
    x = b.input((4, 32), "int8", name="x")
    w = b.param(rng.integers(-127, 128, size=(32, 16)).astype(np.int8), "w")
    ws = b.param(np.full((16,), 0.01, np.float32), "ws")
    y = b.op("dense_int8", [x, w, ws], in_scale=0.05, out_scale=0.1)
    b.output(y)
    g = b.graph
    gt = autotune_graph(g, AutoTuner(str(tmp_path / "t.json")))
    (node,) = [n for n in gt.nodes.values() if n.op == "dense_int8"]
    assert node.attrs["impl"] == "xla"


def test_optimize_autotune_integration(tmp_path):
    """ak.optimize(g, autotune=True) runs the tuner as the final stage and
    persists decisions to the cache file."""
    g = _attn_graph()
    gt = ak.optimize(g, autotune=True, tuner_cache=str(tmp_path / "c.json"))
    (node,) = [n for n in gt.nodes.values()
               if n.op == "multi_head_attention"]
    assert node.attrs["impl"] == "dense"
    assert (tmp_path / "c.json").exists()
    assert "autotune" in gt.applied_passes
