"""Multi-chip GSPMD tests on the 8-device virtual CPU mesh
(SURVEY.md section 4.5: JAX gives deterministic multi-chip tests the
reference never had)."""

import numpy as np
import pytest

import jax

import anakin_tpu as ak
from anakin_tpu.models import build_resnet50
from anakin_tpu.parallel import (
    input_sharding,
    make_mesh,
    shard_graph_params,
)


@pytest.fixture(scope="module")
def graph8():
    return ak.optimize(build_resnet50(batch=8, image_size=32))


def test_mesh_shapes():
    mesh = make_mesh(model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh(model=3)


def test_sharding_rules_cover_all_params(graph8):
    mesh = make_mesh(model=2)
    rules = shard_graph_params(graph8, mesh, min_channels=128)
    assert set(rules) == set(graph8.params)
    from jax.sharding import PartitionSpec

    sharded = [e for e, s in rules.items() if s.spec != PartitionSpec()]
    assert len(sharded) > 20  # large convs + their biases are model-sharded


@pytest.mark.parametrize("model_par", [1, 2, 4])
def test_sharded_equals_single_device(graph8, rng, model_par):
    """dp x tp sharded execution must match the unsharded result."""
    g = graph8
    x = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    y_ref = np.asarray(ak.Net(g).prediction({"input": x})[g.outputs[0]])

    mesh = make_mesh(model=model_par)
    rules = shard_graph_params(g, mesh, min_channels=128)
    net = ak.Net(g, param_sharding=rules, mesh=mesh)
    y = np.asarray(net.prediction({"input": x})[g.outputs[0]])
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


def test_sharded_int8_equals_single_device(graph8, rng):
    from anakin_tpu.quant import calibrate, quantize_graph

    g = graph8
    batches = [{"input": rng.normal(size=(8, 32, 32, 3)).astype(np.float32)}]
    gq = quantize_graph(g, calibrate(g, batches, method="max"))
    x = batches[0]["input"]
    y_ref = np.asarray(ak.Net(gq).prediction({"input": x})[gq.outputs[0]])
    mesh = make_mesh(model=2)
    rules = shard_graph_params(gq, mesh, min_channels=128)
    net = ak.Net(gq, param_sharding=rules, mesh=mesh)
    y = np.asarray(net.prediction({"input": x})[gq.outputs[0]])
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_moe_ffn_routing(rng):
    """MoE: output must equal the gate-weighted sum of selected experts."""
    from tests.test_ops import run_op

    B, S, E, F, NX = 2, 3, 8, 16, 4
    x = rng.normal(size=(B, S, E)).astype(np.float32)
    w_gate = rng.normal(size=(E, NX)).astype(np.float32)
    w_up = rng.normal(size=(NX, E, F)).astype(np.float32) * 0.2
    w_down = rng.normal(size=(NX, F, E)).astype(np.float32) * 0.2
    got = run_op("moe_ffn", [x, w_gate, w_up, w_down], top_k=2,
                 activation="gelu")[0]
    # manual reference
    import scipy.special as sp

    logits = x @ w_gate
    for b in range(B):
        for s in range(S):
            idx = np.argsort(-logits[b, s])[:2]
            g = sp.softmax(logits[b, s][idx])
            want = np.zeros(E)
            import jax

            for gj, e in zip(g, idx):
                h = np.asarray(jax.nn.gelu(x[b, s] @ w_up[e]))
                want += gj * (h @ w_down[e])
            np.testing.assert_allclose(got[b, s], want, rtol=2e-4, atol=2e-4)


def test_pipeline_split_and_run(graph8, rng):
    from anakin_tpu.parallel.pipeline import PipelinedNet, split_graph

    import jax

    stages = split_graph(graph8, 4)
    assert len(stages) == 4
    assert sum(len(s.nodes) for s in stages) == len(graph8.nodes)
    x = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    want = np.asarray(ak.Net(graph8).prediction({"input": x})[graph8.outputs[0]])
    pnet = PipelinedNet(graph8, jax.devices()[:4])
    got = np.asarray(pnet.prediction({"input": x}, microbatches=2)[graph8.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tp_sharded_transformer_decode(rng):
    """LLM TP: decode step with model-sharded dense weights (incl. the
    weight-only int8 variant) matches the unsharded result."""
    import jax

    from anakin_tpu.models.transformer import (TransformerConfig,
                                               build_transformer_decode_step,
                                               make_transformer_params)
    from anakin_tpu.quant import weight_only_quantize

    cfg = TransformerConfig(vocab=96, embed=256, heads=8, kv_heads=4,
                            layers=2, max_seq=16)
    params = make_transformer_params(cfg, 4)
    B = 4
    g = build_transformer_decode_step(cfg, B, params)
    feed = {"input": rng.integers(0, 96, (B, 1)).astype(np.int32),
            "pos": np.zeros((B,), np.int32)}
    shape = (B, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
    for i in range(cfg.layers):
        feed[f"cache_k_{i}"] = rng.normal(size=shape).astype(np.float32) * 0.1
        feed[f"cache_v_{i}"] = rng.normal(size=shape).astype(np.float32) * 0.1

    for gg in (g, weight_only_quantize(g, min_elems=1024)):
        want = np.asarray(ak.Net(gg).prediction(feed)[gg.outputs[0]])
        mesh = make_mesh(model=2)
        rules = shard_graph_params(gg, mesh, min_channels=128)
        from jax.sharding import PartitionSpec

        n_sharded = sum(1 for s in rules.values()
                        if s.spec != PartitionSpec())
        assert n_sharded >= cfg.layers * 2  # mlp + attention matmuls
        net = ak.Net(gg, param_sharding=rules, mesh=mesh)
        got = np.asarray(net.prediction(feed)[gg.outputs[0]])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tp_sharded_w4_and_embedding(rng):
    """Round-4 sharding depth: (a) dense_w4 packed weights + 2-D group
    scales shard under TP (column for up-projections, row pairing for the
    Megatron down-projection — legal because tp divides the group count);
    (b) the embedding table shards its E dim, removing the replicated-HBM
    floor the round-3 llm_decode_tp artifact measured.  Parity vs the
    unsharded net is exact to matmul tolerance."""
    from jax.sharding import PartitionSpec as P

    from anakin_tpu.models.transformer import (TransformerConfig,
                                               build_transformer_decode_step,
                                               make_transformer_params)
    from anakin_tpu.quant import weight_only_quantize

    cfg = TransformerConfig(vocab=96, embed=256, heads=8, kv_heads=4,
                            layers=2, max_seq=16)
    params = make_transformer_params(cfg, 4)
    B = 4
    g = build_transformer_decode_step(cfg, B, params)
    gw = weight_only_quantize(g, bits=4, min_elems=1024)
    assert any(n.op == "dense_w4" for n in gw.nodes.values())
    feed = {"input": rng.integers(0, 96, (B, 1)).astype(np.int32),
            "pos": np.zeros((B,), np.int32)}
    shape = (B, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
    for i in range(cfg.layers):
        feed[f"cache_k_{i}"] = rng.normal(size=shape).astype(np.float32) * 0.1
        feed[f"cache_v_{i}"] = rng.normal(size=shape).astype(np.float32) * 0.1

    want = np.asarray(ak.Net(gw).prediction(feed)[gw.outputs[0]])
    mesh = make_mesh(model=2)
    rules = shard_graph_params(gw, mesh, min_channels=128)
    # embedding table E-sharded
    assert rules["embed"].spec == P(None, "model")
    # mlp_up w4: column (packed + scales follow N); mlp_down w4: row pair
    for i in range(cfg.layers):
        up = gw.nodes[[n for n in gw.nodes
                       if gw.nodes[n].op == "dense_w4"
                       and f"l{i}.mlp_up" in gw.nodes[n].inputs[1]][0]]
        dn_w = [gw.nodes[n].inputs[1] for n in gw.nodes
                if gw.nodes[n].op == "dense_w4"
                and f"l{i}.mlp_down" in gw.nodes[n].inputs[1]][0]
        assert rules[up.inputs[1]].spec == P(None, "model")
        assert rules[up.inputs[2]].spec == P(None, "model")  # 2-D scales
        assert rules[dn_w].spec == P("model", None)
    net = ak.Net(gw, param_sharding=rules, mesh=mesh)
    got = np.asarray(net.prediction(feed)[gw.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tp_sharded_decode_scheduler(rng):
    """Round-5 (VERDICT task 5): the FULL serving stack — bucket
    admission, fused windows with donation, stop tokens — executes over
    a TP=2 GSPMD mesh (Megatron attention/MLP sharding + head-sharded KV
    caches) with token parity vs the unsharded scheduler."""
    from anakin_tpu.models.transformer import (TransformerConfig,
                                               make_transformer_params)
    from anakin_tpu.runtime.decode_scheduler import DecodeScheduler

    cfg = TransformerConfig(vocab=64, embed=64, heads=4, kv_heads=2,
                            layers=2, max_seq=64)
    params = make_transformer_params(cfg, 5)
    reqs = [(rng.integers(0, 64, (p,)).astype(np.int32), n)
            for p, n in ((5, 8), (11, 6), (3, 10))]

    def run(mesh):
        sched = DecodeScheduler(cfg, batch=2, params=params,
                                fuse_window=4, mesh=mesh)
        try:
            futs = [sched.submit(p, max_new_tokens=n) for p, n in reqs]
            outs = [f.result(timeout=300) for f in futs]
            assert sched.fused_windows_run > 0
            assert sched.bucket_prefills_run > 0
            return outs
        finally:
            sched.close()

    mesh = make_mesh(jax.devices()[:2], model=2)
    base = run(None)
    tp = run(mesh)
    for a, b in zip(base, tp):
        np.testing.assert_array_equal(a, b)


def test_tp_swiglu_row_pairing(rng):
    """Round-5: the Megatron row pairing sees through the SwiGLU gate —
    mlp_down row-shards (one psum) instead of column-sharding behind an
    all-gather; the llama-class scheduler still serves token-exactly
    over TP=2."""
    from jax.sharding import PartitionSpec as P

    from anakin_tpu.models.transformer import (TransformerConfig,
                                               build_transformer_decode_step,
                                               make_transformer_params)
    from anakin_tpu.runtime.decode_scheduler import DecodeScheduler

    cfg = TransformerConfig(vocab=64, embed=128, heads=4, kv_heads=2,
                            layers=2, max_seq=48, norm="rms", mlp="swiglu")
    params = make_transformer_params(cfg, 5)
    mesh = make_mesh(jax.devices()[:2], model=2)
    g = build_transformer_decode_step(cfg, 2, params)
    rules = shard_graph_params(g, mesh, min_channels=128)
    assert rules["l0.mlp_up"].spec == P(None, "model")
    assert rules["l0.mlp_gate"].spec == P(None, "model")
    assert rules["l0.mlp_down"].spec == P("model", None)   # through the gate

    prompts = [rng.integers(0, 64, (p,)).astype(np.int32) for p in (5, 9)]

    def run(mesh_):
        sched = DecodeScheduler(cfg, batch=2, params=params,
                                fuse_window=4, mesh=mesh_)
        try:
            return [sched.submit(p, max_new_tokens=6).result(timeout=300)
                    for p in prompts]
        finally:
            sched.close()

    for a, b in zip(run(None), run(mesh)):
        np.testing.assert_array_equal(a, b)
