"""Serving tests: continuous batcher, device monitor, live gRPC round-trip
(reference analog: `test/framework/net/net_exec_multi_thread_test.cpp` +
`service_rpc_client.cpp` — but ours runs hermetically in-process)."""

import threading
import time

import numpy as np
import pytest

import anakin_tpu as ak
from anakin_tpu.models import build_resnet50
from anakin_tpu.serving import (
    AnakinService,
    ContinuousBatcher,
    DeviceMonitor,
    RpcClient,
    serve,
)


@pytest.fixture(scope="module")
def graph():
    return ak.optimize(build_resnet50(batch=1, image_size=32))


@pytest.fixture
def batcher(graph):
    def factory(batch):
        import copy

        g = graph.clone()
        spec = g.input_specs["input"]
        g.input_specs["input"] = ((batch,) + spec[0][1:], spec[1])
        return ak.Net(g)

    b = ContinuousBatcher(factory, ["input"], buckets=(1, 2, 4),
                          max_delay_ms=20.0)
    yield b
    b.shutdown()


def test_batcher_coalesces_and_splits(batcher, graph, rng):
    xs = [rng.normal(size=(32, 32, 3)).astype(np.float32) for _ in range(6)]
    futs = [batcher.submit({"input": x}) for x in xs]
    outs = [f.result(timeout=120) for f in futs]
    out_edge = graph.outputs[0]
    # each result is a single sample and matches a solo run
    net1 = ak.Net(graph)
    for x, o in zip(xs, outs):
        solo = np.asarray(net1.prediction({"input": x[None]})[out_edge])[0]
        np.testing.assert_allclose(np.asarray(o[out_edge]), solo,
                                   rtol=1e-4, atol=1e-5)
    # at least one multi-request batch was formed
    assert max(batcher.batch_sizes_served()) >= 2


def test_device_monitor_samples():
    m = DeviceMonitor(interval_s=0.1).start()
    time.sleep(0.3)
    st = m.status()
    assert st.platform in ("cpu", "tpu", "axon")
    assert st.sampled_at > 0
    m.stop()


def test_rpc_round_trip(batcher, graph, rng):
    svc = AnakinService()
    svc.initial("resnet50", batcher)
    server = serve(svc, port=0)
    try:
        client = RpcClient(f"127.0.0.1:{server._bound_port}")
        assert client.list_models() == ["resnet50"]
        x = rng.normal(size=(32, 32, 3)).astype(np.float32)
        resp = client.evaluate("resnet50", {"input": x}, request_id=7)
        assert resp["request_id"] == 7
        out = resp["outputs"][graph.outputs[0]]
        assert out.shape == (1000,)
        np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-4)
        assert resp["info"]["duration_ms"] > 0
        assert "device_status" in resp["info"]
        # unknown model -> NOT_FOUND
        import grpc

        with pytest.raises(grpc.RpcError):
            client.evaluate("nope", {"input": x})
        client.close()
    finally:
        server.stop(0)


def test_rpc_concurrent_clients(batcher, graph, rng):
    svc = AnakinService()
    svc.initial("m", batcher)
    server = serve(svc, port=0)
    try:
        client = RpcClient(f"127.0.0.1:{server._bound_port}")
        xs = [rng.normal(size=(32, 32, 3)).astype(np.float32) for _ in range(5)]
        results = [None] * 5

        def call(i):
            results[i] = client.evaluate("m", {"input": xs[i]}, request_id=i)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(5)]
        [t.start() for t in threads]
        [t.join(timeout=120) for t in threads]
        for i, r in enumerate(results):
            assert r is not None and r["request_id"] == i
        client.close()
    finally:
        server.stop(0)


def test_daemon_supervises_and_restarts(tmp_path, rng):
    """Spawn a real server process via the daemon, call it over the socket,
    kill it, and watch the daemon restart it (reference: service_daemon
    per-device fork + restart)."""
    import os
    import subprocess
    import time as _time

    from anakin_tpu.model_io import save_model
    from anakin_tpu.models import build_mobilenet_v1
    from anakin_tpu.serving.daemon import ServerSpec, ServingDaemon

    g = ak.optimize(build_mobilenet_v1(batch=1, image_size=32, num_classes=10))
    mdir = str(tmp_path / "m")
    save_model(g, mdir)
    # free port
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env_note = os.environ.get("JAX_PLATFORMS")
    daemon = ServingDaemon([ServerSpec(model_dir=mdir, name="mn", port=port,
                                       extra_args=["--buckets", "1,2", "--platform", "cpu"])])
    daemon.start()
    try:
        # wait for the server to come up, then evaluate over the socket
        client = RpcClient(f"127.0.0.1:{port}")
        x = rng.normal(size=(32, 32, 3)).astype(np.float32)
        deadline = _time.time() + 240  # slow under full-suite load (2 CPUs)
        last = None
        while _time.time() < deadline:
            try:
                resp = client.evaluate("mn", {"input": x})
                break
            except Exception as e:  # server still booting
                last = e
                _time.sleep(1.0)
        else:
            raise AssertionError(f"server never came up: {last}")
        assert resp["outputs"][g.outputs[0]].shape == (10,)
        # kill the child; daemon must restart it
        pid = daemon._procs[0].pid
        daemon._procs[0].terminate()
        deadline = _time.time() + 240
        while _time.time() < deadline:
            st = daemon.alive()
            if st[0] and daemon._procs[0].pid != pid:
                break
            _time.sleep(0.5)
        assert daemon.restarts()[0] >= 1
        client.close()
    finally:
        daemon.stop()


def test_llm_generate_rpc(rng):
    """LLM serving over the wire: DecodeScheduler behind the Generate RPC."""
    from anakin_tpu.models.transformer import (TransformerConfig,
                                               make_transformer_params)
    from anakin_tpu.runtime.decode_scheduler import DecodeScheduler

    cfg = TransformerConfig(vocab=40, embed=64, heads=4, kv_heads=2,
                            layers=2, max_seq=24)
    params = make_transformer_params(cfg, 6)
    sched = DecodeScheduler(cfg, batch=2, params=params)
    svc = AnakinService()
    svc.initial_llm("lm", sched)
    server = serve(svc, port=0)
    try:
        client = RpcClient(f"127.0.0.1:{server._bound_port}")
        prompt = [3, 9, 1]
        resp = client.generate("lm", prompt, max_new_tokens=5, request_id=11)
        assert resp["request_id"] == 11
        assert resp["tokens"][:3] == prompt and len(resp["tokens"]) == 8
        assert resp["info"]["duration_ms"] > 0
        # matches direct scheduler output
        direct = sched.submit(np.asarray(prompt, np.int32), 5).result(120)
        assert resp["tokens"] == [int(t) for t in direct]
        import grpc

        with pytest.raises(grpc.RpcError):
            client.generate("nope", prompt)
        client.close()
    finally:
        server.stop(0)
        sched.close()


def test_llm_generate_stream_rpc(rng):
    """Round-5: token streaming over the GenerateStream RPC — incremental
    {"token"} frames arrive in order and the final frame carries the full
    sequence; stop_tokens pass through the wire."""
    from anakin_tpu.models.transformer import (TransformerConfig,
                                               make_transformer_params)
    from anakin_tpu.runtime.decode_scheduler import DecodeScheduler

    cfg = TransformerConfig(vocab=40, embed=64, heads=4, kv_heads=2,
                            layers=2, max_seq=24)
    params = make_transformer_params(cfg, 6)
    sched = DecodeScheduler(cfg, batch=2, params=params, fuse_window=4)
    svc = AnakinService()
    svc.initial_llm("lm", sched)
    server = serve(svc, port=0)
    try:
        client = RpcClient(f"127.0.0.1:{server._bound_port}")
        prompt = [3, 9, 1]
        frames = list(client.generate_stream("lm", prompt,
                                             max_new_tokens=5))
        tokens = [f["token"] for f in frames if "token" in f]
        final = frames[-1]
        assert final.get("done") and len(tokens) == 5
        assert final["tokens"][:3] == prompt
        assert final["tokens"][3:] == tokens
        # stop_tokens over the wire: reuse a generated token as stop id
        stop = tokens[2]
        if stop not in tokens[:2]:
            resp = client.generate("lm", prompt, max_new_tokens=5,
                                   stop_tokens=[stop])
            assert resp["tokens"] == final["tokens"][:3 + 3]
        client.close()
    finally:
        server.stop(0)
        sched.close()
