"""Distributed-backend tests (VERDICT round-1 item 5): real two-process
collectives, the DCN x ICI hybrid mesh, and the weak-scaling harness."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

import anakin_tpu as ak
from anakin_tpu.models import build_resnet50
from anakin_tpu.parallel import (
    analyze_compiled,
    batch_axes,
    batch_size_of,
    collective_stats,
    input_sharding,
    make_hybrid_mesh,
    make_mesh,
    shard_graph_params,
    weak_scaling_report,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------------- two-process run

def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_collectives():
    """jax.distributed over localhost: 2 processes x 2 CPU devices form one
    cluster; a batch-sharded reduction all-reduces ACROSS processes."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "dist_worker.py"),
             str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"DIST_OK pid={pid}" in out
        # the REAL stack multi-process (VERDICT round-2 task 5): a
        # GSPMD-sharded ResNet Net and a TP decode step, shard parity
        assert f"DIST_NET_OK pid={pid}" in out
        assert f"DIST_DECODE_OK pid={pid}" in out


# ---------------------------------------------------------- hybrid mesh

def test_hybrid_mesh_shapes():
    mesh = make_hybrid_mesh(dcn=2, model=2)
    assert mesh.shape == {"dcn": 2, "data": 2, "model": 2}
    assert batch_axes(mesh) == ("dcn", "data")
    assert batch_size_of(mesh) == 4
    flat = make_mesh(model=2)
    assert batch_axes(flat) == ("data",)
    assert batch_size_of(flat) == 4
    with pytest.raises(ValueError):
        make_hybrid_mesh(dcn=3)


def test_hybrid_mesh_sharded_equals_single_device(rng):
    """dcn x data x model sharded ResNet == unsharded numerics."""
    g = ak.optimize(build_resnet50(batch=8, image_size=32))
    x = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    want = np.asarray(ak.Net(g).prediction({"input": x})[g.outputs[0]])
    mesh = make_hybrid_mesh(dcn=2, model=2)
    rules = shard_graph_params(g, mesh, min_channels=128)
    net = ak.Net(g, param_sharding=rules, mesh=mesh)
    got = np.asarray(net.prediction({"input": x})[g.outputs[0]])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------- scaling harness

def test_collective_stats_parses_hlo():
    """The parser sees the real collectives GSPMD inserts for TP."""
    g = ak.optimize(build_resnet50(batch=4, image_size=32))
    mesh = make_mesh(jax.devices()[:4], model=4)
    rules = shard_graph_params(g, mesh, min_channels=64)
    net = ak.Net(g, param_sharding=rules, mesh=mesh)
    compiled = net.compile(
        {"input": np.zeros((4, 32, 32, 3), np.float32)})
    colls = collective_stats(compiled.as_text())
    assert colls, "TP-sharded ResNet must contain collectives"
    kinds = {c["kind"] for c in colls}
    assert kinds & {"all-reduce", "all-gather", "reduce-scatter",
                    "all-to-all", "collective-permute"}
    for c in colls:
        assert c["wire_bytes"] > 0 and c["group_size"] >= 2

    a = analyze_compiled(compiled)
    assert a["flops_per_device"] > 0
    assert a["t_comm_s"] > 0
    assert a["t_step_no_overlap_s"] >= a["t_step_full_overlap_s"]


def test_weak_scaling_dp_is_free(tmp_path):
    """Pure data parallelism inserts ZERO per-step collectives -> 100%
    weak-scaling efficiency at any mesh size."""
    def build(n):
        mesh = make_mesh(jax.devices()[:n], model=1)
        b = 2 * n
        g = ak.optimize(build_resnet50(batch=b, image_size=32))
        rules = shard_graph_params(g, mesh, min_channels=128)
        net = ak.Net(g, precision="bf16", param_sharding=rules, mesh=mesh)
        return net.compile({"input": np.zeros((b, 32, 32, 3), np.float32)})

    rep = weak_scaling_report(build, ns=(1, 2, 8),
                              out_path=str(tmp_path / "r.json"))
    rows = rep["rows"]
    assert rows[-1]["n_collectives"] == 0
    assert rep["efficiency_at_max_full_overlap"] >= 0.99
    assert rep["efficiency_at_max_no_overlap"] >= 0.99
    saved = json.loads((tmp_path / "r.json").read_text())
    assert saved["rows"][0]["flops_per_device"] > 0


def test_weak_scaling_dp_tp_meets_target(tmp_path):
    """dp x tp2 weak scaling: per-device work constant, TP collectives on
    ICI; the analytic full-overlap efficiency must hold >=85% (the
    BASELINE.json scaling target)."""
    def build(n):
        mesh = make_mesh(jax.devices()[:n], model=2)
        b = 4 * (n // 2)
        g = ak.optimize(build_resnet50(batch=b, image_size=32))
        rules = shard_graph_params(g, mesh, min_channels=128)
        net = ak.Net(g, precision="bf16", param_sharding=rules, mesh=mesh)
        return net.compile({"input": np.zeros((b, 32, 32, 3), np.float32)})

    rep = weak_scaling_report(build, ns=(2, 4, 8),
                              out_path=str(tmp_path / "r.json"))
    assert rep["rows"][-1]["n_collectives"] > 0
    assert rep["efficiency_at_max_full_overlap"] >= 0.85, rep
