"""Collective-matmul overlap kernels: numerics vs dense on the 8-device
CPU mesh (the manual shard_map form of XLA's windowed-einsum rewrite)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from anakin_tpu.parallel.overlap import (
    allgather_matmul, matmul_reducescatter, overlap_xla_flags)


def mesh1d(n=8, name="model"):
    return Mesh(np.array(jax.devices()[:n]), (name,))


def test_allgather_matmul_matches_dense(rng):
    m = mesh1d()
    M, K, N = 64, 32, 48
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((K, N)).astype(np.float32)

    f = shard_map(
        lambda xs, w: allgather_matmul(xs, w, "model"),
        mesh=m, in_specs=(P("model", None), P(None, None)),
        out_specs=P(None, None), check_rep=False)
    got = jax.jit(f)(x, w)
    np.testing.assert_allclose(np.asarray(got), x @ w, rtol=1e-5, atol=1e-5)


def test_allgather_matmul_reverse_ring(rng):
    m = mesh1d()
    x = rng.standard_normal((32, 16)).astype(np.float32)
    w = rng.standard_normal((16, 24)).astype(np.float32)
    f = shard_map(
        lambda xs, w: allgather_matmul(xs, w, "model", reverse=True),
        mesh=m, in_specs=(P("model", None), P(None, None)),
        out_specs=P(None, None), check_rep=False)
    got = jax.jit(f)(x, w)
    np.testing.assert_allclose(np.asarray(got), x @ w, rtol=1e-5, atol=1e-5)


def test_matmul_reducescatter_matches_dense(rng):
    """Row-parallel TP: K sharded over 8 devices; result rows scattered.
    The ring schedule (chunk j visits j+1..j) must sum every rank's
    partial — exercises p > 2 where a sign error in the walk would show."""
    m = mesh1d()
    M, K, N = 64, 128, 40
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((K, N)).astype(np.float32)

    f = shard_map(
        lambda xl, wl: matmul_reducescatter(xl, wl, "model"),
        mesh=m, in_specs=(P(None, "model"), P("model", None)),
        out_specs=P("model", None), check_rep=False)
    got = jax.jit(f)(x, w)
    np.testing.assert_allclose(np.asarray(got), x @ w, rtol=1e-4, atol=1e-4)


def test_int8_allgather_matmul(rng):
    m = mesh1d()
    x = rng.integers(-100, 100, (32, 16)).astype(np.int8)
    w = rng.integers(-100, 100, (16, 24)).astype(np.int8)
    f = shard_map(
        lambda xs, w: allgather_matmul(xs, w, "model"),
        mesh=m, in_specs=(P("model", None), P(None, None)),
        out_specs=P(None, None), check_rep=False)
    got = np.asarray(jax.jit(f)(x, w))
    want = x.astype(np.float32) @ w.astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flag_presets():
    d = overlap_xla_flags("default")
    a = overlap_xla_flags("aggressive")
    assert set(d) < set(a)
    assert all(f.startswith("--xla") for f in a)


def test_compiler_options_presets_and_process_default():
    """Round-4 redesign: the overlap preset is delivered as per-compile
    compiler_options (the env-flag route fatally aborts relay-client
    processes — measured, tools/scaling_crosscheck.py).
    enable_collective_overlap installs a process default; a CPU-backend
    Net must NOT apply it (xla_tpu_* names are invalid there) and must
    keep compiling."""
    from anakin_tpu.parallel.overlap import (default_compiler_options,
                                             enable_collective_overlap,
                                             overlap_compiler_options)

    d = overlap_compiler_options("default")
    a = overlap_compiler_options("aggressive")
    assert set(d) < set(a)
    assert all(not k.startswith("--") for k in a)   # option names, not flags

    try:
        assert enable_collective_overlap("default") is True
        assert default_compiler_options() == d

        import anakin_tpu as ak
        from anakin_tpu.graph.ir import Graph

        g = Graph("t")
        g.add_input("x", (4, 8), "float32")
        g.add_param("w", np.ones((8, 8), np.float32))
        g.add_node("d", "dense", ["x", "w"], ["y"], axis=1)
        g.outputs = ["y"]
        net = ak.Net(g)                      # CPU backend here
        assert net.compiler_options is None  # default NOT applied on CPU
        out = net.prediction({"x": np.ones((4, 8), np.float32)})
        assert np.asarray(out["y"]).shape == (4, 8)
    finally:
        # don't leak the default into other tests
        from anakin_tpu.parallel import overlap as _ov

        _ov._active_default.clear()
