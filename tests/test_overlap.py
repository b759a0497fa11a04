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
