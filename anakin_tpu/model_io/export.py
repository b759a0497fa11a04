"""Compiled-program export: StableHLO serialization + compilation cache.

Parity with the reference's deployment checkpointing (SURVEY.md section
5.4): the reference round-trips the OPTIMIZED graph through its model file
so deployment skips re-optimization (`graph.cpp:361-370`); the TPU-native
equivalent is (a) the model directory (serialize.py) carrying the rewritten
graph, (b) a serialized StableHLO program of the whole jitted forward
(`jax.export`) loadable without retracing Python, and (c) XLA's persistent
compilation cache so recompiles are disk hits.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..runtime.net import Net

__all__ = ["export_program", "load_program", "enable_compilation_cache"]


def export_program(net: Net, example_inputs: Dict[str, Any], path: str) -> None:
    """Serialize the whole forward (with weights embedded as constants)
    to a StableHLO artifact runnable via `load_program`."""
    from jax import export as jexport

    feed = {k: jnp.asarray(v) for k, v in example_inputs.items()}

    def fwd(inputs):
        return net.forward(net.params, inputs)

    exported = jexport.export(jax.jit(fwd))(feed)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_program(path: str):
    """Load a serialized program; returns callable(inputs_dict) -> outputs.

    No Python graph/op code runs at inference time — the deployment
    equivalent of the reference shipping an optimized `.anakin.bin`.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def call(inputs: Dict[str, Any]):
        return exported.call({k: jnp.asarray(v) for k, v in inputs.items()})

    return call


def enable_compilation_cache(cache_dir: str) -> None:
    """Persistent XLA compilation cache: recompiles of the same program
    become disk hits across processes (the reference's analog was shipping
    the pre-optimized graph; TPU executables additionally cache here)."""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
