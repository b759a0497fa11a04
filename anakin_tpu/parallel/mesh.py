"""Device mesh construction.

The reference has no multi-device story (SURVEY.md section 2.10): its only
"model parallel" knob was the opaque MLU `set_model_parallel(8)`.  Here the
distributed backend is designed TPU-first: a `jax.sharding.Mesh` over
(data, model) axes — data-parallel replicas ride DCN/outer ICI, tensor
(model) sharding rides inner ICI — and XLA GSPMD inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "replicated", "DATA_AXIS", "MODEL_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the given devices.

    `model` is the tensor-parallel degree (inner, contiguous devices so TP
    collectives ride the fastest ICI links); `data` defaults to
    n_devices // model.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model != 0:
        raise ValueError(f"model={model} does not divide device count {n}")
    data = data if data is not None else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
