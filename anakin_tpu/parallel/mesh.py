"""Device mesh construction.

The reference has no multi-device story (SURVEY.md section 2.10): its only
"model parallel" knob was the opaque MLU `set_model_parallel(8)`.  Here the
distributed backend is designed TPU-first: a `jax.sharding.Mesh` over
(data, model) axes — data-parallel replicas ride DCN/outer ICI, tensor
(model) sharding rides inner ICI — and XLA GSPMD inserts the collectives.

Two mesh shapes:

  * `make_mesh(data, model)` — single-slice (data, model), model innermost
    so TP collectives ride the fastest ICI links.
  * `make_hybrid_mesh(dcn, data, model)` — pod-scale (dcn, data, model):
    the `dcn` axis spans hosts/slices over the data-center network and
    must only carry data parallelism (batch sharding — zero per-step
    collectives); `data`+`model` stay inside a slice on ICI.  On a real
    multi-process runtime the device grid comes from
    `mesh_utils.create_hybrid_device_mesh` so DCN really is the outer
    axis; single-process (tests, virtual CPU devices) falls back to a
    reshape with the same axis semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "make_hybrid_mesh", "replicated", "batch_axes",
           "batch_size_of", "DATA_AXIS", "MODEL_AXIS", "DCN_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"


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


def make_hybrid_mesh(
    dcn: Optional[int] = None,
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dcn, data, model) mesh.

    `dcn` defaults to `jax.process_count()` — one DCN group per host —
    and `data` to the remaining per-group device count over `model`.
    Under a real multi-process runtime the grid is laid out with
    `mesh_utils.create_hybrid_device_mesh`, which keeps each process's
    devices contiguous in the inner (ICI) axes; anything sharded over
    `dcn` therefore communicates over DCN only, which a correct layout
    never does per step (batch sharding only).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n = len(devices)
    dcn = dcn if dcn is not None else max(1, jax.process_count())
    if n % (dcn * model) != 0:
        raise ValueError(f"dcn={dcn} * model={model} does not divide {n}")
    data = data if data is not None else n // (dcn * model)
    if dcn * data * model != n:
        raise ValueError(f"mesh {dcn}x{data}x{model} != {n} devices")
    if jax.process_count() > 1 and dcn == jax.process_count():
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_hybrid_device_mesh(
                (1, data, model), (dcn, 1, 1), devices=devices)
        except ValueError:
            # CPU multi-process clusters expose no slice topology: group by
            # process_index (the DCN boundary) and reshape — same semantics
            devices = sorted(devices, key=lambda d: (d.process_index, d.id))
            grid = np.asarray(devices).reshape(dcn, data, model)
    else:
        grid = np.asarray(devices).reshape(dcn, data, model)
    return Mesh(grid, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def batch_axes(mesh: Mesh):
    """The mesh axes that carry the batch dimension: (dcn, data) on a
    hybrid mesh, (data,) on a flat one."""
    names = [a for a in (DCN_AXIS, DATA_AXIS) if a in mesh.shape]
    return tuple(names)


def batch_size_of(mesh: Mesh) -> int:
    """Total batch-parallel degree of the mesh."""
    n = 1
    for a in batch_axes(mesh):
        n *= mesh.shape[a]
    return n
