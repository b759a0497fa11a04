"""Multi-host distributed runtime initialization.

The distributed backend the reference never had (SURVEY.md section 5.8):
`initialize()` wraps `jax.distributed.initialize` for a TPU pod slice —
after it, `jax.devices()` spans all hosts and the (data, model) mesh from
`mesh.py` stretches across ICI (model axis inner/fast) and DCN (data axis
outer), with XLA GSPMD inserting the collectives.

Serving topology: one `serving.server` process per host, each holding the
host's shard of every GSPMD-sharded Net; the ContinuousBatcher feeds the
host-local devices and psum/all-gather ride ICI (BASELINE.json north star).

On this single-chip rig, multi-host paths are validated on the virtual
8-device CPU mesh (tests/test_parallel.py, `dryrun_multichip`).
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["initialize", "is_distributed", "local_device_count"]

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the pod-wide runtime.  On TPU pods all args are auto-detected
    from the metadata server; pass them explicitly for CPU/GPU clusters."""
    global _initialized
    if _initialized:
        return
    if num_processes is not None and num_processes <= 1:
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def is_distributed() -> bool:
    return jax.process_count() > 1


def local_device_count() -> int:
    return jax.local_device_count()
