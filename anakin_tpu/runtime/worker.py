"""Worker — async request-level execution over a compiled Net.

Re-design of the reference's thread-pool inference server
(`framework/core/net/worker.h:69-182`, `worker.cpp:56-212`): there, N host
threads each owned a full Net replica (`MultiThreadModel` keyed by thread
id) because one CUDA context + stream pair was the unit of concurrency.  On
TPU the compiled XLA program is reentrant and the device queue is the
concurrency unit, so ONE Net serves all threads: the pool exists to overlap
host-side feed preparation and to provide the same API surface —

  sync_prediction(feed)   -> Future of host outputs   (worker.cpp:96)
  sync_prediction_device  -> Future of device arrays  (stay on HBM)
  async_prediction(feed)  + async_get_result(): FIFO order preserved
  register_aux_function   : per-request hooks
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from .net import Net

__all__ = ["Worker"]


class Worker:
    def __init__(self, net: Net, num_threads: int = 2) -> None:
        self.net = net
        self._pool = ThreadPoolExecutor(max_workers=num_threads,
                                        thread_name_prefix="anakin-worker")
        self._async_q: "queue.Queue[Future]" = queue.Queue()
        self._aux: List[Callable[[], None]] = []
        self._latencies_ms: List[float] = []
        self._lock = threading.Lock()

    # ------------------------------------------------------------ hooks
    def register_aux_function(self, fn: Callable[[], None]) -> None:
        """Per-request hook (reference `register_aux_function`)."""
        self._aux.append(fn)

    # ------------------------------------------------------------- sync
    def _run(self, feed: Dict[str, Any], to_host: bool) -> Dict[str, Any]:
        import time

        t0 = time.perf_counter()
        for fn in self._aux:
            fn()
        out = self.net.prediction(feed)
        out = jax.block_until_ready(out)
        if to_host:
            out = {k: np.asarray(v) for k, v in out.items()}
        with self._lock:
            self._latencies_ms.append((time.perf_counter() - t0) * 1e3)
        return out

    def sync_prediction(self, feed: Dict[str, Any]) -> Future:
        """Returns a Future of HOST tensors (D2H copy included)."""
        return self._pool.submit(self._run, feed, True)

    def sync_prediction_device(self, feed: Dict[str, Any]) -> Future:
        """Returns a Future of device arrays (no D2H)."""
        return self._pool.submit(self._run, feed, False)

    # ------------------------------------------------------------ async
    def async_prediction(self, feed: Dict[str, Any]) -> None:
        """Enqueue; results come back in submission order via
        async_get_result (reference FIFO queue semantics)."""
        self._async_q.put(self._pool.submit(self._run, feed, True))

    def async_get_result(self, timeout: Optional[float] = None) -> Dict[str, Any]:
        fut = self._async_q.get(timeout=timeout)
        return fut.result(timeout=timeout)

    # ---------------------------------------------------------- metrics
    def prediction_times_ms(self) -> List[float]:
        """Per-request latencies (reference
        `_thead_id_to_prediction_times_vec_in_ms`, worker.h:162)."""
        with self._lock:
            return list(self._latencies_ms)

    def shutdown(self) -> None:
        self._pool.shutdown(wait=True)
