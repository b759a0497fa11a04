"""Continuous request batcher.

This is the serving-side evolution of the reference's Worker queue
(SURVEY.md section 2.10 table: "Worker thread-pool over Net replicas →
continuous-batching request scheduler"): individual requests (batch-1
samples) are coalesced into device-shaped batches within a latency window,
run through ONE compiled Net, and the per-request slices are returned via
futures.  Bucketed batch sizes keep the jit cache small (SURVEY.md "hard
parts": bucketed shapes for serving instead of per-shape retrace).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..runtime.net import Net

__all__ = ["ContinuousBatcher"]


@dataclass
class _Request:
    feed: Dict[str, np.ndarray]  # sample WITHOUT batch dim
    future: Future = field(default_factory=Future)
    enqueued_at: float = field(default_factory=time.perf_counter)


class ContinuousBatcher:
    """Collects single-sample requests into padded batches.

    net_factory(batch) must return a Net compiled for that batch size;
    `buckets` are the allowed batch sizes (ascending).  A dispatcher thread
    drains the queue: it waits at most `max_delay_ms` for a fuller bucket,
    pads the batch up to the chosen bucket with zeros, runs, and splits.
    """

    def __init__(
        self,
        net_factory,
        input_names: Sequence[str],
        buckets: Sequence[int] = (1, 2, 4, 8),
        max_delay_ms: float = 2.0,
    ) -> None:
        self.buckets = sorted(buckets)
        self.input_names = list(input_names)
        self._nets: Dict[int, Net] = {}
        self._net_factory = net_factory
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self.max_delay_ms = max_delay_ms
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._batch_sizes_served: List[int] = []
        self._thread.start()

    def _net(self, bucket: int) -> Net:
        if bucket not in self._nets:
            self._nets[bucket] = self._net_factory(bucket)
        return self._nets[bucket]

    # ------------------------------------------------------------- client
    def submit(self, feed: Dict[str, np.ndarray]) -> Future:
        req = _Request({k: np.asarray(v) for k, v in feed.items()})
        self._q.put(req)
        return req.future

    # ---------------------------------------------------------- dispatcher
    def _take_batch(self) -> List[_Request]:
        first = self._q.get()
        if first is None:  # poison pill
            return []
        batch = [first]
        deadline = first.enqueued_at + self.max_delay_ms / 1e3
        max_bucket = self.buckets[-1]
        while len(batch) < max_bucket:
            rest = deadline - time.perf_counter()
            if rest <= 0:
                break
            try:
                nxt = self._q.get(timeout=rest)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)
                break
            batch.append(nxt)
        return batch

    def _loop(self) -> None:
        while not self._stop.is_set():
            batch = self._take_batch()
            if not batch:
                return
            n = len(batch)
            bucket = next(b for b in self.buckets if b >= n)
            net = self._net(bucket)
            feed = {}
            for name in self.input_names:
                stacked = np.stack([r.feed[name] for r in batch])
                if bucket > n:
                    pad = [(0, bucket - n)] + [(0, 0)] * (stacked.ndim - 1)
                    stacked = np.pad(stacked, pad)
                feed[name] = stacked
            try:
                out = net.prediction(feed)
                host = {k: np.asarray(v) for k, v in out.items()}
                for i, r in enumerate(batch):
                    r.future.set_result({k: v[i] for k, v in host.items()})
            except Exception as exc:  # pragma: no cover
                for r in batch:
                    r.future.set_exception(exc)
            self._batch_sizes_served.append(n)

    # ----------------------------------------------------------- lifecycle
    def batch_sizes_served(self) -> List[int]:
        return list(self._batch_sizes_served)

    def shutdown(self) -> None:
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=5)
