"""Continuous-batching decode scheduler (slot-based, vLLM-style).

The LLM analog of the reference's Worker request pool
(`framework/core/net/worker.h:69-182`): a FIXED-batch decode Net whose B
slots each hold an independent sequence (per-slot `pos` is native to
`mha_decode`).  Requests join a free slot at any step; their prompt is
chunk-prefilled one token per step interleaved with other slots' decoding
(the "chunked prefill" discipline — no separate prefill graph, no
recompilation, static shapes throughout); finished slots free immediately
for queued requests.  One jitted step serves the whole mixed batch, so
throughput is the decode net's batch throughput regardless of request
arrival pattern.

Usage:
    sched = DecodeScheduler(cfg, batch=8)
    fut = sched.submit(prompt_ids, max_new_tokens=32)   # thread-safe
    tokens = fut.result()
    sched.close()
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Dict, List, Optional

import numpy as np

from ..models.transformer import (
    TransformerConfig,
    build_transformer_decode_step,
    make_transformer_params,
)
from .net import Net

__all__ = ["DecodeScheduler"]


class _Slot:
    __slots__ = ("future", "prompt", "fed", "generated", "max_new", "tokens")

    def __init__(self, future, prompt, max_new):
        self.future = future
        self.prompt = prompt          # np [P] int32
        self.fed = 0                  # prompt tokens already fed
        self.generated = 0
        self.max_new = max_new
        self.tokens: List[int] = []


class DecodeScheduler:
    def __init__(self, cfg: TransformerConfig, batch: int = 8,
                 params: Optional[Dict[str, np.ndarray]] = None,
                 precision: str = "fp32", seed: int = 0,
                 kv_cache_dtype: str = "float32", kv_scale: float = 0.05):
        self.cfg = cfg
        self.B = batch
        self.params = params if params is not None else \
            make_transformer_params(cfg, seed)
        self.graph = build_transformer_decode_step(
            cfg, batch, self.params, kv_cache_dtype=kv_cache_dtype,
            kv_scale=kv_scale)
        self.net = Net(self.graph, precision=precision)
        self._logits_edge = self.graph.outputs[0]
        self._cache_edges = [
            (self.graph.nodes[f"dec_att_{i}"].outputs[1],
             self.graph.nodes[f"dec_att_{i}"].outputs[2])
            for i in range(cfg.layers)]
        cdt = np.int8 if kv_cache_dtype == "int8" else np.float32
        shape = (batch, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
        self._caches = {}
        for i in range(cfg.layers):
            self._caches[f"cache_k_{i}"] = np.zeros(shape, cdt)
            self._caches[f"cache_v_{i}"] = np.zeros(shape, cdt)
        self._pos = np.zeros((batch,), np.int32)
        self._tok = np.zeros((batch, 1), np.int32)
        self._slots: List[Optional[_Slot]] = [None] * batch
        self._queue: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self.steps_run = 0
        self.tokens_served = 0

    # ------------------------------------------------------------- public
    def submit(self, prompt: np.ndarray, max_new_tokens: int = 16) -> Future:
        """Queue a request; resolves to np [len(prompt)+n] int32 tokens."""
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        assert len(prompt) + max_new_tokens <= self.cfg.max_seq
        fut: Future = Future()
        self._queue.put(_Slot(fut, prompt, max_new_tokens))
        self._wake.set()
        return fut

    def close(self) -> None:
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=60)

    # -------------------------------------------------------------- loop
    def _admit(self) -> None:
        for b in range(self.B):
            if self._slots[b] is not None:
                continue
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                return
            self._slots[b] = req
            # slot restarts from position 0 (its cache rows are masked by
            # pos-causality, so stale rows beyond pos are never read)
            self._pos[b] = 0
            self._tok[b, 0] = req.prompt[0]
            req.fed = 1

    def _loop(self) -> None:
        while not self._stop:
            if all(s is None for s in self._slots) and self._queue.empty():
                self._wake.wait(timeout=0.1)
                self._wake.clear()
                continue
            self._admit()
            if all(s is None for s in self._slots):
                continue
            feed = dict(self._caches)
            feed["input"] = self._tok.copy()
            feed["pos"] = self._pos.copy()
            out = self.net.prediction(feed)
            self.steps_run += 1
            logits = np.asarray(out[self._logits_edge])  # [B, 1, V]
            for i in range(self.cfg.layers):
                ck, cv = self._cache_edges[i]
                self._caches[f"cache_k_{i}"] = out[ck]
                self._caches[f"cache_v_{i}"] = out[cv]
            for b, slot in enumerate(self._slots):
                if slot is None:
                    continue
                self._pos[b] += 1
                if slot.fed < len(slot.prompt):
                    # chunked prefill: teacher-force the next prompt token
                    self._tok[b, 0] = slot.prompt[slot.fed]
                    slot.fed += 1
                    continue
                nxt = int(np.argmax(logits[b, 0]))
                slot.tokens.append(nxt)
                slot.generated += 1
                self.tokens_served += 1
                if slot.generated >= slot.max_new:
                    slot.future.set_result(
                        np.concatenate([slot.prompt,
                                        np.asarray(slot.tokens, np.int32)]))
                    self._slots[b] = None
                else:
                    self._tok[b, 0] = nxt
        # drain on close
        for slot in self._slots:
            if slot is not None and not slot.future.done():
                slot.future.cancel()
