"""Continuous-batching decode scheduler (slot-based, vLLM-style).

The LLM analog of the reference's Worker request pool
(`framework/core/net/worker.h:69-182`): a FIXED-batch decode Net whose B
slots each hold an independent sequence (per-slot `pos` is native to
`mha_decode`).  Requests join a free slot at any step.

Prompt admission is CHUNKED: while any slot still has unfed prompt
tokens, the step runs through a chunk-verify graph
(`build_transformer_verify_step`, `mha_verify`) that scores K tokens per
slot in one dispatch — admission of a P-token prompt costs ceil(P/K)
steps, not P.  Slots that are already decoding ride the same step (their
single token + padding), so prefill and decode interleave with static
shapes and exactly two compiled programs (decode T=1, verify T=K).

Sampling: greedy (temperature=0, default), or temperature softmax with
optional top-k / nucleus top-p filtering, per request.

Fused steady state (`fuse_window=K`): between admission events the
scheduler's transition is pure device math, so K greedy decode steps run
as ONE dispatch — a jitted `lax.fori_loop` carrying (token, pos, caches)
with per-slot step budgets masking slots that finish mid-window (the
same move `runtime/speculative.py` makes for its draft/verify loop).
This is the TPU answer to the reference's flat device hot loop
(`framework/core/net/net.cpp:418-510`): per-step host dispatch cost is
paid once per window, not once per token.  Admission latency is bounded
by one window (the queue is re-checked at every window boundary).
Sampling fuses too — temperature/top-k/top-p run on device with the jax
PRNG (seed-deterministic; greedy slots stay bit-exact argmax); only
prefilling falls back to the chunked verify path.

Usage:
    sched = DecodeScheduler(cfg, batch=8, prefill_chunk=8, fuse_window=16)
    fut = sched.submit(prompt_ids, max_new_tokens=32, temperature=0.8,
                       top_k=40)
    tokens = fut.result()
    sched.close()
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional

import numpy as np

from ..models.transformer import (
    TransformerConfig,
    build_transformer_decode_step,
    build_transformer_verify_step,
    make_transformer_params,
)
from .net import Net

__all__ = ["DecodeScheduler", "sample_token"]


def sample_token(logits: np.ndarray, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 0.0,
                 rng: Optional[np.random.Generator] = None) -> int:
    """Sample one token id from a [V] logit row.

    temperature == 0 -> argmax (greedy).  top_k > 0 keeps only the k most
    likely tokens; 0 < top_p < 1 keeps the smallest set whose probability
    mass reaches top_p (nucleus).  Filters compose (k first, then p).
    """
    logits = np.asarray(logits, np.float64).reshape(-1)
    if temperature <= 0.0:
        return int(np.argmax(logits))
    z = logits / float(temperature)
    if top_k and top_k < z.size:
        kth = np.partition(z, -top_k)[-top_k]
        z = np.where(z < kth, -np.inf, z)
    p = np.exp(z - np.max(z[np.isfinite(z)]))
    p /= p.sum()
    if 0.0 < top_p < 1.0:
        order = np.argsort(-p)
        csum = np.cumsum(p[order])
        keep_n = int(np.searchsorted(csum, top_p) + 1)
        mask = np.zeros_like(p)
        mask[order[:keep_n]] = 1.0
        p = p * mask
        p /= p.sum()
    rng = rng if rng is not None else np.random.default_rng()
    return int(rng.choice(p.size, p=p))


class _Slot:
    __slots__ = ("future", "prompt", "fed", "generated", "max_new",
                 "tokens", "temperature", "top_k", "top_p")

    def __init__(self, future, prompt, max_new, temperature=0.0,
                 top_k=0, top_p=0.0):
        self.future = future
        self.prompt = prompt          # np [P] int32
        self.fed = 0                  # prompt tokens already fed
        self.generated = 0
        self.max_new = max_new
        self.tokens: List[int] = []
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p


class DecodeScheduler:
    # one-hot blend rewrites the whole cache per step (fine when small);
    # beyond this row count the per-row write path wins (measured A/B at
    # max_seq 2048, bench_suite llm1b_*_distinct rows)
    CACHE_UPDATE_BLEND_MAX_SEQ = 512

    def __init__(self, cfg: TransformerConfig, batch: int = 8,
                 params: Optional[Dict[str, np.ndarray]] = None,
                 precision: str = "fp32", seed: int = 0,
                 kv_cache_dtype: str = "float32", kv_scale: float = 0.05,
                 prefill_chunk: int = 8, cache_update: str = "auto",
                 fuse_window: int = 0, weight_only: Optional[str] = None):
        self.cfg = cfg
        self.B = batch
        self.chunk = max(1, int(prefill_chunk))
        self.fuse_window = max(0, int(fuse_window))
        self.weight_only = weight_only
        self.params = params if params is not None else \
            make_transformer_params(cfg, seed)
        if cache_update == "auto":
            # distinct per-slot positions are native here, so the aligned
            # single-row write is ineligible; pick blend vs per-row by
            # cache size (the measured crossover — same shape-dependent
            # policy lesson as the depthwise/batch rule)
            cache_update = ("blend"
                            if cfg.max_seq <= self.CACHE_UPDATE_BLEND_MAX_SEQ
                            else "rows")
        self.cache_update = cache_update
        self.graph = build_transformer_decode_step(
            cfg, batch, self.params, kv_cache_dtype=kv_cache_dtype,
            kv_scale=kv_scale, cache_update=cache_update)
        self.graph = self._maybe_weight_only(self.graph)
        self.net = Net(self.graph, precision=precision)
        self._logits_edge = self.graph.outputs[0]
        self._cache_edges = [
            (self.graph.nodes[f"dec_att_{i}"].outputs[1],
             self.graph.nodes[f"dec_att_{i}"].outputs[2])
            for i in range(cfg.layers)]
        if self.chunk > 1:
            self.vgraph = build_transformer_verify_step(
                cfg, batch, self.chunk, self.params,
                kv_cache_dtype=kv_cache_dtype, kv_scale=kv_scale,
                cache_update=cache_update)
            self.vgraph = self._maybe_weight_only(self.vgraph)
            self.vnet = Net(self.vgraph, precision=precision)
            self._vlogits_edge = self.vgraph.outputs[0]
            self._vcache_edges = [
                (self.vgraph.nodes[f"ver_att_{i}"].outputs[1],
                 self.vgraph.nodes[f"ver_att_{i}"].outputs[2])
                for i in range(cfg.layers)]
        cdt = np.int8 if kv_cache_dtype == "int8" else np.float32
        shape = (batch, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
        self._caches = {}
        for i in range(cfg.layers):
            self._caches[f"cache_k_{i}"] = np.zeros(shape, cdt)
            self._caches[f"cache_v_{i}"] = np.zeros(shape, cdt)
        self._pos = np.zeros((batch,), np.int32)
        self._tok = np.zeros((batch, 1), np.int32)
        self._rng = np.random.default_rng(seed)
        self._slots: List[Optional[_Slot]] = [None] * batch
        self._queue: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._kv_cache_dtype = kv_cache_dtype
        self._fused_runs = {}   # sampling: bool -> compiled window
        self._vrun = None
        self._base_key = None
        if self.fuse_window > 1:
            import jax

            self._base_key = jax.random.PRNGKey(seed)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self.steps_run = 0
        self.prefill_steps_run = 0
        self.fused_windows_run = 0
        self.tokens_served = 0
        # per-phase wall accounting (reference Worker latency bookkeeping,
        # `worker.cpp:96-212`): fused windows vs chunked prefill vs
        # per-step decode, so serving rows can report pure decode rate
        self.phase_seconds = {"window": 0.0, "prefill": 0.0, "step": 0.0}

    def _maybe_weight_only(self, graph):
        """weight_only = None | "w8" | "w4": rewrite dense weights to the
        int8/int4 HBM-resident form (the serving memory-bandwidth play —
        same rewrite the `llm1b_*` bench rows use)."""
        if not self.weight_only:
            return graph
        from ..quant import weight_only_quantize

        g = weight_only_quantize(
            graph, bits=4 if self.weight_only == "w4" else 8)
        if self.weight_only == "w4":
            for n in g.nodes.values():
                if n.op == "dense_w4":
                    n.attrs["impl"] = "pallas"
        return g

    # ------------------------------------------------------------- public
    def submit(self, prompt: np.ndarray, max_new_tokens: int = 16,
               temperature: float = 0.0, top_k: int = 0,
               top_p: float = 0.0) -> Future:
        """Queue a request; resolves to np [len(prompt)+n] int32 tokens."""
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        assert len(prompt) + max_new_tokens <= self.cfg.max_seq
        fut: Future = Future()
        self._queue.put(_Slot(fut, prompt, max_new_tokens,
                              temperature, top_k, top_p))
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
            req.fed = 0

    def _finish(self, b: int, slot: _Slot) -> None:
        slot.future.set_result(
            np.concatenate([slot.prompt,
                            np.asarray(slot.tokens, np.int32)]))
        self._slots[b] = None

    def _sample_and_store(self, b: int, slot: _Slot, row: np.ndarray) -> None:
        nxt = sample_token(row, slot.temperature, slot.top_k, slot.top_p,
                           self._rng)
        slot.tokens.append(nxt)
        slot.generated += 1
        self.tokens_served += 1
        if slot.generated >= slot.max_new:
            self._finish(b, slot)
        else:
            self._tok[b, 0] = nxt

    def _step_decode(self) -> None:
        """One single-token step: every active slot decodes (or, when
        chunk==1, teacher-forces its next prompt token)."""
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
                self._tok[b, 0] = slot.prompt[slot.fed]
                slot.fed += 1
                if slot.fed == len(slot.prompt):
                    # next step's logits produce the first sampled token
                    pass
                continue
            self._sample_and_store(b, slot, logits[b, 0])

    def _make_vrun(self):
        """Prefill-chunk program with DEVICE-SIDE logit row gather: the
        verify net emits [B, K, V] logits, but the host only ever reads
        row nreal[b]-1 per slot (the last REAL token of a prefilling slot;
        row 0 == nreal-1 for a decoding slot riding the chunk).  Gathering
        on device shrinks the per-chunk fetch from B*K*V (8 MB at the
        1B-class config — ~3x the chunk's compute time through the relay)
        to B*V."""
        import jax
        import jax.numpy as jnp

        vnet = self.vnet
        L = self.cfg.layers
        vlog = self._vlogits_edge
        vce = self._vcache_edges

        @jax.jit
        def run(params, ids, pos, nreal, caches):
            feed = {"input": ids, "pos": pos}
            for i in range(L):
                feed[f"cache_k_{i}"] = caches[2 * i]
                feed[f"cache_v_{i}"] = caches[2 * i + 1]
            out = vnet.forward(params, feed)
            logits = out[vlog]                                # [B, K, V]
            rows = logits[jnp.arange(logits.shape[0]), nreal - 1]
            new = []
            for i in range(L):
                new += [out[vce[i][0]], out[vce[i][1]]]
            return rows, tuple(new)

        return run

    def _step_prefill(self) -> None:
        """One chunk step through the verify net: prefilling slots feed up
        to `chunk` prompt tokens; decoding slots feed their single token
        plus padding (stale pad rows are overwritten before the pos pointer
        ever reaches them, the `mha_verify` cache-row discipline)."""
        import jax.numpy as jnp

        K = self.chunk
        ids = np.zeros((self.B, K), np.int32)
        nreal = np.zeros((self.B,), np.int32)
        for b, slot in enumerate(self._slots):
            if slot is None:
                # pad slots still claim one row so the device gather index
                # (nreal - 1) stays in range
                nreal[b] = 1
                continue
            if slot.fed < len(slot.prompt):
                n = min(K, len(slot.prompt) - slot.fed)
                ids[b, :n] = slot.prompt[slot.fed: slot.fed + n]
                nreal[b] = n
            else:
                ids[b, 0] = self._tok[b, 0]
                nreal[b] = 1
        if self._vrun is None:
            self._vrun = self._make_vrun()
        cdt = self._cache_carry_dtype()
        caches = tuple(
            jnp.asarray(self._caches[f"cache_{kv}_{i}"]).astype(cdt)
            for i in range(self.cfg.layers) for kv in ("k", "v"))
        rows, new_caches = self._vrun(
            self.vnet.params, jnp.asarray(ids), jnp.asarray(self._pos),
            jnp.asarray(nreal), caches)
        self.steps_run += 1
        self.prefill_steps_run += 1
        rows = np.asarray(rows)            # [B, V] — the chunk's only fetch
        for i in range(self.cfg.layers):
            self._caches[f"cache_k_{i}"] = new_caches[2 * i]
            self._caches[f"cache_v_{i}"] = new_caches[2 * i + 1]
        for b, slot in enumerate(self._slots):
            if slot is None:
                continue
            n = int(nreal[b])
            self._pos[b] += n
            if slot.fed < len(slot.prompt):
                slot.fed += n
                if slot.fed >= len(slot.prompt):
                    # chunk completed the prompt: the last real token's
                    # logits ARE the first generation sample — no extra step
                    self._sample_and_store(b, slot, rows[b])
                continue
            self._sample_and_store(b, slot, rows[b])

    # ------------------------------------------------------- fused window
    def _can_fuse(self) -> bool:
        """A window is fusable when every active slot is past its prompt
        (pure decode).  Sampling fuses too: temperature/top-k/top-p run
        ON DEVICE with the jax PRNG (greedy slots get bit-exact argmax;
        sampled slots are seed-deterministic but draw from the device
        RNG rather than the host path's numpy RNG)."""
        if self.fuse_window <= 1:
            return False
        active = [s for s in self._slots if s is not None]
        return bool(active) and all(
            s.fed >= len(s.prompt) for s in active)

    def _make_fused(self, K: int, sampling: bool):
        """One jitted program: K decode steps chained through a fori_loop.
        Per-slot step budgets `rem` mask slots that finish mid-window (a
        masked slot's pos/token freeze; its cache row re-write at the
        frozen pos is idempotent, so no cache masking is needed).

        `sampling=False` compiles the pure-argmax window (no [B, V]
        sorts, no PRNG) — all-greedy windows, the common serving case,
        pay zero sampling overhead; a separate program compiles lazily
        the first time a sampled slot decodes."""
        import functools

        import jax
        import jax.numpy as jnp
        from jax import lax

        net = self.net
        logits_e = self._logits_edge
        cache_edges = self._cache_edges
        L = self.cfg.layers
        B = self.B

        def sample(logits, key, temp, topk, topp):
            """Device form of `sample_token` over [B, V] rows: greedy when
            temp<=0; temperature softmax with optional top-k then
            nucleus top-p filters otherwise (same filter composition and
            searchsorted semantics as the host sampler; RNG is jax)."""
            V = logits.shape[-1]
            z32 = logits.astype(jnp.float32)
            greedy = jnp.argmax(z32, -1).astype(jnp.int32)
            z = z32 / jnp.maximum(temp, 1e-6)[:, None]
            zs = jnp.sort(z, axis=-1)[:, ::-1]
            kidx = jnp.clip(topk - 1, 0, V - 1)
            kth = jnp.take_along_axis(zs, kidx[:, None], 1)[:, 0]
            z = jnp.where((topk[:, None] > 0) & (z < kth[:, None]),
                          -jnp.inf, z)
            p = jax.nn.softmax(z, -1)
            ps = jnp.sort(p, axis=-1)[:, ::-1]
            csum = jnp.cumsum(ps, -1)
            keep_n = jnp.sum(csum < topp[:, None], -1) + 1
            cutoff = jnp.take_along_axis(
                ps, jnp.clip(keep_n - 1, 0, V - 1)[:, None], 1)[:, 0]
            use_p = (topp > 0.0) & (topp < 1.0)
            p = jnp.where(use_p[:, None] & (p < cutoff[:, None]), 0.0, p)
            logp = jnp.log(jnp.maximum(p, 1e-30))
            keys = jax.random.split(key, B)
            drawn = jax.vmap(jax.random.categorical)(keys, logp)
            return jnp.where(temp <= 0.0, greedy,
                             drawn.astype(jnp.int32))

        # donate the cache operands: the window's output caches reuse the
        # input HBM (tested through the relay); host transfers per window
        # are ONE [K, B] int32 fetch — pos/tok mirrors are derived on the
        # host from (toks, rem), every other byte stays on device
        @functools.partial(jax.jit, donate_argnums=(6,))
        def run(params, key, tok, pos, rem, samp, caches):
            temp, topk, topp = samp

            def body(k, carry):
                tok, pos, caches, toks = carry
                feed = {"input": tok, "pos": pos}
                for i in range(L):
                    feed[f"cache_k_{i}"] = caches[2 * i]
                    feed[f"cache_v_{i}"] = caches[2 * i + 1]
                out = net.forward(params, feed)
                if sampling:
                    nxt = sample(out[logits_e][:, 0, :],
                                 jax.random.fold_in(key, k), temp,
                                 topk, topp)
                else:
                    nxt = jnp.argmax(out[logits_e][:, 0, :],
                                     -1).astype(jnp.int32)
                active = k < rem
                tok = jnp.where(active[:, None], nxt[:, None], tok)
                pos = jnp.where(active, pos + 1, pos)
                new = []
                for i in range(L):
                    new += [out[cache_edges[i][0]], out[cache_edges[i][1]]]
                return (tok, pos, tuple(new), toks.at[k].set(nxt))

            toks0 = jnp.zeros((K, B), jnp.int32)
            _, _, caches, toks = lax.fori_loop(
                0, K, body, (tok, pos, caches, toks0))
            return caches, toks

        return run

    def _cache_carry_dtype(self):
        import jax.numpy as jnp

        if self._kv_cache_dtype == "int8":
            return jnp.int8
        return jnp.bfloat16 if self.net.precision == "bf16" else jnp.float32

    def _step_fused(self) -> None:
        """Run one fused K-step window (ONE device dispatch)."""
        import jax
        import jax.numpy as jnp

        K = self.fuse_window
        rem = np.zeros((self.B,), np.int32)
        temp = np.zeros((self.B,), np.float32)
        topk = np.zeros((self.B,), np.int32)
        topp = np.zeros((self.B,), np.float32)
        for b, slot in enumerate(self._slots):
            if slot is not None:
                rem[b] = min(K, slot.max_new - slot.generated)
                temp[b] = slot.temperature
                topk[b] = slot.top_k
                topp[b] = slot.top_p
        sampling = bool((temp > 0.0).any())
        run = self._fused_runs.get(sampling)
        if run is None:
            run = self._make_fused(K, sampling)
            self._fused_runs[sampling] = run
        cdt = self._cache_carry_dtype()
        caches = tuple(
            jnp.asarray(self._caches[f"cache_{kv}_{i}"]).astype(cdt)
            for i in range(self.cfg.layers) for kv in ("k", "v"))
        key = jax.random.fold_in(self._base_key, self.fused_windows_run)
        caches, toks = run(
            self.net.params, key, jnp.asarray(self._tok),
            jnp.asarray(self._pos), jnp.asarray(rem),
            (jnp.asarray(temp), jnp.asarray(topk), jnp.asarray(topp)),
            caches)
        toks = np.asarray(toks)        # [K, B] — the window's ONLY fetch
        for i in range(self.cfg.layers):
            self._caches[f"cache_k_{i}"] = caches[2 * i]
            self._caches[f"cache_v_{i}"] = caches[2 * i + 1]
        self.steps_run += K
        self.fused_windows_run += 1
        for b in range(self.B):
            slot = self._slots[b]
            if slot is None:
                continue
            # host mirrors advance exactly as the device masking did
            r = int(rem[b])
            self._pos[b] += r
            if r > 0:
                self._tok[b, 0] = toks[r - 1, b]
            for t in range(r):
                slot.tokens.append(int(toks[t, b]))
                slot.generated += 1
                self.tokens_served += 1
                if slot.generated >= slot.max_new:
                    self._finish(b, slot)
                    break

    def _loop(self) -> None:
        while not self._stop:
            if all(s is None for s in self._slots) and self._queue.empty():
                self._wake.wait(timeout=0.1)
                self._wake.clear()
                continue
            self._admit()
            if all(s is None for s in self._slots):
                continue
            prefilling = any(
                s is not None and s.fed < len(s.prompt) for s in self._slots)
            t0 = time.perf_counter()
            if prefilling and self.chunk > 1:
                self._step_prefill()
                self.phase_seconds["prefill"] += time.perf_counter() - t0
            elif self._can_fuse():
                self._step_fused()
                self.phase_seconds["window"] += time.perf_counter() - t0
            else:
                if self.chunk > 1:
                    self._step_decode()
                else:
                    # chunk==1 legacy path: admit() must seed the first token
                    for b, s in enumerate(self._slots):
                        if s is not None and s.fed == 0:
                            self._tok[b, 0] = s.prompt[0]
                            s.fed = 1
                    self._step_decode()
                self.phase_seconds["step"] += time.perf_counter() - t0
        # drain on close
        for slot in self._slots:
            if slot is not None and not slot.future.done():
                slot.future.cancel()
