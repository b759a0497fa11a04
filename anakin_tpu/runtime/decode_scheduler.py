"""Continuous-batching decode scheduler (slot-based, vLLM-style).

The LLM analog of the reference's Worker request pool
(`framework/core/net/worker.h:69-182`): a FIXED-batch decode Net whose B
slots each hold an independent sequence (per-slot `pos` is native to
`mha_decode`).  Requests join a free slot at any step.

Prompt admission (`prefill_mode`):

  * "bucket" (default): a newly admitted prompt is scored in ONE
    dispatch through a bucketed-length `mha_prefill` graph (flash
    attention at long buckets) that writes the slot's cache rows
    directly on device and returns only the last-real-token logit rows
    — a P-token prompt costs 1 dispatch, not ceil(P/K).  Programs
    compile per BUCKET (32/64, then multiples of 128), never per exact
    prompt length.  Several slots admitted together share one dispatch
    per bucket.
  * "chunked": the round-3 path — while any slot has unfed prompt
    tokens, the step runs a chunk-verify graph (`mha_verify`) scoring K
    tokens per slot per dispatch; decoding slots ride the chunk.  Kept
    for interleaving-latency-sensitive serving (a bucket prefill stalls
    decoding slots for one dispatch; a chunk advances them).

Request lifecycle (reference Worker future semantics,
`worker.cpp:96-212`):

  * `stop_tokens`: per-request token ids that end generation early —
    checked ON DEVICE inside fused windows (the window while_loop
    early-exits when every live slot has stopped or exhausted its
    budget) and on the host paths.  The stop token IS included in the
    returned sequence.
  * `on_token`: per-request streaming callback, called with each newly
    generated token id in order (from the scheduler thread — keep it
    cheap; the gRPC streaming front-end pushes into a queue).
  * cancellation: `future.cancel()` frees the slot at the next step
    boundary (tokens discarded, cache rows abandoned — they are masked
    by pos-causality and overwritten on re-admission).

Sampling: greedy (temperature=0, default), or temperature softmax with
optional top-k / nucleus top-p filtering, per request.  Fused windows
sample on device with per-slot PRNG keys derived from
(seed, request id, token index) — reproducible for a fixed seed
REGARDLESS of admission timing or batch composition; the host paths use
an equally request-keyed numpy Generator (same filters, different RNG
stream, so host-path and fused-path draws differ — greedy is bit-exact
everywhere).

Fused steady state (`fuse_window=K`): between admission events the
scheduler's transition is pure device math, so up to K decode steps run
as ONE dispatch — a jitted `lax.while_loop` carrying (token, pos,
alive, caches) with per-slot step budgets masking slots that finish
mid-window, early-exiting when no slot has work left.  This is the TPU
answer to the reference's flat device hot loop
(`framework/core/net/net.cpp:418-510`): per-step host dispatch cost is
paid once per window, not once per token.  Admission latency is bounded
by one window (the queue is re-checked at every window boundary).

Tensor parallelism: pass `mesh=` to run the decode/prefill graphs
GSPMD-sharded (Megatron attention/MLP rules from
`parallel.sharding.shard_graph_params`; KV caches stay head-sharded
across steps).  The fused-window/bucket-admission machinery is
unchanged — the jitted programs partition over the mesh.

Memory: every slot preallocates its full `max_seq` KV rows
(`cache_bytes()` reports the footprint).  At 1B-class
(16L x 8Hkv x 2048 x 128, int8) that is 64 MB/slot — the static-arena
trade: zero fragmentation and donation-aliased updates, at the cost of
max_seq-bound slot count (see docs/BENCH_NOTES.md "KV capacity wall").

Usage:
    sched = DecodeScheduler(cfg, batch=8, fuse_window=16)
    fut = sched.submit(prompt_ids, max_new_tokens=32, temperature=0.8,
                       top_k=40, stop_tokens=(eos_id,))
    tokens = fut.result()
    sched.close()
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..models.transformer import (
    TransformerConfig,
    build_transformer_decode_step,
    build_transformer_prefill,
    build_transformer_verify_step,
    make_transformer_params,
)
from .net import Net

__all__ = ["DecodeScheduler", "sample_token"]

_log = logging.getLogger("anakin_tpu")


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
                 "tokens", "temperature", "top_k", "top_p", "stop_set",
                 "on_token", "rid", "rng", "finish_reason")

    def __init__(self, future, prompt, max_new, temperature=0.0,
                 top_k=0, top_p=0.0, stop_tokens=(), on_token=None,
                 rid=0, seed=0):
        self.future = future
        self.prompt = prompt          # np [P] int32
        self.fed = 0                  # prompt tokens already fed
        self.generated = 0
        self.max_new = max_new
        self.tokens: List[int] = []
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.stop_set = frozenset(int(t) for t in stop_tokens)
        self.on_token = on_token
        self.rid = rid                # monotone request id (PRNG keying)
        # per-request host RNG: draws depend only on (seed, rid, step),
        # never on admission order or what else shares the batch
        self.rng = np.random.default_rng([seed, rid])
        self.finish_reason: Optional[str] = None


class DecodeScheduler:
    # one-hot blend rewrites the whole cache per step (fine when small);
    # beyond this row count the per-row write path wins (measured A/B at
    # max_seq 2048, bench_suite llm1b_*_distinct rows)
    CACHE_UPDATE_BLEND_MAX_SEQ = 512
    # static per-window stop-id table width (one compiled program
    # regardless of how many stop ids each request carries)
    MAX_STOP_IDS = 8
    # prompt-length buckets: tight small buckets, then flash-tile-aligned
    # multiples of 128 (same ladder as runtime.generate.GenerationSession)
    PREFILL_BUCKETS_SMALL = (32, 64)

    def __init__(self, cfg: TransformerConfig, batch: int = 8,
                 params: Optional[Dict[str, np.ndarray]] = None,
                 precision: str = "fp32", seed: int = 0,
                 kv_cache_dtype: str = "float32", kv_scale: float = 0.05,
                 prefill_chunk: int = 8, cache_update: str = "auto",
                 fuse_window: int = 0, weight_only: Optional[str] = None,
                 prefill_mode: str = "bucket", mesh=None,
                 cache_view: str = "auto"):
        self.cfg = cfg
        self.B = batch
        self.chunk = max(1, int(prefill_chunk))
        self.fuse_window = max(0, int(fuse_window))
        self.weight_only = weight_only
        if prefill_mode not in ("bucket", "chunked"):
            raise ValueError(f"prefill_mode {prefill_mode!r}")
        self.prefill_mode = prefill_mode
        self.mesh = mesh
        self.params = params if params is not None else \
            make_transformer_params(cfg, seed)
        self._seed = seed
        self._kv_scale = kv_scale
        self._precision = precision
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
        # the decode graph is the only one that gets the Pallas w4 kernel
        # forced: it runs at the [B,1,E] token shapes the kernel was tuned
        # for.  Verify/prefill graphs run chunk/prompt shapes where the
        # XLA unpack lowering wins (round-5 w4 phase attribution,
        # docs/BENCH_NOTES.md) — leave their impl to the default/autotuner.
        self.graph = self._maybe_weight_only(self.graph, decode=True)
        self.net = self._make_net(self.graph, device_params=None)
        self._logits_edge = self.graph.outputs[0]
        self._cache_edges = [
            (self.graph.nodes[f"dec_att_{i}"].outputs[1],
             self.graph.nodes[f"dec_att_{i}"].outputs[2])
            for i in range(cfg.layers)]
        if self.chunk > 1 and prefill_mode == "chunked":
            self.vgraph = build_transformer_verify_step(
                cfg, batch, self.chunk, self.params,
                kv_cache_dtype=kv_cache_dtype, kv_scale=kv_scale,
                cache_update=cache_update)
            self.vgraph = self._maybe_weight_only(self.vgraph)
            self.vnet = self._make_net(self.vgraph,
                                       device_params=self.net.params)
            self._vlogits_edge = self.vgraph.outputs[0]
            self._vcache_edges = [
                (self.vgraph.nodes[f"ver_att_{i}"].outputs[1],
                 self.vgraph.nodes[f"ver_att_{i}"].outputs[2])
                for i in range(cfg.layers)]
        cdt = np.int8 if kv_cache_dtype == "int8" else np.float32
        shape = (batch, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
        self._caches = {}
        for i in range(cfg.layers):
            self._caches[f"cache_k_{i}"] = self._place_cache(
                np.zeros(shape, cdt))
            self._caches[f"cache_v_{i}"] = self._place_cache(
                np.zeros(shape, cdt))
        self._pos = np.zeros((batch,), np.int32)
        self._tok = np.zeros((batch, 1), np.int32)
        self._next_rid = 0
        self._slots: List[Optional[_Slot]] = [None] * batch
        self._queue: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._kv_cache_dtype = kv_cache_dtype
        self._fused_runs = {}     # (sampling, view) -> compiled window
        self._prefill_runs = {}   # bucket_len -> jitted admission program
        self._prefill_graphs = {}  # bucket_len -> its Graph (introspection)
        # bucketed cache VIEWS (round-5): fused windows attend over only
        # the first `view` cache rows (static slice, view = next bucket
        # >= max live pos + window) instead of all max_seq rows — the
        # dominant decode HBM traffic at long max_seq.  One extra
        # compiled program per (sampling, view bucket); "off" reads the
        # full cache in every window.
        self._use_views = (cache_view == "auto")
        self._view_nets = {}      # view -> (net, logits_edge, cache_edges)
        self._vrun = None
        self._base_key = None
        import jax

        self._base_key = jax.random.PRNGKey(seed)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self.steps_run = 0
        self.prefill_steps_run = 0
        self.fused_windows_run = 0
        self.bucket_prefills_run = 0
        self.tokens_served = 0
        # per-phase wall accounting (reference Worker latency bookkeeping,
        # `worker.cpp:96-212`): fused windows vs prefill vs per-step
        # decode, so serving rows can report pure decode rate AND
        # admission cost per prompt
        self.phase_seconds = {"window": 0.0, "prefill": 0.0, "step": 0.0}

    # ----------------------------------------------------------- building
    def _make_net(self, graph, device_params=None):
        """Build a Net; with a mesh, apply the Megatron TP sharding rules
        and keep KV caches head-sharded across steps."""
        if self.mesh is None:
            return Net(graph, precision=self._precision,
                       device_params=device_params)
        from ..parallel.sharding import shard_graph_params

        rules = shard_graph_params(graph, self.mesh)
        spec = self._cache_sharding()
        in_sh = {}
        if spec is not None:
            for i in range(self.cfg.layers):
                in_sh[f"cache_k_{i}"] = spec
                in_sh[f"cache_v_{i}"] = spec
        return Net(graph, precision=self._precision,
                   param_sharding=None if device_params is not None else rules,
                   mesh=self.mesh, input_shardings=in_sh,
                   device_params=device_params)

    def _cache_sharding(self):
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel.mesh import MODEL_AXIS

        tp = self.mesh.shape.get(MODEL_AXIS, 1)
        if tp > 1 and self.cfg.kv_heads % tp == 0:
            return NamedSharding(
                self.mesh, PartitionSpec(None, MODEL_AXIS, None, None))
        return NamedSharding(self.mesh, PartitionSpec())

    def _place_cache(self, arr):
        spec = self._cache_sharding()
        if spec is None:
            return arr
        import jax

        return jax.device_put(arr, spec)

    def _maybe_weight_only(self, graph, decode: bool = False):
        """weight_only = None | "w8" | "w4": rewrite dense weights to the
        int8/int4 HBM-resident form (the serving memory-bandwidth play —
        same rewrite the `llm1b_*` bench rows use).  The Pallas VMEM
        nibble-unpack kernel is forced only on the DECODE graph (T=1
        shapes); chunk/prompt-shaped graphs keep the XLA unpack."""
        if not self.weight_only:
            return graph
        import os

        import jax

        from ..quant import weight_only_quantize

        g = weight_only_quantize(
            graph, bits=4 if self.weight_only == "w4" else 8)
        pallas_ok = (jax.default_backend() == "tpu"
                     or os.environ.get("ANAKIN_PALLAS_INTERPRET") == "1")
        if decode and self.weight_only == "w4" and pallas_ok:
            for n in g.nodes.values():
                if n.op == "dense_w4":
                    n.attrs["impl"] = "pallas"
        return g

    def cache_bytes(self) -> int:
        """Static KV arena footprint (all slots, all layers) — the
        serving capacity number (reference analog: the memory scheduler's
        reuse-plan accounting, `memory_scheduler.cpp:187-444`)."""
        itemsize = 1 if self._kv_cache_dtype == "int8" else 4
        per = (self.B * self.cfg.kv_heads * self.cfg.max_seq
               * self.cfg.head_dim * itemsize)
        return 2 * self.cfg.layers * per

    # ------------------------------------------------------------- public
    def submit(self, prompt: np.ndarray, max_new_tokens: int = 16,
               temperature: float = 0.0, top_k: int = 0,
               top_p: float = 0.0, stop_tokens: Sequence[int] = (),
               on_token=None) -> Future:
        """Queue a request; resolves to np [len(prompt)+n] int32 tokens.

        `stop_tokens`: ids that end generation early (the stop token is
        the last token of the result).  `on_token(tok:int)` streams each
        generated token.  Cancel the returned future to evict the
        request (before OR during generation)."""
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        assert len(prompt) >= 1
        assert len(prompt) + max_new_tokens <= self.cfg.max_seq
        assert len(stop_tokens) <= self.MAX_STOP_IDS, \
            f"at most {self.MAX_STOP_IDS} stop tokens per request"
        fut: Future = Future()
        with self._lock:
            rid = self._next_rid
            self._next_rid += 1
        self._queue.put(_Slot(fut, prompt, max_new_tokens,
                              temperature, top_k, top_p, stop_tokens,
                              on_token, rid, self._seed))
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
            while True:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    return
                if not req.future.cancelled():
                    break
            self._slots[b] = req
            # slot restarts from position 0 (its cache rows are masked by
            # pos-causality, so stale rows beyond pos are never read)
            self._pos[b] = 0
            req.fed = 0

    def _reap_cancelled(self) -> None:
        """Evict slots whose future was cancelled: the slot frees at the
        next step boundary (reference: Worker futures dropped client-side
        kept computing; here the batch slot is reclaimed)."""
        for b, slot in enumerate(self._slots):
            if slot is not None and slot.future.cancelled():
                slot.finish_reason = "cancelled"
                self._slots[b] = None

    def _finish(self, b: int, slot: _Slot, reason: str = "length") -> None:
        slot.finish_reason = reason
        self._slots[b] = None
        if slot.future.cancelled():
            return
        try:
            slot.future.set_result(
                np.concatenate([slot.prompt,
                                np.asarray(slot.tokens, np.int32)]))
        except Exception:                       # racing cancel
            pass

    def _emit(self, slot: _Slot, tok: int) -> None:
        slot.tokens.append(tok)
        slot.generated += 1
        self.tokens_served += 1
        if slot.on_token is not None:
            try:
                slot.on_token(tok)
            except Exception:                   # stream sink must not
                _log.exception("on_token callback failed")  # kill serving

    def _sample_and_store(self, b: int, slot: _Slot, row: np.ndarray) -> None:
        nxt = sample_token(row, slot.temperature, slot.top_k, slot.top_p,
                           slot.rng)
        self._emit(slot, nxt)
        if nxt in slot.stop_set:
            self._finish(b, slot, "stop")
        elif slot.generated >= slot.max_new:
            self._finish(b, slot, "length")
        else:
            self._tok[b, 0] = nxt

    def _fail_active(self, exc: BaseException) -> None:
        """A device step failed AFTER its cache operands were donated:
        the old buffers are gone, so in-flight requests cannot be
        resumed.  Fail their futures, reset the arena, keep serving
        (advisor round-4: never leave the thread holding donated
        arrays)."""
        _log.exception("device step failed; resetting scheduler arena")
        for b, slot in enumerate(self._slots):
            if slot is not None:
                self._slots[b] = None
                if not slot.future.cancelled():
                    try:
                        slot.future.set_exception(exc)
                    except Exception:
                        pass
        cdt = np.int8 if self._kv_cache_dtype == "int8" else np.float32
        shape = (self.B, self.cfg.kv_heads, self.cfg.max_seq,
                 self.cfg.head_dim)
        self._caches = {}
        for i in range(self.cfg.layers):
            self._caches[f"cache_k_{i}"] = self._place_cache(
                np.zeros(shape, cdt))
            self._caches[f"cache_v_{i}"] = self._place_cache(
                np.zeros(shape, cdt))
        self._pos[:] = 0
        self._tok[:] = 0

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

    # -------------------------------------------------- bucketed admission
    def _bucket(self, P: int) -> int:
        for b in self.PREFILL_BUCKETS_SMALL:
            if P <= b:
                return min(b, self.cfg.max_seq)
        return min(-(-P // 128) * 128, self.cfg.max_seq)

    def _make_prefill_run(self, L: int):
        """One-dispatch admission program for bucket length L: the flash
        cache-emitting `mha_prefill` graph over the FULL slot batch, a
        device-side gather of each slot's last-real-token logit row, and
        a masked merge of admitted slots' cache blocks into the live
        arena (donated).  Bucket padding is correct without masking:
        causal attention never lets row nreal-1 see rows >= nreal, and
        garbage cache rows beyond nreal are overwritten before the pos
        pointer reads them (same argument as GenerationSession's
        buckets).  This is VERDICT round-4 task 1: admission cost one
        dispatch per bucket instead of ceil(P/chunk) x ~47 ms."""
        import functools

        import jax
        import jax.numpy as jnp

        impl = None
        if jax.default_backend() == "tpu" and L >= 512:
            impl = "flash"      # measured crossover S>=512 (round-2 study)
        # last_token_only: the lm_head runs on ONLY each slot's last real
        # position ([B, 1, V] logits) — skips the [B, L, V]
        # materialization (2.1 GB at 1B-class P=2048) and its head FLOPs
        g = build_transformer_prefill(
            self.cfg, self.B, L, self.params,
            kv_cache_dtype=self._kv_cache_dtype, kv_scale=self._kv_scale,
            attention_impl=impl, last_token_only=True)
        g = self._maybe_weight_only(g)
        self._prefill_graphs[L] = g
        pnet = self._make_net(g, device_params=self.net.params)
        logits_e = g.outputs[0]
        pce = [(g.nodes[f"pre_att_{i}"].outputs[1],
                g.nodes[f"pre_att_{i}"].outputs[2])
               for i in range(self.cfg.layers)]
        Lyr = self.cfg.layers

        @functools.partial(jax.jit, donate_argnums=(4,))
        def run(params, ids, nreal, admit, caches):
            out = pnet.forward(params, {"input": ids, "nreal": nreal})
            rows = out[logits_e][:, 0, :]                 # [B, V]
            m = admit[:, None, None, None]
            new = []
            for i in range(Lyr):
                nk = out[pce[i][0]].astype(caches[2 * i].dtype)
                nv = out[pce[i][1]].astype(caches[2 * i + 1].dtype)
                new += [jnp.where(m, nk, caches[2 * i]),
                        jnp.where(m, nv, caches[2 * i + 1])]
            return rows.astype(jnp.float32), tuple(new)

        return run

    def _step_prefill_bucket(self) -> None:
        """Admit every pending prompt: one dispatch per distinct bucket
        length fills the admitted slots' caches and yields their first
        sampled token.  Decoding slots do not advance during the
        dispatch (they resume at the next window)."""
        import jax.numpy as jnp

        pending = {}
        for b, slot in enumerate(self._slots):
            if slot is not None and slot.fed < len(slot.prompt):
                pending.setdefault(self._bucket(len(slot.prompt)),
                                   []).append(b)
        for L, slots_b in sorted(pending.items()):
            run = self._prefill_runs.get(L)
            if run is None:
                run = self._make_prefill_run(L)
                self._prefill_runs[L] = run
            ids = np.zeros((self.B, L), np.int32)
            nreal = np.ones((self.B,), np.int32)
            admit = np.zeros((self.B,), bool)
            for b in slots_b:
                slot = self._slots[b]
                P = len(slot.prompt)
                ids[b, :P] = slot.prompt
                nreal[b] = P
                admit[b] = True
            caches = self._cache_tuple()
            self._caches = None          # donated — see _fail_active
            t0 = time.perf_counter()
            try:
                rows, new_caches = run(
                    self.net.params, jnp.asarray(ids), jnp.asarray(nreal),
                    jnp.asarray(admit), caches)
                rows = np.asarray(rows)  # [B, V] — the dispatch's one fetch
            except Exception as e:
                self._fail_active(e)
                return
            self.phase_seconds["prefill"] += time.perf_counter() - t0
            self._restore_caches(new_caches)
            self.steps_run += 1
            self.prefill_steps_run += 1
            self.bucket_prefills_run += 1
            for b in slots_b:
                slot = self._slots[b]
                if slot is None:
                    continue
                P = len(slot.prompt)
                slot.fed = P
                self._pos[b] = P
                self._sample_and_store(b, slot, rows[b])

    # ------------------------------------------------------ chunked prefill
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
        caches = self._cache_tuple()
        rows, new_caches = self._vrun(
            self.vnet.params, jnp.asarray(ids), jnp.asarray(self._pos),
            jnp.asarray(nreal), caches)
        self.steps_run += 1
        self.prefill_steps_run += 1
        rows = np.asarray(rows)            # [B, V] — the chunk's only fetch
        self._restore_caches(new_caches)
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
        sampled slots draw from per-request jax keys rather than the
        host path's numpy Generators)."""
        if self.fuse_window <= 1:
            return False
        active = [s for s in self._slots if s is not None]
        return bool(active) and all(
            s.fed >= len(s.prompt) for s in active)

    def _make_fused(self, K: int, sampling: bool, view: int = 0):
        """One jitted program: up to K decode steps chained through a
        while_loop.  Per-slot step budgets `rem` and a stop-token `alive`
        mask freeze slots that finish mid-window (a frozen slot's
        pos/token stop advancing; its cache row re-write at the frozen
        pos is idempotent, so no cache masking is needed); the loop
        EARLY-EXITS once no slot has work left (all stopped or
        budget-exhausted), so stop tokens save real device time.

        `sampling=False` compiles the pure-argmax window (no [B, V]
        sorts, no PRNG) — all-greedy windows, the common serving case,
        pay zero sampling overhead; a separate program compiles lazily
        the first time a sampled slot decodes.  Sampled draws use
        per-slot keys fold_in(fold_in(seed_key, request_id), token_idx):
        reproducible per (seed, request) independent of admission timing
        and batch composition (advisor round-4 determinism finding)."""
        import functools

        import jax
        import jax.numpy as jnp
        from jax import lax

        net, logits_e, cache_edges = self._net_for_view(view)
        L = self.cfg.layers
        B = self.B

        def sample(logits, keys, temp, topk, topp):
            """Device form of `sample_token` over [B, V] rows: greedy when
            temp<=0; temperature softmax with optional top-k then nucleus
            top-p filters otherwise.  Filter semantics match the host
            sampler exactly — top-p keeps the keep_n highest-RANK tokens
            (stable argsort, so cutoff-probability ties resolve to the
            lowest index, as numpy does) rather than thresholding by
            value.  Only the RNG differs (jax PRNG vs numpy
            Generator)."""
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
            order = jnp.argsort(-p, axis=-1)              # stable
            ps = jnp.take_along_axis(p, order, axis=-1)
            csum = jnp.cumsum(ps, -1)
            keep_n = jnp.sum(csum < topp[:, None], -1) + 1
            ranks = jnp.zeros((B, V), jnp.int32)
            ranks = jax.vmap(
                lambda r, o: r.at[o].set(jnp.arange(V, dtype=jnp.int32))
            )(ranks, order)
            use_p = (topp > 0.0) & (topp < 1.0)
            keep = ranks < keep_n[:, None]
            p = jnp.where(use_p[:, None] & ~keep, 0.0, p)
            logp = jnp.log(jnp.maximum(p, 1e-30))
            drawn = jax.vmap(jax.random.categorical)(keys, logp)
            return jnp.where(temp <= 0.0, greedy,
                             drawn.astype(jnp.int32))

        # donate the cache operands: the window's output caches reuse the
        # input HBM (tested through the relay); host transfers per window
        # are ONE [K+1, B] int32 fetch (tokens + executed-step count) —
        # pos/tok mirrors are derived on the host, every other byte stays
        # on device
        @functools.partial(jax.jit, donate_argnums=(8,))
        def run(params, key, tok, pos, rem, rid, gen0, samp, caches):
            temp, topk, topp, stop_ids = samp

            def cond(carry):
                k, tok, pos, alive, caches, toks = carry
                return (k < K) & jnp.any(alive & (rem > k))

            def body(carry):
                k, tok, pos, alive, caches, toks = carry
                feed = {"input": tok, "pos": pos}
                for i in range(L):
                    feed[f"cache_k_{i}"] = caches[2 * i]
                    feed[f"cache_v_{i}"] = caches[2 * i + 1]
                out = net.forward(params, feed)
                if sampling:
                    keys = jax.vmap(
                        lambda r, s: jax.random.fold_in(
                            jax.random.fold_in(key, r), s)
                    )(rid, gen0 + k)
                    nxt = sample(out[logits_e][:, 0, :], keys, temp,
                                 topk, topp)
                else:
                    nxt = jnp.argmax(out[logits_e][:, 0, :],
                                     -1).astype(jnp.int32)
                active = alive & (k < rem)
                stop_now = jnp.any(nxt[:, None] == stop_ids, axis=1)
                tok = jnp.where(active[:, None], nxt[:, None], tok)
                pos = jnp.where(active, pos + 1, pos)
                alive = alive & ~(active & stop_now)
                new = []
                for i in range(L):
                    new += [out[cache_edges[i][0]], out[cache_edges[i][1]]]
                return (k + 1, tok, pos, alive, tuple(new),
                        toks.at[k].set(nxt))

            toks0 = jnp.zeros((K, B), jnp.int32)
            alive0 = jnp.ones((B,), jnp.bool_)
            k, _, _, _, caches, toks = lax.while_loop(
                cond, body, (jnp.int32(0), tok, pos, alive0, caches, toks0))
            # tokens + executed-step count in ONE array = one relay fetch
            packed = jnp.concatenate(
                [toks, jnp.full((1, B), k, jnp.int32)], axis=0)
            return caches, packed

        return run

    def _cache_carry_dtype(self):
        import jax.numpy as jnp

        if self._kv_cache_dtype == "int8":
            return jnp.int8
        return jnp.bfloat16 if self.net.precision == "bf16" else jnp.float32

    def _net_for_view(self, view: int):
        """Decode Net whose attention reads only the first `view` cache
        rows (0 = full).  Shares the device-resident params."""
        if view <= 0 or view >= self.cfg.max_seq:
            return self.net, self._logits_edge, self._cache_edges
        ent = self._view_nets.get(view)
        if ent is None:
            g = build_transformer_decode_step(
                self.cfg, self.B, self.params,
                kv_cache_dtype=self._kv_cache_dtype, kv_scale=self._kv_scale,
                cache_update=self.cache_update, cache_view=view)
            g = self._maybe_weight_only(g, decode=True)
            net = self._make_net(g, device_params=self.net.params)
            edges = [(g.nodes[f"dec_att_{i}"].outputs[1],
                      g.nodes[f"dec_att_{i}"].outputs[2])
                     for i in range(self.cfg.layers)]
            ent = (net, g.outputs[0], edges)
            self._view_nets[view] = ent
        return ent

    def _view_bucket(self, need: int) -> int:
        """Smallest ladder bucket (128, 256, ... doubling) covering
        `need` rows; 0 = full cache when the ladder tops out."""
        if not self._use_views:
            return 0
        v = 128
        while v < need:
            v *= 2
        return 0 if v >= self.cfg.max_seq else v

    def _cache_tuple(self):
        import jax.numpy as jnp

        cdt = self._cache_carry_dtype()
        return tuple(
            jnp.asarray(self._caches[f"cache_{kv}_{i}"]).astype(cdt)
            for i in range(self.cfg.layers) for kv in ("k", "v"))

    def _restore_caches(self, new_caches) -> None:
        self._caches = {}
        for i in range(self.cfg.layers):
            self._caches[f"cache_k_{i}"] = new_caches[2 * i]
            self._caches[f"cache_v_{i}"] = new_caches[2 * i + 1]

    def _step_fused(self) -> None:
        """Run one fused up-to-K-step window (ONE device dispatch)."""
        import jax.numpy as jnp

        K = self.fuse_window
        rem = np.zeros((self.B,), np.int32)
        temp = np.zeros((self.B,), np.float32)
        topk = np.zeros((self.B,), np.int32)
        topp = np.zeros((self.B,), np.float32)
        rid = np.zeros((self.B,), np.int32)
        gen0 = np.zeros((self.B,), np.int32)
        stop_ids = np.full((self.B, self.MAX_STOP_IDS), -1, np.int32)
        for b, slot in enumerate(self._slots):
            if slot is not None:
                rem[b] = min(K, slot.max_new - slot.generated)
                temp[b] = slot.temperature
                topk[b] = slot.top_k
                topp[b] = slot.top_p
                rid[b] = slot.rid
                gen0[b] = slot.generated
                for j, t in enumerate(sorted(slot.stop_set)):
                    stop_ids[b, j] = t
        sampling = bool((temp > 0.0).any())
        # cache-view bucket: every active slot stays below
        # pos + rem <= view for this whole window
        need = int(max((int(self._pos[b]) + int(rem[b])
                        for b in range(self.B) if self._slots[b] is not None),
                       default=0))
        view = self._view_bucket(need)
        run = self._fused_runs.get((sampling, view))
        if run is None:
            run = self._make_fused(K, sampling, view)
            self._fused_runs[(sampling, view)] = run
        caches = self._cache_tuple()
        self._caches = None              # donated — see _fail_active
        t0 = time.perf_counter()
        try:
            caches, packed = run(
                self.net.params, self._base_key, jnp.asarray(self._tok),
                jnp.asarray(self._pos), jnp.asarray(rem),
                jnp.asarray(rid), jnp.asarray(gen0),
                (jnp.asarray(temp), jnp.asarray(topk), jnp.asarray(topp),
                 jnp.asarray(stop_ids)), caches)
            packed = np.asarray(packed)  # [K+1, B] — the window's ONLY fetch
        except Exception as e:
            self._fail_active(e)
            return
        self.phase_seconds["window"] += time.perf_counter() - t0
        self._restore_caches(caches)
        toks, k_done = packed[:-1], int(packed[-1, 0])
        self.steps_run += k_done
        self.fused_windows_run += 1
        for b in range(self.B):
            slot = self._slots[b]
            if slot is None:
                continue
            # host mirrors advance exactly as the device masking did:
            # a slot is active for steps 0..n-1 where n = min(rem, first
            # stop + 1); the while_loop cannot exit while any slot still
            # has live work, so k_done >= n for every slot
            budget = int(rem[b])
            n_active = 0
            stopped = False
            for t in range(min(budget, k_done)):
                n_active += 1
                if int(toks[t, b]) in slot.stop_set:
                    stopped = True
                    break
            self._pos[b] += n_active
            if n_active > 0:
                self._tok[b, 0] = toks[n_active - 1, b]
            for t in range(n_active):
                self._emit(slot, int(toks[t, b]))
                if stopped and t == n_active - 1:
                    self._finish(b, slot, "stop")
                    break
                if slot.generated >= slot.max_new:
                    self._finish(b, slot, "length")
                    break

    def _loop(self) -> None:
        while not self._stop:
            self._reap_cancelled()
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
            if prefilling and self.prefill_mode == "bucket":
                self._step_prefill_bucket()
            elif prefilling and self.chunk > 1:
                self._step_prefill()
                self.phase_seconds["prefill"] += time.perf_counter() - t0
            elif self._can_fuse():
                self._step_fused()
            else:
                if self.chunk > 1 and self.prefill_mode == "chunked":
                    self._step_decode()
                else:
                    # per-step path (fuse_window<=1, or a mid-window
                    # admission arrived): seed first tokens if needed
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
