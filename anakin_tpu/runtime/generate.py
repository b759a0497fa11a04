"""Autoregressive generation: prefill + cached decode over two Nets.

The serving-side LLM loop (beyond-reference capability): ONE fused
prefill call (`build_transformer_prefill` — full-sequence attention that
also emits the KV caches) scores the prompt, then the decode Net advances
one token at a time.  Both are ordinary jitted graphs — caches flow
through named edges, and prefill cache outputs are named to feed directly
into decode inputs.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import (
    TransformerConfig,
    build_transformer_decode_step,
    make_transformer_params,
)
from .net import Net

__all__ = ["GenerationSession"]


class GenerationSession:
    def __init__(self, cfg: TransformerConfig, batch: int = 1,
                 params: Optional[Dict[str, np.ndarray]] = None,
                 precision: str = "fp32", seed: int = 0,
                 kv_cache_dtype: str = "float32", kv_scale: float = 0.05,
                 prefill_attention: str = "auto",
                 prefill_buckets: bool = True):
        self.cfg = cfg
        self.batch = batch
        self.params = params if params is not None else \
            make_transformer_params(cfg, seed)
        self.precision = precision
        self.kv_cache_dtype = kv_cache_dtype
        self.kv_scale = kv_scale
        # "auto": Pallas flash for long prompts on TPU (measured crossover
        # S>=512, docs/BENCH_NOTES.md round-2 attention study), dense
        # otherwise.  The session decodes every row at the SAME position
        # (one scalar pos per step below), so the aligned single-row
        # cache write is always safe here.
        self.prefill_attention = prefill_attention
        # prefill_buckets=False compiles one prefill per EXACT prompt
        # length.  SpeculativeSession uses it: bucket padding perturbs the
        # prefill reduction tiling by ~1e-6, flipping near-tie argmaxes
        # between the draft-decode and verify code paths (lower acceptance
        # for no win — the fused speculative loop compiles per (P, N)
        # anyway).
        self.prefill_buckets = prefill_buckets
        self.decode_graph = build_transformer_decode_step(
            cfg, batch, self.params, kv_cache_dtype=kv_cache_dtype,
            kv_scale=kv_scale, aligned_pos=True)
        self.decode_net = Net(self.decode_graph, precision=precision)
        self._prefill_nets = {}  # prompt_len -> (Net, Graph)
        self._logits_edge = self.decode_graph.outputs[0]

    def _empty_caches(self) -> Dict[str, np.ndarray]:
        cfg, B = self.cfg, self.batch
        shape = (B, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
        dt = np.int8 if self.kv_cache_dtype == "int8" else np.float32
        feed = {}
        for i in range(cfg.layers):
            feed[f"cache_k_{i}"] = np.zeros(shape, dt)
            feed[f"cache_v_{i}"] = np.zeros(shape, dt)
        return feed

    def _step(self, token: np.ndarray, pos: int, caches) -> tuple:
        feed = dict(caches)
        feed["input"] = token.reshape(self.batch, 1).astype(np.int32)
        feed["pos"] = np.full((self.batch,), pos, np.int32)
        out = self.decode_net.prediction(feed)
        logits = out[self._logits_edge]
        new_caches = {}
        for i in range(self.cfg.layers):
            node = self.decode_graph.nodes[f"dec_att_{i}"]
            new_caches[f"cache_k_{i}"] = out[node.outputs[1]]
            new_caches[f"cache_v_{i}"] = out[node.outputs[2]]
        return logits, new_caches

    # Prompt-length buckets: arbitrary-length serving must not compile one
    # prefill program per distinct P (SURVEY.md §7 "bucketed shapes").
    # Small buckets stay tight (32/64); beyond that, multiples of 128 so
    # flash tiles stay aligned.  Bucket padding is CORRECT for causal
    # attention without any masking: the last real position P-1 never
    # attends rows >= P, and cache rows >= P hold garbage only until the
    # decode loop overwrites each row at its own step before reading it.
    _BUCKETS_SMALL = (32, 64)

    def _bucket(self, P: int) -> int:
        if not self.prefill_buckets:
            return P
        for b in self._BUCKETS_SMALL:
            if P <= b:
                return min(b, self.cfg.max_seq)
        return min(-(-P // 128) * 128, self.cfg.max_seq)

    def _prefill(self, prompt: np.ndarray):
        """One fused prefill call: logits for the last position + filled
        KV caches (build_transformer_prefill with `last_token_only` —
        the head runs on each row's last real position only, [B, 1, V];
        jit cached per BUCKET, not per exact prompt length — at most
        2 + max_seq/128 programs)."""
        B, P = prompt.shape
        Pb = self._bucket(P)
        net = self._prefill_nets.get(Pb)
        if net is None:
            from ..models.transformer import build_transformer_prefill

            impl = self.prefill_attention
            if impl == "auto":
                import jax

                impl = ("flash" if jax.default_backend() == "tpu"
                        and Pb >= 512 else None)
            g = build_transformer_prefill(
                self.cfg, B, Pb, self.params,
                kv_cache_dtype=self.kv_cache_dtype, kv_scale=self.kv_scale,
                attention_impl=impl, last_token_only=True)
            net = (Net(g, precision=self.precision), g)
            self._prefill_nets[Pb] = net
        pnet, g = net
        ids = np.zeros((B, Pb), np.int32)
        ids[:, :P] = prompt.astype(np.int32)
        out = pnet.prediction({"input": ids,
                               "nreal": np.full((B,), P, np.int32)})
        logits = np.asarray(out[g.outputs[0]])          # [B, 1, V]
        caches = {}
        for i in range(self.cfg.layers):
            node = g.nodes[f"pre_att_{i}"]
            caches[f"cache_k_{i}"] = out[node.outputs[1]]
            caches[f"cache_v_{i}"] = out[node.outputs[2]]
        return logits, caches

    def generate(self, prompt: np.ndarray, max_new_tokens: int = 16,
                 greedy: bool = True) -> np.ndarray:
        """prompt: [B, P] int32 -> [B, P + max_new_tokens]."""
        B, P = prompt.shape
        assert B == self.batch
        assert P + max_new_tokens <= self.cfg.max_seq
        logits, caches = self._prefill(prompt)
        tokens = [prompt]
        cur = None
        for t in range(max_new_tokens):
            nxt = np.asarray(jnp.argmax(logits[:, 0, :], axis=-1),
                             np.int32)
            tokens.append(nxt[:, None])
            logits, caches = self._step(nxt, P + t, caches)
        return np.concatenate(tokens, axis=1)
